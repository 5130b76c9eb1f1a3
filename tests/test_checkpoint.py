"""Checkpoint round-trip + conversion-tool tests."""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openai_whisper_coreml_tpu.config import tiny_test_config
from openai_whisper_coreml_tpu.params import count_params, init_params
from openai_whisper_coreml_tpu.utils.checkpoint import (
    flatten_params,
    load_params,
    save_params,
    unflatten_params,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def cfg():
    return tiny_test_config(n_audio_ctx=64, n_text_ctx=64)


def test_flatten_roundtrip(cfg):
    params = init_params(cfg, jax.random.PRNGKey(0))
    flat = flatten_params(params)
    assert "decoder/token_embedding" in flat
    assert "encoder/blocks/attn/q/w" in flat
    rebuilt = unflatten_params(flat)
    assert jax.tree.structure(rebuilt) == jax.tree.structure(params)


def test_save_load_roundtrip(cfg, tmp_path):
    params = init_params(cfg, jax.random.PRNGKey(0))
    path = str(tmp_path / "m.safetensors")
    save_params(params, path, model_name="test")
    loaded = load_params(path, cfg=cfg)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_validates_config(cfg, tmp_path):
    params = init_params(cfg, jax.random.PRNGKey(0))
    path = str(tmp_path / "m.safetensors")
    save_params(params, path)
    from openai_whisper_coreml_tpu.config import get_config

    with pytest.raises(ValueError, match="mismatch"):
        load_params(path, cfg=get_config("tiny"))


def test_convert_tool_openai_format(tmp_path):
    """End-to-end: fake openai .pt -> convert.py -> loadable checkpoint
    producing identical logits to the direct converter path."""
    torch = pytest.importorskip("torch")

    from openai_whisper_coreml_tpu.config import get_config
    from openai_whisper_coreml_tpu.models import encoder as enc_mod

    cfg = get_config("tiny")

    # build a random openai-format state dict with tiny's real shapes
    g = torch.Generator().manual_seed(0)

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.02

    sd = {}
    n, nm = cfg.n_audio_state, cfg.n_mels
    sd["encoder.conv1.weight"] = t(n, nm, 3)
    sd["encoder.conv1.bias"] = t(n)
    sd["encoder.conv2.weight"] = t(n, n, 3)
    sd["encoder.conv2.bias"] = t(n)
    for i in range(cfg.n_audio_layer):
        p = f"encoder.blocks.{i}"
        for name, shape in [
            ("attn.query", (n, n)), ("attn.key", (n, n)),
            ("attn.value", (n, n)), ("attn.out", (n, n)),
            ("mlp.0", (4 * n, n)), ("mlp.2", (n, 4 * n)),
        ]:
            sd[f"{p}.{name}.weight"] = t(*shape)
            if name != "attn.key":
                sd[f"{p}.{name}.bias"] = t(shape[0])
        for ln in ("attn_ln", "mlp_ln"):
            sd[f"{p}.{ln}.weight"] = torch.ones(n)
            sd[f"{p}.{ln}.bias"] = torch.zeros(n)
    sd["encoder.ln_post.weight"] = torch.ones(n)
    sd["encoder.ln_post.bias"] = torch.zeros(n)
    sd["decoder.token_embedding.weight"] = t(cfg.n_vocab, n)
    sd["decoder.positional_embedding"] = t(cfg.n_text_ctx, n)
    for i in range(cfg.n_text_layer):
        p = f"decoder.blocks.{i}"
        for name, shape in [
            ("attn.query", (n, n)), ("attn.key", (n, n)),
            ("attn.value", (n, n)), ("attn.out", (n, n)),
            ("cross_attn.query", (n, n)), ("cross_attn.key", (n, n)),
            ("cross_attn.value", (n, n)), ("cross_attn.out", (n, n)),
            ("mlp.0", (4 * n, n)), ("mlp.2", (n, 4 * n)),
        ]:
            sd[f"{p}.{name}.weight"] = t(*shape)
            if not name.endswith(".key"):
                sd[f"{p}.{name}.bias"] = t(shape[0])
        for ln in ("attn_ln", "cross_attn_ln", "mlp_ln"):
            sd[f"{p}.{ln}.weight"] = torch.ones(n)
            sd[f"{p}.{ln}.bias"] = torch.zeros(n)
    sd["decoder.ln.weight"] = torch.ones(n)
    sd["decoder.ln.bias"] = torch.zeros(n)

    pt_path = str(tmp_path / "tiny.pt")
    torch.save({
        "dims": {"n_audio_state": 384, "n_audio_layer": 4, "n_mels": 80,
                 "n_vocab": 51865, "n_text_layer": 4},
        "model_state_dict": sd,
    }, pt_path)

    out_path = str(tmp_path / "tiny.safetensors")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "convert.py"),
         "--input", pt_path, "--output", out_path],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, proc.stderr
    assert "tiny" in proc.stdout

    params = load_params(out_path, cfg=cfg)
    assert count_params(params) > 30e6

    # converted encoder must run and agree with the in-process converter
    from openai_whisper_coreml_tpu.params import params_from_openai_state_dict

    direct = params_from_openai_state_dict(cfg, sd)
    mel = np.random.default_rng(0).standard_normal((1, 80, 3000)).astype(np.float32)
    a = enc_mod.encode(params, cfg, jnp.asarray(mel))
    b = enc_mod.encode(direct, cfg, jnp.asarray(mel))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_load_model_from_orbax_dir(tmp_path):
    """load_model's documented 'orbax dir' contract (code-review finding:
    a training-state dir previously crashed in the safetensors loader)."""
    import jax
    import jax.numpy as jnp

    from openai_whisper_coreml_tpu.config import tiny_test_config
    from openai_whisper_coreml_tpu.params import init_params
    from openai_whisper_coreml_tpu.utils.checkpoint import save_train_state

    cfg = tiny_test_config(n_state=64, n_head=2, n_layer=2)
    params = init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
    path = str(tmp_path / "state")
    save_train_state(path, params, opt_state=None)

    import openai_whisper_coreml_tpu.config as config_mod
    import openai_whisper_coreml_tpu.models.whisper as whisper_mod

    orig = config_mod.get_config
    patched = lambda name: cfg if name == "tiny-test" else orig(name)
    config_mod.get_config = patched
    whisper_mod.get_config = patched
    try:
        m = whisper_mod.load_model("tiny-test", checkpoint=path,
                                   dtype=jnp.float32)
    finally:
        config_mod.get_config = orig
        whisper_mod.get_config = orig
    np.testing.assert_array_equal(
        np.asarray(m.params["decoder"]["token_embedding"]),
        np.asarray(params["decoder"]["token_embedding"]))


def test_flash_plus_mesh_loads():
    """flash=True with a mesh is supported since round 3 (shard_map wrapper,
    ops/flash_attention.flash_attention_auto); loading must not raise."""
    from openai_whisper_coreml_tpu.models.whisper import load_model
    from openai_whisper_coreml_tpu.parallel import make_mesh

    m = load_model("tiny", mesh=make_mesh(n_model=2), flash=True)
    assert m.flash and m.mesh is not None


def test_all_named_configs_validate():
    """Every CONFIGS entry (incl. the distil-whisper family) passes the
    vocab-layout validation and exposes a coherent decode geometry."""
    from openai_whisper_coreml_tpu.config import CONFIGS, get_config

    for name in CONFIGS:
        cfg = get_config(name)
        assert cfg.n_text_layer >= 1
        assert cfg.n_text_state == cfg.n_audio_state
        if name.startswith("distil-"):
            # distillation shrinks only the decoder
            assert cfg.n_text_layer < cfg.n_audio_layer


def test_distil_config_decodes():
    """A distil-shaped config (deep encoder, 2-layer decoder) runs the full
    jitted greedy decode path — the unrolled decode_step specialises on
    n_text_layer, so asymmetric depth must not be assumed equal anywhere."""
    import dataclasses

    import jax
    import numpy as np

    from openai_whisper_coreml_tpu.config import tiny_test_config
    from openai_whisper_coreml_tpu.decoding import DecodingOptions, decode
    from openai_whisper_coreml_tpu.models.whisper import WhisperModel
    from openai_whisper_coreml_tpu.params import init_params

    cfg = tiny_test_config(n_state=64, n_head=2, n_layer=4,
                           n_audio_ctx=64, n_text_ctx=96)
    cfg = dataclasses.replace(cfg, n_text_layer=2)
    cfg.validate()
    model = WhisperModel(cfg=cfg, params=init_params(cfg, jax.random.PRNGKey(0)))
    feats = np.random.default_rng(0).standard_normal(
        (2, 64, 64)).astype(np.float32)
    res = decode(model, feats, DecodingOptions(language="en", sample_len=8),
                 from_features=True)
    assert len(res) == 2 and all(len(r.tokens) >= 0 for r in res)
