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


def test_quantized_checkpoint_roundtrip(tmp_path):
    """int8 serving checkpoints round-trip bit-exactly: w_q stays int8,
    scales stay fp32, metadata marks the file, and load_model skips
    re-quantization (teacher-forced logits identical to quantize-at-load)."""
    import jax.numpy as jnp

    from openai_whisper_coreml_tpu.models.whisper import load_model
    from openai_whisper_coreml_tpu.quantize import quantize_params
    from openai_whisper_coreml_tpu.utils.checkpoint import (
        load_params, read_metadata, save_params)

    # float tiny checkpoint on disk
    base = load_model("tiny", dtype=jnp.float32, seed=7)
    fpath = str(tmp_path / "tiny_f32.safetensors")
    save_params(base.params, fpath, model_name="tiny")
    assert "quantized" not in read_metadata(fpath)

    # quantized checkpoint written from the same weights
    qparams = quantize_params(base.params)
    qpath = str(tmp_path / "tiny_int8.safetensors")
    save_params(qparams, qpath, model_name="tiny")
    assert read_metadata(qpath)["quantized"] == "int8"

    loaded = load_params(qpath, cfg=base.cfg, dtype=jnp.float32)
    qleaf = loaded["decoder"]["blocks"]["attn"]["q"]
    assert qleaf["w_q"].dtype == jnp.int8
    assert qleaf["scale"].dtype == jnp.float32
    np.testing.assert_array_equal(
        np.asarray(qleaf["w_q"]),
        np.asarray(qparams["decoder"]["blocks"]["attn"]["q"]["w_q"]))

    # load_model: prequantized checkpoint == quantize-at-load, exactly
    m_pre = load_model("tiny", dtype=jnp.float32, checkpoint=qpath,
                       quantize="int8")  # satisfied by the checkpoint
    m_live = load_model("tiny", dtype=jnp.float32, checkpoint=fpath,
                        quantize="int8")
    toks = np.array([[m_pre.cfg.sot_token, 1, 2]], np.int32)
    feats = np.random.default_rng(0).standard_normal(
        (1, 1500, base.cfg.n_audio_state)).astype(np.float32) * 0.1
    lg_pre = np.asarray(m_pre.logits(toks, feats))
    lg_live = np.asarray(m_live.logits(toks, feats))
    np.testing.assert_array_equal(lg_pre, lg_live)

    # conflicting / unsupported combinations are rejected
    with pytest.raises(ValueError, match="pre-quantized"):
        load_model("tiny", checkpoint=qpath, quantize="fp4")
    from openai_whisper_coreml_tpu.parallel import make_mesh

    mesh = make_mesh(n_data=1, n_model=2, devices=jax.devices()[:2])
    with pytest.raises(ValueError, match="TP-sharded"):
        load_model("tiny", checkpoint=qpath, mesh=mesh)


def test_convert_tool_native_requantize(tmp_path):
    """convert.py accepts this framework's own float checkpoints as input
    (whisper-tpu-v1 metadata sniff) so an int8 serving checkpoint can be
    produced without the original torch source; double-quantize is refused."""
    from openai_whisper_coreml_tpu.models.whisper import load_model
    from openai_whisper_coreml_tpu.utils.checkpoint import read_metadata

    base = load_model("tiny", dtype=jnp.float32, seed=11)
    fpath = str(tmp_path / "tiny_f.safetensors")
    save_params(base.params, fpath, model_name="tiny")

    out = str(tmp_path / "tiny_q.safetensors")
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "convert.py"),
         "--input", fpath, "--output", out, "--quantize", "int8"],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    assert read_metadata(out)["quantized"] == "int8"

    m_conv = load_model("tiny", dtype=jnp.float32, checkpoint=out,
                        quantize="int8")
    m_live = load_model("tiny", dtype=jnp.float32, checkpoint=fpath,
                        quantize="int8")
    toks = np.array([[base.cfg.sot_token, 1, 2]], np.int32)
    feats = np.random.default_rng(1).standard_normal(
        (1, 1500, base.cfg.n_audio_state)).astype(np.float32) * 0.1
    np.testing.assert_array_equal(np.asarray(m_conv.logits(toks, feats)),
                                  np.asarray(m_live.logits(toks, feats)))

    r2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "convert.py"),
         "--input", out, "--output", str(tmp_path / "x.safetensors"),
         "--quantize", "int8"],
        capture_output=True, text=True, env=env)
    assert r2.returncode != 0 and "already an int8" in r2.stderr


def test_layernorm_scale_follows_compute_dtype(tmp_path):
    """Only quantization scales (w_q siblings) are pinned fp32 by
    load_params; LayerNorm 'scale' leaves follow the requested dtype
    (code-review regression: an endswith('/scale') match caught them)."""
    from openai_whisper_coreml_tpu.models.whisper import load_model
    from openai_whisper_coreml_tpu.quantize import quantize_params

    base = load_model("tiny", dtype=jnp.float32, seed=5)
    fpath = str(tmp_path / "f.safetensors")
    save_params(base.params, fpath, model_name="tiny")
    loaded = load_params(fpath, cfg=base.cfg, dtype=jnp.bfloat16)
    ln = loaded["encoder"]["blocks"]["attn_ln"]
    assert ln["scale"].dtype == jnp.bfloat16

    qpath = str(tmp_path / "q.safetensors")
    save_params(quantize_params(base.params), qpath, model_name="tiny")
    qloaded = load_params(qpath, cfg=base.cfg, dtype=jnp.bfloat16)
    assert qloaded["encoder"]["blocks"]["attn_ln"]["scale"].dtype == jnp.bfloat16
    q = qloaded["decoder"]["blocks"]["attn"]["q"]
    assert q["w_q"].dtype == jnp.int8 and q["scale"].dtype == jnp.float32
