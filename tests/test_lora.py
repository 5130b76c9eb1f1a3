"""LoRA adapter tests (lora.py + the layers.linear hook + training)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openai_whisper_coreml_tpu.config import tiny_test_config
from openai_whisper_coreml_tpu.lora import (
    add_lora,
    count_lora_params,
    merge_lora,
)
from openai_whisper_coreml_tpu.models.whisper import WhisperModel
from openai_whisper_coreml_tpu.params import init_params


@pytest.fixture(scope="module")
def cfg():
    return tiny_test_config(n_state=64, n_head=2, n_layer=2,
                            n_audio_ctx=32, n_text_ctx=32)


@pytest.fixture(scope="module")
def base_params(cfg):
    return init_params(cfg, jax.random.PRNGKey(0))


def _logits(cfg, params, seed=0):
    model = WhisperModel(cfg=cfg, params=params)
    rng = np.random.default_rng(seed)
    feats = rng.standard_normal(
        (1, cfg.n_audio_ctx, cfg.n_audio_state)).astype(np.float32) * 0.1
    toks = np.array([[cfg.sot_token, 3, 5]], np.int32)
    return np.asarray(model.logits(toks, feats))


def test_add_lora_is_identity_at_init(cfg, base_params):
    """B = 0 at init: adapted logits are bit-identical to the base."""
    adapted = add_lora(base_params, rank=4, seed=1)
    q = adapted["decoder"]["blocks"]["attn"]["q"]
    assert q["lora_a"].shape == (cfg.n_text_layer, cfg.n_text_state, 4)
    assert q["lora_b"].shape == (cfg.n_text_layer, 4, cfg.n_text_state)
    assert "lora_a" not in adapted["decoder"]["blocks"]["attn"]["k"]
    assert "lora_a" not in adapted["decoder"]["blocks"]["mlp"]["fc1"]
    np.testing.assert_array_equal(_logits(cfg, adapted),
                                  _logits(cfg, base_params))
    assert count_lora_params(adapted) > 0


def test_lora_merge_matches_runtime_adapter(cfg, base_params):
    """With non-zero adapters, runtime x@A@B == merged (w + A@B) logits."""
    adapted = add_lora(base_params, rank=4, seed=2)
    # give B real values so the adapter actually contributes
    adapted = jax.tree_util.tree_map_with_path(
        lambda p, x: (jax.random.normal(jax.random.PRNGKey(7), x.shape,
                                        x.dtype) * 0.02
                      if str(getattr(p[-1], "key", "")) == "lora_b" else x),
        adapted)
    lg_runtime = _logits(cfg, adapted)
    lg_base = _logits(cfg, base_params)
    assert not np.array_equal(lg_runtime, lg_base), \
        "non-zero adapters must change the logits"
    merged = merge_lora(adapted)
    assert "lora_a" not in merged["decoder"]["blocks"]["attn"]["q"]
    np.testing.assert_allclose(_logits(cfg, merged), lg_runtime,
                               atol=2e-4, rtol=2e-4)


def test_lora_on_quantized_base(cfg, base_params):
    """QLoRA-style: adapters ride on an int8 base through quantize_params
    and linear(); merging into w_q is refused."""
    from openai_whisper_coreml_tpu.quantize import quantize_params

    adapted = add_lora(base_params, rank=4, seed=3)
    q_adapted = quantize_params(adapted, min_size=1)
    node = q_adapted["decoder"]["blocks"]["attn"]["q"]
    assert "w_q" in node and "lora_a" in node
    lg = _logits(cfg, q_adapted)  # runs
    assert np.isfinite(lg).all()
    with pytest.raises(ValueError, match="quantized"):
        merge_lora(q_adapted)


def test_lora_training_moves_only_adapters(cfg, base_params):
    """TrainConfig(trainable='lora_'): a step leaves every base leaf
    bit-exact and moves the adapters; the decode path then uses them."""
    from openai_whisper_coreml_tpu.parallel import make_mesh
    from openai_whisper_coreml_tpu.tokenizer import get_tokenizer
    from openai_whisper_coreml_tpu.train import (
        TrainConfig, make_batch, make_train_step)

    adapted = add_lora(base_params, rank=2, seed=4)
    before = jax.tree.map(np.asarray, adapted)
    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    init_fn, step_fn = make_train_step(
        cfg, mesh, TrainConfig(learning_rate=1e-2, trainable="lora_",
                               remat=False))
    params, opt_state = init_fn(adapted)
    tok = get_tokenizer(cfg)
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, cfg.n_mels, 64)).astype(np.float32)
    mel, tokens, mask = make_batch(cfg, tok, mel, ["x y", "z w"], max_len=12)
    params, opt_state, metrics = step_fn(
        params, opt_state, jnp.asarray(mel), jnp.asarray(tokens),
        jnp.asarray(mask))
    assert np.isfinite(float(metrics["loss"]))

    after = jax.tree.map(np.asarray, params)
    np.testing.assert_array_equal(
        after["decoder"]["blocks"]["attn"]["q"]["w"],
        before["decoder"]["blocks"]["attn"]["q"]["w"])
    np.testing.assert_array_equal(
        after["decoder"]["token_embedding"],
        before["decoder"]["token_embedding"])
    assert not np.array_equal(
        after["decoder"]["blocks"]["attn"]["q"]["lora_b"],
        before["decoder"]["blocks"]["attn"]["q"]["lora_b"])


def test_lora_sharded_parity(cfg, base_params):
    """Adapted params place onto a TP mesh (align_pspecs replicates the
    adapter leaves) and sharded logits match single-device."""
    from openai_whisper_coreml_tpu.parallel import make_mesh
    from openai_whisper_coreml_tpu.parallel.sharding import shard_params

    adapted = add_lora(base_params, rank=4, seed=5)
    adapted = jax.tree_util.tree_map_with_path(
        lambda p, x: (jnp.full(x.shape, 0.01, x.dtype)
                      if str(getattr(p[-1], "key", "")) == "lora_b" else x),
        adapted)
    lg_single = _logits(cfg, adapted)

    mesh = make_mesh(n_data=2, n_model=2, devices=jax.devices()[:4])
    sharded = shard_params(adapted, cfg, mesh)
    model = WhisperModel(cfg=cfg, params=sharded, mesh=mesh)
    rng = np.random.default_rng(0)
    feats = rng.standard_normal(
        (1, cfg.n_audio_ctx, cfg.n_audio_state)).astype(np.float32) * 0.1
    toks = np.array([[cfg.sot_token, 3, 5]], np.int32)
    lg_sharded = np.asarray(model.logits(toks, feats))
    np.testing.assert_allclose(lg_sharded, lg_single, atol=1e-5, rtol=1e-5)


def test_lora_checkpoint_roundtrip(cfg, base_params, tmp_path):
    """Adapted trees save/load through the standard checkpoint path."""
    from openai_whisper_coreml_tpu.utils.checkpoint import (
        load_params, save_params)

    adapted = add_lora(base_params, rank=4, seed=6)
    path = str(tmp_path / "lora.safetensors")
    save_params(adapted, path, model_name="test")
    loaded = load_params(path)
    np.testing.assert_array_equal(
        np.asarray(loaded["decoder"]["blocks"]["attn"]["q"]["lora_a"]),
        np.asarray(adapted["decoder"]["blocks"]["attn"]["q"]["lora_a"]))


def test_lora_validation():
    params = {"attn": {"q": {"w": jnp.zeros((4, 4))}}}
    with pytest.raises(ValueError, match="matched no"):
        add_lora(params, targets="nonexistent$")
    with pytest.raises(ValueError, match="rank"):
        add_lora(params, rank=0)


def test_lora_greedy_decode_uses_adapters(cfg, base_params):
    """The KV-cache decode loop (decode_step path) applies adapters:
    adapted greedy tokens == merged-weights greedy tokens, and non-zero
    adapters actually change the decode."""
    from openai_whisper_coreml_tpu.decoding import DecodingOptions, decode

    adapted = add_lora(base_params, rank=4, seed=8)
    adapted = jax.tree_util.tree_map_with_path(
        lambda p, x: (jax.random.normal(jax.random.PRNGKey(3), x.shape,
                                        x.dtype) * 0.05
                      if str(getattr(p[-1], "key", "")) == "lora_b" else x),
        adapted)
    rng = np.random.default_rng(2)
    feats = rng.standard_normal(
        (1, cfg.n_audio_ctx, cfg.n_audio_state)).astype(np.float32) * 0.1
    opts = DecodingOptions(language="en", sample_len=8)

    def toks(params):
        model = WhisperModel(cfg=cfg, params=params)
        return decode(model, jnp.asarray(feats), opts,
                      from_features=True)[0].tokens

    t_adapted = toks(adapted)
    t_merged = toks(merge_lora(adapted))
    t_base = toks(base_params)
    assert t_adapted == t_merged
    assert t_adapted != t_base  # 0.05-scale adapters must move the argmax
