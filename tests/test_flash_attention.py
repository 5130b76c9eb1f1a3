"""Flash-attention kernel parity vs the jnp oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openai_whisper_coreml_tpu.models.layers import attention_core
from openai_whisper_coreml_tpu.ops.flash_attention import flash_attention


def _rand_qkv(rng, b, tq, tk, h, d):
    q = rng.standard_normal((b, tq, h, d)).astype(np.float32)
    k = rng.standard_normal((b, tk, h, d)).astype(np.float32)
    v = rng.standard_normal((b, tk, h, d)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


@pytest.mark.parametrize("tq,tk", [(128, 128), (256, 384), (300, 300)])
def test_flash_matches_oracle(rng, tq, tk):
    q, k, v = _rand_qkv(rng, 2, tq, tk, 2, 64)
    ref = attention_core(q, k, v)
    out = flash_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_unpadded_1500(rng):
    """Whisper encoder geometry: 1500 is not a tile multiple."""
    q, k, v = _rand_qkv(rng, 1, 1500, 1500, 1, 64)
    ref = attention_core(q, k, v)
    out = flash_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("tq,tk", [(128, 128), (256, 384), (1500, 1500)])
def test_flash_single_block_matches_online(rng, tq, tk):
    """The scratch-free single-KV-block kernel (the default whenever the KV
    fits one block — encoder geometry) equals the general online-softmax
    kernel and the oracle. online=True forces the general kernel so both
    code paths stay covered now that the default routes single-block."""
    q, k, v = _rand_qkv(rng, 2, tq, tk, 2, 64)
    ref = attention_core(q, k, v)
    single = flash_attention(q, k, v, online=False)
    online = flash_attention(q, k, v, online=True)
    np.testing.assert_allclose(np.asarray(single), np.asarray(ref),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(online), np.asarray(ref),
                               atol=2e-5)


def test_flash_single_block_causal_matches_online(rng):
    t = 448  # decoder prompt-prefill geometry
    q, k, v = _rand_qkv(rng, 2, t, t, 2, 64)
    mask = jnp.tril(jnp.ones((t, t), jnp.bool_))[None, None]
    ref = attention_core(q, k, v, mask=mask)
    for online in (False, True):
        out = flash_attention(q, k, v, causal=True, online=online)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)


def test_flash_multi_block_routes_online(rng):
    """KV longer than one block must ignore online=None's single-block
    shortcut and still match the oracle (block_k forced small)."""
    q, k, v = _rand_qkv(rng, 1, 128, 512, 2, 64)
    ref = attention_core(q, k, v)
    out = flash_attention(q, k, v, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("t", [128, 300])
def test_flash_causal(rng, t):
    q, k, v = _rand_qkv(rng, 2, t, t, 2, 64)
    mask = jnp.tril(jnp.ones((t, t), jnp.bool_))[None, None]
    ref = attention_core(q, k, v, mask=mask)
    out = flash_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_encoder_flash_path_matches(rng):
    """encode(flash=True) == encode(flash=False) on CPU interpret mode."""
    from openai_whisper_coreml_tpu.config import tiny_test_config
    from openai_whisper_coreml_tpu.models import encoder as enc_mod
    from openai_whisper_coreml_tpu.params import init_params

    cfg = tiny_test_config(n_state=64, n_head=2, n_layer=2, n_audio_ctx=128)
    params = init_params(cfg, jax.random.PRNGKey(0))
    mel = rng.standard_normal((1, 80, 256)).astype(np.float32)
    a = enc_mod.encode(params, cfg, mel, flash=False)
    b = enc_mod.encode(params, cfg, mel, flash=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_flash_attention_gradients_match_reference():
    """The kernel's custom VJP returns the reference attention gradient
    (fp32, non-causal and causal)."""
    import jax

    from openai_whisper_coreml_tpu.models.layers import attention_core
    from openai_whisper_coreml_tpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(0)
    shape = (2, 64, 2, 64)
    q, k, v = (jnp.asarray(rng.standard_normal(shape), jnp.float32) * 0.3
               for _ in range(3))

    for causal in (False, True):
        def loss_flash(q_, k_, v_):
            return (flash_attention(q_, k_, v_, causal=causal) ** 2).sum()

        def loss_ref(q_, k_, v_):
            mask = (jnp.tril(jnp.ones((shape[1], shape[1]), jnp.bool_))
                    [None, None] if causal else None)
            return (attention_core(q_, k_, v_, mask=mask) ** 2).sum()

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-3, rtol=2e-3)


def test_train_step_with_flash_encoder():
    """TrainConfig(flash=True): the train step runs through the kernel
    forward + VJP backward and matches the jnp-encoder step's loss."""
    import jax

    from openai_whisper_coreml_tpu.config import tiny_test_config
    from openai_whisper_coreml_tpu.params import init_params
    from openai_whisper_coreml_tpu.parallel import make_mesh
    from openai_whisper_coreml_tpu.tokenizer import get_tokenizer
    from openai_whisper_coreml_tpu.train import (
        TrainConfig, make_batch, make_train_step)

    cfg = tiny_test_config(n_state=64, n_head=2, n_layer=2,
                           n_audio_ctx=64, n_text_ctx=32)
    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    tok = get_tokenizer(cfg)
    rng = np.random.default_rng(0)
    mel_np = rng.standard_normal((2, cfg.n_mels, 128)).astype(np.float32)
    mel, tokens, mask = make_batch(cfg, tok, mel_np, ["a b", "c d"],
                                   max_len=12)

    losses = {}
    for flash in (False, True):
        params = init_params(cfg, jax.random.PRNGKey(0))
        init_fn, step_fn = make_train_step(
            cfg, mesh, TrainConfig(learning_rate=1e-3, flash=flash,
                                   remat=False))
        p, o = init_fn(params)
        _, _, metrics = step_fn(p, o, jnp.asarray(mel), jnp.asarray(tokens),
                                jnp.asarray(mask))
        losses[flash] = float(metrics["loss"])
    assert np.isfinite(losses[True])
    assert abs(losses[True] - losses[False]) < 1e-3
