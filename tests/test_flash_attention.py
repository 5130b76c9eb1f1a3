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
