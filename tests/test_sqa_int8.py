"""int8 single-query-attention kernel parity tests (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from openai_whisper_coreml_tpu.ops.sqa_int8 import (
    quantize_kv_column,
    sqa_int8,
    sqa_reference,
)


@pytest.mark.parametrize("pos,valid", [(0, 0), (100, 0), (250, 2)])
def test_sqa_matches_fp_reference(rng, pos, valid):
    B, H, D, S = 2, 4, 64, 256
    q = jnp.asarray(rng.standard_normal((B, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, D, S)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, D, S)).astype(np.float32))

    k8, ks = quantize_kv_column(k)
    v8, vs = quantize_kv_column(v)

    out = np.asarray(sqa_int8(q, k8, ks, v8, vs, jnp.int32(pos),
                              jnp.int32(valid)))
    ref = np.asarray(sqa_reference(q, k, v, pos, valid))
    # int8 KV quantisation noise: tight but not exact
    assert np.abs(out - ref).max() < 0.05
    assert np.abs(out - ref).mean() < 0.01


def test_quantize_kv_column_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((1, 2, 64, 128)).astype(np.float32))
    q, s = quantize_kv_column(x)
    deq = q.astype(np.float32) * np.asarray(s)
    rel = np.abs(deq - np.asarray(x)).max() / np.abs(np.asarray(x)).max()
    assert rel < 0.01
    assert q.dtype == jnp.int8


def test_sqa_fully_masked_positions_ignored(rng):
    B, H, D, S = 1, 2, 64, 128
    q = jnp.asarray(rng.standard_normal((B, H, D)).astype(np.float32))
    k = rng.standard_normal((B, H, D, S)).astype(np.float32)
    v = rng.standard_normal((B, H, D, S)).astype(np.float32)
    # poison positions beyond pos: output must not change
    k2, v2 = k.copy(), v.copy()
    k2[..., 60:] = 1e3
    v2[..., 60:] = -1e3
    k8a, ksa = quantize_kv_column(jnp.asarray(k))
    v8a, vsa = quantize_kv_column(jnp.asarray(v))
    k8b, ksb = quantize_kv_column(jnp.asarray(k2))
    v8b, vsb = quantize_kv_column(jnp.asarray(v2))
    a = np.asarray(sqa_int8(q, k8a, ksa, v8a, vsa, jnp.int32(59), jnp.int32(0)))
    b = np.asarray(sqa_int8(q, k8b, ksb, v8b, vsb, jnp.int32(59), jnp.int32(0)))
    np.testing.assert_allclose(a, b, atol=1e-6)
