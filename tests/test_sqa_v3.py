"""v3 fused int8-MXU cross-attention kernel: interpret-mode parity tests.

Compiled behaviour is re-verified on the real chip by
benchmarks/sqa_v3_probe.py (CLAUDE.md: Pallas precision/VMEM differ on
hardware); these pin the math.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from openai_whisper_coreml_tpu.ops.sqa_int8 import quantize_kv_column
from openai_whisper_coreml_tpu.ops.sqa_v3 import (
    quantize_q_rows,
    sqa_cross_int8,
    sqa_cross_reference,
)


@pytest.fixture()
def data():
    rng = np.random.default_rng(0)
    b, h, d, s = 2, 8, 64, 256
    k = jnp.asarray(rng.standard_normal((b, h, d, s)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, d, s)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32)
    k8, ks = quantize_kv_column(k)
    v8, vs = quantize_kv_column(v)
    return q, k8, ks, v8, vs


@pytest.mark.parametrize("av_int8", [True, False])
def test_v3_matches_inline_dequant_oracle(data, av_int8):
    q, k8, ks, v8, vs = data
    ref = sqa_cross_reference(q, k8, ks, v8, vs)
    out = sqa_cross_int8(q, k8, ks, v8, vs, av_int8=av_int8)
    # int8 q adds <=0.4% rel error; int8 probs (av_int8) ~1% on the
    # near-uniform random-attention worst case
    tol = 0.012 if av_int8 else 0.004
    assert float(jnp.max(jnp.abs(out - ref))) < tol
    rms = float(jnp.sqrt(jnp.mean((out - ref) ** 2)))
    assert rms < tol / 3


def test_v3_lane_padding_masked(data):
    """Padded S columns (1500->1536-style) must not leak into the softmax."""
    q, k8, ks, v8, vs = data
    s_real = 199
    ref = sqa_cross_reference(q, k8, ks, v8, vs, s_len=s_real)
    out = sqa_cross_int8(q, k8, ks, v8, vs, s_len=s_real, av_int8=True)
    assert float(jnp.max(jnp.abs(out - ref))) < 0.012
    # poison the padded region: the output must not change at all
    k8_p = k8.at[..., s_real:].set(127)
    v8_p = v8.at[..., s_real:].set(127)
    ks_p = ks.at[..., s_real:].set(1e6)
    vs_p = vs.at[..., s_real:].set(1e6)
    out_p = sqa_cross_int8(q, k8_p, ks_p, v8_p, vs_p, s_len=s_real,
                           av_int8=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_p))


def test_quantize_q_rows_roundtrip():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((3, 4, 64)) * 5, jnp.float32)
    q8, qs = quantize_q_rows(q)
    assert q8.dtype == jnp.int8 and qs.shape == (3, 4, 1)
    back = q8.astype(jnp.float32) * qs
    assert float(jnp.max(jnp.abs(back - q))) < float(jnp.max(qs)) * 0.51
