"""Fused decode self-attention kernel (ops/sqa_self): interpret parity.

Compiled behaviour is re-verified on chip (benchmarks/step_ablation.py
full_selfkernel variant + decode-parity probe); these pin the math and the
position/left-pad masking.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openai_whisper_coreml_tpu.config import tiny_test_config
from openai_whisper_coreml_tpu.models import decoder as dec
from openai_whisper_coreml_tpu.ops.sqa_self import sqa_self
from openai_whisper_coreml_tpu.params import init_params


def _oracle(q, k, v, pos, valid):
    d = q.shape[-1]
    lg = jnp.einsum("bhd,bhdc->bhc", q.astype(jnp.float32),
                    k.astype(jnp.float32)) * (d ** -0.5)
    c_ids = jnp.arange(k.shape[-1])[None, None, :]
    pos = jnp.asarray(pos)[..., None, None] if jnp.ndim(pos) else pos
    valid = jnp.asarray(valid)[..., None, None] if jnp.ndim(valid) else valid
    lg = jnp.where((c_ids <= pos) & (c_ids >= valid), lg, -1e30)
    w = jax.nn.softmax(lg, axis=-1)
    return jnp.einsum("bhc,bhdc->bhd", w, v.astype(jnp.float32))


@pytest.mark.parametrize("pos,valid", [(7, 0), (31, 4)])
def test_sqa_self_matches_oracle(pos, valid):
    rng = np.random.default_rng(0)
    b, h, d, c = 3, 8, 64, 32
    q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, d, c)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, d, c)), jnp.float32)
    ref = _oracle(q, k, v, pos, valid)
    out = sqa_self(q, k, v, jnp.int32(pos), jnp.int32(valid))
    # kernel computes in bf16 -> ~1% of scale
    assert float(jnp.max(jnp.abs(out - ref))) < 0.05


def test_sqa_self_per_row_bounds():
    rng = np.random.default_rng(1)
    b, h, d, c = 4, 4, 64, 16
    q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, d, c)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, d, c)), jnp.float32)
    pos = jnp.asarray([3, 7, 11, 15], jnp.int32)
    valid = jnp.asarray([0, 2, 4, 6], jnp.int32)
    ref = _oracle(q, k, v, pos, valid)
    out = sqa_self(q, k, v, pos, valid)
    assert float(jnp.max(jnp.abs(out - ref))) < 0.05
    # masked-out columns must have zero influence: poison them
    k_p = k.at[..., :2].set(1e3)  # columns < min(valid) for rows 2,3
    out_row3 = sqa_self(q, k_p, v, pos, valid)[3]
    np.testing.assert_allclose(np.asarray(out_row3), np.asarray(out[3]))


def test_decode_step_self_kernel_parity():
    """decode_step(self_kernel=True) == the jnp path within bf16 rounding,
    incl. per-row valid_from (per-sample prompts)."""
    cfg = tiny_test_config(n_state=128, n_head=4, n_layer=2,
                           n_audio_ctx=64, n_text_ctx=64)
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    feats = jnp.asarray(
        rng.standard_normal((3, cfg.n_audio_ctx, cfg.n_audio_state)),
        jnp.float32) * 0.1
    cross = dec.precompute_cross_kv(params, cfg, feats)
    cache = dec.init_kv_cache(cfg, 3, ctx=32)
    tok = jnp.asarray(rng.integers(0, cfg.n_vocab, (3, 1)), jnp.int32)
    for vf in (2, jnp.asarray([1, 2, 3], jnp.int32)):
        lg_a, ca = dec.decode_step(params, cfg, tok, cross, cache, 5,
                                   valid_from=vf)
        lg_b, cb = dec.decode_step(params, cfg, tok, cross, cache, 5,
                                   valid_from=vf, self_kernel=True)
        assert float(jnp.max(jnp.abs(lg_a - lg_b))) < 0.05
        # layer 0's cache write happens BEFORE any kernel output is used:
        # bit-identical; deeper layers inherit the kernel's bf16 rounding
        np.testing.assert_array_equal(np.asarray(ca.k[0]),
                                      np.asarray(cb.k[0]))
        np.testing.assert_allclose(np.asarray(ca.k, np.float32),
                                   np.asarray(cb.k, np.float32), atol=0.05)
