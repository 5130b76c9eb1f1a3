"""Pallas single-query attention over int8 K/V (experimental perf lever).

Autoregressive decode at the batch ceiling is HBM-bound on K/V reads
(docs/benchmarks.md). XLA cannot dequantise-on-read (an int8 cache converted
with `.astype(bf16)` materialises a bf16 copy in HBM — measured, only 7%
gain for half the bytes). This kernel streams int8 K/V into VMEM and
dequantises there, so HBM traffic truly halves:

  * K quantised per (b, h, position) column over D; the column scale folds
    into the logits; V's scale folds into the softmax weights — no
    dequantised K/V tensor ever exists outside VMEM;
  * d-major (B, H, D, S) blocks, one grid cell per batch row, static loop
    over heads; masking by [valid_from, pos] bounds from scalar prefetch.

Status: validated for parity (interpret + on-chip) and benchmarked
standalone; not yet wired into decode_step (integration = cache pytrees gain
scale planes; planned once step-level win is confirmed end to end).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)


def quantize_kv_column(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(..., D, S) float -> (int8 values, (..., 1, S) fp32 scales)."""
    x32 = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(x32), axis=-2, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _sqa_kernel(pos_ref, valid_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref,
                o_ref, *, n_head: int, sm_scale: float):
    pos = pos_ref[0]
    valid = valid_ref[0]
    s_len = k_ref.shape[-1]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, s_len), 1)
    mask = (col_ids <= pos) & (col_ids >= valid)  # (1, S)

    for h in range(n_head):
        q = q_ref[0, h][None, :].astype(jnp.float32)  # (1, D)
        k = k_ref[0, h].astype(jnp.float32)  # (D, S) dequant-in-VMEM
        logits = jax.lax.dot(q, k, preferred_element_type=jnp.float32)
        logits = logits * ks_ref[0, h] * sm_scale  # fold column scales
        logits = jnp.where(mask, logits, MASK_VALUE)
        w = jax.nn.softmax(logits, axis=-1)  # (1, S) fp32
        wv = (w * vs_ref[0, h]).astype(jnp.float32)  # fold V scales
        v = v_ref[0, h].astype(jnp.float32)  # (D, S)
        out = jax.lax.dot_general(
            v, wv, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (D, 1)
        o_ref[0, h] = out[:, 0].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def sqa_int8(
    q: jax.Array,  # (B, H, D) — single query per row
    k8: jax.Array,  # (B, H, D, S) int8
    k_scale: jax.Array,  # (B, H, 1, S) fp32
    v8: jax.Array,  # (B, H, D, S) int8
    v_scale: jax.Array,  # (B, H, 1, S) fp32
    pos: jax.Array,  # scalar int32: attend positions <= pos
    valid_from: jax.Array,  # scalar int32: attend positions >= valid_from
    *,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Returns (B, H, D) attention output in q.dtype."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, h, d = q.shape
    s = k8.shape[-1]
    kernel = functools.partial(_sqa_kernel, n_head=h, sm_scale=d ** -0.5)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, h, d), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((1, h, d, s), lambda i, *_: (i, 0, 0, 0)),
                pl.BlockSpec((1, h, 1, s), lambda i, *_: (i, 0, 0, 0)),
                pl.BlockSpec((1, h, d, s), lambda i, *_: (i, 0, 0, 0)),
                pl.BlockSpec((1, h, 1, s), lambda i, *_: (i, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, h, d), lambda i, *_: (i, 0, 0)),
        ),
        interpret=interpret,
    )(jnp.atleast_1d(pos).astype(jnp.int32),
      jnp.atleast_1d(valid_from).astype(jnp.int32),
      q, k8, k_scale, v8, v_scale)


def sqa_reference(q, k, v, pos, valid_from):
    """fp reference with identical masking (test oracle); q (B,H,D),
    k/v (B,H,D,S) float."""
    d = q.shape[-1]
    logits = jnp.einsum("bhd,bhds->bhs", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * (d ** -0.5)
    s_ids = jnp.arange(k.shape[-1])[None, None, :]
    mask = (s_ids <= pos) & (s_ids >= valid_from)
    logits = jnp.where(mask, logits, -1e30)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhs,bhds->bhd", w, v.astype(jnp.float32)).astype(q.dtype)
