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

Status: parity-validated (interpret + on-chip) and compiled on real v5e
after two Mosaic workarounds (no bool minor-dim insertion; no lane-dim shape
casts — see _sqa_kernel docstring). Round-2 verdict (benchmarks/sqa_probe.py,
32 chained layers, B24 S1500, per decode step): bf16 einsum 9.12 ms,
inline-XLA-dequant int8 einsum 5.72 ms, THIS kernel 7.71 ms. The v2
block-diagonal rewrite fixed v1's 36 ms per-head-matvec latency, but the
H-times-redundant MXU work and the loss of XLA's cross-op scheduling still
lose to inline dequant, whose convert+scale fuses into the attention reads.
The production int8 cross-KV path (`DecodingOptions(kv_dtype="int8")`)
therefore stays on inline dequant; this kernel remains the reference
formulation for fused dequant-in-VMEM attention.
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


def pack_kv(q8: jax.Array, scale: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(B, H, D, S) int8 + (B, H, 1, S) scales -> kernel layout
    ((B, H*D, S), (B, H, S)). Mosaic cannot relayout int8 minor dims
    in-kernel, so the head-merge reshape happens here (free in HBM)."""
    b, h, d, s = q8.shape
    return q8.reshape(b, h * d, s), scale[:, :, 0, :]


def _sqa_kernel(pos_ref, valid_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref,
                o_ref, *, n_head: int, head_dim: int, sm_scale: float):
    """All heads in ONE MXU matmul pair via block-diagonal head packing.

    A per-head loop of (1,D)@(D,S) matvecs is fixed-overhead-bound (measured
    slower than XLA's einsum despite half the bytes). Instead build a
    block-diagonal query Q_bd (H, H*D) — Q_bd[g, h*D+d] = q[h,d] iff g==h —
    so logits for every head come from one (H, H*D)@(H*D, S) matmul. The
    19/20 zero blocks waste FLOPs, not bandwidth, and decode is
    bandwidth-bound. The same mask in reverse extracts the output diagonal.

    Mosaic constraints shape the formulation: no in-kernel reshapes that
    merge/split the lane dim (a (H,H,D)->(H,H*D) shape cast fails to infer a
    layout) and no minor-dim insertion on non-32-bit types — so q arrives
    PRE-FLATTENED as (1, H*D), the block structure comes from an iota mask
    (row == col//D), and the output diagonal is extracted with a masked
    axis-0 reduction back to (1, H*D).
    """
    pos = pos_ref[0]
    valid = valid_ref[0]
    h_n, d = n_head, head_dim
    s_len = k_ref.shape[-1]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (h_n, s_len), 1)
    mask = (col_ids <= pos) & (col_ids >= valid)  # (H, S)

    # block-diagonal selector (H, H*D): 1 where the column's head == row
    bd = (jax.lax.broadcasted_iota(jnp.int32, (h_n, h_n * d), 1) // d
          == jax.lax.broadcasted_iota(jnp.int32, (h_n, h_n * d), 0)
          ).astype(jnp.float32)

    q = q_ref[0].astype(jnp.float32)  # (1, H*D), flattened outside
    q_bd = bd * q  # (H, H*D)

    k = k_ref[0].astype(jnp.float32)  # (H*D, S) — dequant in VMEM
    logits = jax.lax.dot(q_bd, k, preferred_element_type=jnp.float32)
    logits = logits * ks_ref[0] * sm_scale  # (H, S) column scales
    logits = jnp.where(mask, logits, MASK_VALUE)
    w = jax.nn.softmax(logits, axis=-1)  # (H, S) fp32
    wv = w * vs_ref[0]  # fold V scales

    v = v_ref[0].astype(jnp.float32)  # (H*D, S)
    out_full = jax.lax.dot_general(
        wv, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (H, H*D)
    out = jnp.sum(out_full * bd, axis=0, keepdims=True)  # (1, H*D) diagonal
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def sqa_int8(
    q: jax.Array,  # (B, H, D) — single query per row
    k8: jax.Array,  # (B, H, D, S) int8 OR packed (B, H*D, S)
    k_scale: jax.Array,  # (B, H, 1, S) fp32 OR packed (B, H, S)
    v8: jax.Array,  # same as k8
    v_scale: jax.Array,  # same as k_scale
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
    if k8.ndim == 4:  # unpacked: merge heads outside the kernel
        k8, k_scale = pack_kv(k8, k_scale)
        v8, v_scale = pack_kv(v8, v_scale)
    kernel = functools.partial(_sqa_kernel, n_head=h, head_dim=d,
                               sm_scale=d ** -0.5)
    # q flattened to (B, 1, H*D) OUTSIDE the kernel (free in XLA; Mosaic
    # cannot shape-cast the lane dim in-kernel)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, 1, h * d), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, 1, h * d), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((1, h * d, s), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((1, h, s), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((1, h * d, s), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((1, h, s), lambda i, *_: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, h * d), lambda i, *_: (i, 0, 0)),
        ),
        interpret=interpret,
    )(jnp.atleast_1d(pos).astype(jnp.int32),
      jnp.atleast_1d(valid_from).astype(jnp.int32),
      q.reshape(b, 1, h * d), k8, k_scale, v8, v_scale)
    return out.reshape(b, h, d)


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
