"""Fused int8 single-query CROSS-attention kernel, v3 (native int8 MXU dots).

Why a third attempt (v1 per-head matvecs: 36 ms; v2 block-diagonal fp32
dots: 7.71 ms; XLA inline dequant: 5.75 ms — benchmarks/sqa_probe.py):

  * v2 dequantised K/V to FP32 in VMEM and ran fp32 MXU dots — quarter-rate
    MXU passes — and did H-times-redundant block-diagonal work.
  * The decode step's dominant HBM stream is cross-KV (5.2 GB/step at the
    B40 champion config); XLA's inline-dequant einsum chain runs ~1.6x above
    the HBM floor (benchmarks/int8_mxu_probe.py: the isolated QK einsum
    moves 1.43x faster with native int8xint8->int32 dots, but in the full
    layer XLA gives the gain back).
  * This kernel keeps K and V in int8 END TO END: QK^T is an int8xint8->int32
    MXU dot (the query is pre-quantised per (b,h) row; its scale and K's
    per-position column scale fold into one f32 multiplier), and A@V either
    a) quantises the softmax probs to int8 per row — after folding V's
       column scale into them — for a second int8 dot (av_int8=True), or
    b) dequantises V to bf16 in VMEM for a bf16 dot (exact-er, half-rate).

Cross-attention reads ALL 1500 audio positions every step (no causal mask),
so the kernel needs no scalar-prefetch position bounds — only the static
real-length mask for the 1500->1536 lane padding.

Layouts match the production d-major cache ((B, H, D, S), decoder.KVCache
docstring); grid is (B, H/HG) with HG heads per block so K/V stream through
VMEM in ~2 MB double-buffered blocks.
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


def quantize_q_rows(q: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(B, H, D) float -> (int8, (B, H, 1) fp32 row scales)."""
    q32 = q.astype(jnp.float32)
    scale = jnp.max(jnp.abs(q32), axis=-1, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q8 = jnp.clip(jnp.round(q32 / scale), -127, 127).astype(jnp.int8)
    return q8, scale


def _sqa3_kernel(q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref, *,
                 sm_scale: float, s_len: int, av_int8: bool):
    """One (batch row, head group) block.

    q_ref: (1, HG, 1, D) int8 — note the pre-inserted singleton: Mosaic
    cannot reshape/insert minor dims on sub-32-bit vectors, so every int8
    operand arrives already in its dot_general rank and all in-kernel
    rank-changes happen on f32/int32;
    k_ref/v_ref: (1, HG, D, S) int8;
    ks_ref: (1, HG, S) f32 — PRE-FOLDED k_col_scale * q_row_scale;
    vs_ref: (1, HG, S) f32; o_ref: (1, HG, D) f32.
    """
    q = q_ref[0]  # (HG, 1, D) int8
    k = k_ref[0]  # (HG, D, S) int8
    # batched over heads: (HG, 1, D) @ (HG, D, S) -> (HG, 1, S), int8 MXU
    lg_i = jax.lax.dot_general(
        q, k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)[:, 0, :]  # (HG, S) — i32 reshape ok
    lg = lg_i.astype(jnp.float32) * ks_ref[0] * sm_scale

    if s_len != lg.shape[-1]:  # mask the 1500 -> 1536 lane padding
        col = jax.lax.broadcasted_iota(jnp.int32, lg.shape, 1)
        lg = jnp.where(col < s_len, lg, MASK_VALUE)

    m = jnp.max(lg, axis=-1, keepdims=True)
    p = jnp.exp(lg - m)  # (HG, S)
    denom = jnp.sum(p, axis=-1, keepdims=True)

    pv = (p * vs_ref[0])[:, None, :]  # (HG, 1, S) f32; V col scale folded
    if av_int8:
        wmax = jnp.maximum(jnp.max(pv, axis=-1, keepdims=True), 1e-20)
        w8 = jnp.clip(jnp.round(pv * (127.0 / wmax)), -127, 127
                      ).astype(jnp.int8)  # (HG, 1, S) — no int8 reshape
        v = v_ref[0]  # (HG, D, S) int8
        o_i = jax.lax.dot_general(
            w8, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)[:, 0, :]  # (HG, D)
        out = o_i.astype(jnp.float32) * (wmax[:, 0, :] / 127.0) / denom
    else:
        vb = v_ref[0].astype(jnp.bfloat16)  # (HG, D, S)
        o_f = jax.lax.dot_general(
            pv.astype(jnp.bfloat16), vb,
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, 0, :]
        out = o_f / denom
    o_ref[0] = out


@functools.partial(jax.jit,
                   static_argnames=("s_len", "av_int8", "interpret"))
def sqa_cross_int8(
    q: jax.Array,  # (B, H, D) float (bf16/f32) — single query per row
    k8: jax.Array,  # (B, H, D, S) int8 (S may include lane padding)
    k_scale: jax.Array,  # (B, H, 1, S) fp32 column scales
    v8: jax.Array,  # (B, H, D, S) int8
    v_scale: jax.Array,  # (B, H, 1, S) fp32
    *,
    s_len: Optional[int] = None,  # real (unpadded) S; default k8.shape[-1]
    av_int8: bool = True,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Fused cross-attention decode step; returns (B, H, D) in q.dtype.

    Grid is (B,) with all heads in one block (Mosaic requires the trailing
    two block dims divisible by (8, 128) or equal to the array dims; whisper
    head counts (6..20) are neither, so the head dim stays whole — at
    large-v3 that is a 1.9 MB K block + 1.9 MB V block per batch row,
    comfortably double-buffered in ~16 MB VMEM).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, h, d = q.shape
    s = k8.shape[-1]
    if s_len is None:
        s_len = s
    q8, qs = quantize_q_rows(q)
    # fold the query row scale into K's column scales: one (B,H,S) multiply
    ks_folded = (k_scale[:, :, 0, :] * qs).astype(jnp.float32)
    vs = v_scale[:, :, 0, :].astype(jnp.float32)

    kernel = functools.partial(_sqa3_kernel, sm_scale=d ** -0.5,
                               s_len=s_len, av_int8=av_int8)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, d), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, 1, d), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, d, s), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, s), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, h, d, s), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, s), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, d), lambda i: (i, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(q8[:, :, None, :], k8, ks_folded, v8, vs)
    return out.astype(q.dtype)


def sqa_cross_reference(q, k8, k_scale, v8, v_scale, s_len=None):
    """Inline-dequant oracle with identical masking (the production XLA
    path's math, models/decoder.py decode_step quant_cross branch)."""
    s = k8.shape[-1]
    if s_len is None:
        s_len = s
    d = q.shape[-1]
    kd = k8.astype(jnp.float32) * k_scale
    vd = v8.astype(jnp.float32) * v_scale
    lg = jnp.einsum("bhd,bhds->bhs", q.astype(jnp.float32), kd) * (d ** -0.5)
    if s_len != s:
        lg = jnp.where(jnp.arange(s)[None, None, :] < s_len, lg, -1e30)
    w = jax.nn.softmax(lg, axis=-1)
    return jnp.einsum("bhs,bhds->bhd", w, vd).astype(q.dtype)
