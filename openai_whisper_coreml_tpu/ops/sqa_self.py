"""Fused single-query SELF-attention kernel for the decode step (bf16).

Why this exists (round-3 attribution, benchmarks/step_ablation.py at the
B40 champion config): the decode step's sublayers measure cross-attn
10.7 ms (AT its MXU-ingest floor — see docs/benchmarks.md round-3), MLP
0.8 ms and logits 0.7 ms (at floor), but the SELF-attention sublayer costs
7.05 ms against a ~2.5 ms floor. Its compute is a string of ~12 tiny ops
(QK matvecs of (1,64)@(64,C), mask, fp32 softmax, AV) whose per-op
boundary costs dominate at single-token shapes. This kernel collapses the
attention group (QK + position mask + softmax + AV) into ONE op per layer.

Unlike the cross-attention kernels (v1-v3, all measured losers because that
chain is ingest-bound), the self-attention chain is NOT at a bandwidth
floor — the win here is op-count, not bytes.

Shapes mirror the production d-major cache (decoder.KVCache): K/V arrive as
(B, H, D, C) bf16 slices of layer l's cache (cache write stays in XLA —
it is one in-place dynamic_update_slice). Masking bounds [valid_from, pos]
arrive via scalar prefetch so one compiled kernel serves every decode
position. Mosaic constraints (learned in v2/v3): q is pre-shaped
(B, H, 1, D) outside (no sub-32-bit minor-dim insertion in-kernel), and
all in-kernel rank changes happen on f32/int32.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)


def _sqa_self_kernel(pos_ref, valid_ref, q_ref, k_ref, v_ref, o_ref, *,
                     sm_scale: float):
    """One batch row, all heads. q (1,H,1,D) bf16; k/v (1,H,D,C) bf16;
    out (1,H,D) f32. Attend columns c with valid_from <= c <= pos; the
    bounds are per-row (B,) prefetch vectors (per-sample prompts give rows
    different left-pads; continuous batching gives them different
    positions)."""
    i = pl.program_id(0)
    pos = pos_ref[i]
    valid = valid_ref[i]
    q = q_ref[0]  # (H, 1, D) bf16
    k = k_ref[0]  # (H, D, C) bf16
    lg = jax.lax.dot_general(
        q, k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)[:, 0, :]  # (H, C) f32
    lg = lg * sm_scale
    col = jax.lax.broadcasted_iota(jnp.int32, lg.shape, 1)
    lg = jnp.where((col <= pos) & (col >= valid), lg, MASK_VALUE)

    m = jnp.max(lg, axis=-1, keepdims=True)
    p = jnp.exp(lg - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    pv = (p / denom)[:, None, :]  # (H, 1, C) f32

    v = v_ref[0]  # (H, D, C) bf16
    out = jax.lax.dot_general(
        pv.astype(jnp.bfloat16), v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)[:, 0, :]  # (H, D)
    o_ref[0] = out


@functools.partial(jax.jit, static_argnames=("interpret",))
def sqa_self(
    q: jax.Array,  # (B, H, D) bf16/f32 — the single query per row
    k: jax.Array,  # (B, H, D, C) — layer slice of the d-major cache
    v: jax.Array,  # (B, H, D, C)
    pos: jax.Array,  # int32 scalar or (B,): attend columns <= pos
    valid_from: jax.Array,  # int32 scalar or (B,): attend columns >= this
    *,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Fused decode self-attention; returns (B, H, D) in q.dtype."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, h, d = q.shape
    c = k.shape[-1]
    dtype = q.dtype
    qb = q.astype(jnp.bfloat16)[:, :, None, :]
    pos = jnp.broadcast_to(jnp.asarray(pos, jnp.int32), (b,))
    valid_from = jnp.broadcast_to(jnp.asarray(valid_from, jnp.int32), (b,))
    out = pl.pallas_call(
        functools.partial(_sqa_self_kernel, sm_scale=d ** -0.5),
        out_shape=jax.ShapeDtypeStruct((b, h, d), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, h, 1, d), lambda i, *_: (i, 0, 0, 0)),
                pl.BlockSpec((1, h, d, c), lambda i, *_: (i, 0, 0, 0)),
                pl.BlockSpec((1, h, d, c), lambda i, *_: (i, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, h, d), lambda i, *_: (i, 0, 0)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(pos, valid_from,
      qb, k.astype(jnp.bfloat16), v.astype(jnp.bfloat16))
    return out.astype(dtype)
