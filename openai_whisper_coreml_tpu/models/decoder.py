"""Whisper text decoder: causal self-attention + audio cross-attention.

The reference's decoder is a CoreML graph traced at a FIXED one-token input
with no KV cache (/root/reference/whisper_to_cml.py:28-41) and called exactly
once with the SOT token (/root/reference/Whisper/Whisper/Whisper.swift:34-36)
— it cannot transcribe. This module completes the capability: one pure
function serves

  * teacher-forcing over a full token sequence (training, logit-parity tests,
    prompt prefill), and
  * single-step incremental decoding against a preallocated fixed-shape KV
    cache (the shape discipline `lax.while_loop` requires on TPU).

Cross-attention K/V over the 1500 audio positions are computed once per
segment and reused by every decode step (the dominant FLOPs saving the
reference's cache-less design forgoes).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import WhisperConfig
from ..parallel.sharding import KV_PSPEC, KV_SCALE_PSPEC, constrain
from .layers import (
    layer_norm,
    linear,
    merge_heads,
    mlp,
    split_heads,
)

Array = jax.Array


class KVCache(NamedTuple):
    """Preallocated self-attention cache: (n_layers, B, H, D, n_text_ctx).

    "d-major" layout: the minor dim pair is (D=64, seq), so
      * no 128-lane padding (a (..., H, 64) seq-major layout doubled HBM —
        2.4x expansion observed on large-v3), and
      * attention reads K/V in STORED layout (einsum "bthd,bhds->bhts"),
        with no per-step head-split reshape. A merged (..., n_state) layout
        forced a (B,S,H,64) relayout copy of every K/V tensor every decode
        step, which spilled past VMEM at batch>=16 and tripled step time.
    """

    k: Array
    v: Array

    @property
    def batch(self) -> int:
        return self.k.shape[1]


class CrossKV(NamedTuple):
    """Per-segment audio K/V: (n_layers, B, H, D, n_audio_ctx), d-major
    (same rationale as KVCache)."""

    k: Array
    v: Array


class QuantCrossKV(NamedTuple):
    """int8 cross K/V with per-(b,h,position) column scales.

    Cross-KV reads dominate decode HBM traffic at the batch ceiling
    (docs/benchmarks.md); int8 halves them. Dequantisation happens inside
    the Pallas single-query-attention kernel's VMEM (ops/sqa_int8.py) for
    decode steps; prefill (T>1, once per window) dequantises inline.
    """

    k8: Array  # (L, B, H, D, S) int8
    ks: Array  # (L, B, H, 1, S) fp32
    v8: Array
    vs: Array


class QuantKVCache(NamedTuple):
    """int8 self-attention cache with per-(b, h, position) column scales.

    Same d-major geometry as KVCache; values live in HBM as int8 (halving
    the self-KV read stream every decode step) and are dequantised inline on
    read — XLA fuses the convert+scale into the attention reads, the same
    mechanism measured for int8 cross-KV (docs/benchmarks.md "int8 options").
    """

    k8: Array  # (L, B, H, D, C) int8
    ks: Array  # (L, B, H, 1, C) fp32
    v8: Array
    vs: Array

    @property
    def batch(self) -> int:
        return self.k8.shape[1]


def init_kv_cache_int8(cfg: WhisperConfig, batch: int,
                       ctx: Optional[int] = None) -> QuantKVCache:
    """int8 variant of init_kv_cache (see cache_dtype in DecodingOptions)."""
    ctx = cfg.n_text_ctx if ctx is None else min(ctx, cfg.n_text_ctx)
    shape = (cfg.n_text_layer, batch, cfg.n_text_head, cfg.text_head_dim, ctx)
    sshape = shape[:3] + (1, ctx)
    return QuantKVCache(
        constrain(jnp.zeros(shape, jnp.int8), KV_PSPEC),
        constrain(jnp.zeros(sshape, jnp.float32), KV_SCALE_PSPEC),
        constrain(jnp.zeros(shape, jnp.int8), KV_PSPEC),
        constrain(jnp.zeros(sshape, jnp.float32), KV_SCALE_PSPEC))


def gather_cache(cache, idx: Array):
    """Reorder the cache's batch rows (beam-search source gather)."""
    if isinstance(cache, QuantKVCache):
        return QuantKVCache(cache.k8[:, idx], cache.ks[:, idx],
                            cache.v8[:, idx], cache.vs[:, idx])
    return KVCache(cache.k[:, idx], cache.v[:, idx])


def init_kv_cache(cfg: WhisperConfig, batch: int, dtype=jnp.float32,
                  ctx: Optional[int] = None) -> KVCache:
    """ctx: cache length; defaults to the full 448 text context. Decodes with
    a known shorter horizon pass prompt+sample rounded up — every self-attend
    reads the whole buffer, so an oversized cache is pure wasted bandwidth."""
    ctx = cfg.n_text_ctx if ctx is None else min(ctx, cfg.n_text_ctx)
    shape = (cfg.n_text_layer, batch, cfg.n_text_head, cfg.text_head_dim, ctx)
    # batch on "data", heads on "model" under an active mesh (no-op otherwise)
    return KVCache(constrain(jnp.zeros(shape, dtype), KV_PSPEC),
                   constrain(jnp.zeros(shape, dtype), KV_PSPEC))


def to_dmajor(x: Array, n_head: int) -> Array:
    """(B, S, n_state) -> (B, H, D, S)."""
    b, s, n = x.shape
    return x.reshape(b, s, n_head, n // n_head).transpose(0, 2, 3, 1)


def precompute_cross_kv(params, cfg: WhisperConfig, audio_features: Array) -> CrossKV:
    """audio_features (B, S, n_state) -> stacked per-layer cross K/V,
    d-major. The relayout happens once per segment, not once per token."""
    blocks = params["decoder"]["blocks"]
    n_head = cfg.n_text_head

    def body(_, layer_params):
        p = layer_params["cross_attn"]
        k = to_dmajor(linear(audio_features, p["k"]), n_head)
        v = to_dmajor(linear(audio_features, p["v"]), n_head)
        return None, (k, v)

    _, (ks, vs) = jax.lax.scan(body, None, blocks)
    return CrossKV(constrain(ks, KV_PSPEC), constrain(vs, KV_PSPEC))


def precompute_cross_kv_int8(params, cfg: WhisperConfig,
                             audio_features: Array) -> QuantCrossKV:
    """Quantised variant of precompute_cross_kv (once per segment)."""
    from ..ops.sqa_int8 import quantize_kv_column

    blocks = params["decoder"]["blocks"]
    n_head = cfg.n_text_head

    def body(_, layer_params):
        p = layer_params["cross_attn"]
        k8, ks = quantize_kv_column(to_dmajor(linear(audio_features, p["k"]),
                                              n_head))
        v8, vs = quantize_kv_column(to_dmajor(linear(audio_features, p["v"]),
                                              n_head))
        return None, (k8, ks, v8, vs)

    _, (k8, ks, v8, vs) = jax.lax.scan(body, None, blocks)
    return QuantCrossKV(constrain(k8, KV_PSPEC), constrain(ks, KV_SCALE_PSPEC),
                        constrain(v8, KV_PSPEC), constrain(vs, KV_SCALE_PSPEC))


def attention_dmajor(q: Array, k: Array, v: Array,
                     mask: Optional[Array] = None) -> Array:
    """Attention against d-major K/V.

    q: (B, T, H, D); k, v: (B, H, D, S); mask broadcastable to (B, H, T, S).
    Returns (B, T, H, D). Softmax in fp32; openai double-scaling numerics.
    """
    from .layers import matmul_precision

    d = q.shape[-1]
    scale = d ** -0.25
    qs = (q * scale).astype(q.dtype)
    ks = (k * scale).astype(k.dtype)
    # precision matters: fp32 operands at default MXU precision truncate to
    # bf16 and break the 1e-3 fidelity gates (CLAUDE.md invariant)
    logits = jnp.einsum("bthd,bhds->bhts", qs, ks,
                        preferred_element_type=jnp.float32,
                        precision=matmul_precision(q.dtype))
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.float32(-1e30))
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhts,bhds->bthd", weights.astype(v.dtype), v,
                     preferred_element_type=jnp.float32,
                     precision=matmul_precision(v.dtype))
    return out.astype(q.dtype)


def attention_dmajor_decode(
    q: Array,  # (B, 1, H, D)
    k_stale: Array,  # (B, H, D, C) — the cache BEFORE this step's write
    v_stale: Array,
    k_new: Array,  # (B, H, D, 1) — this step's key/value
    v_new: Array,
    pos_col: Array,  # (B,) int32 — this step's write position per row
    valid_from,  # scalar or (B,) int32 — left-pad bound
) -> Array:
    """Single-token decode attention WITHOUT reading the just-written cache.

    Columns [valid_from, pos) come from the stale buffer; column pos comes
    from k_new/v_new still in registers — mathematically identical to
    writing first and attending to the updated buffer.

    STATUS: recorded NEGATIVE (kept as the reference formulation + for its
    parity tests). Motivation was the measured 5.49 ms/step of layer-slice
    copies when the write fuses with the same-step read
    (benchmarks/step_ablation.py, -self_nowrite row) — but inverting the
    dependency makes XLA resolve the read-before-write ANTI-dependency with
    even larger copies: 641 ms/step vs 17.7 on v5e (measured). Production
    keeps write-then-read; see decode_step's write_barrier knob for the
    remaining lever.
    """
    from .layers import matmul_precision

    d = q.shape[-1]
    c = k_stale.shape[-1]
    scale = d ** -0.25
    qs = (q * scale).astype(q.dtype)
    ks = (k_stale * scale).astype(k_stale.dtype)
    prec = matmul_precision(q.dtype)
    lg = jnp.einsum("bthd,bhds->bhts", qs, ks,
                    preferred_element_type=jnp.float32,
                    precision=prec)  # (B, H, 1, C)
    # current column's logit: q . k_new (openai double-scaling numerics)
    lg_new = jnp.einsum("bthd,bhd->bht", qs,
                        (k_new[..., 0] * scale).astype(k_new.dtype),
                        preferred_element_type=jnp.float32,
                        precision=prec)[..., None]  # (B, H, 1, 1)

    col = jnp.arange(c)[None, None, None, :]  # (1,1,1,C)
    pos4 = pos_col[:, None, None, None]
    vf4 = jnp.broadcast_to(jnp.asarray(valid_from, jnp.int32),
                           pos_col.shape)[:, None, None, None]
    lg = jnp.where((col < pos4) & (col >= vf4), lg, jnp.float32(-1e30))
    lg = jnp.where(col == pos4, lg_new, lg)

    w = jax.nn.softmax(lg.astype(jnp.float32), axis=-1)  # (B, H, 1, C)
    w_stale = jnp.where(col == pos4, 0.0, w)
    out = jnp.einsum("bhts,bhds->bthd", w_stale.astype(v_stale.dtype),
                     v_stale, preferred_element_type=jnp.float32,
                     precision=prec)
    w_pos = jnp.take_along_axis(w, pos4, axis=-1)  # (B, H, 1, 1)
    out = out + (w_pos[:, :, :, 0].transpose(0, 2, 1)[..., None]
                 * v_new[..., 0][:, None]).astype(out.dtype)
    return out.astype(q.dtype)


def attention_dmajor_twolevel(
    q: Array,  # (B, T, H, D)
    k_frozen: Array,  # (B, H, D, F) — read-only prefix, columns [0, F)
    v_frozen: Array,
    k_stage: Array,  # (B, H, D, C) — staging block, columns [F, F+C)
    v_stage: Array,
    mask_frozen: Array,  # broadcastable to (B, H, T, F)
    mask_stage: Array,  # broadcastable to (B, H, T, C)
) -> Array:
    """attention_dmajor over a cache split into a frozen prefix + a staging
    block, with one joint softmax (numerics match the flat formulation up to
    fp32 summation order).

    Why the split exists: a loop-carried buffer that is both column-written
    and fully read every decode step pays a per-step whole-buffer layout
    conversion that scales linearly with its capacity (measured 1.62/3.56/
    6.87 ms/step at C=128/256/448, B40 large-v3 —
    benchmarks/cache_write_probe.py). Keeping the writes in a 128-column
    staging block pins that cost at the C=128 figure; the frozen prefix is
    loop-invariant inside each phase loop and pays read bandwidth only.
    """
    from .layers import matmul_precision

    d = q.shape[-1]
    scale = d ** -0.25
    qs = (q * scale).astype(q.dtype)
    prec = matmul_precision(q.dtype)
    lg_f = jnp.einsum("bthd,bhds->bhts", qs,
                      (k_frozen * scale).astype(k_frozen.dtype),
                      preferred_element_type=jnp.float32, precision=prec)
    lg_s = jnp.einsum("bthd,bhds->bhts", qs,
                      (k_stage * scale).astype(k_stage.dtype),
                      preferred_element_type=jnp.float32, precision=prec)
    lg = jnp.concatenate(
        [jnp.where(mask_frozen, lg_f, jnp.float32(-1e30)),
         jnp.where(mask_stage, lg_s, jnp.float32(-1e30))], axis=-1)
    w = jax.nn.softmax(lg.astype(jnp.float32), axis=-1)
    f = k_frozen.shape[-1]
    out = (jnp.einsum("bhts,bhds->bthd", w[..., :f].astype(v_frozen.dtype),
                      v_frozen, preferred_element_type=jnp.float32,
                      precision=prec)
           + jnp.einsum("bhts,bhds->bthd", w[..., f:].astype(v_stage.dtype),
                        v_stage, preferred_element_type=jnp.float32,
                        precision=prec))
    return out.astype(q.dtype)


def cross_attention_dmajor(x: Array, p, n_head: int, k: Array, v: Array) -> Array:
    q = split_heads(linear(x, p["q"]), n_head)
    out = attention_dmajor(q, k, v)
    return linear(merge_heads(out), p["out"])


def decoder_block_full(x, layer_params, cross_k, cross_v, n_head):
    """Teacher-forcing block: full causal self-attention (no cache)."""
    from .layers import self_attention

    x = x + self_attention(layer_norm(x, layer_params["attn_ln"]),
                           layer_params["attn"], n_head, causal=True)
    x = x + cross_attention_dmajor(
        layer_norm(x, layer_params["cross_attn_ln"]),
        layer_params["cross_attn"], n_head, cross_k, cross_v)
    x = x + mlp(layer_norm(x, layer_params["mlp_ln"]), layer_params["mlp"])
    return x


def embed_tokens(params, cfg: WhisperConfig, tokens: Array,
                 pos_offset, compute_dtype, valid_from=0) -> Array:
    """Token + learned-position embedding. Cache slot i holds logical position
    i - valid_from (left-pad bucketing); padded slots clamp to position 0 and
    are masked out of attention anyway.

    pos_offset may be a scalar (lockstep decode) or a (B,) vector of
    independent per-row positions (continuous batching); valid_from likewise
    may be a scalar or a (B,) vector of per-row left-pads (per-sample
    prompts of different lengths sharing one bucketed graph)."""
    dec = params["decoder"]
    b, t = tokens.shape
    tok_emb = dec["token_embedding"][tokens]  # (B, T, n_state)
    pos_col = jnp.broadcast_to(jnp.asarray(pos_offset, jnp.int32),
                               (b,))[:, None]  # (B, 1)
    vf_col = jnp.broadcast_to(jnp.asarray(valid_from, jnp.int32),
                              (b,))[:, None]  # (B, 1)
    positions = jnp.clip(pos_col + jnp.arange(t)[None] - vf_col, 0,
                         cfg.n_text_ctx - 1)  # (B, T)
    pos_emb = jnp.take(dec["positional_embedding"], positions, axis=0)
    return (tok_emb + pos_emb).astype(compute_dtype)


def final_logits(params, x: Array) -> Array:
    """ln -> tied-embedding projection; logits returned in fp32."""
    dec = params["decoder"]
    x = layer_norm(x, dec["ln"])
    from .layers import matmul_precision

    return jnp.dot(x, dec["token_embedding"].T.astype(x.dtype),
                   preferred_element_type=jnp.float32,
                   precision=matmul_precision(x.dtype))


def _cache_write(buf: Array, l: int, val: Array, pos_offset, rowpos: bool
                 ) -> Array:
    """Write val (B, *, *, T) into buf (L, B, *, *, C) at column pos_offset of
    layer l. Lockstep decode uses one dynamic_update_slice; per-row positions
    (continuous batching, T == 1) scatter each row at its own column. Per-row
    positions with T > 1 (speculative verify: K+1 candidate tokens land at
    row-independent columns) scatter a (B, T) column block per row."""
    if rowpos:
        b = val.shape[0]
        t = val.shape[-1]
        if t == 1:
            return buf.at[l, jnp.arange(b), :, :, pos_offset].set(val[..., 0])
        cols = pos_offset[:, None] + jnp.arange(t)[None, :]  # (B, T)
        # advanced indices (B,1) rows + (B,T) cols are separated by the two
        # sliced dims, so the broadcast (B, T) moves to the front: the update
        # operand is val in (B, T, H, D) order
        return buf.at[l, jnp.arange(b)[:, None], :, :, cols].set(
            val.transpose(0, 3, 1, 2))
    return jax.lax.dynamic_update_slice(buf, val[None],
                                        (l, 0, 0, 0, pos_offset))


def decode_step(
    params,
    cfg: WhisperConfig,
    tokens: Array,  # (B, T) int32 — T tokens starting at pos_offset
    cross_kv: CrossKV,
    cache: KVCache,
    pos_offset,  # python int, traced scalar, or (B,) per-row positions
    valid_from=0,  # slots [0, valid_from) are masked left-padding
    self_kernel: bool = False,  # fuse the decode self-attention (QK + mask
    # + softmax + AV) into ONE Pallas op (ops/sqa_self). The sublayer's ~12
    # tiny ops are boundary-cost-bound at single-token shapes (measured
    # 7.05 ms of a 17.7 ms step vs a ~2.5 ms floor at B40 —
    # benchmarks/step_ablation.py); requires T == 1 and a bf16 cache.
    write_barrier: bool = False,  # optimization_barrier between the cache
    # column write and its same-step read (see comment at the write site)
    frozen: Optional[KVCache] = None,  # two-level decode: read-only K/V
    # prefix holding absolute columns [0, F); `cache` is then a staging
    # block holding absolute columns [F, F + C) and takes this step's
    # write at column pos_offset - F. Requires T == 1, lockstep positions,
    # and a bf16 cache. See attention_dmajor_twolevel for the rationale.
    frozen_origin: Optional[Array] = None,  # (B,) int32 — beam search's
    # DEFERRED cache reordering: row b's frozen prefix lives at frozen row
    # frozen_origin[b] (the composed beam-source permutation since the
    # phase started). The staging block is still physically gathered per
    # step (cheap: stage_width columns); the frozen prefix — the expensive
    # part of the flat path's full-cache gather — is only read through
    # this index and materialised once per phase boundary.
    _ablate: Optional[str] = None,  # benchmark-only: skip one sublayer kind
    # ("self" | "cross" | "mlp" | "self_nowrite" | "self_noattn") to
    # attribute step time on-chip (benchmarks/step_ablation.py); None in
    # every production path
) -> Tuple[Array, KVCache]:
    """Incremental decode: returns (logits (B, T, vocab) fp32, updated cache).

    With a (B,) pos_offset each batch row decodes at its own position
    (continuous batching: slots refilled mid-flight are at earlier positions
    than long-running ones); requires T == 1 and cache writes become per-row
    scatters instead of a dynamic_update_slice.

    The layer loop is UNROLLED with static layer indices. Two reasons:
      * a lax.scan formulation (cache as xs/ys) restacks both cache tensors
        every token — ~2.3 GB of pure copies per step at large-v3 batch 8;
      * a lax.fori_loop formulation (traced layer index, dynamic
        update/index on the stacked cache) miscompiles to all-NaN logits on
        the TPU backend (CPU is fine) — observed and bisected on v5e: the
        identical math with static indices is finite.
    Static per-layer slicing also lets XLA address each layer's weights
    directly instead of gathering them per step.
    """
    compute_dtype = params["decoder"]["token_embedding"].dtype
    x = embed_tokens(params, cfg, tokens, pos_offset, compute_dtype, valid_from)
    blocks = params["decoder"]["blocks"]
    n_head = cfg.n_text_head

    b, t, _ = x.shape
    c = cache[0].shape[-1]  # KVCache.k / QuantKVCache.k8: (..., ctx)
    rowpos = getattr(pos_offset, "ndim", 0) == 1  # (B,) per-row positions
    if rowpos and t != 1 and self_kernel:
        raise ValueError("self_kernel requires single-token decode")
    base = 0
    if frozen is not None:
        if t != 1 or rowpos or self_kernel or isinstance(cache, QuantKVCache):
            raise ValueError(
                "frozen-prefix decode requires single-token lockstep "
                "positions and a bf16 staging cache")
        base = frozen.k.shape[-1]  # static: staging covers [base, base+C)
    pos_col = jnp.broadcast_to(jnp.asarray(pos_offset, jnp.int32), (b,))
    q_pos = pos_col[:, None, None] + jnp.arange(t)[None, :, None]  # (B,T,1)
    k_pos = base + jnp.arange(c)[None, None, :]  # (1,1,C) absolute columns
    # valid_from: scalar or (B,) per-row left-pad bound
    vf = jnp.broadcast_to(jnp.asarray(valid_from, jnp.int32),
                          (b,))[:, None, None]  # (B,1,1)
    mask = ((k_pos <= q_pos) & (k_pos >= vf))[:, None]  # (B,1,T,C)
    if frozen is not None:
        kf_pos = jnp.arange(base)[None, None, :]  # (1,1,F)
        mask_frozen = ((kf_pos <= q_pos) & (kf_pos >= vf))[:, None]
    # the staging write lands at the block-relative column
    write_at = (pos_offset if frozen is None
                else jnp.asarray(pos_offset, jnp.int32) - base)

    quant_cross = isinstance(cross_kv, QuantCrossKV)

    def cross_attn(x, lp, l):
        cp = lp["cross_attn"]
        h2 = layer_norm(x, lp["cross_attn_ln"])
        q2 = split_heads(linear(h2, cp["q"]), n_head)
        if quant_cross:
            # inline dequant (XLA). The fused dequant-in-VMEM kernel
            # (ops/sqa_int8.py) hits a Mosaic int8-relayout limitation when
            # compiled inside the full decode graph and its per-head variant
            # measured slower end to end; int8 cross-KV therefore currently
            # trades a little step time for halved cross-KV HBM *storage*
            # (see docs/benchmarks.md).
            xk = (cross_kv.k8[l].astype(jnp.float32)
                  * cross_kv.ks[l]).astype(x.dtype)
            xv = (cross_kv.v8[l].astype(jnp.float32)
                  * cross_kv.vs[l]).astype(x.dtype)
            out = attention_dmajor(q2, xk, xv)
        else:
            out = attention_dmajor(q2, cross_kv.k[l], cross_kv.v[l])
        return linear(merge_heads(out), cp["out"])

    quant_self = isinstance(cache, QuantKVCache)
    if quant_self:
        from ..ops.sqa_int8 import quantize_kv_column

        k8_all, ks_all, v8_all, vs_all = cache
    else:
        ck_all, cv_all = cache.k, cache.v

    for l in range(cfg.n_text_layer):
        lp = jax.tree.map(lambda a: a[l], blocks)

        if _ablate != "self":
            p = lp["attn"]
            h = layer_norm(x, lp["attn_ln"])
            q = split_heads(linear(h, p["q"]), n_head)
            # new K/V in d-major: (B, T, n_state) -> (B, H, D, T)
            k_new = to_dmajor(linear(h, p["k"]), n_head)
            v_new = to_dmajor(linear(h, p["v"]), n_head)
            attn = None
            k_l = v_l = None
            if _ablate == "self_nowrite":
                # skip the cache writes; attend against the stale buffer
                k_l, v_l = cache[0][l], cache[1][l]
            elif _ablate == "self_noattn":
                # do the writes; skip the attention reads/softmax/out-proj
                ck_all = _cache_write(ck_all, l, k_new.astype(ck_all.dtype),
                                      write_at, rowpos)
                cv_all = _cache_write(cv_all, l, v_new.astype(cv_all.dtype),
                                      write_at, rowpos)
            elif quant_self:
                kq, ksc = quantize_kv_column(k_new)
                vq, vsc = quantize_kv_column(v_new)
                k8_all = _cache_write(k8_all, l, kq, write_at, rowpos)
                ks_all = _cache_write(ks_all, l, ksc, write_at, rowpos)
                v8_all = _cache_write(v8_all, l, vq, write_at, rowpos)
                vs_all = _cache_write(vs_all, l, vsc, write_at, rowpos)
                # inline dequant: XLA fuses the convert+scale into the reads
                k_l = (k8_all[l].astype(jnp.float32)
                       * ks_all[l]).astype(x.dtype)
                v_l = (v8_all[l].astype(jnp.float32)
                       * vs_all[l]).astype(x.dtype)
            else:
                ck_all = _cache_write(ck_all, l, k_new.astype(ck_all.dtype),
                                      write_at, rowpos)
                cv_all = _cache_write(cv_all, l, v_new.astype(cv_all.dtype),
                                      write_at, rowpos)
                if write_barrier:
                    # keep the column write a standalone in-place op: fusing
                    # the dynamic_update_slice into the same-step attention
                    # read makes XLA materialise a copy of the layer slice
                    # (5.49 ms/step at B40 — docs/benchmarks.md round 3; the
                    # read-stale-plus-current rewrite was 36x WORSE, see
                    # attention_dmajor_decode)
                    ck_all, cv_all = jax.lax.optimization_barrier(
                        (ck_all, cv_all))
                k_l, v_l = ck_all[l], cv_all[l]
            if k_l is not None:
                if frozen is not None:
                    if frozen_origin is not None:
                        kf = jnp.take(frozen.k[l], frozen_origin, axis=0)
                        vf = jnp.take(frozen.v[l], frozen_origin, axis=0)
                    else:
                        kf, vf = frozen.k[l], frozen.v[l]
                    attn = attention_dmajor_twolevel(
                        q, kf, vf, k_l, v_l, mask_frozen, mask)
                elif self_kernel and t == 1 and not quant_self:
                    from ..ops.sqa_self import sqa_self

                    attn = sqa_self(q[:, 0], k_l, v_l, pos_col,
                                    jnp.broadcast_to(
                                        jnp.asarray(valid_from, jnp.int32),
                                        (b,)))[:, None]  # (B, 1, H, D)
                else:
                    attn = attention_dmajor(q, k_l, v_l, mask=mask)
            if attn is not None:
                x = x + linear(merge_heads(attn), p["out"])

        if _ablate != "cross":
            x = x + cross_attn(x, lp, l)
        if _ablate != "mlp":
            x = x + mlp(layer_norm(x, lp["mlp_ln"]), lp["mlp"])

    if quant_self:
        new_cache = QuantKVCache(k8_all, ks_all, v8_all, vs_all)
    else:
        new_cache = KVCache(ck_all, cv_all)
    return final_logits(params, x), new_cache


def decoder_forward(
    params,
    cfg: WhisperConfig,
    tokens: Array,  # (B, T)
    audio_features: Optional[Array] = None,
    cross_kv: Optional[CrossKV] = None,
    *,
    remat: bool = False,
) -> Array:
    """Teacher-forcing forward over a full sequence -> logits (B, T, vocab).

    Equivalent (at T=1, SOT input) to the reference's single decoder call
    (/root/reference/Whisper/Whisper/Whisper.swift:36).
    """
    if cross_kv is None:
        if audio_features is None:
            raise ValueError("need audio_features or cross_kv")
        cross_kv = precompute_cross_kv(params, cfg, audio_features)

    compute_dtype = params["decoder"]["token_embedding"].dtype
    x = embed_tokens(params, cfg, tokens, 0, compute_dtype)

    block = decoder_block_full
    if remat:
        block = jax.checkpoint(block, static_argnums=(4,))

    def body(x, xs):
        layer_params, xk, xv = xs
        return block(x, layer_params, xk, xv, cfg.n_text_head), None

    x, _ = jax.lax.scan(body, x,
                        (params["decoder"]["blocks"], cross_kv.k, cross_kv.v))
    return final_logits(params, x)
