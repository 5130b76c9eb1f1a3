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
from .layers import (
    attention_core,
    cross_attention,
    layer_norm,
    linear,
    merge_heads,
    mlp,
    split_heads,
)

Array = jax.Array


class KVCache(NamedTuple):
    """Preallocated self-attention cache: (n_layers, B, n_text_ctx, n_state).

    Head dims stay MERGED in storage: a (..., H, D) layout pads D=64 to the
    128-lane tile and doubles HBM (observed 2.4x expansion on large-v3);
    (..., n_state) keeps the minor dim a multiple of 128. Heads are split
    transiently at the attention site.
    """

    k: Array
    v: Array

    @property
    def batch(self) -> int:
        return self.k.shape[1]


class CrossKV(NamedTuple):
    """Per-segment audio K/V: (n_layers, B, n_audio_ctx, n_state), merged
    heads (same HBM-padding rationale as KVCache)."""

    k: Array
    v: Array


def init_kv_cache(cfg: WhisperConfig, batch: int, dtype=jnp.float32) -> KVCache:
    shape = (cfg.n_text_layer, batch, cfg.n_text_ctx, cfg.n_text_state)
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def precompute_cross_kv(params, cfg: WhisperConfig, audio_features: Array) -> CrossKV:
    """audio_features (B, S, n_state) -> stacked per-layer cross K/V."""
    blocks = params["decoder"]["blocks"]

    def body(_, layer_params):
        p = layer_params["cross_attn"]
        k = linear(audio_features, p["k"])
        v = linear(audio_features, p["v"])
        return None, (k, v)

    _, (ks, vs) = jax.lax.scan(body, None, blocks)
    return CrossKV(ks, vs)


def decoder_block_full(x, layer_params, cross_k, cross_v, n_head):
    """Teacher-forcing block: full causal self-attention (no cache)."""
    t = x.shape[1]
    mask = jnp.tril(jnp.ones((t, t), jnp.bool_))[None, None]
    h = layer_norm(x, layer_params["attn_ln"])
    p = layer_params["attn"]
    q = split_heads(linear(h, p["q"]), n_head)
    k = split_heads(linear(h, p["k"]), n_head)
    v = split_heads(linear(h, p["v"]), n_head)
    attn_out = linear(merge_heads(attention_core(q, k, v, mask=mask)), p["out"])
    x = x + attn_out
    x = x + cross_attention(layer_norm(x, layer_params["cross_attn_ln"]),
                            layer_params["cross_attn"], n_head, cross_k, cross_v)
    x = x + mlp(layer_norm(x, layer_params["mlp_ln"]), layer_params["mlp"])
    return x


def embed_tokens(params, cfg: WhisperConfig, tokens: Array,
                 pos_offset, compute_dtype, valid_from=0) -> Array:
    """Token + learned-position embedding. Cache slot i holds logical position
    i - valid_from (left-pad bucketing); padded slots clamp to position 0 and
    are masked out of attention anyway."""
    dec = params["decoder"]
    t = tokens.shape[1]
    tok_emb = dec["token_embedding"][tokens]  # (B, T, n_state)
    positions = jnp.clip(pos_offset + jnp.arange(t) - valid_from, 0,
                         cfg.n_text_ctx - 1)
    pos_emb = jnp.take(dec["positional_embedding"], positions, axis=0)
    return (tok_emb + pos_emb[None]).astype(compute_dtype)


def final_logits(params, x: Array) -> Array:
    """ln -> tied-embedding projection; logits returned in fp32."""
    dec = params["decoder"]
    x = layer_norm(x, dec["ln"])
    from .layers import matmul_precision

    return jnp.dot(x, dec["token_embedding"].T.astype(x.dtype),
                   preferred_element_type=jnp.float32,
                   precision=matmul_precision(x.dtype))


def decode_step(
    params,
    cfg: WhisperConfig,
    tokens: Array,  # (B, T) int32 — T tokens starting at pos_offset
    cross_kv: CrossKV,
    cache: KVCache,
    pos_offset,  # python int or traced scalar
    valid_from=0,  # slots [0, valid_from) are masked left-padding
) -> Tuple[Array, KVCache]:
    """Incremental decode: returns (logits (B, T, vocab) fp32, updated cache).

    Layers iterate via fori_loop with the FULL stacked cache as loop carry and
    a tiny (1, B, T, n_state) dynamic_update_slice per layer. A lax.scan
    formulation (cache as xs/ys) restacks both cache tensors every token —
    ~2.3 GB of pure copies per decode step at large-v3 batch 8, several times
    the useful HBM traffic. The carry formulation updates in place.
    """
    compute_dtype = params["decoder"]["token_embedding"].dtype
    x = embed_tokens(params, cfg, tokens, pos_offset, compute_dtype, valid_from)
    blocks = params["decoder"]["blocks"]
    n_head = cfg.n_text_head

    b, t, _ = x.shape
    c = cache.k.shape[2]
    q_pos = pos_offset + jnp.arange(t)[:, None]  # (T, 1)
    k_pos = jnp.arange(c)[None, :]  # (1, C)
    mask = ((k_pos <= q_pos) & (k_pos >= valid_from))[None, None]

    def take(tree, l):
        return jax.tree.map(
            lambda a: jax.lax.dynamic_index_in_dim(a, l, 0, keepdims=False),
            tree)

    def body(l, carry):
        x, ck_all, cv_all = carry
        lp = take(blocks, l)
        xk = jax.lax.dynamic_index_in_dim(cross_kv.k, l, 0, keepdims=False)
        xv = jax.lax.dynamic_index_in_dim(cross_kv.v, l, 0, keepdims=False)

        p = lp["attn"]
        h = layer_norm(x, lp["attn_ln"])
        q = split_heads(linear(h, p["q"]), n_head)
        k_new = linear(h, p["k"]).astype(ck_all.dtype)  # (B, T, n_state)
        v_new = linear(h, p["v"]).astype(cv_all.dtype)
        ck_all = jax.lax.dynamic_update_slice(
            ck_all, k_new[None], (l, 0, pos_offset, 0))
        cv_all = jax.lax.dynamic_update_slice(
            cv_all, v_new[None], (l, 0, pos_offset, 0))
        ck = jax.lax.dynamic_index_in_dim(ck_all, l, 0, keepdims=False)
        cv = jax.lax.dynamic_index_in_dim(cv_all, l, 0, keepdims=False)
        attn = attention_core(q, split_heads(ck, n_head),
                              split_heads(cv, n_head), mask=mask)
        x = x + linear(merge_heads(attn), p["out"])

        x = x + cross_attention(layer_norm(x, lp["cross_attn_ln"]),
                                lp["cross_attn"], n_head, xk, xv)
        x = x + mlp(layer_norm(x, lp["mlp_ln"]), lp["mlp"])
        return x, ck_all, cv_all

    x, new_k, new_v = jax.lax.fori_loop(
        0, cfg.n_text_layer, body, (x, cache.k, cache.v))
    return final_logits(params, x), KVCache(new_k, new_v)


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
