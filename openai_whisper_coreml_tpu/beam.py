"""Jitted beam-search decoding.

Completes the decode capability the reference entirely lacks (its decoder is
a single cache-less SOT step, /root/reference/Whisper/Whisper/Whisper.swift:36).
Canonical TPU-friendly formulation, all static shapes:

  * beams flattened into the batch axis (B*K rows share one KV cache);
  * each step: top-2K candidates from (K x V) merged scores; the first K
    non-EOT continue, EOT candidates merge into a per-batch finished buffer
    (top max_candidates = round(beam_size * patience) kept, openai semantics);
  * KV cache reordered per step by gathering beam sources (the "beam
    reordering via gather" called out in SURVEY.md §7 hard parts);
  * first-step degeneracy broken by masking beams 1..K-1 to -inf;
  * early exit when no alive beam can beat the worst kept finished score;
  * final ranking by avg-logprob, or GNMT length penalty ((5+L)/6)^p.

Timestamp/suppress logit rules are shared with the greedy path
(decoding._apply_logit_rules) so beam transcripts obey the same grammar.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .config import WhisperConfig
from .models import decoder as dec_mod

NEG_INF = jnp.float32(-1e30)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "sample_len", "use_timestamps", "prompt_len",
                     "beam_size", "max_candidates", "kv_dtype", "cache_dtype",
                     "two_level", "stage_width"),
)
def beam_decode_core(
    params,
    cfg: WhisperConfig,
    audio_features,  # (B, S, n_state)
    initial_tokens,  # (B, P) int32, left-padded to bucket
    suppress_mask,  # (V,) bool
    blank_mask,  # (V,) bool
    max_initial_ts_index,  # scalar int32
    pad_len,  # scalar int32
    sot_index,  # scalar int32
    *,
    sample_len: int,
    use_timestamps: bool,
    prompt_len: int,
    beam_size: int,
    max_candidates: int,
    kv_dtype: str = "bf16",
    cache_dtype: str = "bf16",
    two_level: bool = True,
    stage_width: int = 64,
):
    """Returns (best_tokens (B, P+sample_len), best_sum_logprob (B,),
    best_len (B,), no_speech_prob (B,)).

    two_level: phased frozen-prefix decode (see decoding.greedy_decode_core)
    adapted to beam search with DEFERRED cache reordering. The flat path
    gathers the ENTIRE B*K-row cache every step (the per-step "beam
    reordering via gather"); two-level only gathers the stage_width-column
    staging block and instead carries a per-row `origin` index — the
    composed source permutation since the phase began — that the frozen
    prefix is read through (models.decoder.decode_step frozen_origin). At
    each phase boundary the frozen prefix is materialised ONCE in current
    beam order and origin resets to identity. Token-identical to the flat
    path up to fp32 summation order in the split attention."""
    from .decoding import _apply_logit_rules
    from .parallel.sharding import KV_PSPEC, constrain

    b = audio_features.shape[0]
    k = beam_size
    eot = cfg.eot_token
    total_len = prompt_len + sample_len
    bk = b * k

    # prompts replicate across beams -> flattened rows; cross-KV is
    # computed ONCE per batch row and repeated along its batch axis (the
    # K beam rows are bit-identical — projecting replicated features did
    # k-fold redundant matmul work per window)
    init = jnp.repeat(initial_tokens, k, axis=0)  # (B*K, P)

    if kv_dtype == "int8":
        cross_b = dec_mod.precompute_cross_kv_int8(params, cfg,
                                                   audio_features)
    else:
        cross_b = dec_mod.precompute_cross_kv(params, cfg, audio_features)
    cross_kv = jax.tree.map(lambda a: jnp.repeat(a, k, axis=1), cross_b)
    cache_len = min(-(-total_len // 128) * 128, cfg.n_text_ctx)
    two_level = two_level and cache_dtype != "int8"
    if two_level:
        col_blocks = []
        lo = stage_width * (prompt_len // stage_width)
        while lo < cache_len:
            col_blocks.append((lo, min(lo + stage_width, cache_len)))
            lo = col_blocks[-1][1]
        prefill_ctx = col_blocks[0][1]
    else:
        prefill_ctx = cache_len
    if cache_dtype == "int8":
        cache = dec_mod.init_kv_cache_int8(cfg, bk, ctx=prefill_ctx)
    else:
        cache = dec_mod.init_kv_cache(cfg, bk, dtype=audio_features.dtype,
                                      ctx=prefill_ctx)

    tokens = jnp.full((bk, total_len), eot, jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, init, (0, 0))

    prefill_logits, cache = dec_mod.decode_step(
        params, cfg, init, cross_kv, cache, 0, valid_from=pad_len)
    no_speech_prob = jax.nn.softmax(
        jnp.take(prefill_logits, sot_index, axis=1).astype(jnp.float32),
        axis=-1)[:, cfg.no_speech_token].reshape(b, k)[:, 0]

    v = cfg.n_vocab

    def apply_rules(logits, tokens, pos, ts_max):
        return _apply_logit_rules(
            logits, tokens, pos, cfg, prompt_len, suppress_mask, blank_mask,
            use_timestamps, ts_max, max_initial_ts_index)

    def make_step(frozen):
      def step(carry):
        (pos, tokens, cache, logits, sum_lp, seq_len, ts_max,
         fin_scores, fin_tokens, fin_lens, origin) = carry
        # logits (B*K, V) fp32 for position pos

        filtered = apply_rules(logits, tokens, pos, ts_max)
        logprobs = jax.nn.log_softmax(filtered, axis=-1)  # (B*K, V)

        # first sampled step: only beam 0 proposes (identical prefixes)
        beam_ids = jnp.arange(bk) % k
        first = pos == prompt_len
        beam_alive_mask = jnp.where(first & (beam_ids > 0), NEG_INF, 0.0)

        cand = (sum_lp[:, None] + logprobs
                + beam_alive_mask[:, None])  # (B*K, V)
        cand = cand.reshape(b, k * v)
        top_scores, top_idx = jax.lax.top_k(cand, 2 * k)  # (B, 2K)
        src_beam = top_idx // v  # (B, 2K) in [0, K)
        tok = (top_idx % v).astype(jnp.int32)
        is_eot = tok == eot

        # ---- finished buffer update (EOT candidates) ----
        eot_scores = jnp.where(is_eot, top_scores, NEG_INF)  # (B, 2K)
        all_scores = jnp.concatenate([fin_scores, eot_scores], axis=1)
        # candidate token rows for finished entries: current tokens of the
        # source beam with EOT written at pos
        src_rows = jnp.take_along_axis(
            tokens.reshape(b, k, total_len), src_beam[..., None], axis=1
        )  # (B, 2K, L)
        src_rows = src_rows.at[:, :, pos].set(eot)
        # length EXCLUDES the EOT (openai MaximumLikelihoodRanker counts
        # text tokens only; including it skews avg-logprob toward shorter
        # hypotheses)
        cand_lens = jnp.take_along_axis(
            seq_len.reshape(b, k), src_beam, axis=1)
        all_tokens = jnp.concatenate([fin_tokens, src_rows], axis=1)
        all_lens = jnp.concatenate([fin_lens, cand_lens], axis=1)
        keep_scores, keep_idx = jax.lax.top_k(all_scores, max_candidates)
        fin_scores = keep_scores
        fin_tokens = jnp.take_along_axis(all_tokens, keep_idx[..., None],
                                         axis=1)
        fin_lens = jnp.take_along_axis(all_lens, keep_idx, axis=1)

        # ---- select K continuing (non-EOT) beams ----
        alive_scores = jnp.where(is_eot, NEG_INF, top_scores)  # (B, 2K)
        new_scores, pick = jax.lax.top_k(alive_scores, k)  # (B, K)
        new_tok = jnp.take_along_axis(tok, pick, axis=1)  # (B, K)
        new_src = jnp.take_along_axis(src_beam, pick, axis=1)  # (B, K)

        # gather rows: flat source index = b * K + src
        flat_src = (jnp.arange(b)[:, None] * k + new_src).reshape(bk)
        newt = new_tok.reshape(bk)
        tokens = tokens[flat_src].at[:, pos].set(newt)
        sum_lp = new_scores.reshape(bk)
        seq_len = jnp.take_along_axis(
            seq_len.reshape(b, k), new_src, axis=1).reshape(bk) + 1
        ts_max_g = jnp.take_along_axis(
            ts_max.reshape(b, k), new_src, axis=1).reshape(bk)
        ts_max = jnp.where(newt >= cfg.timestamp_begin, newt, ts_max_g)

        # the staging block (or, flat path, the whole cache) is physically
        # reordered; the frozen prefix is reordered LAZILY via origin
        cache = dec_mod.gather_cache(cache, flat_src)
        origin = jnp.take(origin, flat_src)

        next_logits, cache = dec_mod.decode_step(
            params, cfg, newt[:, None], cross_kv, cache, pos,
            valid_from=pad_len, frozen=frozen,
            frozen_origin=origin if frozen is not None else None)

        return (pos + 1, tokens, cache, next_logits[:, 0].astype(jnp.float32),
                sum_lp, seq_len, ts_max, fin_scores, fin_tokens, fin_lens,
                origin)
      return step

    def make_cond(hi):
      def cond(carry):
        (pos, _tokens, _cache, _logits, sum_lp, _seq_len, _ts, fin_scores,
         *_rest) = carry
        best_alive = jnp.max(sum_lp.reshape(b, k), axis=1)
        worst_fin = jnp.min(fin_scores, axis=1)
        improvable = jnp.any(best_alive > worst_fin)
        return (pos < hi) & improvable
      return cond

    init_carry = (
        jnp.int32(prompt_len),
        tokens,
        cache,
        prefill_logits[:, -1].astype(jnp.float32),
        jnp.zeros((bk,), jnp.float32),
        jnp.zeros((bk,), jnp.int32),
        # ts_max sentinel: ts_begin - 1 == "no timestamp sampled yet"
        # (decoding._apply_logit_rules rule c relies on it)
        jnp.full((bk,), cfg.timestamp_begin - 1, jnp.int32),
        jnp.full((b, max_candidates), NEG_INF, jnp.float32),
        jnp.full((b, max_candidates, total_len), eot, jnp.int32),
        jnp.zeros((b, max_candidates), jnp.int32),
        jnp.arange(bk, dtype=jnp.int32),  # origin (identity at phase start)
    )
    if not two_level:
        carry = jax.lax.while_loop(make_cond(total_len), make_step(None),
                                   init_carry)
    else:
        # phased decode: one while_loop per staging block; the frozen
        # prefix is materialised in CURRENT beam order at each boundary
        # (composed origin applied once), then origin resets to identity
        carry = init_carry
        frozen = None
        for bi, (lo, hi) in enumerate(col_blocks):
            if bi == 0:
                if lo > 0:
                    frozen = dec_mod.KVCache(cache.k[..., :lo],
                                             cache.v[..., :lo])
                    staging = dec_mod.KVCache(cache.k[..., lo:],
                                              cache.v[..., lo:])
                    carry = carry[:2] + (staging,) + carry[3:]
            else:
                done = carry[2]  # completed staging block, current order
                origin = carry[10]
                if frozen is None:
                    frozen = done
                else:
                    frozen = dec_mod.gather_cache(frozen, origin)
                    frozen = dec_mod.KVCache(
                        constrain(jnp.concatenate([frozen.k, done.k], -1),
                                  KV_PSPEC),
                        constrain(jnp.concatenate([frozen.v, done.v], -1),
                                  KV_PSPEC))
                staging = dec_mod.init_kv_cache(
                    cfg, bk, dtype=audio_features.dtype, ctx=hi - lo)
                carry = (carry[:2] + (staging,) + carry[3:10]
                         + (jnp.arange(bk, dtype=jnp.int32),))
            carry = jax.lax.while_loop(
                make_cond(min(hi, total_len)), make_step(frozen), carry)
    (pos, tokens, cache, logits, sum_lp, seq_len, _ts, fin_scores,
     fin_tokens, fin_lens, _origin) = carry

    # openai finalize semantics: pad the candidate set with the still-alive
    # beams (EOT appended, score unchanged) and let the ranker choose over
    # finished + alive together. Discarding alive beams the moment ONE
    # early EOT landed let a truncated low-quality hypothesis beat much
    # better unfinished ones.
    alive_scores = sum_lp.reshape(b, k)
    col = jnp.minimum(pos, total_len - 1)
    write_eot = (pos < total_len) & (jnp.arange(total_len) == col)
    alive_tokens = jnp.where(write_eot[None, :], eot, tokens
                             ).reshape(b, k, total_len)
    alive_lens = seq_len.reshape(b, k)

    all_scores = jnp.concatenate([fin_scores, alive_scores], axis=1)
    all_tokens = jnp.concatenate(
        [fin_tokens, alive_tokens], axis=1)  # (B, max_cand + K, L)
    all_lens = jnp.concatenate([fin_lens, alive_lens], axis=1)
    # keep the top max_candidates by raw score (openai's finalize bound);
    # the host-side ranker applies length normalisation over these
    keep_scores, keep_idx = jax.lax.top_k(all_scores, max_candidates)
    keep_tokens = jnp.take_along_axis(all_tokens, keep_idx[..., None], axis=1)
    keep_lens = jnp.take_along_axis(all_lens, keep_idx, axis=1)
    return keep_tokens, keep_scores, keep_lens, no_speech_prob


def rank_sequences(scores, lengths, length_penalty: Optional[float]):
    """openai MaximumLikelihoodRanker: avg logprob, or GNMT length penalty."""
    lengths = jnp.maximum(lengths.astype(jnp.float32), 1.0)
    if length_penalty is None:
        return scores / lengths
    return scores / (((5.0 + lengths) / 6.0) ** length_penalty)
