"""Speculative decoding: a cheap draft model proposes K tokens, the target
verifies them in ONE multi-token decoder step.

Why this exists (the measured motivation): single-token decode is a batched
matvec, and the round-3 probes proved the production cross-attention chain
runs AT the v5e's M=1 MXU-ingest floor (~516 G elem/s,
benchmarks/int8_mxu_probe.py) — no kernel can stream the same K/V faster one
query at a time. The only way past that floor is to stop decoding one token
per forward: a verify step over K+1 tokens reads the caches ONCE for K+1
queries (M=K+1 matmuls instead of K+1 matvecs), so each accepted draft token
rides the same ingest the baseline pays for a single token.

Scheme (greedy; token-exact vs the flat greedy loop by construction):
  * the carried target logits determine this iteration's first token g
    (argmax after the full in-graph logit-rule grammar — identical rules to
    decoding.greedy_decode_core);
  * the draft decodes K single-token steps from g, proposing d_1..d_K (the
    draft applies the SAME logit rules, which both raises acceptance and
    keeps proposals inside the timestamp grammar);
  * the target runs ONE decode_step over [g, d_1..d_K] (T=K+1) and the
    acceptance walk keeps the longest prefix where the target's rules-greedy
    choice equals the draft's proposal. The first mismatch position's target
    logits become the next iteration's carried logits, so the correction
    token is committed (bit-identically) at the next iteration's step 1.
  * every row accepts a different prefix length -> per-row positions (the
    continuous-batching machinery in models.decoder.decode_step), with the
    multi-token per-row cache scatter added for the verify write.

Acceptance is a property of the model pair; the iteration COST is not — it
is measured on-chip by benchmarks/spec_bench.py, and tokens/iteration for a
given per-token acceptance rate follows mechanically (docs/benchmarks.md).

Draft pairing: large-v3 + large-v3-turbo is the intended production pair —
turbo was distilled with the large-v3 ENCODER FROZEN, so one encoder forward
feeds both decoders (pass share_features=True/auto). Any pair sharing the
tokenizer works; with different encoder widths the draft runs its own
encoder on the same mel.

Reference counterpart: none — the reference never loops its decoder at all
(single step, /root/reference/Whisper/Whisper/Whisper.swift:36). This module
is the round-4 answer to the measured M=1 ingest bound.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import WhisperConfig
from .decoding import _apply_logit_rules
from .models import decoder as dec_mod

Array = jax.Array


def check_pair(cfg: WhisperConfig, cfg_d: WhisperConfig) -> None:
    """A draft is usable iff the two models share the token space."""
    for f in ("n_vocab", "eot_token", "sot_token", "timestamp_begin",
              "no_speech_token", "lang_token_start", "n_langs",
              "multilingual"):
        a, b = getattr(cfg, f), getattr(cfg_d, f)
        if a != b:
            raise ValueError(
                f"draft/target token spaces differ: {f} {b} vs {a} "
                "(speculative decoding needs a shared tokenizer)")


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "cfg_d", "sample_len", "use_timestamps",
                     "prompt_len", "spec_k", "kv_dtype", "sampled"),
)
def spec_decode_core(
    params,
    params_d,
    cfg: WhisperConfig,
    cfg_d: WhisperConfig,
    audio_features: Array,  # (B, S, n_state) — target encoder output
    audio_features_d: Array,  # draft decoder's feature input (often the same
    # array: turbo's decoder was distilled against the frozen large-v3
    # encoder, so the target features ARE the draft features)
    initial_tokens: Array,  # (B, P) int32, left-padded to the P bucket
    suppress_mask: Array,  # (V,) bool
    blank_mask: Array,  # (V,) bool
    max_initial_ts_index: Array,  # scalar int32; -1 disables
    pad_len: Array,  # int32 scalar or (B,)
    sot_index: Array,  # int32 scalar or (B,)
    temperature: Optional[Array] = None,  # scalar fp32 (sampled mode only)
    key: Optional[Array] = None,  # PRNG key (sampled mode only)
    *,
    sample_len: int,
    use_timestamps: bool,
    prompt_len: int,
    spec_k: int,
    kv_dtype: str = "bf16",
    sampled: bool = False,
) -> Tuple[Array, Array, Array, Array, Array, Array]:
    """Speculative decode. Returns (tokens (B, P+sample_len), sum_lp,
    n_sampled, no_speech_prob, n_iters (B,), n_drafted (B,)).

    n_iters counts verify steps while the row was live; n_drafted counts
    draft proposals offered (= spec_k * n_iters) — acceptance rate per
    offered draft token is (n_sampled - n_iters) / n_drafted.

    Greedy mode (sampled=False): token-exact vs
    greedy_decode_core(two_level=False) up to bf16 tiling noise between the
    T=1 and T=K+1 decoder graphs (fp32 is bit-exact; pinned by
    tests/test_speculative.py).

    Sampled mode (sampled=True, round-5): standard speculative REJECTION
    sampling (Leviathan et al.) so the temperature-fallback rungs keep the
    draft — the committed sequence is distributed EXACTLY as the plain
    sampled loop's:
      * the draft SAMPLES proposals d_j ~ q_j (its rules-filtered,
        temperature-scaled distribution), with the same counter-based
        per-(row, position) keys the plain loop uses
        (decoding.greedy_decode_core sample());
      * the verify walk accepts d_j with probability
        min(1, p_j(d_j)/q_j(d_j)) using a fresh tagged uniform;
      * the first rejection carries log(max(p_j - q_j, 0)) — the residual
        distribution — and the next iteration's first token is drawn from
        it with a tagged key (fresh randomness, never the proposal's);
        accepted-through iterations carry the raw target logits and sample
        exactly like the plain loop.
    With draft == target every ratio is 1, nothing is ever rejected, and
    the output is SEED-EXACT vs the plain sampled path (pinned by
    tests/test_speculative.py); the per-position residual math is
    distribution-checked by Monte-Carlo in the same file.
    """
    b = audio_features.shape[0]
    eot = cfg.eot_token
    ts_begin = cfg.timestamp_begin
    k = spec_k
    total_len = prompt_len + sample_len
    # candidate writes overshoot the committed horizon by up to K columns;
    # the host wrapper clamps sample_len so the slack fits n_text_ctx
    buf_len = total_len + k + 1
    cache_len = min(-(-buf_len // 128) * 128, cfg.n_text_ctx)
    rows = jnp.arange(b)

    if sampled:
        if temperature is None or key is None:
            raise ValueError(
                "sampled speculative decode needs temperature and key")

        def _scaled(x):
            # the EXACT expression the plain loop feeds categorical
            # (decoding.greedy_decode_core sample_t) — bit-identical scaled
            # logits keep the gumbel argmax seed-exact across paths
            return x / jnp.maximum(temperature, 1e-6)

    def _keys_at(pos_vec, tag=None):
        """Counter-based per-(row, absolute position) keys — the SAME
        derivation as the plain loop's sample() (seed-exact parity when
        draft == target); tags split off independent streams (1: residual
        commit, 2: acceptance uniform) so rejection-path randomness is
        never the rejected proposal's."""
        def one(p, r):
            kk = jax.random.fold_in(jax.random.fold_in(key, p), r)
            return kk if tag is None else jax.random.fold_in(kk, tag)
        return jax.vmap(one)(jnp.broadcast_to(pos_vec, (b,)), rows)

    def _cat(keys, logits):
        return jax.vmap(jax.random.categorical)(keys, logits).astype(
            jnp.int32)

    if kv_dtype == "int8":
        cross_t = dec_mod.precompute_cross_kv_int8(params, cfg,
                                                   audio_features)
        cross_d = dec_mod.precompute_cross_kv_int8(params_d, cfg_d,
                                                   audio_features_d)
    else:
        cross_t = dec_mod.precompute_cross_kv(params, cfg, audio_features)
        cross_d = dec_mod.precompute_cross_kv(params_d, cfg_d,
                                              audio_features_d)
    cache_t = dec_mod.init_kv_cache(cfg, b, dtype=audio_features.dtype,
                                    ctx=cache_len)
    cache_d = dec_mod.init_kv_cache(cfg_d, b, dtype=audio_features_d.dtype,
                                    ctx=cache_len)

    tokens = jnp.full((b, buf_len), eot, jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, initial_tokens, (0, 0))

    # prompt prefill for BOTH models (the draft must carry the same context)
    prefill_t, cache_t = dec_mod.decode_step(
        params, cfg, initial_tokens, cross_t, cache_t, 0, valid_from=pad_len)
    _, cache_d = dec_mod.decode_step(
        params_d, cfg_d, initial_tokens, cross_d, cache_d, 0,
        valid_from=pad_len)
    si = jnp.broadcast_to(jnp.asarray(sot_index, jnp.int32), (b,))
    sot_logits = jnp.take_along_axis(prefill_t, si[:, None, None],
                                     axis=1)[:, 0]
    no_speech_prob = jax.nn.softmax(
        sot_logits.astype(jnp.float32), axis=-1)[:, cfg.no_speech_token]

    def rules(logits, toks, pos, ts):
        return _apply_logit_rules(
            logits, toks, pos, cfg, prompt_len, suppress_mask, blank_mask,
            use_timestamps, ts, max_initial_ts_index)

    def body(carry):
        if sampled:
            (tokens, pos, logits, finished, sum_lp, n_sampled, ts_max,
             cache_t, cache_d, n_iters, carried_res, ready) = carry
        else:
            (tokens, pos, logits, finished, sum_lp, n_sampled, ts_max,
             cache_t, cache_d, n_iters) = carry
        # finished rows idle at pos <= total_len; the buffer's K+1 columns of
        # slack keep even their (gated/garbage) accesses in bounds, so pos is
        # NEVER clamped — a clamp would shrink the carried pos of a finished
        # row and the final cleanup would wipe its last token

        # -- 1) commit g: the token the carried target logits determine -----
        filt = rules(logits, tokens, pos, ts_max)
        if sampled:
            # ready rows commit from the carried RESIDUAL distribution
            # (rejection correction, tagged key — fresh randomness); others
            # sample from the target exactly like the plain loop
            g_raw = _cat(_keys_at(pos), _scaled(filt))
            g_res = _cat(_keys_at(pos, tag=1), carried_res)
            g = jnp.where(ready, g_res, g_raw)
        else:
            g = jnp.argmax(filt, axis=-1).astype(jnp.int32)
        lp_g = jnp.take_along_axis(jax.nn.log_softmax(filt, axis=-1),
                                   g[:, None], axis=1)[:, 0]
        g = jnp.where(finished, eot, g)
        keep = tokens[rows, pos]
        tokens = tokens.at[rows, pos].set(jnp.where(finished, keep, g))
        sum_lp = sum_lp + jnp.where(finished, 0.0, lp_g)
        n_sampled = n_sampled + jnp.where(finished, 0, 1)
        ts_max = jnp.where((g >= ts_begin) & ~finished, g, ts_max)
        fin_g = finished | (g == eot) | (pos + 1 >= total_len)

        # -- 2) draft proposes d_1..d_K (rules-filtered chain: greedy argmax
        # or temperature sampling from q_j with the plain loop's keys) ------
        d_ts = ts_max
        d_tok, d_pos = g, pos
        d_list = []
        q_list = []  # sampled mode: the draft distribution at each position
        dcache = cache_d
        for j in range(1, k + 1):
            d_logits, dcache = dec_mod.decode_step(
                params_d, cfg_d, d_tok[:, None], cross_d, dcache, d_pos,
                valid_from=pad_len)
            d_filt = rules(d_logits[:, 0].astype(jnp.float32), tokens,
                           d_pos + 1, d_ts)
            if sampled:
                q_j = jax.nn.softmax(_scaled(d_filt), axis=-1)
                d_next = _cat(_keys_at(d_pos + 1), _scaled(d_filt))
                q_list.append(q_j)
            else:
                d_next = jnp.argmax(d_filt, axis=-1).astype(jnp.int32)
            # the proposal lands in the token buffer NOW: the rule grammar at
            # position pos+j+1 reads tokens[pos+j] (candidate history). The
            # rejected tail stays as garbage above each row's write pointer
            # and is overwritten by later candidates / cleared at the end.
            keep = tokens[rows, d_pos + 1]
            tokens = tokens.at[rows, d_pos + 1].set(
                jnp.where(fin_g, keep, d_next))
            d_ts = jnp.where(d_next >= ts_begin, d_next, d_ts)
            d_list.append(d_next)
            d_tok, d_pos = d_next, d_pos + 1
        # consume d_K too, so the draft cache never falls behind the commit
        # pointer even when every proposal is accepted (output unused)
        _, dcache = dec_mod.decode_step(
            params_d, cfg_d, d_tok[:, None], cross_d, dcache, d_pos,
            valid_from=pad_len)

        # -- 3) verify: ONE target step over K+1 tokens ----------------------
        v_toks = jnp.stack([g] + d_list, axis=1)  # (B, K+1)
        v_logits, cache_t = dec_mod.decode_step(
            params, cfg, v_toks, cross_t, cache_t, pos, valid_from=pad_len)
        # v_logits[:, j] predicts position pos+j+1 given candidates <= pos+j

        # -- 4) acceptance walk ----------------------------------------------
        # greedy: keep the longest prefix where the target's rules-greedy
        # choice equals the proposal. sampled: standard rejection sampling —
        # accept d_j with prob min(1, p_j(d_j)/q_j(d_j)); the first
        # rejection stashes the residual max(p_j - q_j, 0) for the next
        # iteration's commit (distribution-exact vs the plain sampled loop).
        acc = jnp.zeros((b,), jnp.int32)
        accepting = ~fin_g
        eot_hit = (g == eot) & ~finished
        w_ts = ts_max
        if sampled:
            new_res = jnp.zeros((b, cfg.n_vocab), jnp.float32)
            new_ready = jnp.zeros((b,), jnp.bool_)
        for j in range(k):
            filt_j = rules(v_logits[:, j].astype(jnp.float32), tokens,
                           pos + j + 1, w_ts)
            d_j = d_list[j]
            if sampled:
                p_j = jax.nn.softmax(_scaled(filt_j), axis=-1)
                q_j = q_list[j]
                p_d = jnp.take_along_axis(p_j, d_j[:, None], axis=1)[:, 0]
                q_d = jnp.take_along_axis(q_j, d_j[:, None], axis=1)[:, 0]
                u = jax.vmap(jax.random.uniform)(_keys_at(pos + j + 1,
                                                          tag=2))
                # u*q < p  <=>  u < p/q (q_d > 0: d_j was drawn from q_j)
                match = accepting & (u * q_d < p_d)
                rej = accepting & ~match
                res_j = jnp.log(jnp.maximum(p_j - q_j, 0.0))
                # p == q exactly => rejection has probability 0, but guard
                # the all-empty residual against fp ties: fall back to p
                has_mass = jnp.any(p_j > q_j, axis=-1)
                res_j = jnp.where(has_mass[:, None], res_j,
                                  jnp.log(jnp.maximum(p_j, 1e-38)))
                new_res = jnp.where(rej[:, None], res_j, new_res)
                new_ready = new_ready | rej
            else:
                g_j = jnp.argmax(filt_j, axis=-1).astype(jnp.int32)
                match = accepting & (g_j == d_j)
            lp_j = jnp.take_along_axis(
                jax.nn.log_softmax(filt_j, axis=-1), d_j[:, None],
                axis=1)[:, 0]
            sum_lp = sum_lp + jnp.where(match, lp_j, 0.0)
            n_sampled = n_sampled + jnp.where(match, 1, 0)
            w_ts = jnp.where(match & (d_j >= ts_begin), d_j, w_ts)
            acc = acc + match.astype(jnp.int32)
            eot_hit = eot_hit | (match & (d_j == eot))
            accepting = match & (d_j != eot) & (pos + j + 2 < total_len)
        ts_max = w_ts

        # -- 5) advance ------------------------------------------------------
        new_pos = jnp.where(finished, pos, pos + acc + 1)
        next_logits = jnp.take_along_axis(
            v_logits, acc[:, None, None], axis=1)[:, 0].astype(jnp.float32)
        next_logits = jnp.where(finished[:, None], logits, next_logits)
        n_iters = n_iters + jnp.where(finished, 0, 1)
        new_finished = finished | eot_hit | (new_pos >= total_len)
        out = (tokens, new_pos, next_logits, new_finished, sum_lp,
               n_sampled, ts_max, cache_t, dcache, n_iters)
        if sampled:
            out = out + (new_res, new_ready & ~new_finished)
        return out

    def cond(carry):
        finished = carry[3]
        return ~jnp.all(finished)

    init = (
        tokens,
        jnp.full((b,), prompt_len, jnp.int32),
        prefill_t[:, -1].astype(jnp.float32),
        jnp.zeros((b,), jnp.bool_),
        jnp.zeros((b,), jnp.float32),
        jnp.zeros((b,), jnp.int32),
        jnp.full((b,), ts_begin - 1, jnp.int32),
        cache_t,
        cache_d,
        jnp.zeros((b,), jnp.int32),
    )
    if sampled:
        init = init + (jnp.zeros((b, cfg.n_vocab), jnp.float32),
                       jnp.zeros((b,), jnp.bool_))
    fin = jax.lax.while_loop(cond, body, init)
    (tokens, pos, _, _, sum_lp, n_sampled, _, _, _, n_iters) = fin[:10]

    # clear the rejected-candidate tail above each row's commit pointer
    col = jnp.arange(buf_len)[None, :]
    tokens = jnp.where(col >= pos[:, None], eot, tokens)
    return (tokens[:, :total_len], sum_lp, n_sampled, no_speech_prob,
            n_iters, n_iters * k)


def draft_features(model, draft, mel: Optional[Array],
                   feats: Array) -> Array:
    """The draft decoder's feature input.

    Same encoder width -> share the target's features (the turbo pairing:
    its decoder was distilled against the frozen large-v3 encoder). Different
    width -> the draft runs its own encoder over the same mel.
    """
    if (draft.cfg.n_audio_state == model.cfg.n_audio_state
            and draft.cfg.n_audio_ctx == model.cfg.n_audio_ctx):
        return feats
    if mel is None:
        raise ValueError(
            "draft encoder width differs from the target's; speculative "
            "decoding from precomputed features needs a width-matched "
            "draft (pass mel instead)")
    return draft._encode_jit(draft.params, mel=mel)


# diagnostics: decoding._decode_impl stores the most recent spec decode's
# aggregate stats here (tokens/iteration, acceptance rate) — read by
# benchmarks/spec_bench.py and tools/validate_real.py gate J. Not part of
# the DecodingResult schema (openai parity) and never read by library code.
LAST_STATS: Optional[dict] = None

# process-lifetime accumulation (same producer): serve_http's batch worker
# diffs this around each batch to expose spec_acceptance_rate /
# spec_tokens_per_iter gauges on /metrics without threading state through
# the serving call chain. Single-writer (the decode path), so plain ints.
TOTALS = {"iters": 0, "tokens": 0, "drafted": 0}


def accumulate_stats(stats: dict) -> None:
    TOTALS["iters"] += stats["iters"]
    TOTALS["tokens"] += stats["tokens"]
    TOTALS["drafted"] += stats["drafted"]


def spec_stats(n_sampled: np.ndarray, n_iters: np.ndarray,
               n_drafted: np.ndarray) -> dict:
    """Aggregate acceptance statistics for logging/benchmarks."""
    n_sampled = np.asarray(n_sampled, np.float64)
    n_iters = np.maximum(np.asarray(n_iters, np.float64), 1)
    n_drafted = np.maximum(np.asarray(n_drafted, np.float64), 1)
    return {
        "tokens_per_iter": float(np.sum(n_sampled) / np.sum(n_iters)),
        "acceptance_rate": float(np.sum(n_sampled - n_iters)
                                 / np.sum(n_drafted)),
        "iters": int(np.sum(n_iters)),
        "tokens": int(np.sum(n_sampled)),
        "drafted": int(np.sum(n_drafted)),
    }


# -- acceptance governor: automatic draft fallback for serving ---------------

# Measured iteration-cost PRIOR (benchmarks/spec_bench.py, large-v3 +
# large-v3-turbo draft, int8 champion config, device-fenced), two calibrated
# geometries:
#   B24 (serving): ms/iteration = 20.5 + 2.13*K (K=4 -> 29.05, K=8 -> 37.59
#       measured) vs 8.97 ms/token two-level greedy -> BE(4)=3.24, BE(8)=4.19
#   B1 (streaming/interactive): ms/iteration = 6.77 + 0.41*K (K=4 -> 8.40,
#       K=8 -> 10.03 measured) vs 2.27 ms/token -> BE(4)=3.70, BE(8)=4.41
# Break-even RISES as batch shrinks: the draft's fixed per-iteration overhead
# stays while the target's per-token cost falls with fewer rows sharing the
# weight/cross-KV ingest. Acceptance below break-even makes speculative
# decoding a net LOSS (measured: the serving smoke at the random-weights
# acceptance floor ran 3.61 s vs 2.84 s plain — 27% slower).
#
# These constants are ONLY the prior (round-4 calibrations from one
# chip/session): SpecGovernor re-derives the break-even live from walled
# decodes at its own geometry (observe_timing below) and switches to the
# live number once both cost terms have evidence — a B48 server no longer
# silently runs B24 numbers, and new hardware/model pairs self-calibrate.
_KINETICS = {
    # batch: (iter_ms_base, iter_ms_per_k, plain_ms_per_token).
    # B1 from the round-4 streaming-geometry run; B8-B32 from the round-5
    # same-session sweep (benchmarks/tpu_queue_r5.sh: spec K=4,8 + flat +
    # two-level baselines measured in ONE process per batch; fit of the two
    # K points, plain = two-level ms/token). B24 reproduced round-4 within
    # noise (29.06 vs 29.05 ms/iter). Large-v3 target + large-v3-turbo
    # draft, int8 weights + int8 cross-KV, v5e via the axon relay. This is
    # only the PRIOR: SpecGovernor self-calibrates from walled decodes at
    # the live geometry once enough observations accumulate.
    1: (6.77, 0.4075, 2.27),
    8: (7.56, 1.39, 4.53),
    16: (16.49, 1.545, 6.52),
    24: (20.46, 2.15, 8.95),
    32: (25.37, 3.12, 11.07),
}


def break_even_tokens_per_iter(k: int, batch: int = 24) -> float:
    """Tokens/iteration below which a speculative iteration costs more than
    decoding the same tokens with the plain greedy loop, from the measured
    calibration geometry nearest (in log batch) to ``batch``."""
    import math

    lb = math.log(max(int(batch), 1))
    cal = min(_KINETICS, key=lambda b: abs(lb - math.log(b)))
    base, slope, tok = _KINETICS[cal]
    return (base + slope * k) / tok


# most recent decode-core wall timing, produced by decoding._decode_impl for
# every decode() call: {"path": "spec"|"plain", "wall_s", "units", "batch",
# ...} where units is max-row iterations (spec) or max-row committed tokens
# (plain) — the loop runs lockstep until the slowest row finishes, so the
# max row is what the wall clock paid for. None when the call took a path
# with different kinetics (beam, best_of fan-out). Single-writer, same
# producer discipline as LAST_STATS.
LAST_TIMING: Optional[dict] = None


def _median(xs) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])


class SpecGovernor:
    """Withhold the draft while measured acceptance sits below break-even.

    Acceptance is a property of the CONTENT x model pair, and serving has no
    control over content: noise, music, or domain shift can push draft
    agreement below the break-even where every speculative iteration costs
    more than the plain steps it replaces. The governor tracks measured
    tokens/iteration over a sliding window of decode batches and withholds
    the draft while the windowed mean is below threshold; every
    ``reprobe_every``-th withheld batch runs speculatively anyway, so a
    recovery (content drift back toward the draft's competence) re-enables
    the draft within one window. Decisions cost nothing on the accept path:
    one float comparison per batch.

    The break-even THRESHOLD self-calibrates (round-5): every decode()
    already pays a device sync, so decoding.py walls the core call and
    publishes LAST_TIMING; feeding those here maintains windowed medians of
    spec ms/iteration and plain ms/token at the LIVE geometry (model pair,
    batch, chip, K). Walls are bucketed BY geometry — spec by (batch, K,
    sampled), plain by batch — and the threshold is the ratio at the most
    recent spec geometry's bucket pair: per-batch kinetics differ ~4x
    (ms/token 2.27 at B1 vs 8.95 at B24, _KINETICS), so mixing a remainder
    chunk's B1 plain wall into a B24 server's calibration would set an
    unreachable threshold and permanently withhold a profitable draft.
    Once both matched buckets have ``calib_min_obs`` observations the
    threshold becomes their ratio; before that it is the constructor prior
    (the round-4 static table). Medians, not EMAs, so the one
    compile-poisoned first wall per graph cannot skew the estimate. Two
    biases, both conservative: the walls include the per-call setup
    (cross-KV precompute + prefill) that true marginal costs exclude, and
    setup/units is larger for spec (fewer iterations than tokens per call)
    — so the live threshold sits slightly HIGH, withholding a touch early
    (the cheap direction: a withheld draft forgoes upside; a mis-enabled
    one pays the measured 27% regression). ``pinned=True`` (an explicit
    user threshold) disables calibration.

    Acceptance evidence is tracked PER REGIME (greedy argmax verification
    vs t>0 rejection sampling — ``sampled=True`` on permit/observe):
    rejection sampling naturally accepts fewer proposals at high
    temperature, and a burst of hard-audio fallback rungs must not disable
    the draft for healthy greedy traffic (or vice versa). Each regime
    keeps its own window, verdict, and reprobe counter; ``disabled`` and
    ``tokens_per_iter`` expose the greedy regime (the primary rung — the
    /metrics gauges; ``disabled_sampled`` for the other).

    Single-threaded by design (the serving batch worker is one thread;
    transcribe() is one call) — no locking.
    """

    def __init__(self, threshold: float, min_iters: int = 32,
                 window: int = 8, reprobe_every: int = 8,
                 pinned: bool = False, calib_window: int = 16,
                 calib_min_obs: int = 3):
        if threshold <= 1.0:
            raise ValueError(
                f"threshold must exceed 1.0 tokens/iter, got {threshold}")
        self.prior_threshold = float(threshold)
        self.pinned = bool(pinned)
        self.min_iters = int(min_iters)  # evidence mass before any verdict
        self.window = int(window)  # observations in the sliding window
        self.reprobe_every = int(reprobe_every)
        self.calib_window = int(calib_window)
        self.calib_min_obs = int(calib_min_obs)
        # per-regime acceptance state, keyed by sampled: False = greedy
        # argmax verification, True = t>0 rejection sampling
        self._obs = {False: [], True: []}  # [(tokens, iters), ...]
        self._skips = {False: 0, True: 0}
        self._disabled = {False: False, True: False}
        # kinetics walls bucketed by geometry (timings without the batch/k
        # fields all land in one None bucket — still self-consistent)
        self._iter_ms: dict = {}  # (batch, k, sampled) -> [ms/iter, ...]
        self._tok_ms: dict = {}  # batch -> [ms/token, ...]
        self._geom = {False: None, True: None}  # newest spec (batch, k, s)
        self._tok_geom = None  # newest plain batch (pre-spec gauge fallback)

    @property
    def disabled(self) -> bool:
        return self._disabled[False]

    @disabled.setter
    def disabled(self, value: bool) -> None:
        self._disabled[False] = bool(value)

    @property
    def disabled_sampled(self) -> bool:
        return self._disabled[True]

    @property
    def tokens_per_iter(self) -> Optional[float]:
        iters = sum(i for _, i in self._obs[False])
        if iters == 0:
            return None
        return sum(t for t, _ in self._obs[False]) / iters

    # -- live kinetics calibration -------------------------------------------

    def _iter_list(self, sampled: bool) -> Optional[list]:
        key = self._geom[sampled]
        return None if key is None else self._iter_ms.get(key)

    def _tok_list(self, sampled: bool) -> Optional[list]:
        key = self._geom[sampled]
        batch = key[0] if key is not None else self._tok_geom
        return self._tok_ms.get(batch)

    @property
    def live_iter_ms(self) -> Optional[float]:
        walls = self._iter_list(False)
        return _median(walls) if walls else None

    @property
    def live_tok_ms(self) -> Optional[float]:
        walls = self._tok_list(False)
        return _median(walls) if walls else None

    def _calibrated(self, sampled: bool) -> bool:
        if self.pinned:
            return False
        iters, toks = self._iter_list(sampled), self._tok_list(sampled)
        return (iters is not None and len(iters) >= self.calib_min_obs
                and toks is not None and len(toks) >= self.calib_min_obs)

    @property
    def calibrated(self) -> bool:
        return self._calibrated(False)

    def _threshold_for(self, sampled: bool) -> float:
        if self._calibrated(sampled):
            # a threshold <=1 would be unfalsifiable (tpi >= 1 always);
            # floor just above it so a degenerate calibration cannot lock
            # the draft permanently ON
            return max(1.0 + 1e-6, _median(self._iter_list(sampled))
                       / _median(self._tok_list(sampled)))
        return self.prior_threshold

    @property
    def threshold(self) -> float:
        """Break-even tokens/iteration: live once calibrated, else prior."""
        return self._threshold_for(False)

    def observe_timing(self, timing: Optional[dict]) -> None:
        """Feed one decode()'s LAST_TIMING (None-safe). Spec walls calibrate
        ms/iteration; plain walls (withheld batches, probe misses, routed
        best_of fan-outs — same lockstep loop) calibrate ms/token. Both are
        bucketed by the wall's geometry so decodes at a different batch
        (remainder chunks, batch-1 transcribe calls) never contaminate the
        serving batch's break-even ratio."""
        if self.pinned or not timing or timing.get("units", 0) <= 0:
            return
        per_unit = timing["wall_s"] * 1e3 / timing["units"]
        if timing.get("path") == "spec":
            sampled = bool(timing.get("temperature") or 0.0)
            key = (timing.get("batch"), timing.get("k"), sampled)
            self._geom[sampled] = key
            dest = self._iter_ms.setdefault(key, [])
        elif timing.get("path") == "plain":
            batch = timing.get("batch")
            self._tok_geom = batch
            dest = self._tok_ms.setdefault(batch, [])
        else:
            return
        dest.append(per_unit)
        if len(dest) > self.calib_window:
            del dest[: len(dest) - self.calib_window]

    def permit(self, sampled: bool = False) -> bool:
        """Should the NEXT decode batch use the draft? Per-regime verdict:
        greedy (default) and sampled rungs reprobe independently."""
        if not self._disabled[sampled]:
            return True
        self._skips[sampled] += 1
        if self._skips[sampled] >= self.reprobe_every:
            self._skips[sampled] = 0
            return True  # probe batch: measure whether acceptance recovered
        return False

    def observe(self, stats: Optional[dict], sampled: bool = False) -> None:
        """Feed one decode batch's LAST_STATS (None-safe: a decode that took
        a non-speculative path inside decoding.py contributes nothing).
        ``sampled`` routes the evidence to the matching regime window."""
        if not stats or stats.get("iters", 0) <= 0:
            return
        obs = self._obs[sampled]
        obs.append((stats["tokens"], stats["iters"]))
        if len(obs) > self.window:
            del obs[: len(obs) - self.window]
        iters = sum(i for _, i in obs)
        if iters >= self.min_iters:
            tpi = sum(t for t, _ in obs) / iters
            was = self._disabled[sampled]
            self._disabled[sampled] = tpi < self._threshold_for(sampled)
            if self._disabled[sampled] and not was:
                # the windowed evidence that damned the draft would keep
                # damning it on every probe; start the probes from fresh eyes
                self._obs[sampled] = []
                self._skips[sampled] = 0
