"""Continuous batching for BEAM search: group-level slot refill mid-flight.

Round-3's feature-matrix gap (serve.py silently fell back to the static
scheduler for beam requests) closed positively instead of with a negative:
beam search is LOCKSTEP WITHIN a request — all K beam rows share one
position — so the continuous-batching idea lifts from per-row positions
(serve_cb.decode_chunk_core) to per-GROUP positions: each device slot is a
group of K adjacent rows, groups decode at independent positions, and
finished groups are harvested and refilled mid-flight exactly like the
sampled engine's rows.

Differences from the sampled CB engine (serve_cb.py):
  * the chunk core runs the beam step (top-2K merge, EOT candidate buffer,
    within-group cache gather) from beam.beam_decode_core, generalised to a
    (G,) position vector and a (G,) finished mask (finished groups gather
    with the identity permutation and their writes are gated);
  * the cache reorder gathers the full right-sized cache every step — the
    CB geometry is <=256 columns where two-level staging has ZERO headroom
    (the analysed negative in docs/benchmarks.md round 3), and per-group
    positions cross staging boundaries at different steps anyway;
  * temperature-fallback: beam runs only on the t=0 rung (openai ladder
    semantics); windows whose gates fail requeue into the SAMPLED CB
    engine for the t>0 rungs — the same two-engine split the static
    scheduler's ladder performs per batch, here per window.

Token/candidate-exact vs the static beam path in fp32
(tests/test_serve_cb_beam.py).
"""

from __future__ import annotations

import functools
from typing import Any, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import WhisperConfig
from .decoding import NEG_INF, _apply_logit_rules
from .models import decoder as dec_mod
from .serve_cb import ContinuousBatcher, gather_cross_rows

Array = jax.Array


class CBBeamState(NamedTuple):
    """Live beam-decode state: G groups x K rows."""

    tokens: Array  # (G*K, total_len) int32
    logits: Array  # (G*K, V) fp32 — logits for each group's `pos`
    sum_lp: Array  # (G*K,) fp32 — alive-beam cumulative scores
    seq_len: Array  # (G*K,) int32 — text tokens per alive beam
    ts_max: Array  # (G*K,) int32
    pad: Array  # (G*K,) int32 per-row left-pads
    pos: Array  # (G,) int32 — per-group next position
    finished: Array  # (G,) bool
    no_speech: Array  # (G,) fp32
    fin_scores: Array  # (G, C) fp32 — finished-candidate buffer
    fin_tokens: Array  # (G, C, total_len) int32
    fin_lens: Array  # (G, C) int32
    cache: Any  # KVCache, G*K rows
    cross_kv: Any  # CrossKV | QuantCrossKV, G*K rows


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "sample_len", "prompt_len", "cache_len",
                     "beam_size", "max_candidates", "compute_dtype"),
)
def prefill_beam_from_cross_core(
    params,
    cfg: WhisperConfig,
    cross_kv,  # G*K rows (window cross-KV repeated K-fold)
    initial_tokens: Array,  # (G*K, prompt_len) int32
    pad_len: Array,  # (G*K,) int32
    sot_index: Array,  # (G*K,) int32
    *,
    sample_len: int,
    prompt_len: int,
    cache_len: int,
    beam_size: int,
    max_candidates: int,
    compute_dtype=jnp.bfloat16,
) -> CBBeamState:
    gk = initial_tokens.shape[0]
    g = gk // beam_size
    eot = cfg.eot_token
    total_len = prompt_len + sample_len

    cache = dec_mod.init_kv_cache(cfg, gk, dtype=compute_dtype, ctx=cache_len)
    tokens = jnp.full((gk, total_len), eot, jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, initial_tokens, (0, 0))

    prefill_logits, cache = dec_mod.decode_step(
        params, cfg, initial_tokens, cross_kv, cache, 0, valid_from=pad_len)
    si = jnp.broadcast_to(jnp.asarray(sot_index, jnp.int32), (gk,))
    sot_logits = jnp.take_along_axis(prefill_logits, si[:, None, None],
                                     axis=1)[:, 0]
    no_speech = jax.nn.softmax(
        sot_logits.astype(jnp.float32), axis=-1)[:, cfg.no_speech_token]

    return CBBeamState(
        tokens=tokens,
        logits=prefill_logits[:, -1].astype(jnp.float32),
        sum_lp=jnp.zeros((gk,), jnp.float32),
        seq_len=jnp.zeros((gk,), jnp.int32),
        ts_max=jnp.full((gk,), cfg.timestamp_begin - 1, jnp.int32),
        pad=jnp.broadcast_to(jnp.asarray(pad_len, jnp.int32), (gk,)),
        pos=jnp.full((g,), prompt_len, jnp.int32),
        finished=jnp.zeros((g,), jnp.bool_),
        no_speech=no_speech.reshape(g, beam_size)[:, 0],
        fin_scores=jnp.full((g, max_candidates), NEG_INF, jnp.float32),
        fin_tokens=jnp.full((g, max_candidates, total_len), eot, jnp.int32),
        fin_lens=jnp.zeros((g, max_candidates), jnp.int32),
        cache=cache,
        cross_kv=cross_kv,
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "chunk", "use_timestamps", "prompt_len",
                     "total_len", "beam_size", "max_candidates"),
    donate_argnames=("state",),
)
def beam_decode_chunk_core(
    params,
    cfg: WhisperConfig,
    state: CBBeamState,
    suppress_mask: Array,
    blank_mask: Array,
    max_initial_ts_index: Array,
    *,
    chunk: int,
    use_timestamps: bool,
    prompt_len: int,
    total_len: int,
    beam_size: int,
    max_candidates: int,
) -> CBBeamState:
    """Advance every unfinished GROUP by up to `chunk` beam steps."""
    eot = cfg.eot_token
    k = beam_size
    gk = state.tokens.shape[0]
    g = gk // k
    v = cfg.n_vocab
    rows = jnp.arange(gk)
    group_of_row = rows // k
    beam_ids = rows % k

    def body(carry):
        i, st = carry
        pos_rep = jnp.take(st.pos, group_of_row)  # (G*K,)
        fin_rep = jnp.take(st.finished, group_of_row)  # (G*K,) bool

        filtered = _apply_logit_rules(
            st.logits, st.tokens, pos_rep, cfg, prompt_len, suppress_mask,
            blank_mask, use_timestamps, st.ts_max, max_initial_ts_index)
        logprobs = jax.nn.log_softmax(filtered, axis=-1)  # (G*K, V)

        first = pos_rep == prompt_len
        beam_alive_mask = jnp.where(first & (beam_ids > 0), NEG_INF, 0.0)
        cand = (st.sum_lp[:, None] + logprobs + beam_alive_mask[:, None]
                ).reshape(g, k * v)
        top_scores, top_idx = jax.lax.top_k(cand, 2 * k)  # (G, 2K)
        src_beam = top_idx // v
        tok = (top_idx % v).astype(jnp.int32)
        is_eot = tok == eot

        # ---- finished-candidate buffer (gated per group) ----
        eot_scores = jnp.where(is_eot & ~st.finished[:, None], top_scores,
                               NEG_INF)
        all_scores = jnp.concatenate([st.fin_scores, eot_scores], axis=1)
        src_rows3 = jnp.take_along_axis(
            st.tokens.reshape(g, k, total_len), src_beam[..., None], axis=1)
        pos3 = jnp.minimum(st.pos, total_len - 1)[:, None, None]
        col3 = jnp.arange(total_len)[None, None, :]
        src_rows3 = jnp.where(col3 == pos3, eot, src_rows3)
        cand_lens = jnp.take_along_axis(
            st.seq_len.reshape(g, k), src_beam, axis=1)
        all_tokens = jnp.concatenate([st.fin_tokens, src_rows3], axis=1)
        all_lens = jnp.concatenate([st.fin_lens, cand_lens], axis=1)
        keep_scores, keep_idx = jax.lax.top_k(all_scores, max_candidates)
        fin_scores = keep_scores
        fin_tokens = jnp.take_along_axis(all_tokens, keep_idx[..., None],
                                         axis=1)
        fin_lens = jnp.take_along_axis(all_lens, keep_idx, axis=1)

        # ---- K continuing beams per group ----
        alive_scores = jnp.where(is_eot, NEG_INF, top_scores)
        new_scores, pick = jax.lax.top_k(alive_scores, k)  # (G, K)
        new_tok = jnp.take_along_axis(tok, pick, axis=1)
        new_src = jnp.take_along_axis(src_beam, pick, axis=1)

        # finished groups: identity permutation, frozen state
        flat_src = (jnp.arange(g)[:, None] * k + new_src).reshape(gk)
        flat_src = jnp.where(fin_rep, rows, flat_src)
        newt = jnp.where(fin_rep, eot, new_tok.reshape(gk))

        write_pos = jnp.minimum(pos_rep, total_len - 1)
        gathered = st.tokens[flat_src]
        keep = gathered[rows, write_pos]
        tokens = gathered.at[rows, write_pos].set(
            jnp.where(fin_rep, keep, newt))
        sum_lp = jnp.where(fin_rep, st.sum_lp, new_scores.reshape(gk))
        seq_len = jnp.where(
            fin_rep, st.seq_len,
            jnp.take_along_axis(st.seq_len.reshape(g, k), new_src,
                                axis=1).reshape(gk) + 1)
        ts_g = jnp.take_along_axis(st.ts_max.reshape(g, k), new_src,
                                   axis=1).reshape(gk)
        ts_max = jnp.where(
            fin_rep, st.ts_max,
            jnp.where(newt >= cfg.timestamp_begin, newt, ts_g))
        pad = jnp.take(st.pad, flat_src)

        cache = dec_mod.gather_cache(st.cache, flat_src)
        next_logits, cache = dec_mod.decode_step(
            params, cfg, newt[:, None], st.cross_kv, cache, write_pos,
            valid_from=pad)
        logits = jnp.where(fin_rep[:, None], st.logits,
                           next_logits[:, 0].astype(jnp.float32))

        # per-group stop: horizon, or no alive beam can beat the worst
        # kept finished candidate (beam.beam_decode_core's early exit)
        best_alive = jnp.max(new_scores, axis=1)
        worst_fin = jnp.min(fin_scores, axis=1)
        improvable = best_alive > worst_fin
        finished = st.finished | (st.pos + 1 >= total_len) | ~improvable
        pos = jnp.where(st.finished, st.pos, st.pos + 1)

        st = CBBeamState(
            tokens=tokens, logits=logits, sum_lp=sum_lp, seq_len=seq_len,
            ts_max=ts_max, pad=pad, pos=pos, finished=finished,
            no_speech=st.no_speech, fin_scores=fin_scores,
            fin_tokens=fin_tokens, fin_lens=fin_lens, cache=cache,
            cross_kv=st.cross_kv)
        return i + 1, st

    def cond(carry):
        i, st = carry
        return (i < chunk) & ~jnp.all(st.finished)

    _, state = jax.lax.while_loop(cond, body, (jnp.int32(0), state))
    return state


@functools.partial(jax.jit, donate_argnames=("state",),
                   static_argnames=("beam_size",))
def scatter_beam_rows(state: CBBeamState, rows: CBBeamState, group_idx: Array,
                      *, beam_size: int) -> CBBeamState:
    """Insert a refill group's G' request-groups at group slots `group_idx`
    (out-of-range indices drop, as in serve_cb.scatter_rows)."""
    k = beam_size
    # an out-of-range group index (bs, the drop sentinel) lands its rows at
    # bs*k + j >= G*K, which the row-axis mode="drop" scatters discard too
    row_idx = (group_idx[:, None] * k
               + jnp.arange(k)[None, :]).reshape(-1)  # (G'*K,)

    def ax0_rows(a, r):
        return a.at[row_idx].set(r, mode="drop")

    def ax0_groups(a, r):
        return a.at[group_idx].set(r, mode="drop")

    def ax1_rows(a, r):
        return a.at[:, row_idx].set(r, mode="drop")

    cache = jax.tree.map(ax1_rows, state.cache, rows.cache)
    cross = jax.tree.map(ax1_rows, state.cross_kv, rows.cross_kv)
    return CBBeamState(
        tokens=ax0_rows(state.tokens, rows.tokens),
        logits=ax0_rows(state.logits, rows.logits),
        sum_lp=ax0_rows(state.sum_lp, rows.sum_lp),
        seq_len=ax0_rows(state.seq_len, rows.seq_len),
        ts_max=ax0_rows(state.ts_max, rows.ts_max),
        pad=ax0_rows(state.pad, rows.pad),
        pos=ax0_groups(state.pos, rows.pos),
        finished=ax0_groups(state.finished, rows.finished),
        no_speech=ax0_groups(state.no_speech, rows.no_speech),
        fin_scores=ax0_groups(state.fin_scores, rows.fin_scores),
        fin_tokens=ax0_groups(state.fin_tokens, rows.fin_tokens),
        fin_lens=ax0_groups(state.fin_lens, rows.fin_lens),
        cache=cache,
        cross_kv=cross,
    )


class BeamContinuousBatcher(ContinuousBatcher):
    """Beam-search continuous batching: slots are K-row request groups.

    Reuses the sampled engine's pool machinery (full-batch encode into a
    device-resident cross-KV pool, language detection, prompt layout);
    overrides prefill, the chunk loop, and harvest with the group-beam
    forms. Runs the t=0 rung only — windows failing the quality gates are
    returned for the caller to requeue into the sampled engine
    (serve.transcribe_batch wires the two together).
    """

    def __init__(self, model, options) -> None:
        super().__init__(model, options)
        if not options.beam_size:
            raise ValueError("BeamContinuousBatcher requires beam_size")
        if self.cache_dtype == "int8":
            raise ValueError("beam continuous batching requires a bf16 cache")
        self.k = int(options.beam_size)
        patience = getattr(options, "patience", None) or 1.0
        self.max_candidates = max(self.k, round(self.k * patience))
        # cache rows = groups * K; right-size as the sampled engine does
        self.cache_len = min(-(-self.total_len // 128) * 128,
                             self.cfg.n_text_ctx)

    # -- group prefill --------------------------------------------------------

    def _draw_from_pool(self, size: int, count: int
                        ) -> Tuple[CBBeamState, List[Any]]:
        take = self._pool_slots[self._pool_next : self._pool_next + count]
        idx = np.zeros(size, np.int32)
        idx[: len(take)] = np.arange(self._pool_next,
                                     self._pool_next + len(take))
        self._pool_next += len(take)
        row_idx = np.repeat(idx, self.k)  # K cross-KV rows per window
        cross_rows = gather_cross_rows(self._pool_cross,
                                       jnp.asarray(row_idx))

        langs = [s.language for s in take]
        langs += [langs[-1] if langs else "en"] * (size - len(take))
        prompted = [s.window.offset_frames == 0 for s in take]
        prompted += [False] * (size - len(take))
        initial, pads, sots = self._initial_tokens(langs, prompted)
        initial = np.repeat(initial, self.k, axis=0)
        pads = np.repeat(pads, self.k)
        sots = np.repeat(sots, self.k)
        rows = prefill_beam_from_cross_core(
            self.model.params, self.cfg, cross_rows, jnp.asarray(initial),
            jnp.asarray(pads), jnp.asarray(sots),
            sample_len=self.sample_len, prompt_len=self.prompt_len,
            cache_len=self.cache_len, beam_size=self.k,
            max_candidates=self.max_candidates,
            compute_dtype=self.model.params["decoder"]["token_embedding"].dtype)
        return rows, take

    # -- harvest (finalize + rank, host side) --------------------------------

    def _harvest_group(self, host, slot: int, entry) -> Tuple[Any, bool]:
        from .beam import rank_sequences
        from .decoding import DecodingResult, compression_ratio

        tok = self.tokenizer
        opts = self.options
        k = self.k
        total_len = self.total_len
        pos = int(host["pos"][slot])
        # finalize (beam.beam_decode_core semantics): pad the candidate set
        # with the still-alive beams, EOT appended when the horizon remains
        alive_scores = host["sum_lp"][slot * k : (slot + 1) * k]
        alive_tokens = host["tokens"][slot * k : (slot + 1) * k].copy()
        if pos < total_len:
            alive_tokens[:, pos] = tok.eot
        alive_lens = host["seq_len"][slot * k : (slot + 1) * k]
        scores = np.concatenate([host["fin_scores"][slot], alive_scores])
        tokens = np.concatenate([host["fin_tokens"][slot], alive_tokens])
        lens = np.concatenate([host["fin_lens"][slot], alive_lens])
        ranked = np.asarray(rank_sequences(
            jnp.asarray(scores[None]), jnp.asarray(lens[None]),
            getattr(opts, "length_penalty", None)))[0]
        best = int(np.argmax(ranked))

        sampled = tokens[best, self.prompt_len:]
        eot_pos = np.nonzero(sampled == tok.eot)[0]
        cut = int(eot_pos[0]) if len(eot_pos) else len(sampled)
        toks = sampled[:cut].tolist()
        text = tok.decode(toks).strip()
        n = max(int(lens[best]), 1)
        result = DecodingResult(
            tokens=toks, text=text, language=entry.language,
            language_probs=None,
            avg_logprob=float(scores[best]) / n,
            no_speech_prob=float(host["no_speech"][slot]),
            temperature=0.0,
            compression_ratio=compression_ratio(text))
        bad = False
        if (opts.compression_ratio_threshold is not None
                and result.compression_ratio
                > opts.compression_ratio_threshold):
            bad = True
        if (opts.logprob_threshold is not None
                and result.avg_logprob < opts.logprob_threshold):
            bad = True
        if (opts.no_speech_threshold is not None
                and result.no_speech_prob > opts.no_speech_threshold):
            bad = False
        retry = bad and len(self.temperatures) > 1
        return result, retry

    # -- main loop ------------------------------------------------------------

    def run(self, windows: List[Any], arrivals=None) -> List[Any]:
        """Decode every window on the t=0 beam rung; returns the windows
        that failed the quality gates (the caller routes them to the
        sampled engine's t>0 rungs)."""
        if not windows and arrivals is None:
            return []
        with self.model.mesh_context():
            return self._run_beam(windows, arrivals)

    def _run_beam(self, windows: List[Any], arrivals=None) -> List[Any]:
        import time as _time
        from collections import deque

        from .serve_cb import _Slot

        pending: deque = deque(
            _Slot(w, 0, self.options.language or "en") for w in windows)
        closed = arrivals is None

        def poll_arrivals() -> None:
            nonlocal closed
            if closed:
                return
            got = arrivals()
            if got is None:
                closed = True
            else:
                pending.extend(_Slot(w, 0, self.options.language or "en")
                               for w in got)

        bs = self.bs  # GROUPS per device batch
        active: List[Optional[Any]] = [None] * bs
        retries: List[Any] = []
        self._pool_slots = []
        self._pool_next = 0
        self._pool_cross = None

        while not pending:
            poll_arrivals()
            if closed and not pending:
                return retries
            if not pending:
                _time.sleep(0.002)
        self._encode_pool(pending)
        state, group = self._draw_from_pool(bs, min(bs, self._pool_remaining()))
        for i, s in enumerate(group):
            active[i] = s
        if len(group) < bs:
            mask = np.zeros(bs, bool)
            mask[len(group):] = True
            state = state._replace(finished=state.finished | jnp.asarray(mask))

        while True:
            poll_arrivals()
            if any(a is not None for a in active):
                state = beam_decode_chunk_core(
                    self.model.params, self.cfg, state, self.suppress_mask,
                    self.blank_mask, jnp.int32(self.max_init_idx),
                    chunk=self.chunk, use_timestamps=self.use_timestamps,
                    prompt_len=self.prompt_len, total_len=self.total_len,
                    beam_size=self.k, max_candidates=self.max_candidates)

            finished = np.asarray(state.finished)
            host = None
            if any(finished[s] for s in range(bs) if active[s] is not None):
                host = {
                    "tokens": np.asarray(state.tokens),
                    "sum_lp": np.asarray(state.sum_lp),
                    "seq_len": np.asarray(state.seq_len),
                    "pos": np.asarray(state.pos),
                    "no_speech": np.asarray(state.no_speech),
                    "fin_scores": np.asarray(state.fin_scores),
                    "fin_tokens": np.asarray(state.fin_tokens),
                    "fin_lens": np.asarray(state.fin_lens),
                }
            for slot in range(bs):
                entry = active[slot]
                if entry is None or not finished[slot]:
                    continue
                result, retry = self._harvest_group(host, slot, entry)
                entry.window.result = result
                if retry:
                    retries.append(entry.window)
                active[slot] = None

            free = [s for s in range(bs) if active[s] is None]
            supply = self._pool_remaining() + len(pending)
            if supply and (len(free) >= self.refill
                           or all(a is None for a in active)):
                if self._pool_remaining() == 0:
                    self._encode_pool(pending)
                count = min(self.refill, len(free), self._pool_remaining())
                rows, group = self._draw_from_pool(self.refill, count)
                idx = np.full(self.refill, bs, np.int32)
                idx[: len(group)] = free[: len(group)]
                state = scatter_beam_rows(state, rows, jnp.asarray(idx),
                                          beam_size=self.k)
                for i, s in zip(idx[: len(group)], group):
                    active[int(i)] = s
            if (not pending and self._pool_remaining() == 0
                    and all(a is None for a in active)):
                if closed:
                    break
                _time.sleep(0.002)
        return retries
