"""Continuous batching: window-level slot refill mid-flight.

The static scheduler (serve.transcribe_batch) decodes fixed batches: every
batch runs until its LAST window reaches EOT, so slots whose window finished
early sit idle. This engine keeps every device slot busy:

  * the decode loop advances PER-ROW positions (models.decoder.decode_step
    with a (B,) pos vector) in jitted CHUNKS of `chunk_tokens` steps — one
    host round-trip (~30 ms through the axon relay, CLAUDE.md) amortised
    over the whole chunk;
  * between chunks, EOT-finished rows are harvested and their slots refilled
    from the pending queue: a refill group of R windows is encoded +
    prefilled in its own fixed-shape graph, then scattered into the live
    state (`.at[idx].set(..., mode="drop")`, so underfull groups pad
    harmlessly with out-of-range indices);
  * the sampling temperature is a (B,) vector, so temperature-fallback
    retries re-enter the queue and mix freely with first attempts in the
    same device batch — no whole-batch re-decode (the static scheduler's
    known inefficiency).

Reference counterpart: none — the reference decodes one utterance at a time
(/root/reference/Whisper/Whisper/ContentView.swift:40-68). This is serving
lever #2 from docs/benchmarks.md, built TPU-style: fixed shapes everywhere,
host control only between chunks.

Parity: token-exact vs the static scheduler in fp32 (tests/test_serve_cb.py,
and measured on-chip with fp32). In bf16 the two schedulers can differ on
near-tie argmaxes because refill groups encode at a different batch size
than static batches, and XLA's bf16 tiling is batch-shape-dependent
(measured: 8e-3 feature drift for the same mel at batch 1 vs 2 — the same
dtype noise class as CLAUDE.md's 'bf16 logits differ ~0.02-0.05' note).
"""

from __future__ import annotations

import dataclasses
import functools
import logging
from collections import deque
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import WhisperConfig
from .decoding import (
    NEG_INF,
    DecodingOptions,
    DecodingResult,
    _apply_logit_rules,
    build_blank_mask,
    build_suppress_mask,
    compression_ratio,
)
from .models import decoder as dec_mod
from .tokenizer import LANGUAGES, get_tokenizer
from .utils.obs import get_logger as _get_logger, kv as _kv

_cb_log = _get_logger("serve_cb")

Array = jax.Array


class CBState(NamedTuple):
    """Live decode state for one device batch of slots."""

    tokens: Array  # (B, total_len) int32
    logits: Array  # (B, V) fp32 — logits for the position in `pos`
    pos: Array  # (B,) int32 — per-row next position to sample
    finished: Array  # (B,) bool
    sum_lp: Array  # (B,) fp32
    n_sampled: Array  # (B,) int32
    ts_max: Array  # (B,) int32 (ts_begin - 1 sentinel)
    temp: Array  # (B,) fp32 — per-row sampling temperature
    no_speech: Array  # (B,) fp32 — SOT-step no-speech probability
    pad: Array  # (B,) int32 — per-row left-pad (rows with a conditioning
    # prompt pad less; slots [0, pad) are masked out of attention)
    cache: Any  # KVCache | QuantKVCache
    cross_kv: Any  # CrossKV | QuantCrossKV


@functools.partial(jax.jit, static_argnames=("cfg", "kv_dtype"))
def encode_cross_core(params, cfg: WhisperConfig, feats: Array,
                      *, kv_dtype: str = "bf16"):
    """Audio features -> per-layer (quantised) cross-KV.

    Kept separate from prefill so the encoder always runs at FULL batch:
    refilling 3 slots with a 3-row encode costs almost as much device time
    as a 24-row encode (the MXU is row-starved either way), which measured
    as the term that erased continuous batching's scheduling win. The pool
    in ContinuousBatcher amortises this call over batch_size windows."""
    if kv_dtype == "int8":
        return dec_mod.precompute_cross_kv_int8(params, cfg, feats)
    return dec_mod.precompute_cross_kv(params, cfg, feats)


@jax.jit
def gather_cross_rows(cross, idx: Array):
    """Select batch rows (axis 1) of a pooled cross-KV for a refill group."""
    return jax.tree.map(lambda a: a[:, idx], cross)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "sample_len", "prompt_len", "cache_len",
                     "cache_dtype", "compute_dtype"),
)
def prefill_from_cross_core(
    params,
    cfg: WhisperConfig,
    cross_kv,  # CrossKV | QuantCrossKV, batch R
    initial_tokens: Array,  # (R, prompt_len) int32, left-padded
    temps: Array,  # (R,) fp32
    pad_len: Array,  # (R,) int32 per-row left-pads
    sot_index: Array,  # (R,) int32 per-row SOT slot
    *,
    sample_len: int,
    prompt_len: int,
    cache_len: int,
    cache_dtype: str = "bf16",
    compute_dtype=jnp.bfloat16,
) -> CBState:
    """Prompt prefill against already-encoded cross-KV (no encoder work)."""
    r = initial_tokens.shape[0]
    eot = cfg.eot_token
    total_len = prompt_len + sample_len

    if cache_dtype == "int8":
        cache = dec_mod.init_kv_cache_int8(cfg, r, ctx=cache_len)
    else:
        cache = dec_mod.init_kv_cache(cfg, r, dtype=compute_dtype,
                                      ctx=cache_len)

    tokens = jnp.full((r, total_len), eot, jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, initial_tokens, (0, 0))

    prefill_logits, cache = dec_mod.decode_step(
        params, cfg, initial_tokens, cross_kv, cache, 0, valid_from=pad_len)
    si = jnp.broadcast_to(jnp.asarray(sot_index, jnp.int32), (r,))
    sot_logits = jnp.take_along_axis(prefill_logits, si[:, None, None],
                                     axis=1)[:, 0]
    no_speech = jax.nn.softmax(
        sot_logits.astype(jnp.float32), axis=-1)[:, cfg.no_speech_token]

    return CBState(
        tokens=tokens,
        logits=prefill_logits[:, -1].astype(jnp.float32),
        pos=jnp.full((r,), prompt_len, jnp.int32),
        finished=jnp.zeros((r,), jnp.bool_),
        sum_lp=jnp.zeros((r,), jnp.float32),
        n_sampled=jnp.zeros((r,), jnp.int32),
        ts_max=jnp.full((r,), cfg.timestamp_begin - 1, jnp.int32),
        temp=temps.astype(jnp.float32),
        no_speech=no_speech,
        pad=jnp.broadcast_to(jnp.asarray(pad_len, jnp.int32), (r,)),
        cache=cache,
        cross_kv=cross_kv,
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "chunk", "use_timestamps", "prompt_len",
                     "total_len"),
    # the multi-GB cache/cross-KV state is consumed and rebuilt every chunk:
    # donation lets XLA update it in place instead of copying it per call
    donate_argnames=("state",),
)
def decode_chunk_core(
    params,
    cfg: WhisperConfig,
    state: CBState,
    key: Array,
    suppress_mask: Array,
    blank_mask: Array,
    max_initial_ts_index: Array,
    *,
    chunk: int,
    use_timestamps: bool,
    prompt_len: int,
    total_len: int,
) -> Tuple[CBState, Array]:
    """Advance every unfinished row by up to `chunk` tokens (early exit when
    all rows finish). Rows are at independent positions."""
    eot = cfg.eot_token
    b = state.tokens.shape[0]
    rows = jnp.arange(b)

    def cond(carry):
        i, st, _ = carry
        return (i < chunk) & ~jnp.all(st.finished)

    def body(carry):
        i, st, key = carry
        filtered = _apply_logit_rules(
            st.logits, st.tokens, st.pos, cfg, prompt_len, suppress_mask,
            blank_mask, use_timestamps, st.ts_max, max_initial_ts_index)

        key, sub = jax.random.split(key)
        greedy = jnp.argmax(filtered, axis=-1).astype(jnp.int32)
        sampled = jax.random.categorical(
            sub, filtered / jnp.maximum(st.temp, 1e-6)[:, None], axis=-1
        ).astype(jnp.int32)
        tok = jnp.where(st.temp > 0, sampled, greedy)
        logprobs = jax.nn.log_softmax(filtered, axis=-1)
        tok_lp = jnp.take_along_axis(logprobs, tok[:, None], axis=1)[:, 0]

        tok = jnp.where(st.finished, eot, tok)
        sum_lp = st.sum_lp + jnp.where(st.finished, 0.0, tok_lp)
        n_sampled = st.n_sampled + jnp.where(st.finished, 0, 1)
        ts_max = jnp.where((tok >= cfg.timestamp_begin) & ~st.finished, tok,
                           st.ts_max)
        write_pos = jnp.minimum(st.pos, total_len - 1)
        # finished rows must not write: a row frozen at pos==total_len would
        # clobber the real token it sampled at total_len-1 with EOT on every
        # later iteration (its write_pos clamps back onto that slot)
        keep = st.tokens[rows, write_pos]
        tokens = st.tokens.at[rows, write_pos].set(
            jnp.where(st.finished, keep, tok))
        finished = st.finished | (tok == eot) | (st.pos + 1 >= total_len)

        next_logits, cache = dec_mod.decode_step(
            params, cfg, tok[:, None], st.cross_kv, st.cache, st.pos,
            valid_from=st.pad)
        pos = jnp.where(st.finished, st.pos, st.pos + 1)
        st = st._replace(tokens=tokens,
                         logits=next_logits[:, 0].astype(jnp.float32),
                         pos=pos, finished=finished, sum_lp=sum_lp,
                         n_sampled=n_sampled, ts_max=ts_max, cache=cache)
        return i + 1, st, key

    _, state, key = jax.lax.while_loop(cond, body, (jnp.int32(0), state, key))
    return state, key


@functools.partial(jax.jit, donate_argnames=("state",))
def scatter_rows(state: CBState, rows: CBState, idx: Array) -> CBState:
    """Insert a refill group's rows at slots `idx`; out-of-range indices
    (padding rows of an underfull group) are dropped."""

    def ax0(a, r):
        return a.at[idx].set(r, mode="drop")

    def ax1(a, r):
        return a.at[:, idx].set(r, mode="drop")

    cache = jax.tree.map(ax1, state.cache, rows.cache)
    cross = jax.tree.map(ax1, state.cross_kv, rows.cross_kv)
    return CBState(
        tokens=ax0(state.tokens, rows.tokens),
        logits=ax0(state.logits, rows.logits),
        pos=ax0(state.pos, rows.pos),
        finished=ax0(state.finished, rows.finished),
        sum_lp=ax0(state.sum_lp, rows.sum_lp),
        n_sampled=ax0(state.n_sampled, rows.n_sampled),
        ts_max=ax0(state.ts_max, rows.ts_max),
        temp=ax0(state.temp, rows.temp),
        no_speech=ax0(state.no_speech, rows.no_speech),
        pad=ax0(state.pad, rows.pad),
        cache=cache,
        cross_kv=cross,
    )


# ---------------------------------------------------------------------------
# Host-side engine
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class _Slot:
    window: Any  # serve._Window
    temp_index: int
    language: str


class ContinuousBatcher:
    """Drives one device batch of slots over a queue of 30 s windows.

    Usage (serve.transcribe_batch wires this up):
        cb = ContinuousBatcher(model, options)
        cb.run(windows)      # fills w.result on every window
    """

    def __init__(self, model, options) -> None:
        self.model = model
        self.options = options
        cfg = model.cfg
        self.cfg = cfg
        self.bs = options.batch_size
        self.refill = options.refill_size or max(1, self.bs // 4)
        self.chunk = options.chunk_tokens
        self.sample_len = options.sample_len or cfg.n_text_ctx // 2

        self.tokenizer = get_tokenizer(
            cfg, language=(options.language or "en") if cfg.multilingual
            else None, task=options.task)
        d_opts = DecodingOptions(
            task=options.task,
            suppress_tokens=options.suppress_tokens,
            without_timestamps=options.without_timestamps)
        self.suppress_mask = jnp.asarray(
            build_suppress_mask(self.tokenizer, d_opts))
        self.blank_mask = jnp.asarray(build_blank_mask(self.tokenizer))
        self.use_timestamps = not options.without_timestamps
        self.max_init_idx = -1 if options.without_timestamps else 50  # 1.0 s

        # prompt layout: [sot_prev, initial_prompt?] + [sot, lang, task]
        # (+notimestamps), left-padded to a shared bucket. Rows WITHOUT a
        # conditioning prompt (every window past a request's first) pad
        # further left — per-row pads ride in CBState.pad, so prompted and
        # unprompted rows mix freely in one device batch / one graph.
        base = 1 if not cfg.multilingual else 3
        if options.without_timestamps:
            base += 1
        self.base_len = base
        self.prompt_tokens: Optional[List[int]] = None
        if getattr(options, "initial_prompt", None):
            max_prompt = cfg.n_text_ctx // 2 - 1
            self.prompt_tokens = self.tokenizer.encode(
                " " + options.initial_prompt.strip())[-max_prompt:]
            from .decoding import _prompt_bucket

            self.prompt_len = _prompt_bucket(
                1 + len(self.prompt_tokens) + base, cfg.n_text_ctx)
        else:
            self.prompt_len = 4
        self.pad = self.prompt_len - base  # unprompted-row pad (the default)
        self.sot_index = self.pad
        self.sample_len = min(self.sample_len, cfg.n_text_ctx - self.prompt_len)
        self.total_len = self.prompt_len + self.sample_len
        self.cache_len = min(-(-self.total_len // 128) * 128, cfg.n_text_ctx)

        self.kv_dtype = getattr(options, "kv_dtype", "bf16")
        self.cache_dtype = getattr(options, "cache_dtype", "bf16")
        self.temperatures = list(options.temperature)

    # -- helpers -------------------------------------------------------------

    def _initial_tokens(self, languages: List[str],
                        prompted: List[bool]) -> Tuple[np.ndarray, np.ndarray,
                                                       np.ndarray]:
        """Per-row [pad | sot_prev prompt? | sot lang task ...] sequences.

        Returns (tokens (R, prompt_len), pads (R,), sot_indices (R,)):
        prompted rows (a request's FIRST window, when initial_prompt is set)
        carry the conditioning text; the rest left-pad to the same bucket.
        """
        tok = self.tokenizer
        cfg = self.cfg
        out, pads, sots = [], [], []
        for lang, p in zip(languages, prompted):
            if cfg.multilingual:
                task_tok = (tok.transcribe if self.options.task == "transcribe"
                            else tok.translate)
                seq = [tok.sot, tok.language_token(lang), task_tok]
            else:
                seq = [tok.sot]
            if self.options.without_timestamps:
                seq.append(tok.no_timestamps)
            if p and self.prompt_tokens:
                seq = [tok.sot_prev] + self.prompt_tokens + seq
                sot_off = 1 + len(self.prompt_tokens)
            else:
                sot_off = 0
            pad = self.prompt_len - len(seq)
            out.append([tok.eot] * pad + seq)
            pads.append(pad)
            sots.append(pad + sot_off)
        return (np.asarray(out, np.int32), np.asarray(pads, np.int32),
                np.asarray(sots, np.int32))

    def _encode_pool(self, pending: deque) -> None:
        """Encode up to batch_size pending windows at the FULL batch graph
        into the device-resident pool (cross-KV + language per window).

        Refill groups then draw rows from the pool without touching the
        encoder: a small-group encode costs nearly as much device time as a
        full-batch one (row-starved MXU), and per-refill encodes measured
        as the term that erased the scheduler's win (docs/benchmarks.md
        "Serving schedulers"). Pool HBM: one extra batch of cross-KV
        (~3 GB at large-v3 B24 int8)."""
        model = self.model
        group = [pending.popleft()
                 for _ in range(min(self.bs, len(pending)))]
        mels = np.stack([s.window.mel for s in group], axis=0)
        if len(group) < self.bs:
            mels = np.concatenate(
                [mels, np.repeat(mels[-1:], self.bs - len(group), axis=0)],
                axis=0)
        mels_dev = model.shard_batch(jnp.asarray(mels))
        feats = model._encode_jit(model.params, mel=mels_dev)

        # per-row language: explicit option, else detect from the features
        if self.options.language is not None or not self.cfg.multilingual:
            langs = [self.options.language or "en"] * self.bs
        else:
            from .decoding import _detect_language_core

            idx, _ = _detect_language_core(model.params, self.cfg, feats)
            langs = [LANGUAGES[i] for i in np.asarray(idx)]
        for s, lang in zip(group, langs):
            s.language = lang

        self._pool_cross = encode_cross_core(model.params, self.cfg, feats,
                                             kv_dtype=self.kv_dtype)
        self._pool_slots = group
        self._pool_next = 0

    def _pool_remaining(self) -> int:
        return len(self._pool_slots) - self._pool_next

    def _draw_from_pool(self, size: int, count: int
                        ) -> Tuple[CBState, List[_Slot]]:
        """Prefill `count` pooled windows at fixed graph size `size` (padding
        rows repeat the first index; they are dropped at scatter time or
        marked finished by the caller for the initial fill)."""
        take = self._pool_slots[self._pool_next : self._pool_next + count]
        idx = np.zeros(size, np.int32)
        idx[: len(take)] = np.arange(self._pool_next,
                                     self._pool_next + len(take))
        self._pool_next += len(take)
        cross_rows = gather_cross_rows(self._pool_cross, jnp.asarray(idx))

        temps = np.asarray(
            [self.temperatures[min(s.temp_index, len(self.temperatures) - 1)]
             for s in take] + [0.0] * (size - len(take)), np.float32)
        langs = [s.language for s in take]
        langs += [langs[-1] if langs else "en"] * (size - len(take))
        prompted = [s.window.offset_frames == 0 for s in take]
        prompted += [False] * (size - len(take))
        initial, pads, sots = self._initial_tokens(langs, prompted)
        rows = prefill_from_cross_core(
            self.model.params, self.cfg, cross_rows, jnp.asarray(initial),
            jnp.asarray(temps), jnp.asarray(pads),
            jnp.asarray(sots), sample_len=self.sample_len,
            prompt_len=self.prompt_len, cache_len=self.cache_len,
            cache_dtype=self.cache_dtype,
            compute_dtype=self.model.params["decoder"]["token_embedding"].dtype)
        return rows, take

    def _harvest(self, host: Dict[str, np.ndarray], slot: int, entry: _Slot
                 ) -> Tuple[DecodingResult, bool]:
        """Build the DecodingResult for a finished row from the once-per-chunk
        host snapshot (per-row device reads would cost ~30 ms each through
        the axon relay); returns (result, needs_retry)."""
        tok = self.tokenizer
        opts = self.options
        sampled = host["tokens"][slot, self.prompt_len:]
        eot_pos = np.nonzero(sampled == tok.eot)[0]
        cut = int(eot_pos[0]) if len(eot_pos) else len(sampled)
        toks = sampled[:cut].tolist()
        text = tok.decode(toks).strip()
        n_sampled = max(int(host["n_sampled"][slot]), 1)
        temp = self.temperatures[
            min(entry.temp_index, len(self.temperatures) - 1)]
        result = DecodingResult(
            tokens=toks,
            text=text,
            language=entry.language,
            language_probs=None,
            avg_logprob=float(host["sum_lp"][slot]) / n_sampled,
            no_speech_prob=float(host["no_speech"][slot]),
            temperature=float(temp),
            compression_ratio=compression_ratio(text),
        )
        # quality gates (openai fallback semantics, as in transcribe_batch)
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
            bad = False  # silence: accept (skipped downstream)
        retry = bad and entry.temp_index + 1 < len(self.temperatures)
        return result, retry

    # -- main loop -----------------------------------------------------------

    def run(self, windows: List[Any], arrivals=None) -> None:
        """Decode every window; fills w.result.

        arrivals: optional OPEN-LOOP source — a zero-arg callable polled
        between chunks returning newly-arrived windows ([] when none yet,
        None once the stream is closed). This is the serving regime the
        scheduler exists for: requests join mid-flight and are prefilled
        into free slots without waiting for a batch boundary
        (benchmarks/serving_arrivals.py measures it against the static
        scheduler under Poisson load).
        """
        if not windows and arrivals is None:
            return
        # under a DP x TP mesh every jitted core (encode, prefill, chunk,
        # scatter) compiles with the model's sharding constraints — same
        # mechanism as the static path's mesh_context-wrapped entries
        with self.model.mesh_context():
            self._run(windows, arrivals)

    def _run(self, windows: List[Any], arrivals=None) -> None:
        import time as _time

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

        bs = self.bs
        active: List[Optional[_Slot]] = [None] * bs
        key = jax.random.PRNGKey(0)
        self._pool_slots: List[_Slot] = []
        self._pool_next = 0
        self._pool_cross = None

        # initial fill: wait for the first window(s) under an open-loop
        # source, then encode one full batch into the pool and draw it
        while not pending:
            poll_arrivals()
            if closed and not pending:
                return
            if not pending:
                _time.sleep(0.002)
        self._encode_pool(pending)
        state, group = self._draw_from_pool(bs, min(bs, self._pool_remaining()))
        for i, s in enumerate(group):
            active[i] = s
        if len(group) < bs:  # mark padded rows finished & inert
            mask = np.zeros(bs, bool)
            mask[len(group):] = True
            state = state._replace(finished=state.finished | jnp.asarray(mask))

        while True:
            poll_arrivals()
            if any(a is not None for a in active):
                state, key = decode_chunk_core(
                    self.model.params, self.cfg, state, key,
                    self.suppress_mask, self.blank_mask,
                    jnp.int32(self.max_init_idx), chunk=self.chunk,
                    use_timestamps=self.use_timestamps,
                    prompt_len=self.prompt_len, total_len=self.total_len)

            finished = np.asarray(state.finished)
            host = None
            if any(finished[s] for s in range(bs) if active[s] is not None):
                host = {  # one snapshot per chunk, shared by every harvest
                    "tokens": np.asarray(state.tokens),
                    "n_sampled": np.asarray(state.n_sampled),
                    "sum_lp": np.asarray(state.sum_lp),
                    "no_speech": np.asarray(state.no_speech),
                }
            for slot in range(bs):
                entry = active[slot]
                if entry is None or not finished[slot]:
                    continue
                result, retry = self._harvest(host, slot, entry)
                if retry:
                    entry.temp_index += 1
                    pending.append(entry)
                else:
                    entry.window.result = result
                active[slot] = None

            free = [s for s in range(bs) if active[s] is None]
            supply = self._pool_remaining() + len(pending)
            if supply and (len(free) >= self.refill
                           or all(a is None for a in active)):
                if self._pool_remaining() == 0:
                    self._encode_pool(pending)
                count = min(self.refill, len(free), self._pool_remaining())
                if _cb_log.isEnabledFor(logging.DEBUG):
                    _cb_log.debug("refill %s", _kv(
                        count=count, free=len(free), pending=len(pending),
                        pool=self._pool_remaining()))
                rows, group = self._draw_from_pool(self.refill, count)
                idx = np.full(self.refill, bs, np.int32)
                idx[: len(group)] = free[: len(group)]
                state = scatter_rows(state, rows, jnp.asarray(idx))
                for i, s in zip(idx[: len(group)], group):
                    active[int(i)] = s
            if (not pending and self._pool_remaining() == 0
                    and all(a is None for a in active)):
                if closed:
                    break
                # open-loop idle: every slot drained but the arrival stream
                # is still live — wait for work instead of spinning the
                # (finished) decode chunk against the device
                _time.sleep(0.002)
