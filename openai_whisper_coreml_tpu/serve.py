"""Batched serving: many audio streams through one device batch.

The reference serves exactly one utterance at a time on-device (tap-to-record
UI, /root/reference/Whisper/Whisper/ContentView.swift:30-68). Production TPU
serving is batch-first: this module packs 30 s windows from many requests into
fixed-size device batches (one compiled graph), decodes them together, and
reassembles per-request results.

Design notes (TPU-shaped):
  * window-level batching: long audio fans out into independent windows
    (chunk-parallel == data-parallel, SURVEY.md §2), so a single request
    never serialises the batch; conditioning-on-previous-text is OFF in
    batch mode (it would serialise windows; accuracy delta is small and
    documented by openai);
  * SPECULATIVE SEEK: windows are first decoded at fixed 30 s offsets
    (speculating full advance), then each request's seek chain is verified
    against the openai rule (transcribe.seek_advance) and mis-seeked
    windows are re-decoded in batched repair rounds. Output is
    token-identical to transcribe(condition_on_previous_text=False) at
    temperature 0 — including audio where a window's last complete segment
    ends mid-window;
  * fixed batch size with EOT-padding of underfull batches -> one XLA graph;
  * per-window no-speech skip and temperature fallback applied per window.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from . import speculative as _spec_mod
from .audio import log_mel_spectrogram
from .config import FRAMES_PER_SECOND, HOP_LENGTH, N_FRAMES
from .decoding import DecodingOptions, DecodingResult, decode
from .transcribe import Segment


def spec_governor(model, options: "ServeOptions") -> _spec_mod.SpecGovernor:
    """The model's acceptance governor, created on first use.

    Attached to the model instance so the verdict persists across
    transcribe_batch calls (the HTTP worker calls once per micro-batch);
    a dataclasses.replace(model, draft=...) starts a fresh governor, which
    is the right scope — a new draft pairing is new evidence. The threshold
    is fixed at creation from the first call's options (serving runs one
    option set; per-call thresholds would reset the evidence window).
    """
    gov = getattr(model, "_spec_governor", None)
    if gov is None:
        thr = options.spec_fallback_threshold
        # an explicit user threshold is PINNED (no live calibration); the
        # static-table prior self-calibrates from walled decodes at the
        # live geometry (SpecGovernor.observe_timing)
        pinned = thr is not None
        if thr is None:
            thr = _spec_mod.break_even_tokens_per_iter(
                options.spec_k, batch=options.batch_size)
        gov = _spec_mod.SpecGovernor(threshold=thr, pinned=pinned)
        model._spec_governor = gov
    return gov


@dataclasses.dataclass
class ServeOptions:
    batch_size: int = 8
    task: str = "transcribe"
    language: Optional[str] = None  # None -> per-request detection
    temperature: Sequence[float] = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0)
    beam_size: Optional[int] = None
    patience: Optional[float] = None  # beam: keep round(K*patience) finished
    length_penalty: Optional[float] = None  # beam ranking (GNMT); None=avg-lp
    # speculative decoding: when the model carries a paired draft
    # (WhisperModel.draft), greedy t=0 rungs under the STATIC scheduler run
    # the turbo-draft verify loop with this many proposals per step. The CB
    # engines keep the flat per-row loop (chunked per-row verify writes are
    # an un-built geometry; see docs/design.md).
    spec_k: int = 4
    # acceptance governor (speculative.SpecGovernor): withhold the draft
    # while measured tokens/iteration over recent batches sits below the
    # measured break-even (content the draft can't predict makes speculative
    # serving ~27% SLOWER — docs/benchmarks.md round 4), re-probing every
    # Nth withheld batch so recoveries re-enable it. threshold None ->
    # speculative.break_even_tokens_per_iter(spec_k, batch=batch_size)
    # (batch-aware: break-even RISES as batch shrinks — B1/B24 calibrations).
    spec_fallback: bool = True
    spec_fallback_threshold: Optional[float] = None
    without_timestamps: bool = False
    logprob_threshold: Optional[float] = -1.0
    no_speech_threshold: Optional[float] = 0.6
    compression_ratio_threshold: Optional[float] = 2.4
    sample_len: Optional[int] = None
    # "static": fixed batches, whole batch runs to its slowest window.
    # "continuous": mid-flight slot refill — per-row positions for greedy/
    # sampled decodes (serve_cb), per-GROUP positions for beam search
    # (serve_cb_beam: each slot is beam_size rows; t>0 retry rungs route
    # through the sampled engine). Wins whenever decode lengths are mixed.
    scheduler: str = "static"
    chunk_tokens: int = 32  # host round-trips amortised over this many steps
    refill_size: Optional[int] = None  # default: batch_size // 4
    kv_dtype: str = "bf16"  # "int8": quantised cross-KV (decoding.py)
    cache_dtype: str = "bf16"  # "int8": quantised self-attention cache
    # openai suppress_tokens semantics ("-1" = the non-speech set)
    suppress_tokens: Union[str, Sequence[int]] = "-1"
    # attach per-word timings to every segment (device-side alignment core,
    # timing.py): windows are re-encoded in batched encoder calls after the
    # seek chains are verified, then aligned per window
    word_timestamps: bool = False
    # conditions each request's FIRST window (openai initial_prompt with
    # conditioning off — batched serving never conditions on previous text).
    # Supported everywhere: static greedy/sampled (per-row prompts), static
    # beam (uniform prompted/unprompted partition), CB greedy (per-row
    # prompt buckets) and CB beam (per-group prompted layout)
    initial_prompt: Optional[str] = None
    # energy-VAD window gating (vad.py): 30 s windows whose audio holds no
    # detected speech never reach the decoder — they act exactly like an
    # openai no-speech skip (full advance, no segments). Throughput win on
    # sparse audio; opt-in because an energy VAD can drop very quiet speech
    vad_filter: bool = False

    def __post_init__(self):
        # scalar temperature is valid everywhere transcribe() accepts one
        # (HTTP clients POST {"temperature": 0.0}); normalise to the ladder
        # shape the decode loops iterate
        if isinstance(self.temperature, (int, float)):
            self.temperature = (float(self.temperature),)
        if self.word_timestamps and self.without_timestamps:
            raise ValueError(
                "word_timestamps requires timestamps (without_timestamps "
                "must be False)")


@dataclasses.dataclass
class _Window:
    request_id: int
    offset_frames: int
    mel: np.ndarray  # (n_mels, N_FRAMES)
    result: Optional[DecodingResult] = None


def _window_mel(mel: np.ndarray, seek: int, content_frames: int) -> np.ndarray:
    """One window's mel, openai pad_or_trim semantics: slice only up to the
    content end and ZERO-pad back to N_FRAMES (transcribe()'s loop does the
    same — the silence-mel columns of the padded audio are not used)."""
    size = max(0, min(N_FRAMES, content_frames - seek))
    seg = mel[:, seek : seek + size]
    if seg.shape[-1] < N_FRAMES:
        seg = np.pad(seg, ((0, 0), (0, N_FRAMES - seg.shape[-1])))
    return seg


def _windows_for(audio: np.ndarray, n_mels: int, request_id: int,
                 mel: Optional[np.ndarray] = None) -> List[_Window]:
    n = len(audio)
    if mel is None:
        n_ceil = ((n + HOP_LENGTH - 1) // HOP_LENGTH) * HOP_LENGTH
        padded = np.zeros(n_ceil + N_FRAMES * HOP_LENGTH, dtype=np.float32)
        padded[:n] = audio
        mel = np.asarray(log_mel_spectrogram(padded, n_mels=n_mels))
    content_frames = -(-n // HOP_LENGTH)  # == mel width minus the 30 s pad
    out = []
    for seek in range(0, max(content_frames, 1), N_FRAMES):
        out.append(_Window(request_id, seek,
                           _window_mel(mel, seek, content_frames)))
    return out


def _batched_mels(arrays: List[np.ndarray], n_mels: int
                  ) -> List[np.ndarray]:
    """Mel spectrograms for many requests in batched device calls.

    Per-request batch-1 mel calls cost ~30 ms dispatch each through the axon
    relay (CLAUDE.md) — for a 96-request batch that is pure overhead at the
    same order as the decode itself (measured: the serving benchmark spent
    more time in the frontend than in the decoder before this). Group
    same-padded-length requests and run ONE device call per group.
    """
    pad_lens, padded = [], []
    for a in arrays:
        n_ceil = ((len(a) + HOP_LENGTH - 1) // HOP_LENGTH) * HOP_LENGTH
        total = n_ceil + N_FRAMES * HOP_LENGTH
        p = np.zeros(total, dtype=np.float32)
        p[: len(a)] = a
        pad_lens.append(total)
        padded.append(p)
    mels: List[Optional[np.ndarray]] = [None] * len(arrays)
    by_len: Dict[int, List[int]] = {}
    for i, t in enumerate(pad_lens):
        by_len.setdefault(t, []).append(i)
    group_cap = 64  # bounds the device-call footprint (~2.5 GB audio f32)
    for t, idxs in by_len.items():
        for start in range(0, len(idxs), group_cap):
            part = idxs[start : start + group_cap]
            stack = np.stack([padded[i] for i in part], axis=0)
            if len(idxs) > group_cap and len(part) < group_cap:
                # pad the tail of a capped sequence to the cap so it reuses
                # the same compiled graph instead of compiling a new size
                stack = np.concatenate(
                    [stack, np.repeat(stack[-1:], group_cap - len(part), 0)],
                    axis=0)
            out = np.asarray(log_mel_spectrogram(stack, n_mels=n_mels))
            for j, i in enumerate(part):
                mels[i] = out[j]
    return mels  # type: ignore[return-value]


def transcribe_batch(
    model,
    audios: Sequence[Union[np.ndarray, str]],
    options: ServeOptions = ServeOptions(),
) -> List[Dict[str, Any]]:
    """Transcribe many independent audio arrays/files at once.

    Returns one openai-schema result dict per input.
    """
    from .audio import load_audio

    arrays: List[np.ndarray] = []
    for a in audios:
        if isinstance(a, str):
            a = load_audio(a)
        arrays.append(np.asarray(a, np.float32))

    # fan out to windows (mel frontend batched across requests)
    import time as _time

    _t0 = _time.perf_counter()
    mels = _batched_mels(arrays, model.cfg.n_mels)
    _mel_s = _time.perf_counter() - _t0
    if os.environ.get("WHISPER_TPU_SERVE_TIMING"):
        from .utils.obs import get_logger, kv

        get_logger("serve").info("mel frontend %s", kv(
            seconds=round(_mel_s, 2), requests=len(arrays)))
    if options.scheduler not in ("static", "continuous"):
        raise ValueError(f"unknown scheduler {options.scheduler!r}")
    use_cb = options.scheduler == "continuous"

    def decode_round(wins: List[_Window]) -> None:
        if use_cb and options.beam_size is not None:
            from .serve_cb import ContinuousBatcher
            from .serve_cb_beam import BeamContinuousBatcher

            # t=0 rung under group-level continuous batching; gate failures
            # requeue into the sampled engine for the t>0 rungs (openai
            # ladder semantics: beam only on the greedy rung)
            retries = BeamContinuousBatcher(model, options).run(wins)
            t_rest = tuple(t for t in options.temperature if t > 0)
            if retries and t_rest:
                opts2 = dataclasses.replace(options, temperature=t_rest,
                                            beam_size=None)
                ContinuousBatcher(model, opts2).run(retries)
        elif use_cb:
            from .serve_cb import ContinuousBatcher

            ContinuousBatcher(model, options).run(wins)
        else:
            _decode_windows_static(model, wins, options)

    # -- speculative seek (round-2 verdict #6) -----------------------------
    # openai's transcribe() advances window N+1 to where window N's LAST
    # complete segment ended — a data dependency that would serialise the
    # batch. Instead: SPECULATE that every window advances fully (decode all
    # fixed 30 s offsets in one batched round), then verify each request's
    # seek chain with the shared transcribe.seek_advance rule and decode any
    # window whose true offset differs, again batched across requests, until
    # every chain is closed. Typical speech seeks nearly-full windows, so
    # repair rounds are rare; the result is token-parity with
    # transcribe(condition_on_previous_text=False).
    from .transcribe import seek_advance

    content = [-(-len(a) // HOP_LENGTH) for a in arrays]
    ts_begin = model.cfg.timestamp_begin
    decoded: Dict[tuple, DecodingResult] = {}

    def window_at(rid: int, seek: int) -> _Window:
        return _Window(rid, seek, _window_mel(mels[rid], seek, content[rid]))

    def walk(rid: int):
        """Follow request rid's seek chain; returns (chain, missing_seek).
        chain entries: (seek, result, segment_size)."""
        chain, seek = [], 0
        while seek < content[rid]:
            r = decoded.get((rid, seek))
            if r is None:
                return chain, seek
            seg_size = min(N_FRAMES, content[rid] - seek)
            chain.append((seek, r, seg_size))
            if _window_skipped(r, options):
                seek += seg_size  # silence: skip, advance fully
            else:
                seek += seek_advance(r.tokens, ts_begin, seg_size)
        return chain, None

    speech_spans = None
    if options.vad_filter:
        from .vad import detect_speech

        speech_spans = [detect_speech(a) for a in arrays]

    def _window_is_silent(w: _Window) -> bool:
        if speech_spans is None:
            return False
        ws = w.offset_frames / FRAMES_PER_SECOND
        we = ws + min(N_FRAMES, content[w.request_id]
                      - w.offset_frames) / FRAMES_PER_SECOND
        return not any(s < we and e > ws
                       for s, e in speech_spans[w.request_id])

    # a VAD-gated window behaves exactly like an openai no-speech skip:
    # high no_speech_prob (skipped under the default threshold -> full
    # advance), low avg_logprob, no tokens (empty segment if thresholds
    # off). language="" so silence casts NO language-detection vote — a
    # mostly-silent multilingual file must not auto-detect toward silence
    silent_result = DecodingResult(
        tokens=[], text="", language="",
        language_probs=None, avg_logprob=-10.0, no_speech_prob=1.0,
        temperature=0.0, compression_ratio=0.0)

    pending_windows = [w for rid in range(len(arrays))
                       for w in (_windows_for(arrays[rid], model.cfg.n_mels,
                                              rid, mel=mels[rid]))]
    # safety valve for degenerate streams that advance 2 frames per window
    # (transcribe() crawls the same way, one window at a time; here we bound
    # the extra batched rounds and log the truncation instead of crawling)
    max_extra = 16 * len(arrays) + 256
    while pending_windows:
        to_decode = pending_windows
        if speech_spans is not None:
            to_decode = []
            for w in pending_windows:
                if _window_is_silent(w):
                    w.result = silent_result
                else:
                    to_decode.append(w)
        if to_decode:
            decode_round(to_decode)
        for w in pending_windows:
            decoded[(w.request_id, w.offset_frames)] = w.result
        pending_windows = []
        for rid in range(len(arrays)):
            _, missing = walk(rid)
            if missing is not None:
                pending_windows.append(window_at(rid, missing))
        if pending_windows and len(decoded) > max_extra + sum(
                -(-c // N_FRAMES) for c in content):
            from .utils.obs import get_logger

            get_logger("serve").warning(
                "speculative seek repair truncated after %d windows "
                "(degenerate timestamps); remaining chains end early",
                len(decoded))
            break

    chains = [walk(rid)[0] for rid in range(len(arrays))]
    return _reassemble(model, arrays, chains, options, mels=mels,
                       content=content)


def _decode_windows_static(model, windows: List[_Window],
                           options: ServeOptions) -> None:
    """Fixed-size batches + per-window temperature-fallback ladder."""
    bs = options.batch_size
    prompt_tokens: Optional[List[int]] = None
    if options.initial_prompt:
        from .tokenizer import get_tokenizer

        tok = get_tokenizer(
            model.cfg,
            language=options.language if model.cfg.multilingual else None)
        # openai encoding rule: " " + stripped prompt text
        prompt_tokens = tok.encode(" " + options.initial_prompt.strip())
    base_opts = dict(
        task=options.task,
        language=options.language,
        beam_size=options.beam_size,
        patience=options.patience,
        length_penalty=options.length_penalty,
        without_timestamps=options.without_timestamps,
        sample_len=options.sample_len,
        kv_dtype=options.kv_dtype,
        cache_dtype=options.cache_dtype,
        suppress_tokens=options.suppress_tokens,
        spec_k=options.spec_k,
    )

    if prompt_tokens is not None and options.beam_size is not None:
        # beam search assumes one shared pad/sot layout per decode call
        # (decoding.py rejects per-sample prompts under beam). Equivalent
        # batching: partition into prompted (offset-0) and unprompted
        # windows and give each group a UNIFORM prompt — token-identical
        # to the per-row path, two graphs instead of one.
        first = [w for w in windows if w.offset_frames == 0]
        rest = [w for w in windows if w.offset_frames != 0]
        for group, ptoks in ((first, prompt_tokens), (rest, None)):
            if group:
                _decode_window_batches(model, group, options, base_opts, bs,
                                       ptoks, uniform=True)
        return
    _decode_window_batches(model, windows, options, base_opts, bs,
                           prompt_tokens)


def _decode_window_batches(model, windows: List[_Window], options,
                           base_opts, bs: int,
                           prompt_tokens: Optional[List[int]],
                           uniform: bool = False) -> None:
    # pad the tail batch by repeating the last window (one compiled graph)
    for start in range(0, len(windows), bs):
        chunk = windows[start : start + bs]
        batch_mels = np.stack([w.mel for w in chunk], axis=0)
        if len(chunk) < bs:
            pad = np.repeat(batch_mels[-1:], bs - len(chunk), axis=0)
            batch_mels = np.concatenate([batch_mels, pad], axis=0)

        chunk_opts = dict(base_opts)
        if prompt_tokens is not None and uniform:
            # pre-partitioned group (beam path): every row shares the prompt
            chunk_opts["prompt"] = list(prompt_tokens)
        elif prompt_tokens is not None:
            # per-row prompts: only each request's FIRST window (offset 0)
            # is conditioned, matching transcribe(initial_prompt=...,
            # condition_on_previous_text=False); pad rows get None
            rows = [prompt_tokens if w.offset_frames == 0 else None
                    for w in chunk]
            rows += [None] * (bs - len(chunk))
            if any(r is not None for r in rows):
                chunk_opts["prompt"] = rows

        results: List[Optional[DecodingResult]] = [None] * len(chunk)
        pending = list(range(len(chunk)))
        for t in options.temperature:
            if not pending:
                break
            # openai ladder rung semantics (matches transcribe()): beam
            # search runs only on the greedy t=0 rung; t>0 rungs fall back
            # to sampling so a degenerate beam result can actually change
            rung = dict(chunk_opts)
            if t > 0:
                rung["beam_size"] = None
            # paired draft (WhisperModel.draft): greedy rungs go speculative,
            # subject to the acceptance governor's break-even verdict
            # (getattr: serve accepts duck-typed models without the field)
            # the draft rides every non-beam rung: greedy rungs verify by
            # argmax agreement, t>0 fallback rungs by rejection sampling
            # (round-5; decoding.py routes best_of fan-outs to plain)
            draft = (getattr(model, "draft", None)
                     if rung.get("beam_size") is None else None)
            # the governor exists whenever a draft is paired; it also
            # ingests PLAIN decode walls (withheld batches, t>0 rungs) for
            # the live break-even calibration
            gov = (spec_governor(model, options)
                   if getattr(model, "draft", None) is not None
                   and options.spec_fallback else None)
            sampled_rung = float(t) > 0
            if gov is not None and draft is not None:
                if gov.permit(sampled=sampled_rung):
                    _spec_mod.LAST_STATS = None  # observe only THIS decode
                else:
                    draft = None
            res = decode(model, batch_mels,
                         DecodingOptions(temperature=float(t), **rung),
                         draft=draft)
            if gov is not None and draft is not None:
                gov.observe(_spec_mod.LAST_STATS, sampled=sampled_rung)
            if gov is not None:
                gov.observe_timing(_spec_mod.LAST_TIMING)
            still: List[int] = []
            for i in pending:
                r = res[i]
                bad = False
                if (options.compression_ratio_threshold is not None
                        and r.compression_ratio
                        > options.compression_ratio_threshold):
                    bad = True
                if (options.logprob_threshold is not None
                        and r.avg_logprob < options.logprob_threshold):
                    bad = True
                if (options.no_speech_threshold is not None
                        and r.no_speech_prob > options.no_speech_threshold):
                    bad = False  # silence: accept, skipped below
                if bad:
                    still.append(i)
                else:
                    results[i] = r
            pending = still
        for i in pending:  # all temperatures failed: keep the last attempt
            results[i] = res[i]
        for w, r in zip(chunk, results):
            w.result = r


def _window_skipped(r: DecodingResult, options: ServeOptions) -> bool:
    """openai no-speech skip rule (identical to transcribe())."""
    return (options.no_speech_threshold is not None
            and r.no_speech_prob > options.no_speech_threshold
            and not (options.logprob_threshold is not None
                     and r.avg_logprob > options.logprob_threshold))


def _reassemble(model, arrays, chains, options,
                mels: Optional[List[np.ndarray]] = None,
                content: Optional[List[int]] = None) -> List[Dict[str, Any]]:
    """Stitch each request's verified seek chain into per-request outputs.

    chains[rid]: ordered (seek, DecodingResult, segment_size) entries from
    the speculative-seek walk — the same windows transcribe() would decode.
    mels/content back the optional word-timestamp pass (windows are
    re-encoded in batched encoder calls, then aligned per window on device).
    """
    out: List[Dict[str, Any]] = []
    for rid, arr in enumerate(arrays):
        segs: List[Segment] = []
        align_jobs: List[Tuple[List[Segment], int, int]] = []
        language_votes: Dict[str, float] = {}
        for seek, r, seg_size in chains[rid]:
            if r is None:
                continue
            if r.language_probs:
                for code, p in r.language_probs.items():
                    language_votes[code] = language_votes.get(code, 0.0) + p
            elif r.language:
                # continuous scheduler: per-window detected code without the
                # full probability dict — still a vote (else detected
                # languages would silently fall back to "en")
                language_votes[r.language] = (
                    language_votes.get(r.language, 0.0) + 1.0)
            if _window_skipped(r, options):
                continue
            time_offset = seek / FRAMES_PER_SECOND
            win_segs = _segments_from_result(
                model.cfg, r, time_offset, seek,
                segment_duration=seg_size / FRAMES_PER_SECOND)
            segs.extend(win_segs)
            if options.word_timestamps and win_segs:
                align_jobs.append((win_segs, seek, seg_size))
        for i, s in enumerate(segs):
            s.id = i
        language = (options.language
                    or (max(language_votes, key=language_votes.get)
                        if language_votes else "en"))
        if align_jobs and mels is not None:
            _align_words(model, align_jobs, mels[rid],
                         content[rid], language, options)
        out.append({
            "text": "".join(s.text for s in segs),
            "segments": [s.to_dict() for s in segs],
            "language": language,
            "duration": len(arr) / 16_000,
        })
    return out


def _align_words(model, align_jobs, mel: np.ndarray, content_frames: int,
                 language: str, options: ServeOptions) -> None:
    """Word-timestamp pass for one request: re-encode its decoded windows
    in fixed-size batched encoder calls (the decode rounds do not retain
    features — at large-v3 that would hold ~7 MB bf16 per in-flight window),
    then align ALL windows of the chunk in batched device calls
    (timing.find_word_alignment_batch — full windows share one alignment
    forward per token bucket). Only the boundary-refinement heuristics,
    which thread last-speech state across windows, run sequentially."""
    from .timing import add_word_timestamps_to_segments
    from .timing import find_word_alignment_batch
    from .tokenizer import get_tokenizer

    lang = language if model.cfg.multilingual else None
    tok = get_tokenizer(model.cfg, language=lang)
    bs = options.batch_size
    last_speech = 0.0
    for start in range(0, len(align_jobs), bs):
        chunk = align_jobs[start : start + bs]
        stack = np.stack([_window_mel(mel, seek, content_frames)
                          for _, seek, _ in chunk], axis=0)
        if len(chunk) < bs:  # repeat-pad: one compiled encoder graph
            pad = np.repeat(stack[-1:], bs - len(chunk), axis=0)
            stack = np.concatenate([stack, pad], axis=0)
        feats = model.encode(stack)
        jobs = [([t for seg in win_segs for t in seg.tokens if t < tok.eot],
                 feats[i], seg_size)
                for i, (win_segs, _, seg_size) in enumerate(chunk)]
        aligned = find_word_alignment_batch(model, tok, jobs, language=lang)
        for i, (win_segs, seek, seg_size) in enumerate(chunk):
            if not jobs[i][0]:
                continue
            add_word_timestamps_to_segments(
                model, tok, win_segs, feats[i], num_frames=seg_size,
                time_offset=seek / FRAMES_PER_SECOND, language=lang,
                last_speech_timestamp=last_speech, timings=aligned[i])
            ends = [w["end"] for s in win_segs for w in (s.words or [])]
            if ends:  # silence-gap heuristic threads across windows,
                last_speech = ends[-1]  # matching sequential transcribe()


def _segments_from_result(cfg, r: DecodingResult, time_offset: float,
                          seek: int, segment_duration: float
                          ) -> List[Segment]:
    """Split one window's tokens into timestamped segments — EXACTLY the
    transcribe() in-window rule: with consecutive-timestamp pairs, only the
    CLOSED segments are emitted (plus the final open one when the window
    ends on a single trailing timestamp); the incomplete tail is dropped
    because the verified seek chain re-decodes that audio in the next
    window. This is what keeps batched output token-identical to
    transcribe(condition_on_previous_text=False)."""
    from .tokenizer import get_tokenizer
    from .transcribe import window_segment_spans

    tok = get_tokenizer(cfg, language=r.language if cfg.multilingual else None)
    tokens = np.asarray(r.tokens, dtype=np.int64)
    # NB: an empty decode still yields one empty-text segment spanning the
    # window — transcribe()'s loop does the same, and dropping it here would
    # break batched-vs-sequential parity for windows that EOT immediately.

    def seg(start, end, toks):
        text_toks = [int(t) for t in toks if t < tok.eot]
        return Segment(
            id=0, seek=seek, start=start, end=end,
            text=tok.decode(text_toks), tokens=[int(t) for t in toks],
            temperature=r.temperature, avg_logprob=r.avg_logprob,
            compression_ratio=r.compression_ratio,
            no_speech_prob=r.no_speech_prob)

    segs = [seg(start, end, toks) for start, end, toks in
            window_segment_spans(tokens, cfg.timestamp_begin, time_offset,
                                 segment_duration)]
    # openai clears instantaneous/text-less segments (transcribe()'s loop
    # does the same; the cleared tokens also stay out of conditioning there)
    for s in segs:
        if s.start == s.end or not s.text.strip():
            s.text = ""
            s.tokens = []
    return segs
