"""Long-form transcription: 30 s windowing with timestamp-seek.

The reference truncates/zero-pads everything to EXACTLY one 30 s window and
discards the rest (/root/reference/Whisper/Whisper/ContentView.swift:57-60 —
`min(audio.count, input.count)` silently drops audio past 30 s). This module
implements the real Whisper long-form algorithm instead: slide a 30 s window,
decode it, advance the window to the last complete timestamped segment, carry
the decoded text as conditioning prompt, with the temperature-fallback quality
ladder (retry a window at higher temperature when the output is degenerate).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Union

import numpy as np

from .audio import load_audio, log_mel_spectrogram, pad_or_trim
from .config import (
    APPEND_PUNCTUATIONS,
    FRAMES_PER_SECOND,
    HOP_LENGTH,
    N_FRAMES,
    N_SAMPLES,
    PREPEND_PUNCTUATIONS,
    SAMPLE_RATE,
)
from .decoding import DecodingOptions, DecodingResult, decode
from .tokenizer import get_tokenizer


@dataclasses.dataclass
class Segment:
    id: int
    seek: int
    start: float
    end: float
    text: str
    tokens: List[int]
    temperature: float
    avg_logprob: float
    compression_ratio: float
    no_speech_prob: float
    words: Optional[List[Dict[str, Any]]] = None

    def to_dict(self) -> Dict[str, Any]:
        d = dataclasses.asdict(self)
        if d["words"] is None:
            del d["words"]
        return d


def seek_advance(tokens, ts_begin: int, segment_size: int) -> int:
    """openai's window-advance rule, in mel frames (input_stride == 2).

    Shared single source of truth between the sequential loop below and
    batched serving's speculative-seek verification (serve.transcribe_batch)
    — round-2 verdict #6: the two paths must agree on where window N+1
    starts or batched transcripts diverge from `transcribe()`.
    """
    tokens = np.asarray(tokens, dtype=np.int64)
    timestamp_tokens = tokens >= ts_begin
    single_timestamp_ending = (
        len(timestamp_tokens) >= 2
        and not timestamp_tokens[-2] and timestamp_tokens[-1])
    consecutive = np.where(timestamp_tokens[:-1] & timestamp_tokens[1:])[0] + 1
    if len(consecutive) > 0 and not single_timestamp_ending:
        last_ts_pos = int(tokens[int(consecutive[-1]) - 1]) - ts_begin
        # guard: a degenerate window whose last timestamp is 0.00 must still
        # advance, or the loop would never terminate
        return max(last_ts_pos * 2, 2)
    return segment_size


def window_segment_spans(tokens, ts_begin: int, time_offset: float,
                         segment_duration: float):
    """openai's in-window segmentation rule: split one window's tokens on
    consecutive-timestamp pairs into CLOSED segments (plus the final open
    one when the window ends on a single trailing timestamp); without any
    consecutive pair, the whole window is one segment whose end comes from
    the last non-zero timestamp (else segment_duration).

    Shared single source of truth between the sequential loop below and
    batched serving (serve._segments_from_result) — the counterpart of
    `seek_advance` for the segment-splitting half of the parity contract.
    Returns [(start_s, end_s, token_slice)] with token_slice an int64
    ndarray view including the surrounding timestamp tokens.
    """
    tokens = np.asarray(tokens, dtype=np.int64)
    is_ts = tokens >= ts_begin
    single_timestamp_ending = (len(is_ts) >= 2
                               and not is_ts[-2] and is_ts[-1])
    consecutive = np.where(is_ts[:-1] & is_ts[1:])[0] + 1
    spans = []
    if len(consecutive) > 0:
        slices = consecutive.tolist()
        if single_timestamp_ending:
            slices.append(len(tokens))
        last = 0
        for cur in slices:
            sliced = tokens[last:cur]
            start_pos = int(sliced[0]) - ts_begin
            end_pos = int(sliced[-1]) - ts_begin
            spans.append((time_offset + start_pos * 0.02,
                          time_offset + end_pos * 0.02, sliced))
            last = cur
    else:
        duration = segment_duration
        ts_in = tokens[is_ts]
        if len(ts_in) > 0 and int(ts_in[-1]) != ts_begin:
            duration = (int(ts_in[-1]) - ts_begin) * 0.02
        spans.append((time_offset, time_offset + duration, tokens))
    return spans


# openai's hallucination heuristics (transcribe.py v20231117): a word is
# anomalous when improbable or implausibly short/long; a segment is a
# likely hallucination when its first non-punctuation words are mostly
# anomalous. Reimplemented — openai-whisper is not importable here.
_ANOMALY_PUNCTUATION = "\"'“¿([{-\"'.。,，!！?？:：”)]}、"


def _word_anomaly_score(word: Dict[str, Any]) -> float:
    probability = word.get("probability", 0.0)
    duration = word["end"] - word["start"]
    score = 0.0
    if probability < 0.15:
        score += 1.0
    if duration < 0.133:
        score += (0.133 - duration) * 15
    if duration > 2.0:
        score += duration - 2.0
    return score


def _is_segment_anomaly(segment) -> bool:
    if segment is None or not getattr(segment, "words", None):
        return False
    words = [w for w in segment.words
             if w["word"] not in _ANOMALY_PUNCTUATION][:8]
    if not words:
        return False
    score = sum(_word_anomaly_score(w) for w in words)
    return score >= 3 or score + 0.01 >= len(words)


def _next_words_segment(segments):
    return next((s for s in segments if getattr(s, "words", None)), None)


def _get_end(segments) -> Optional[float]:
    """Timestamp of the last spoken word, else the last segment end."""
    return next(
        (w["end"] for s in reversed(segments)
         for w in reversed(getattr(s, "words", None) or [])),
        segments[-1].end if segments else None,
    )


def transcribe(
    model,
    audio: Union[str, np.ndarray],
    *,
    task: str = "transcribe",
    language: Optional[str] = None,
    temperature: Union[float, Sequence[float]] = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
    compression_ratio_threshold: Optional[float] = 2.4,
    logprob_threshold: Optional[float] = -1.0,
    no_speech_threshold: Optional[float] = 0.6,
    condition_on_previous_text: bool = True,
    initial_prompt: Optional[str] = None,
    carry_initial_prompt: bool = False,
    without_timestamps: bool = False,
    word_timestamps: bool = False,
    prepend_punctuations: str = PREPEND_PUNCTUATIONS,
    append_punctuations: str = APPEND_PUNCTUATIONS,
    clip_timestamps: Union[str, Sequence[float]] = "0",
    hallucination_silence_threshold: Optional[float] = None,
    vad_filter: bool = False,
    vad_parameters=None,  # vad.VadOptions
    progress_callback=None,  # fn(seconds_done: float, total_seconds: float)
    verbose: Optional[bool] = None,
    draft_model=None,  # speculative decoding: a smaller WhisperModel sharing
    # the tokenizer drafts spec_k tokens per target verify step (greedy t=0
    # rungs only — speculative.py; pass spec_k=K in decode_options to tune;
    # spec_fallback=False in decode_options disables the per-call acceptance
    # governor that withholds a below-break-even draft)
    **decode_options,
) -> Dict[str, Any]:
    """Transcribe (or translate) audio of any length.

    Returns {"text", "segments", "language"} in the openai/whisper result
    schema.

    carry_initial_prompt: prepend initial_prompt to EVERY window's prompt
    (openai v20240930) instead of conditioning only the first window; the
    carried prefix plus the rolling context are bounded to the decoder's
    n_text_ctx//2 - 1 prompt budget.

    clip_timestamps: comma-separated string or list of start,end,start,end,…
    offsets in seconds — only audio inside these clips is transcribed (an
    odd count gets the content end appended; offsets are clamped to the
    audio). hallucination_silence_threshold (requires word_timestamps):
    when a decoded segment looks like a hallucination by openai's
    word-anomaly score, skip over surrounding silence longer than this many
    seconds instead of keeping the segment. Both follow openai/whisper
    transcribe.py (v20231117) semantics, reimplemented — openai-whisper is
    not importable in this environment.
    """
    cfg = model.cfg

    if isinstance(audio, str):
        audio = load_audio(audio)
    audio = np.asarray(audio, dtype=np.float32)
    if audio.ndim != 1:
        raise ValueError(f"transcribe expects mono audio, got {audio.shape}")

    if vad_filter:
        # energy VAD (vad.py) -> the standard clip_timestamps machinery:
        # only detected speech spans reach the decode loop
        if clip_timestamps != "0":
            raise ValueError(
                "vad_filter computes clip_timestamps itself; pass either "
                "vad_filter=True or explicit clip_timestamps, not both")
        from .vad import VadOptions, speech_clip_timestamps

        clips = speech_clip_timestamps(
            audio, options=vad_parameters or VadOptions())
        if not clips:
            return {"text": "", "segments": [],
                    "language": language or "en"}
        clip_timestamps = clips
        if verbose:
            spans = ", ".join(f"{clips[i]:.2f}-{clips[i+1]:.2f}"
                              for i in range(0, len(clips), 2))
            print(f"VAD speech spans: {spans}")

    # Full-length mel plus one window of trailing padding (so the final
    # window is always complete), openai semantics. The device length is
    # BUCKETED to a power-of-two count of 30 s chunks: an exact-length mel
    # graph would recompile for every distinct file duration (the recompile
    # class CLAUDE.md's prompt buckets exist to avoid); the mel is sliced
    # back to the true frame count, so downstream seek logic is unchanged.
    n_samples_ceil = ((len(audio) + HOP_LENGTH - 1) // HOP_LENGTH) * HOP_LENGTH
    chunks = max(1, -(-n_samples_ceil // N_SAMPLES))
    bucket_chunks = 1 << (chunks - 1).bit_length()
    padded = np.zeros(bucket_chunks * N_SAMPLES + N_SAMPLES, dtype=np.float32)
    padded[: len(audio)] = audio
    mel = np.asarray(log_mel_spectrogram(padded, n_mels=cfg.n_mels))
    mel = mel[..., : n_samples_ceil // HOP_LENGTH + N_FRAMES]
    content_frames = mel.shape[-1] - N_FRAMES
    content_duration = content_frames / FRAMES_PER_SECOND

    # --- language ---------------------------------------------------------
    if language is None:
        if not cfg.multilingual:
            language = "en"
        else:
            codes, _ = model.detect_language(
                np.asarray(pad_or_trim(mel[:, :N_FRAMES], N_FRAMES, axis=-1))[None])
            language = codes[0]
            if verbose:
                print(f"Detected language: {language}")

    tokenizer = get_tokenizer(cfg, language=language if cfg.multilingual else None,
                              task=task)

    temperatures = ([temperature] if isinstance(temperature, (int, float))
                    else list(temperature))

    all_tokens: List[int] = []
    all_segments: List[Segment] = []
    prompt_reset_since = 0

    # acceptance governor for the draft (speculative.SpecGovernor): one per
    # transcribe() call — long audio whose content the draft can't predict
    # would otherwise pay the measured below-break-even loss on EVERY window.
    # decode_options["spec_fallback"]=False opts out (matches ServeOptions).
    spec_gov = None
    spec_fallback = bool(decode_options.pop("spec_fallback", True))
    if draft_model is not None and spec_fallback:
        from . import speculative as _spec_mod

        spec_gov = _spec_mod.SpecGovernor(
            threshold=_spec_mod.break_even_tokens_per_iter(
                int(decode_options.get("spec_k", 4)), batch=1))

    remaining_prompt_length = cfg.n_text_ctx // 2 - 1
    if initial_prompt is not None:
        initial_prompt_tokens = tokenizer.encode(" " + initial_prompt.strip())
        all_tokens.extend(initial_prompt_tokens)
        remaining_prompt_length -= len(initial_prompt_tokens)
    else:
        initial_prompt_tokens = []

    def decode_with_fallback(segment_feats) -> DecodingResult:
        """segment_feats: (1, 1500, n_state) — encoded ONCE per window by the
        caller; the temperature ladder and the word-timestamp pass both reuse
        it (round-2 verdict: the old mel-in signature re-ran the encoder per
        retry and again for word timestamps)."""
        result: Optional[DecodingResult] = None
        if carry_initial_prompt:
            # openai v20240930: the initial prompt rides along in EVERY
            # window, ahead of a budget-bounded rolling context tail
            nignored = max(len(initial_prompt_tokens), prompt_reset_since)
            remaining = (all_tokens[nignored:][-remaining_prompt_length:]
                         if remaining_prompt_length > 0 else [])
            prompt = initial_prompt_tokens + remaining
        else:
            # always the tail since the last reset (openai): with
            # conditioning OFF the reset advances after every window,
            # so the initial_prompt conditions only window 1 — re-
            # feeding it to every window diverges from openai
            prompt = all_tokens[prompt_reset_since:]
        for t in temperatures:
            # openai ladder semantics: beam search only on the greedy rung
            # (t=0); the sampled rungs use best_of candidates instead
            rung_options = dict(decode_options)
            if t > 0:
                rung_options.pop("beam_size", None)
                rung_options.pop("patience", None)
            else:
                rung_options.pop("best_of", None)
            opts = DecodingOptions(
                task=task,
                language=language if cfg.multilingual else None,
                temperature=float(t),
                prompt=prompt or None,
                without_timestamps=without_timestamps,
                **rung_options,
            )
            # greedy rung verifies by argmax agreement; t>0 retry rungs keep
            # the draft via rejection sampling (round-5). best_of fan-outs
            # take the plain path inside decoding.py.
            use_draft = draft_model
            sampled_rung = float(t) > 0  # regime tag: greedy vs rejection
            if use_draft is not None and spec_gov is not None:
                if spec_gov.permit(sampled=sampled_rung):
                    from . import speculative as _spec_mod

                    _spec_mod.LAST_STATS = None  # observe only THIS decode
                else:
                    use_draft = None
            result = decode(model, segment_feats, opts, from_features=True,
                            tokenizer=None, draft=use_draft)[0]
            if spec_gov is not None:
                from . import speculative as _spec_mod

                if use_draft is not None:
                    spec_gov.observe(_spec_mod.LAST_STATS,
                                     sampled=sampled_rung)
                # plain AND spec walls feed the live break-even calibration
                spec_gov.observe_timing(_spec_mod.LAST_TIMING)

            needs_fallback = False
            if (compression_ratio_threshold is not None
                    and result.compression_ratio > compression_ratio_threshold):
                needs_fallback = True  # repetitive/degenerate
            if (logprob_threshold is not None
                    and result.avg_logprob < logprob_threshold):
                needs_fallback = True  # low confidence
            if (no_speech_threshold is not None
                    and result.no_speech_prob > no_speech_threshold):
                needs_fallback = False  # silence: accept and let caller skip
            if not needs_fallback:
                break
        assert result is not None
        return result

    # one timestamp token step = 0.02 s = 2 mel frames (input stride)
    ts_begin = cfg.timestamp_begin

    # --- clip windows (openai clip_timestamps semantics) ------------------
    if isinstance(clip_timestamps, str):
        clip_list = [float(ts) for ts in
                     (clip_timestamps.split(",") if clip_timestamps else [])]
    else:
        clip_list = [float(ts) for ts in clip_timestamps]
    seek_points = [
        min(max(0, round(ts * FRAMES_PER_SECOND)), content_frames)
        for ts in clip_list]
    if len(seek_points) == 0:
        seek_points = [0]
    if len(seek_points) % 2 == 1:
        seek_points.append(content_frames)
    seek_clips = list(zip(seek_points[::2], seek_points[1::2]))

    clip_idx = 0
    seek = seek_clips[0][0]
    last_speech_timestamp = 0.0

    while clip_idx < len(seek_clips):
        if progress_callback is not None:
            progress_callback(
                round(min(seek / FRAMES_PER_SECOND, content_duration), 2),
                round(content_duration, 2))
        seek_clip_start, seek_clip_end = seek_clips[clip_idx]
        if seek < seek_clip_start:
            seek = seek_clip_start
        if seek >= seek_clip_end:
            clip_idx += 1
            if clip_idx < len(seek_clips):
                seek = seek_clips[clip_idx][0]
            continue
        time_offset = seek / FRAMES_PER_SECOND
        window_end_time = (seek + N_FRAMES) / FRAMES_PER_SECOND
        segment_size = min(N_FRAMES, content_frames - seek,
                           seek_clip_end - seek)
        segment_duration = segment_size / FRAMES_PER_SECOND
        # openai slices the window at segment_size and ZERO-pads the mel
        # back to N_FRAMES (pad_or_trim): a final partial window decodes
        # against zero mel columns, NOT the silence-mel of the padded audio
        segment_mel = mel[:, seek : seek + segment_size]
        if segment_mel.shape[-1] < N_FRAMES:
            segment_mel = np.pad(
                segment_mel, ((0, 0), (0, N_FRAMES - segment_mel.shape[-1])))

        segment_feats = model.encode(segment_mel[None])
        result = decode_with_fallback(segment_feats)
        tokens = np.asarray(result.tokens, dtype=np.int64)

        if no_speech_threshold is not None:
            should_skip = result.no_speech_prob > no_speech_threshold
            if (logprob_threshold is not None
                    and result.avg_logprob > logprob_threshold):
                should_skip = False  # confident despite no_speech
            if should_skip:
                seek += segment_size
                continue

        previous_seek = seek
        current_segments: List[Segment] = []

        def new_segment(start: float, end: float, seg_tokens: np.ndarray):
            seg_tokens = seg_tokens.tolist()
            text_tokens = [t for t in seg_tokens if t < tokenizer.eot]
            current_segments.append(Segment(
                id=0,  # renumbered at the end
                seek=previous_seek,
                start=start,
                end=end,
                text=tokenizer.decode(text_tokens),
                tokens=seg_tokens,
                temperature=result.temperature,
                avg_logprob=result.avg_logprob,
                compression_ratio=result.compression_ratio,
                no_speech_prob=result.no_speech_prob,
            ))

        for span_start, span_end, sliced in window_segment_spans(
                tokens, ts_begin, time_offset, segment_duration):
            new_segment(span_start, span_end, sliced)
        # advance by the shared openai rule (also used by batched serving's
        # speculative-seek verification)
        seek += seek_advance(tokens, ts_begin, segment_size)
        is_ts = tokens >= ts_begin
        single_timestamp_ending = (
            len(is_ts) >= 2 and not is_ts[-2] and is_ts[-1])

        if word_timestamps and current_segments:
            from .timing import add_word_timestamps_to_segments

            # reuse the window's features — no duplicate encoder pass
            add_word_timestamps_to_segments(
                model, tokenizer, current_segments, segment_feats,
                num_frames=segment_size, time_offset=time_offset,
                language=language,
                prepend_punctuations=prepend_punctuations,
                append_punctuations=append_punctuations,
                last_speech_timestamp=last_speech_timestamp)
            if not single_timestamp_ending:
                last_word_end = _get_end(current_segments)
                if last_word_end is not None and last_word_end > time_offset:
                    # the last word's end is a better seek point than the
                    # last timestamp token (openai)
                    seek = round(last_word_end * FRAMES_PER_SECOND)

            # skip silence around likely hallucinations (openai rules)
            if hallucination_silence_threshold is not None:
                threshold = hallucination_silence_threshold
                if not single_timestamp_ending:
                    last_word_end = _get_end(current_segments)
                    if (last_word_end is not None
                            and last_word_end > time_offset):
                        remaining = window_end_time - last_word_end
                        if remaining > threshold:
                            seek = round(last_word_end * FRAMES_PER_SECOND)
                        else:
                            seek = previous_seek + segment_size

                # a hallucinated FIRST segment: drop the window and
                # re-decode past the leading silence
                first_segment = _next_words_segment(current_segments)
                if (first_segment is not None
                        and _is_segment_anomaly(first_segment)):
                    gap = first_segment.start - time_offset
                    if gap > threshold:
                        seek = previous_seek + max(
                            1, round(gap * FRAMES_PER_SECOND))
                        continue

                # a hallucination surrounded by silence (or by more
                # hallucinations): re-seek to it, drop it and the tail
                hal_last_end = last_speech_timestamp
                for si, segment in enumerate(current_segments):
                    if not getattr(segment, "words", None):
                        continue
                    if _is_segment_anomaly(segment):
                        next_seg = _next_words_segment(
                            current_segments[si + 1:])
                        if next_seg is not None:
                            hal_next_start = next_seg.words[0]["start"]
                        else:
                            hal_next_start = time_offset + segment_duration
                        silence_before = (
                            segment.start - hal_last_end > threshold
                            or segment.start < threshold
                            or segment.start - time_offset < 2.0)
                        silence_after = (
                            hal_next_start - segment.end > threshold
                            or _is_segment_anomaly(next_seg)
                            or window_end_time - segment.end < 2.0)
                        if silence_before and silence_after:
                            seek = round(
                                max(time_offset + 1, segment.start)
                                * FRAMES_PER_SECOND)
                            if content_duration - segment.end < threshold:
                                seek = content_frames
                            del current_segments[si:]
                            break
                    hal_last_end = segment.end

            last_word_end = _get_end(current_segments)
            if last_word_end is not None:
                last_speech_timestamp = last_word_end

        if seek <= previous_seek:
            # stall guard (openai has none and can re-decode the same
            # window forever at temperature 0 when a word-end refinement
            # rounds back to the window start): fall back to full advance
            seek = previous_seek + segment_size

        if verbose:
            for seg in current_segments:
                print(f"[{_fmt_time(seg.start)} --> {_fmt_time(seg.end)}]"
                      f" {seg.text}")

        # openai: instantaneous or text-less segments are kept but emptied
        # — their tokens must not condition later windows
        for seg in current_segments:
            if seg.start == seg.end or not seg.text.strip():
                seg.text = ""
                seg.tokens = []
                seg.words = [] if word_timestamps else None

        all_segments.extend(current_segments)
        for seg in current_segments:
            all_tokens.extend(seg.tokens)

        if not condition_on_previous_text or result.temperature > 0.5:
            # degenerate context is worse than none
            prompt_reset_since = len(all_tokens)

    for i, seg in enumerate(all_segments):
        seg.id = i

    return {
        # decode the FULL token stream once (openai): per-segment decode
        # would corrupt multi-byte UTF-8 characters whose byte-level BPE
        # tokens straddle a segment boundary
        "text": tokenizer.decode(
            [t for t in all_tokens[len(initial_prompt_tokens):]
             if t < tokenizer.eot]),
        "segments": [seg.to_dict() for seg in all_segments],
        "language": language,
        "duration": content_duration,
    }


def _fmt_time(seconds: float) -> str:
    m, s = divmod(seconds, 60.0)
    h, m = divmod(int(m), 60)
    return f"{h:02d}:{int(m):02d}:{s:06.3f}"
