"""Streaming transcription: incremental decoding with LocalAgreement.

The reference records a fixed 10 s clip, then processes it offline
(/root/reference/Whisper/Whisper/ContentView.swift:40-68). Real-time serving
needs incremental output: this module re-decodes a sliding window as audio
arrives and CONFIRMS the longest common prefix of the last `agreement`
hypotheses (the LocalAgreement-n policy from the streaming-Whisper
literature), so emitted text never retracts.

Buffer policy: when the rolling buffer approaches 30 s, confirmed text is
committed (it becomes the conditioning prompt) and the last ~10 s of audio
are kept as context for the still-unconfirmed tail. Streaming decodes run
without timestamps, so the kept audio cannot be cut exactly at the confirmed
boundary; re-transcription of already-emitted audio is suppressed by a
one-shot overlap check against the tail of emitted tokens (first
confirmation after each trim). All decoding reuses the batch-of-one jitted
graphs from decoding.py (no new compilation beyond the first call).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from .audio import pad_or_trim
from .config import N_SAMPLES, SAMPLE_RATE
from .decoding import DecodingOptions, decode

# Per-tick decode-length buckets. Each (prompt_bucket, sample_len) pair is
# one compiled decode graph; coarse buckets keep the compile count tiny while
# letting short buffers decode a short horizon (tick latency scales ~linearly
# with sample_len — docs/benchmarks.md "Streaming latency").
_SAMPLE_BUCKETS = (32, 64, 128, 224)


@dataclasses.dataclass
class StreamEvent:
    """A piece of newly-confirmed transcript."""

    text: str
    tokens: List[int]
    is_final: bool = False


class StreamingTranscriber:
    """Feed audio chunks; receive confirmed transcript increments.

    Usage:
        st = StreamingTranscriber(model, language="en")
        for chunk in audio_chunks:          # arbitrary-size float32 @16k
            for ev in st.feed(chunk):
                print(ev.text, end="", flush=True)
        for ev in st.finish():
            print(ev.text)
    """

    def __init__(
        self,
        model,
        *,
        language: Optional[str] = "en",
        task: str = "transcribe",
        agreement: int = 2,
        decode_interval: float = 1.0,
        sample_len: Optional[int] = None,
        temperature: float = 0.0,
        beam_size: Optional[int] = None,
        max_tokens_per_second: Optional[float] = 8.0,
        vad_gate: bool = False,
        draft_model=None,
        spec_k: int = 4,
    ) -> None:
        """max_tokens_per_second bounds each tick's decode horizon by the
        audio actually buffered (dense English speech is ~3-4 BPE tokens/s;
        8/s is a 2x margin). A 2 s buffer then decodes <=32 tokens instead of
        the full 224-token horizon — the dominant per-tick latency term at
        batch 1. None disables the cap (always decode the full horizon).

        vad_gate: skip a due decode tick entirely when the rolling buffer
        contains no speech by the energy VAD (vad.py) — a silent buffer
        costs a full device round-trip only to decode hallucination fuel.
        The tick fires as soon as speech appears.

        draft_model: speculative decoding for the tick decodes (greedy
        only; speculative.py). Batch-1 streaming is the regime where the
        draft pays most — the tick is one long serial decode whose matvecs
        the verify step turns into M=spec_k+1 matmuls. Tick decodes ride
        the same acceptance governor as serving (speculative.SpecGovernor,
        one per stream): content the draft can't predict would otherwise
        pay the measured below-break-even loss on EVERY tick."""
        if agreement < 1:
            raise ValueError("agreement must be >= 1")
        self.model = model
        self.language = language
        self.agreement = agreement
        self.decode_interval = decode_interval
        self.max_tokens_per_second = max_tokens_per_second
        self.vad_gate = vad_gate
        self.draft_model = draft_model
        self._spec_gov = None
        if draft_model is not None:
            from . import speculative as _spec_mod

            self._spec_gov = _spec_mod.SpecGovernor(
                threshold=_spec_mod.break_even_tokens_per_iter(
                    spec_k, batch=1))
        self.opts = dict(
            task=task,
            language=language,
            temperature=temperature,
            sample_len=sample_len,
            beam_size=beam_size,
            without_timestamps=True,
            spec_k=spec_k,
        )
        self._buffer = np.zeros(0, np.float32)
        self._since_decode = 0  # samples fed since last decode
        self._confirmed: List[int] = []  # confirmed tokens for current buffer
        self._hyps: List[List[int]] = []  # recent hypotheses
        self._prompt: List[int] = []  # committed text (conditioning)
        self._emitted_tail: List[int] = []  # recent emitted ids (dedup)
        self._dedup_pending = False  # set by a trim that kept emitted audio
        self._tokenizer = None

    # -- internals ----------------------------------------------------------

    def _tok(self):
        if self._tokenizer is None:
            from .tokenizer import get_tokenizer

            self._tokenizer = get_tokenizer(
                self.model.cfg,
                language=self.language if self.model.cfg.multilingual else None)
        return self._tokenizer

    def _tick_sample_len(self) -> Optional[int]:
        """Decode horizon for this tick: user sample_len capped by buffered
        audio duration, rounded up to a compile bucket."""
        base = self.opts["sample_len"]
        if not self.max_tokens_per_second:
            return base
        secs = len(self._buffer) / SAMPLE_RATE
        need = int(np.ceil(secs * self.max_tokens_per_second)) + 8
        cap = next((b for b in _SAMPLE_BUCKETS if need <= b), None)
        if cap is None:
            return base
        return min(base, cap) if base else cap

    def _decode_window(self) -> List[int]:
        mel = self.model.log_mel(pad_or_trim(self._buffer))
        opts = dict(self.opts, sample_len=self._tick_sample_len())
        draft = self.draft_model
        # one fixed temperature per stream (no ladder): every tick is the
        # same verification regime, tagged so its acceptance evidence lands
        # in the matching governor window
        sampled = float(opts.get("temperature", 0.0) or 0.0) > 0
        if draft is not None and self._spec_gov is not None:
            from . import speculative as _spec_mod

            if self._spec_gov.permit(sampled=sampled):
                _spec_mod.LAST_STATS = None  # observe only THIS decode
            else:
                draft = None
        res = decode(
            self.model, np.asarray(mel)[None],
            DecodingOptions(prompt=self._prompt or None, **opts),
            draft=draft)[0]
        if self._spec_gov is not None:
            from . import speculative as _spec_mod

            if draft is not None:
                self._spec_gov.observe(_spec_mod.LAST_STATS, sampled=sampled)
            # plain (withheld) AND spec tick walls calibrate break-even
            self._spec_gov.observe_timing(_spec_mod.LAST_TIMING)
        return res.tokens

    @staticmethod
    def _common_prefix(seqs: List[List[int]]) -> List[int]:
        if not seqs:
            return []
        out = []
        for vals in zip(*seqs):
            if all(v == vals[0] for v in vals):
                out.append(vals[0])
            else:
                break
        return out

    def _confirm(self) -> List[int]:
        """Run one decode, update hypothesis history, return newly-confirmed
        tokens."""
        return self._update_with_hyp(self._decode_window())

    def _update_with_hyp(self, hyp: List[int]) -> List[int]:
        """LocalAgreement update for one new hypothesis (split out so a
        batched multi-stream driver can decode many windows in one device
        call and inject each stream's hypothesis here)."""
        self._hyps.append(hyp)
        self._hyps = self._hyps[-self.agreement :]
        if len(self._hyps) < self.agreement:
            return []
        prefix = self._common_prefix(self._hyps)
        if len(prefix) <= len(self._confirmed):
            return []
        new = prefix[len(self._confirmed) :]
        self._confirmed = prefix
        return new

    def _maybe_trim(self) -> None:
        """Keep the rolling buffer under 30 s by committing confirmed text."""
        if len(self._buffer) <= N_SAMPLES - SAMPLE_RATE:  # 1 s headroom
            return
        if not self._confirmed:
            # nothing confirmed: hard-trim the oldest 10 s (content there is
            # unconfirmable anyway once it leaves the window)
            drop = 10 * SAMPLE_RATE
            self._buffer = self._buffer[drop:]
            self._hyps.clear()
            return
        # commit everything confirmed, keep the last ~10 s of audio as
        # context for the still-unconfirmed tail. The kept audio may cover
        # text that was already emitted (no timestamps -> no exact cut
        # point): arm the one-shot overlap dedup for the next confirmation.
        self._prompt = (self._prompt + self._confirmed)[-(self.model.cfg.n_text_ctx // 2 - 1):]
        keep = 10 * SAMPLE_RATE
        self._buffer = self._buffer[-keep:]
        self._confirmed = []
        self._hyps.clear()
        self._dedup_pending = True

    def _make_event(self, new: List[int], final: bool = False
                    ) -> Optional[StreamEvent]:
        """Dedup (one-shot after a trim), record the emitted tail, build the
        event. Returns None when nothing (new) survives."""
        if new and self._dedup_pending:
            tail = self._emitted_tail
            for k in range(min(len(tail), len(new)), 0, -1):
                if tail[-k:] == new[:k]:
                    new = new[k:]
                    break
            self._dedup_pending = False
        if not new:
            return None
        self._emitted_tail = (self._emitted_tail + new)[-64:]
        return StreamEvent(self._tok().decode(new), new, is_final=final)

    def _buffer_samples(self, samples: np.ndarray) -> None:
        """Append audio without triggering a decode (shared with the
        multi-stream tier, which decodes in poll())."""
        samples = np.asarray(samples, np.float32).reshape(-1)
        self._buffer = np.concatenate([self._buffer, samples])
        self._since_decode += len(samples)

    # -- public API ---------------------------------------------------------

    def feed(self, samples: np.ndarray) -> List[StreamEvent]:
        """Append audio; returns newly confirmed transcript events."""
        self._buffer_samples(samples)

        events: List[StreamEvent] = []
        if self._since_decode >= self.decode_interval * SAMPLE_RATE:
            self._since_decode = 0
            if self._vad_skip():
                return events
            ev = self._make_event(self._confirm())
            if ev:
                events.append(ev)
            self._maybe_trim()
        return events

    def _vad_skip(self) -> bool:
        """True when vad_gate is on and the buffer holds no speech.

        A skipped tick also BOUNDS the buffer (feed()'s normal trim lives
        behind the decode it just skipped): a speechless buffer carries no
        transcript content, so keep only a 5 s onset-context tail — long
        silences neither grow memory nor bury later speech behind stale
        audio at the front of the 30 s window."""
        if not self.vad_gate or not len(self._buffer):
            return False
        from .vad import detect_speech

        if detect_speech(self._buffer):
            return False
        keep = 5 * SAMPLE_RATE
        if len(self._buffer) > keep:
            self._buffer = self._buffer[-keep:]
            self._confirmed = []
            self._hyps.clear()
        return True

    def finish(self) -> List[StreamEvent]:
        """Flush: decode once more and emit everything unconfirmed.

        Emitted text must never retract: the final hypothesis only extends
        the output if it agrees with the already-emitted confirmed prefix;
        on divergence the confirmed text stands and nothing new is emitted.
        """
        hyp = self._decode_window() if len(self._buffer) else []
        lcp = len(self._common_prefix([hyp, self._confirmed])) \
            if self._confirmed else 0
        if self._confirmed and lcp < len(self._confirmed):
            new: List[int] = []
        else:
            new = hyp[len(self._confirmed) :]
            self._confirmed = hyp
        ev = self._make_event(new, final=True)
        return [ev] if ev else [StreamEvent("", [], is_final=True)]


class MultiStreamTranscriber:
    """Many live streams on one chip: one BATCHED decode per tick.

    The batch-1 streaming tier pays a full device round-trip and a
    row-starved decode per stream per tick (p50 ~1 s at large-v3 —
    docs/benchmarks.md "Streaming latency"). This tier keeps a
    StreamingTranscriber state machine per stream but decodes every due
    stream's window in ONE device batch, so N concurrent streams cost ~one
    decode instead of N. Each stream carries its OWN committed-text prompt
    through decoding's per-sample prompt support (per-row left-pads in one
    bucketed graph) — round 2 disabled conditioning here and traded
    transcript quality for the batching win; round 3 removes the tradeoff.

    Usage:
        mst = MultiStreamTranscriber(model, n_streams=8, language="en")
        mst.feed(3, chunk)              # buffer audio for stream 3
        for i, evs in mst.poll().items():   # one batched decode per call
            ...
        mst.finish(3)                   # flush one stream
    """

    def __init__(self, model, n_streams: int, *,
                 language: Optional[str] = "en", task: str = "transcribe",
                 agreement: int = 2,
                 decode_interval: float = 1.0,
                 sample_len: Optional[int] = None,
                 max_tokens_per_second: Optional[float] = 8.0,
                 condition_on_committed_text: bool = True,
                 vad_gate: bool = False,
                 draft_model=None,
                 spec_k: int = 4) -> None:
        """draft_model: speculative decoding for the batched tick decodes
        (greedy; speculative.py), governed by ONE tier-level acceptance
        governor — the batch mixes streams, so acceptance evidence is a
        property of the tier's aggregate content, matching serving's
        per-model governor scope."""
        if n_streams < 1:
            raise ValueError("n_streams must be >= 1")
        self.model = model
        self.language = language
        self.condition_on_committed_text = condition_on_committed_text
        self.task = task
        self.draft_model = draft_model
        self.spec_k = spec_k
        self._spec_gov = None
        if draft_model is not None:
            from . import speculative as _spec_mod

            self._spec_gov = _spec_mod.SpecGovernor(
                threshold=_spec_mod.break_even_tokens_per_iter(
                    spec_k, batch=n_streams))
        self.streams = [
            StreamingTranscriber(
                model, language=language, task=task, agreement=agreement,
                decode_interval=decode_interval, sample_len=sample_len,
                max_tokens_per_second=max_tokens_per_second,
                vad_gate=vad_gate)
            for _ in range(n_streams)
        ]

    def feed(self, idx: int, samples: np.ndarray) -> None:
        """Buffer audio for one stream (no device work; see poll())."""
        self.streams[idx]._buffer_samples(samples)

    def poll(self) -> dict:
        """Decode every due stream in one device batch; returns
        {stream_index: [StreamEvent, ...]} for streams with new text."""
        from .audio import log_mel_spectrogram
        from .decoding import decode as _decode

        sr = SAMPLE_RATE
        due = []
        for i, st in enumerate(self.streams):
            if (st._since_decode >= st.decode_interval * sr
                    and len(st._buffer)):
                if st._vad_skip():
                    # silent stream: do not burn a batch row on it this
                    # tick (its clock is reset so speech re-arms the tick)
                    st._since_decode = 0
                    continue
                due.append(i)
        if not due:
            return {}
        # shared decode horizon: the largest due stream's duration cap
        # (one graph per (batch-size, horizon) pair)
        caps = [self.streams[i]._tick_sample_len() for i in due]
        sample_len = None if any(c is None for c in caps) else max(caps)

        audio = np.stack([pad_or_trim(self.streams[i]._buffer)
                          for i in due], axis=0)
        prompts = [list(self.streams[i]._prompt) or None for i in due]
        if len(due) < len(self.streams):
            # pad to the FIXED stream count: every distinct batch size is
            # its own compiled decode graph (minutes each at large models);
            # padded rows repeat the last due stream and are discarded
            n_pad = len(self.streams) - len(due)
            audio = np.concatenate(
                [audio, np.repeat(audio[-1:], n_pad, axis=0)], axis=0)
            prompts = prompts + [prompts[-1]] * n_pad
        mel = np.asarray(log_mel_spectrogram(
            audio, n_mels=self.model.cfg.n_mels))
        # per-stream committed text rides decoding's per-sample prompts; the
        # prompt-length BUCKET is shared, so conditioned streams do not add
        # compiled graphs beyond one per (bucket, horizon) pair
        prompt_opt = (prompts if self.condition_on_committed_text
                      and any(p for p in prompts) else None)
        draft = self.draft_model
        if draft is not None and self._spec_gov is not None:
            from . import speculative as _spec_mod

            if self._spec_gov.permit():
                _spec_mod.LAST_STATS = None  # observe only THIS decode
            else:
                draft = None
        res = _decode(self.model, mel, DecodingOptions(
            task=self.task,
            language=self.language, without_timestamps=True,
            prompt=prompt_opt, spec_k=self.spec_k,
            sample_len=sample_len), draft=draft)[: len(due)]
        if self._spec_gov is not None:
            from . import speculative as _spec_mod

            if draft is not None:
                self._spec_gov.observe(_spec_mod.LAST_STATS)
            self._spec_gov.observe_timing(_spec_mod.LAST_TIMING)

        events: dict = {}
        for i, r in zip(due, res):
            st = self.streams[i]
            st._since_decode = 0
            ev = st._make_event(st._update_with_hyp(list(r.tokens)))
            if ev:
                events[i] = [ev]
            st._maybe_trim()
        return events

    def finish(self, idx: int) -> List[StreamEvent]:
        """Flush one stream (batch-1 decode; final text)."""
        return self.streams[idx].finish()
