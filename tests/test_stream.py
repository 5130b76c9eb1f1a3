"""Streaming transcription (LocalAgreement) tests."""

import numpy as np
import pytest

import jax

from openai_whisper_coreml_tpu.config import tiny_test_config
from openai_whisper_coreml_tpu.models.whisper import WhisperModel
from openai_whisper_coreml_tpu.params import init_params
from openai_whisper_coreml_tpu.stream import StreamingTranscriber


@pytest.fixture(scope="module")
def model():
    cfg = tiny_test_config(n_state=64, n_head=2, n_layer=2)
    return WhisperModel(cfg=cfg, params=init_params(cfg, jax.random.PRNGKey(0)))


def test_streaming_confirms_monotonically(model):
    rng = np.random.default_rng(0)
    t = np.arange(8 * 16000) / 16000
    audio = (0.2 * np.sin(2 * np.pi * 200 * t)
             + 0.02 * rng.standard_normal(t.shape)).astype(np.float32)

    st = StreamingTranscriber(model, language="en", agreement=2,
                              decode_interval=2.0, sample_len=6)
    confirmed: list = []
    for off in range(0, len(audio), 16000):  # 1s chunks
        for ev in st.feed(audio[off : off + 16000]):
            confirmed.extend(ev.tokens)
            snapshot = list(confirmed)
            # emitted text never retracts: prior confirmations are a prefix
            assert snapshot[: len(confirmed)] == confirmed
    finals = st.finish()
    assert finals and finals[-1].is_final
    # deterministic decode + identical windows => agreement reached at least
    # once across 8s/2s intervals with a frozen buffer tail
    assert isinstance(finals[-1].text, str)


def test_streaming_requires_positive_agreement(model):
    with pytest.raises(ValueError):
        StreamingTranscriber(model, agreement=0)


def test_streaming_trims_long_buffer(model):
    rng = np.random.default_rng(1)
    st = StreamingTranscriber(model, language="en", agreement=1,
                              decode_interval=10.0, sample_len=4)
    # feed 40s total; internal buffer must stay bounded near 30s
    for _ in range(4):
        st.feed((0.1 * rng.standard_normal(10 * 16000)).astype(np.float32))
    assert len(st._buffer) <= 30 * 16000
    st.finish()


def test_finish_never_contradicts_confirmed(model, monkeypatch):
    """finish() must not re-emit or contradict confirmed text when the final
    hypothesis diverges from the already-emitted prefix."""
    st = StreamingTranscriber(model, language="en", agreement=1)
    st._buffer = np.zeros(16000, np.float32)
    st._confirmed = [10, 11, 12]
    monkeypatch.setattr(st, "_decode_window", lambda: [10, 99, 98, 97])
    finals = st.finish()
    assert finals[-1].is_final
    assert finals[-1].tokens == []  # diverged: nothing new emitted

    # agreeing hypothesis extends normally
    st2 = StreamingTranscriber(model, language="en", agreement=1)
    st2._buffer = np.zeros(16000, np.float32)
    st2._confirmed = [10, 11]
    monkeypatch.setattr(st2, "_decode_window", lambda: [10, 11, 12, 13])
    finals = st2.finish()
    assert finals[-1].tokens == [12, 13]


def test_tick_sample_len_scales_with_buffer(model):
    st = StreamingTranscriber(model, language="en", max_tokens_per_second=8.0)
    st._buffer = np.zeros(2 * 16000, np.float32)  # 2s -> need 24 -> bucket 32
    assert st._tick_sample_len() == 32
    st._buffer = np.zeros(10 * 16000, np.float32)  # 10s -> 88 -> bucket 128
    assert st._tick_sample_len() == 128
    st._buffer = np.zeros(30 * 16000, np.float32)  # 30s -> 248 -> no cap
    assert st._tick_sample_len() is None

    # explicit sample_len is an upper bound, never raised by the cap
    st2 = StreamingTranscriber(model, language="en", sample_len=6)
    st2._buffer = np.zeros(2 * 16000, np.float32)
    assert st2._tick_sample_len() == 6
    st2._buffer = np.zeros(30 * 16000, np.float32)
    assert st2._tick_sample_len() == 6

    # cap disabled -> always the configured horizon
    st3 = StreamingTranscriber(model, language="en",
                               max_tokens_per_second=None)
    st3._buffer = np.zeros(2 * 16000, np.float32)
    assert st3._tick_sample_len() is None


def test_multistream_batched_poll(model):
    from openai_whisper_coreml_tpu.stream import MultiStreamTranscriber

    rng = np.random.default_rng(3)
    t = np.arange(6 * 16000) / 16000
    audio = (0.2 * np.sin(2 * np.pi * 200 * t)
             + 0.02 * rng.standard_normal(t.shape)).astype(np.float32)

    mst = MultiStreamTranscriber(model, n_streams=2, language="en",
                                 agreement=2, decode_interval=2.0,
                                 sample_len=6)
    confirmed = {0: [], 1: []}
    for off in range(0, len(audio), 16000):
        chunk = audio[off : off + 16000]
        mst.feed(0, chunk)
        mst.feed(1, chunk)  # identical audio on both streams
        for i, evs in mst.poll().items():
            for ev in evs:
                confirmed[i].extend(ev.tokens)
    # identical inputs through one batched decode => identical confirmations
    assert confirmed[0] == confirmed[1]
    finals0 = mst.finish(0)
    assert finals0 and finals0[-1].is_final

    # solo reference: same audio through the batch-1 tier (no trim at 6 s,
    # so no conditioning divergence; fp32 decode is batch-shape stable)
    st = StreamingTranscriber(model, language="en", agreement=2,
                              decode_interval=2.0, sample_len=6)
    solo = []
    for off in range(0, len(audio), 16000):
        for ev in st.feed(audio[off : off + 16000]):
            solo.extend(ev.tokens)
    assert solo == confirmed[0]


def test_multistream_due_gating(model):
    """poll() decodes only streams whose interval elapsed."""
    from openai_whisper_coreml_tpu.stream import MultiStreamTranscriber

    mst = MultiStreamTranscriber(model, n_streams=2, language="en",
                                 decode_interval=2.0, sample_len=4)
    mst.feed(0, np.zeros(16000, np.float32))  # 1 s: not due
    assert mst.poll() == {}
    mst.feed(0, np.zeros(2 * 16000, np.float32))  # 3 s total: due
    mst.poll()  # decodes stream 0 only (stream 1 has no audio)
    assert mst.streams[0]._since_decode == 0
    assert mst.streams[1]._since_decode == 0 or len(
        mst.streams[1]._buffer) == 0


def test_make_event_dedups_once_after_trim(model):
    st = StreamingTranscriber(model, language="en")
    st._emitted_tail = [5, 6, 7]
    st._dedup_pending = True
    ev = st._make_event([6, 7, 8])  # overlap [6,7] with emitted tail
    assert ev is not None and ev.tokens == [8]
    # one-shot: the next confirmation is NOT deduped
    ev2 = st._make_event([8, 9])
    assert ev2 is not None and ev2.tokens == [8, 9]

    st2 = StreamingTranscriber(model, language="en")
    st2._emitted_tail = [5, 6, 7]
    ev3 = st2._make_event([6, 7])  # no trim pending: emit verbatim
    assert ev3 is not None and ev3.tokens == [6, 7]

    st3 = StreamingTranscriber(model, language="en")
    st3._emitted_tail = [1, 2]
    st3._dedup_pending = True
    assert st3._make_event([1, 2]) is None  # fully duplicate -> nothing


def test_multistream_per_stream_conditioning(model):
    """Round-2 verdict #5: each stream in the batched tier now carries its
    OWN committed-text prompt through decoding's per-sample prompts. The
    batched hypothesis per stream must equal a batch-1 decode with that
    stream's prompt (fp32), and differ from the unconditioned decode."""
    from openai_whisper_coreml_tpu.stream import MultiStreamTranscriber

    rng = np.random.default_rng(5)
    t = np.arange(3 * 16000) / 16000
    audio = (0.2 * np.sin(2 * np.pi * 220 * t)
             + 0.02 * rng.standard_normal(t.shape)).astype(np.float32)

    mst = MultiStreamTranscriber(model, n_streams=2, language="en",
                                 agreement=1, decode_interval=1.0,
                                 sample_len=8)
    # distinct committed text per stream (as if earlier audio was trimmed)
    mst.streams[0]._prompt = [41, 42, 43]
    mst.streams[1]._prompt = [44, 45]
    mst.feed(0, audio)
    mst.feed(1, audio)
    mst.poll()
    hyp0 = mst.streams[0]._hyps[-1]
    hyp1 = mst.streams[1]._hyps[-1]

    # batch-1 oracle: same buffer + same prompt through the solo tier
    def solo_hyp(prompt):
        st = StreamingTranscriber(model, language="en", agreement=1,
                                  decode_interval=1.0, sample_len=8)
        st._prompt = list(prompt)
        st._buffer_samples(audio)
        return st._decode_window()

    assert hyp0 == solo_hyp([41, 42, 43])
    assert hyp1 == solo_hyp([44, 45])

    # and conditioning must actually matter: the unconditioned tier diverges
    # (random weights: prompts shift the logit landscape)
    mst_off = MultiStreamTranscriber(model, n_streams=2, language="en",
                                     agreement=1, decode_interval=1.0,
                                     sample_len=8,
                                     condition_on_committed_text=False)
    mst_off.streams[0]._prompt = [41, 42, 43]
    mst_off.feed(0, audio)
    mst_off.feed(1, audio)
    mst_off.poll()
    assert mst_off.streams[0]._hyps[-1] != hyp0


def test_vad_gate_skips_silent_ticks(model, monkeypatch):
    """vad_gate=True: a due tick on a speechless buffer costs zero decodes;
    speech re-arms the tick and decoding resumes."""
    from openai_whisper_coreml_tpu.stream import StreamingTranscriber

    st = StreamingTranscriber(model, language="en", decode_interval=0.5,
                              vad_gate=True)
    calls = []
    real = st._decode_window
    monkeypatch.setattr(st, "_decode_window",
                        lambda: calls.append(1) or real())

    rng = np.random.default_rng(0)
    silence = (1e-6 * rng.standard_normal(8000)).astype(np.float32)
    for _ in range(4):  # 2 s of near-silence across 4 due ticks
        st.feed(silence)
    assert calls == [], "silent ticks must not decode"

    t = np.arange(16000) / 16000
    tone = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    st.feed(tone.copy())
    assert len(calls) >= 1, "speech must re-arm decoding"


def test_multistream_vad_gate_drops_silent_rows(model, monkeypatch):
    """A silent stream is excluded from the batched poll() while a speech
    stream still decodes."""
    from openai_whisper_coreml_tpu.stream import MultiStreamTranscriber

    mst = MultiStreamTranscriber(model, n_streams=2, language="en",
                                 decode_interval=0.25, vad_gate=True)
    rng = np.random.default_rng(1)
    t = np.arange(8000) / 16000
    speech = (0.3 * np.sin(2 * np.pi * 180 * t)).astype(np.float32)
    silence = (1e-6 * rng.standard_normal(8000)).astype(np.float32)

    decoded_rows = []
    from openai_whisper_coreml_tpu import stream as stream_mod
    from openai_whisper_coreml_tpu.decoding import decode as real_decode

    def spy(model_, mel, opts, **kw):
        decoded_rows.append(mel.shape[0])
        return real_decode(model_, mel, opts, **kw)

    monkeypatch.setattr(
        "openai_whisper_coreml_tpu.decoding.decode", spy)

    mst.feed(0, speech)
    mst.feed(1, silence)
    mst.poll()
    # stream 1 was due but silent: its tick clock was reset, no decode row
    assert mst.streams[1]._since_decode == 0
    # stream 0 decoded (poll ran at least one batch)
    assert decoded_rows, "speech stream must decode"


def test_vad_gate_bounds_silent_buffer(model):
    """Long silence must not grow the buffer (the skip path bypasses the
    normal post-decode trim): skipped ticks keep only a 5 s context tail."""
    from openai_whisper_coreml_tpu.config import SAMPLE_RATE
    from openai_whisper_coreml_tpu.stream import StreamingTranscriber

    st = StreamingTranscriber(model, language="en", decode_interval=0.5,
                              vad_gate=True)
    rng = np.random.default_rng(2)
    silence = (1e-6 * rng.standard_normal(8000)).astype(np.float32)
    for _ in range(20):  # 10 s of silence
        st.feed(silence)
    assert len(st._buffer) <= 5 * SAMPLE_RATE
