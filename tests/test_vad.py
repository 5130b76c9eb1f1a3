"""Energy-VAD tests (vad.py) and its transcribe() integration."""

import numpy as np
import pytest

import jax

from openai_whisper_coreml_tpu.config import tiny_test_config
from openai_whisper_coreml_tpu.models.whisper import WhisperModel
from openai_whisper_coreml_tpu.params import init_params
from openai_whisper_coreml_tpu.vad import (
    VadOptions,
    detect_speech,
    speech_clip_timestamps,
)

SR = 16_000


def _tone(seconds, freq=220.0, amp=0.3):
    t = np.arange(int(seconds * SR)) / SR
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _noise(seconds, amp, seed=0):
    rng = np.random.default_rng(seed)
    return (amp * rng.standard_normal(int(seconds * SR))).astype(np.float32)


def test_detect_speech_silence_tone_silence():
    audio = np.concatenate([
        _noise(2.0, 1e-4, seed=1),            # near-silence
        _tone(3.0) + _noise(3.0, 1e-4, 2),    # speech-like energy
        _noise(2.0, 1e-4, seed=3),
    ])
    spans = detect_speech(audio)
    assert len(spans) == 1
    s, e = spans[0]
    assert s == pytest.approx(2.0, abs=0.3)
    assert e == pytest.approx(5.0, abs=0.3)


def test_detect_speech_merges_short_gaps_and_drops_clicks():
    opts = VadOptions(min_silence_ms=400, min_speech_ms=150)
    audio = np.concatenate([
        _noise(1.0, 1e-4, 1),
        _tone(1.0),
        _noise(0.2, 1e-4, 2),   # short gap: merges
        _tone(1.0),
        _noise(2.0, 1e-4, 3),
        _tone(0.05),            # 50 ms click: dropped
        _noise(1.0, 1e-4, 4),
    ])
    spans = detect_speech(audio, options=opts)
    assert len(spans) == 1
    s, e = spans[0]
    assert s == pytest.approx(1.0, abs=0.3) and e == pytest.approx(3.2, abs=0.3)


def test_detect_speech_empty_and_silent():
    assert detect_speech(np.zeros(0, np.float32)) == []
    # digital silence + dither stays below the absolute floor
    assert detect_speech(_noise(3.0, 1e-6, 7)) == []
    assert speech_clip_timestamps(_noise(1.0, 1e-6, 8)) == []


def test_vad_options_validation():
    with pytest.raises(ValueError, match="hop_ms"):
        VadOptions(frame_ms=10, hop_ms=20)
    with pytest.raises(ValueError, match="positive"):
        VadOptions(frame_ms=0)


@pytest.fixture(scope="module")
def model():
    cfg = tiny_test_config(n_state=64, n_head=2, n_layer=2)
    return WhisperModel(cfg=cfg,
                        params=init_params(cfg, jax.random.PRNGKey(0)))


def test_transcribe_vad_filter_skips_silence(model):
    """vad_filter routes only the detected speech span into the decode
    loop (clip_timestamps semantics): every emitted segment lies inside
    the padded span, and pure silence returns an empty result without
    decoding."""
    audio = np.concatenate([
        _noise(35.0, 1e-5, 1),   # a full window of silence: skipped
        _tone(3.0),
        _noise(2.0, 1e-5, 2),
    ])
    kw = dict(language="en", temperature=0.0, sample_len=6,
              no_speech_threshold=None, logprob_threshold=None,
              compression_ratio_threshold=None)
    result = model.transcribe(audio, vad_filter=True, **kw)
    assert result["segments"], "speech span must be decoded"
    for seg in result["segments"]:
        # every decoded WINDOW lies inside the detected speech clip — the
        # 35 s silence never reaches the decoder. (Segment start/end are
        # model-predicted timestamp tokens: arbitrary within the window's
        # 30 s grammar under random weights, so only seek is guaranteed.)
        assert 3400 <= seg["seek"] < 3850  # mel frames

    silent = model.transcribe(_noise(3.0, 1e-6, 5), vad_filter=True, **kw)
    assert silent["segments"] == [] and silent["text"] == ""
    assert silent["language"] == "en"

    with pytest.raises(ValueError, match="vad_filter"):
        model.transcribe(audio, vad_filter=True, clip_timestamps="1,2", **kw)


def test_detect_speech_all_loud_buffer():
    """A buffer that is entirely speech must not read as silence (the
    adaptive floor sits at speech level there; the absolute_speech_db
    rail catches it — streaming vad_gate regression)."""
    spans = detect_speech(_tone(1.0, amp=0.3))
    assert spans and spans[0][0] == pytest.approx(0.0, abs=0.2)
    assert spans[-1][1] == pytest.approx(1.0, abs=0.2)
