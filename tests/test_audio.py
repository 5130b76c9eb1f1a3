"""Mel-frontend fidelity tests (SURVEY.md §4: golden vs reference semantics)."""

import os

import numpy as np
import pytest

from openai_whisper_coreml_tpu import audio as wa
from openai_whisper_coreml_tpu.config import N_SAMPLES

from .oracles import oracle_hann, oracle_log_mel

REF_M80 = "/root/reference/stft/src/m80.npy"


def test_hann_window_matches_oracle():
    np.testing.assert_allclose(wa.hann_window(400), oracle_hann(400), atol=1e-7)


def test_mel_filters_shape_and_partition():
    f = wa.mel_filters(80)
    assert f.shape == (80, 201)
    assert f.min() >= 0.0
    # Each fft bin (except DC/nyquist edges) is covered by some filter.
    assert (f.sum(axis=0)[3:-1] > 0).all()


@pytest.mark.skipif(not os.path.exists(REF_M80), reason="reference asset absent")
def test_mel_filters_match_reference_asset():
    """Golden check vs the filterbank the reference bakes into its Rust crate
    (export_m80.py pulls openai/whisper's mel_80; our slaney derivation must
    reproduce it)."""
    ref = np.load(REF_M80).reshape(80, 201)
    ours = wa.mel_filters(80)
    np.testing.assert_allclose(ours, ref, atol=2e-7)


def test_mel_filters_128():
    f = wa.mel_filters(128)
    assert f.shape == (128, 201)
    assert (f.sum(axis=0)[3:-1] > 0).all()


@pytest.mark.parametrize("seconds", [1, 30])
def test_log_mel_matches_oracle(rng, seconds):
    n = seconds * 16000
    x = rng.standard_normal(n).astype(np.float32) * 0.1
    ours = np.asarray(wa.log_mel_spectrogram(x))
    ref = oracle_log_mel(x, wa.mel_filters(80))
    assert ours.shape == (80, seconds * 100)
    np.testing.assert_allclose(ours, ref, atol=1e-3)
    # typical element agreement should be much tighter than the 1e-3 gate
    assert np.abs(ours - ref).mean() < 1e-5


def test_log_mel_dft_matmul_matches_rfft(rng):
    x = rng.standard_normal(N_SAMPLES).astype(np.float32) * 0.1
    a = np.asarray(wa.log_mel_spectrogram(x, use_dft_matmul=True))
    b = np.asarray(wa.log_mel_spectrogram(x, use_dft_matmul=False))
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_log_mel_batched_consistency(rng):
    xs = rng.standard_normal((3, 16000)).astype(np.float32) * 0.1
    batched = np.asarray(wa.log_mel_spectrogram(xs))
    singles = np.stack([np.asarray(wa.log_mel_spectrogram(x)) for x in xs])
    # per-sample dynamic range compression must match the unbatched path
    np.testing.assert_allclose(batched, singles, atol=1e-6)


def test_log_mel_128(rng):
    x = rng.standard_normal(16000).astype(np.float32)
    out = np.asarray(wa.log_mel_spectrogram(x, n_mels=128))
    ref = oracle_log_mel(x, wa.mel_filters(128))
    np.testing.assert_allclose(out, ref, atol=1e-3)


def test_pad_or_trim():
    x = np.ones(1000, np.float32)
    padded = np.asarray(wa.pad_or_trim(x, 2000))
    assert padded.shape == (2000,)
    assert padded[1000:].sum() == 0
    trimmed = np.asarray(wa.pad_or_trim(x, 500))
    assert trimmed.shape == (500,)
    assert np.asarray(wa.pad_or_trim(x, 1000)).shape == (1000,)


def test_wav_roundtrip(tmp_path, rng):
    from openai_whisper_coreml_tpu.utils import audio_io

    x = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    p = str(tmp_path / "t.wav")
    audio_io.save_wav(p, x, 16000)
    y = audio_io.load_audio(p, 16000)
    assert y.shape == x.shape
    np.testing.assert_allclose(x, y, atol=2.0 / 32768)


def test_wav_resample_on_load(tmp_path, rng):
    from openai_whisper_coreml_tpu.utils import audio_io

    t = np.arange(32000) / 32000.0
    x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32) * 0.5
    p = str(tmp_path / "t32k.wav")
    audio_io.save_wav(p, x, 32000)
    y = audio_io.load_audio(p, 16000)
    assert abs(y.shape[0] - 16000) <= 1
    # resampled sine keeps its frequency: check via FFT peak
    peak = np.argmax(np.abs(np.fft.rfft(y[:16000])))
    assert abs(peak - 440) <= 2


def test_wav_24bit_decode(tmp_path, rng):
    """24-bit PCM decodes correctly through the pure-Python width dispatch
    and the in-memory HTTP path (decode_wav_bytes)."""
    import wave

    from openai_whisper_coreml_tpu.utils.audio_io import (
        _load_wav_python,
        decode_wav_bytes,
    )

    x = (rng.uniform(-0.9, 0.9, 400)).astype(np.float64)
    pcm = np.round(x * 8388607.0).astype(np.int32)
    b = np.zeros((len(pcm), 3), np.uint8)
    u = pcm.astype(np.uint32) & 0xFFFFFF
    b[:, 0] = u & 0xFF
    b[:, 1] = (u >> 8) & 0xFF
    b[:, 2] = (u >> 16) & 0xFF
    path = tmp_path / "s24.wav"
    with wave.open(str(path), "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(3)
        wf.setframerate(16000)
        wf.writeframes(b.tobytes())

    data, rate = _load_wav_python(str(path))
    assert rate == 16000
    np.testing.assert_allclose(data, x, atol=2e-7)

    via_bytes = decode_wav_bytes(path.read_bytes())
    np.testing.assert_allclose(via_bytes, x, atol=2e-7)
