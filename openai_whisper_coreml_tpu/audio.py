"""Audio loading + Whisper log-mel frontend (TPU-native).

The reference computes its log-mel spectrogram in a Rust static library called
over a C FFI from Swift (/root/reference/stft/src/lib.rs:49-102, bridge at
/root/reference/Whisper/Whisper/bridge.h:11), with the 80x201 mel filterbank
shipped as a baked `.npy` asset (/root/reference/stft/src/lib.rs:9,
/root/reference/export_m80.py:4-5).

Here the same math is a pure-functional JAX pipeline:
  * the filterbank is re-derived on the fly from the slaney-mel formula
    (no asset; golden-checked against the reference asset in tests),
  * framing + Hann window + rFFT + mel matmul + log/clamp/compress run
    under `jit` on-chip (a fused Pallas kernel in `ops.mel_kernel` is the
    production path; this module is the reference implementation and fallback).

Semantics matched exactly (and verified against a float64 NumPy oracle):
  reflect-pad 200 each side      -> lib.rs:34-40 / torch.stft(center=True)
  Hann periodic 400-pt window    -> lib.rs:26
  160-hop, 3000 frames           -> lib.rs:52 (the 3001st frame is dropped)
  power spectrum |rfft|^2        -> lib.rs:54
  mel matmul (n_mels, 201)       -> lib.rs:60-69
  log10(max(x, 1e-10))           -> lib.rs:76
  (max(x, globalmax - 8) + 4)/4  -> lib.rs:82-99
"""

from __future__ import annotations

import functools
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .config import HOP_LENGTH, N_FFT, N_SAMPLES, SAMPLE_RATE

__all__ = [
    "mel_filters",
    "hann_window",
    "log_mel_spectrogram",
    "pad_or_trim",
    "load_audio",
]


# ---------------------------------------------------------------------------
# Mel filterbank (slaney scale + slaney area-norm, librosa-compatible).
# Replaces the reference's m80.npy asset (export_m80.py:4-5, lib.rs:9-13).
# ---------------------------------------------------------------------------

def _hertz_to_mel(freq: np.ndarray) -> np.ndarray:
    """Slaney mel scale: linear below 1 kHz, logarithmic above."""
    freq = np.asarray(freq, dtype=np.float64)
    f_sp = 200.0 / 3.0
    mels = freq / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp  # 15.0
    logstep = np.log(6.4) / 27.0
    log_region = freq >= min_log_hz
    mels = np.where(
        log_region,
        min_log_mel + np.log(np.maximum(freq, min_log_hz) / min_log_hz) / logstep,
        mels,
    )
    return mels


def _mel_to_hertz(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    f_sp = 200.0 / 3.0
    freqs = f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = mels >= min_log_mel
    freqs = np.where(
        log_region,
        min_log_hz * np.exp(logstep * (np.maximum(mels, min_log_mel) - min_log_mel)),
        freqs,
    )
    return freqs


@functools.lru_cache(maxsize=None)
def mel_filters(
    n_mels: int = 80,
    sample_rate: int = SAMPLE_RATE,
    n_fft: int = N_FFT,
) -> np.ndarray:
    """Triangular mel filterbank, shape (n_mels, n_fft//2 + 1), float32.

    Equivalent to librosa.filters.mel(sr, n_fft, n_mels, htk=False,
    norm="slaney") — the exact matrix the reference ships as m80.npy
    (/root/reference/stft/src/lib.rs:60-69 consumes it row-major 80x201).
    """
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs, dtype=np.float64)

    mel_min = _hertz_to_mel(0.0)
    mel_max = _hertz_to_mel(sample_rate / 2.0)
    mel_pts = np.linspace(mel_min, mel_max, n_mels + 2)
    hz_pts = _mel_to_hertz(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney area normalisation.
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=None)
def hann_window(n: int = N_FFT) -> np.ndarray:
    """Periodic Hann window — (1 - cos(2 pi i / n)) / 2 (lib.rs:26)."""
    i = np.arange(n, dtype=np.float64)
    return ((1.0 - np.cos(2.0 * np.pi * i / n)) / 2.0).astype(np.float32)


@functools.lru_cache(maxsize=None)
def dft_matrices(n_fft: int = N_FFT) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT as two (n_fft, n_fft//2+1) matmul operands (cos, -sin).

    frames @ cos -> Re(rfft), frames @ sin -> Im(rfft). This is the
    MXU-friendly formulation used by the Pallas mel kernel; n_fft=400 makes a
    400x201 matmul per frame, which the systolic array eats trivially.
    """
    n_freqs = n_fft // 2 + 1
    k = np.arange(n_fft, dtype=np.float64)[:, None]
    f = np.arange(n_freqs, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * f / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


# ---------------------------------------------------------------------------
# Log-mel spectrogram (jnp reference implementation; jit-able, batched).
# ---------------------------------------------------------------------------

def _frame_indices(n_frames: int, n_fft: int, hop: int) -> np.ndarray:
    return np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]


@functools.partial(jax.jit, static_argnames=("n_mels", "use_dft_matmul"))
def _log_mel_impl(audio: jnp.ndarray, n_mels: int, use_dft_matmul: bool) -> jnp.ndarray:
    n_samples = audio.shape[-1]
    batched = audio.ndim == 2
    if not batched:
        audio = audio[None]
    audio = audio.astype(jnp.float32)

    # Reflect-pad 200 samples each side (lib.rs:34-40 semantics: left pad is
    # audio[400-i] for the i-th pad sample, i.e. standard reflect without
    # repeating the edge; right pad mirrors around the final sample).
    pad = N_FFT // 2
    audio = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")

    # Frame into (B, n_frames, 400). The last torch.stft frame is dropped
    # (openai/whisper semantics; the Rust loop at lib.rs:52 produces the same
    # 3000 frames for 30 s input).
    n_frames = n_samples // HOP_LENGTH
    idx = _frame_indices(n_frames, N_FFT, HOP_LENGTH)
    frames = audio[:, idx]  # (B, n_frames, N_FFT)
    window = jnp.asarray(hann_window(N_FFT))
    frames = frames * window

    # Frontend fidelity gate is <=1e-3 vs float64 (BASELINE.md), so these
    # matmuls must run at full fp32 MXU precision, not the bf16 default.
    hi = jax.lax.Precision.HIGHEST
    if use_dft_matmul:
        cos_m, sin_m = (jnp.asarray(m) for m in dft_matrices(N_FFT))
        re = jnp.einsum("btf,fk->btk", frames, cos_m, precision=hi,
                        preferred_element_type=jnp.float32)
        im = jnp.einsum("btf,fk->btk", frames, sin_m, precision=hi,
                        preferred_element_type=jnp.float32)
        power = re * re + im * im  # (B, n_frames, 201)
    else:
        spec = jnp.fft.rfft(frames, n=N_FFT, axis=-1)
        power = jnp.abs(spec) ** 2

    filters = jnp.asarray(mel_filters(n_mels))  # (n_mels, 201)
    mel = jnp.einsum("mk,btk->bmt", filters, power, precision=hi,
                     preferred_element_type=jnp.float32)

    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    # Global (per-sample) dynamic-range compression (lib.rs:82-99).
    log_max = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, log_max - 8.0)
    log_spec = (log_spec + 4.0) / 4.0

    if not batched:
        log_spec = log_spec[0]
    return log_spec


def log_mel_spectrogram(
    audio: Union[np.ndarray, jnp.ndarray],
    n_mels: int = 80,
    *,
    use_dft_matmul: bool = True,
) -> jnp.ndarray:
    """Whisper log-mel spectrogram.

    Args:
      audio: float waveform, shape (n_samples,) or (batch, n_samples),
        16 kHz mono. n_samples must be a multiple of HOP_LENGTH (pad first
        with `pad_or_trim`).
      n_mels: 80 (classic) or 128 (large-v3 family).
      use_dft_matmul: compute the rFFT as two MXU matmuls against fixed
        DFT matrices (fast on TPU) instead of jnp.fft.rfft.

    Returns:
      (n_mels, n_frames) or (batch, n_mels, n_frames) float32 in [~-1, ~1+].
    """
    audio = jnp.asarray(audio)
    if audio.ndim not in (1, 2):
        raise ValueError(f"audio must be 1D or 2D, got shape {audio.shape}")
    if audio.shape[-1] % HOP_LENGTH != 0:
        raise ValueError(
            f"n_samples ({audio.shape[-1]}) must be a multiple of {HOP_LENGTH}; "
            "use pad_or_trim first"
        )
    return _log_mel_impl(audio, n_mels, use_dft_matmul)


def pad_or_trim(
    array: Union[np.ndarray, jnp.ndarray],
    length: int = N_SAMPLES,
    *,
    axis: int = -1,
) -> jnp.ndarray:
    """Zero-pad or truncate audio to `length` samples along `axis`.

    Matches the reference's pad/truncate-to-480000 loop
    (/root/reference/Whisper/Whisper/ContentView.swift:57-60).

    NumPy inputs stay on the HOST (np.pad): shipping a trivial pad through
    the axon relay cost a ~30 ms round trip per call (streaming pays this
    per stream per tick).
    """
    xp = np if isinstance(array, np.ndarray) else jnp
    array = xp.asarray(array)
    n = array.shape[axis]
    if n > length:
        sl = [slice(None)] * array.ndim
        sl[axis] = slice(0, length)
        return array[tuple(sl)]
    if n < length:
        pad_widths = [(0, 0)] * array.ndim
        pad_widths[axis] = (0, length - n)
        return xp.pad(array, pad_widths)
    return array


# ---------------------------------------------------------------------------
# Audio file loading (host-side). The reference records a 16 kHz mono WAV via
# AVFoundation and reads it back as floats
# (/root/reference/Whisper/Whisper/AudioRecorder.swift:56-61,74-86). A TPU host
# has no mic; we load WAV/array input, resampling if needed. A C++ fast path
# lives in native/audio_io.cpp (loaded lazily); this is the portable fallback.
# ---------------------------------------------------------------------------

def load_audio(path: str, sample_rate: int = SAMPLE_RATE) -> np.ndarray:
    """Load an audio file as float32 mono at `sample_rate`. Supports WAV
    natively; other formats require the optional native decoder."""
    from .utils import audio_io  # lazy: avoids ctypes load at import time

    return audio_io.load_audio(path, sample_rate)
