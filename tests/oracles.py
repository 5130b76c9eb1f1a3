"""Independent float64 NumPy oracles for golden tests.

This is a from-first-principles restatement of the Whisper log-mel definition
(the math the reference implements in Rust at /root/reference/stft/src/lib.rs:
reflect :34-40, window :26, frame/fft :52-58, mel :60-69, log/compress :71-99),
kept deliberately separate from the package so tests compare two independent
implementations.
"""

import numpy as np


def oracle_log_mel(audio: np.ndarray, filters: np.ndarray) -> np.ndarray:
    """audio: (n_samples,) float; filters: (n_mels, 201). Returns (n_mels, T)."""
    n_fft, hop = 400, 160
    audio = np.asarray(audio, dtype=np.float64)
    padded = np.pad(audio, (n_fft // 2, n_fft // 2), mode="reflect")

    i = np.arange(n_fft)
    window = (1.0 - np.cos(2.0 * np.pi * i / n_fft)) / 2.0

    n_frames = audio.shape[0] // hop
    spec = np.empty((n_frames, n_fft // 2 + 1), dtype=np.float64)
    for t in range(n_frames):
        frame = padded[t * hop : t * hop + n_fft] * window
        fft = np.fft.rfft(frame)
        spec[t] = np.abs(fft) ** 2

    mel = filters.astype(np.float64) @ spec.T  # (n_mels, n_frames)
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return (log_spec + 4.0) / 4.0


def oracle_hann(n: int = 400) -> np.ndarray:
    i = np.arange(n)
    return (1.0 - np.cos(2.0 * np.pi * i / n)) / 2.0
