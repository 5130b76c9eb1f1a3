"""Fused Pallas mel kernel parity vs the XLA reference and fp64 oracle."""

import numpy as np
import pytest

from openai_whisper_coreml_tpu import audio as wa
from openai_whisper_coreml_tpu.ops.mel_kernel import log_mel_pallas

from .oracles import oracle_log_mel


@pytest.mark.parametrize("seconds,n_mels", [(1, 80), (30, 80), (2, 128)])
def test_pallas_mel_matches_xla(rng, seconds, n_mels):
    x = (rng.standard_normal(seconds * 16000) * 0.1).astype(np.float32)
    ref = np.asarray(wa.log_mel_spectrogram(x, n_mels=n_mels))
    out = np.asarray(log_mel_pallas(x, n_mels))
    assert out.shape == ref.shape == (n_mels, seconds * 100)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_pallas_mel_matches_fp64_oracle(rng):
    x = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    out = np.asarray(log_mel_pallas(x, 80))
    ref = oracle_log_mel(x, wa.mel_filters(80))
    np.testing.assert_allclose(out, ref, atol=1e-3)
    assert np.abs(out - ref).mean() < 1e-5


def test_pallas_mel_batched(rng):
    xs = (rng.standard_normal((3, 16000)) * 0.1).astype(np.float32)
    out = np.asarray(log_mel_pallas(xs, 80))
    singles = np.stack([np.asarray(log_mel_pallas(x, 80)) for x in xs])
    np.testing.assert_allclose(out, singles, atol=1e-6)
