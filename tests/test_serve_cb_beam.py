"""Beam-search continuous batching (serve_cb_beam) parity tests.

The group-beam chunk core must produce the SAME best hypotheses as the
static scheduler's beam path (beam.beam_decode_core through decode()) —
fp32, so the only acceptable difference is scheduling. Geometries cover
refill across group boundaries, the quality-gate requeue into the sampled
engine, and an initial_prompt under beam CB.
"""

import numpy as np
import pytest

import jax

from openai_whisper_coreml_tpu.config import tiny_test_config
from openai_whisper_coreml_tpu.models.whisper import WhisperModel
from openai_whisper_coreml_tpu.params import init_params
from openai_whisper_coreml_tpu.serve import ServeOptions, transcribe_batch


@pytest.fixture(scope="module")
def model():
    cfg = tiny_test_config(n_state=64, n_head=2, n_layer=2)
    return WhisperModel(cfg=cfg,
                        params=init_params(cfg, jax.random.PRNGKey(0)))


def _audios(rng, seconds):
    sr = 16_000
    out = []
    for i, s in enumerate(seconds):
        t = np.arange(int(s * sr)) / sr
        out.append((0.2 * np.sin(2 * np.pi * (180 + 40 * i) * t)
                    + 0.02 * rng.standard_normal(t.shape)).astype(np.float32))
    return out


COMMON = dict(language="en", temperature=(0.0,), sample_len=8, beam_size=2,
              no_speech_threshold=None, logprob_threshold=None,
              compression_ratio_threshold=None)


def _tokens(results):
    return [[t for seg in r["segments"] for t in seg["tokens"]]
            for r in results]


def test_beam_cb_matches_static_beam(model, rng):
    audios = _audios(rng, [1.0, 1.2])
    static = transcribe_batch(model, audios, ServeOptions(
        scheduler="static", batch_size=2, **COMMON))
    cont = transcribe_batch(model, audios, ServeOptions(
        scheduler="continuous", batch_size=2, **COMMON))
    assert _tokens(static) == _tokens(cont)
    for s, c in zip(static, cont):
        assert s["text"] == c["text"]
        for a, b in zip(s["segments"], c["segments"]):
            assert abs(a["avg_logprob"] - b["avg_logprob"]) < 1e-4


def test_beam_cb_refill_more_groups_than_slots(model, rng):
    """5 windows through 2 group slots: group harvest + group refill."""
    audios = _audios(rng, [1.0, 1.1, 0.8, 1.3, 0.9])
    static = transcribe_batch(model, audios, ServeOptions(
        scheduler="static", batch_size=2, **COMMON))
    cont = transcribe_batch(model, audios, ServeOptions(
        scheduler="continuous", batch_size=2, **COMMON))
    assert _tokens(static) == _tokens(cont)


def test_beam_cb_gate_failure_routes_to_sampled_engine(model, rng):
    """An impossible logprob gate fails the t=0 beam rung; the retry must
    decode on the sampled engine at the next rung (temperature 0.5)."""
    audios = _audios(rng, [1.0, 1.2])
    opts = ServeOptions(scheduler="continuous", batch_size=2, language="en",
                        temperature=(0.0, 0.5), sample_len=6, beam_size=2,
                        logprob_threshold=1e9, no_speech_threshold=None,
                        compression_ratio_threshold=None)
    out = transcribe_batch(model, audios, opts)
    assert len(out) == 2
    for r in out:
        assert r["segments"]
        assert all(seg["temperature"] == 0.5 for seg in r["segments"])


def test_beam_cb_initial_prompt(model, rng):
    """beam + initial_prompt + continuous: per-row pads repeat across the
    K beam rows; parity vs the static scheduler's partitioned beam path."""
    audios = _audios(rng, [1.0, 2.6])
    common = dict(COMMON, initial_prompt="names: Kowalski")
    static = transcribe_batch(model, audios, ServeOptions(
        scheduler="static", batch_size=2, **common))
    cont = transcribe_batch(model, audios, ServeOptions(
        scheduler="continuous", batch_size=2, **common))
    assert _tokens(static) == _tokens(cont)
