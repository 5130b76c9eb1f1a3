"""Speculative decoding through the serving surface (WhisperModel.draft).

The spec core's token-exactness vs the flat greedy loop is pinned by
tests/test_speculative.py; these tests pin the SERVING integration: a
paired draft attached to the model must leave static-scheduler transcripts
bit-identical (greedy rungs go through spec_decode_core, which is exact by
construction), and must be ignored everywhere it does not apply (t>0
rungs, beam, continuous scheduler).
"""

import dataclasses

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


@pytest.fixture(scope="module")
def draft(model):
    # same token space (check_pair), independent weights: the acceptance
    # floor — every verify step still commits >= 1 exact target token
    return WhisperModel(cfg=model.cfg,
                        params=init_params(model.cfg, jax.random.PRNGKey(7)))


def _audios(rng, seconds):
    sr = 16_000
    out = []
    for i, s in enumerate(seconds):
        t = np.arange(int(s * sr)) / sr
        out.append((0.2 * np.sin(2 * np.pi * (180 + 40 * i) * t)
                    + 0.02 * rng.standard_normal(t.shape)).astype(np.float32))
    return out


def _toks(results):
    return [[t for seg in r["segments"] for t in seg["tokens"]]
            for r in results]


def test_static_greedy_with_draft_matches_plain(model, draft, rng):
    audios = _audios(rng, [0.9, 1.2])
    opts = ServeOptions(scheduler="static", batch_size=2, language="en",
                        temperature=(0.0,), sample_len=12, spec_k=3,
                        no_speech_threshold=None, logprob_threshold=None,
                        compression_ratio_threshold=None)
    plain = transcribe_batch(model, audios, opts)
    spec_model = dataclasses.replace(model, draft=draft)
    spec = transcribe_batch(spec_model, audios, opts)
    assert _toks(plain) == _toks(spec)
    assert [r["text"] for r in plain] == [r["text"] for r in spec]


def test_draft_rides_sampled_rungs_but_not_cb(model, draft, rng):
    """Round-5: t>0 rungs keep the draft via REJECTION sampling — the
    committed sequence is distribution-exact (pinned statistically in
    test_speculative.py), not sample-path-exact, so here we pin that the
    draft actually RAN, that serving stays deterministic per seed, and
    that the CB engines still ignore the draft (flat per-row loop)."""
    from openai_whisper_coreml_tpu import speculative

    audios = _audios(rng, [1.0])
    spec_model = dataclasses.replace(model, draft=draft)
    # spec_fallback off: the governor must not withhold the floor draft —
    # this test is about the routing, not the governor's verdict
    opts = ServeOptions(scheduler="static", batch_size=1, language="en",
                        temperature=(0.7,), sample_len=8,
                        no_speech_threshold=None, logprob_threshold=None,
                        compression_ratio_threshold=None,
                        spec_fallback=False)
    before = dict(speculative.TOTALS)
    b1 = transcribe_batch(spec_model, audios, opts)
    assert speculative.TOTALS["iters"] > before["iters"]  # sampled spec RAN
    b2 = transcribe_batch(spec_model, audios, opts)
    assert _toks(b1) == _toks(b2)  # deterministic per seed
    # continuous scheduler: draft must be ignored (CB keeps the flat loop)
    opts_cb = dataclasses.replace(opts, scheduler="continuous",
                                  temperature=(0.0,))
    c = transcribe_batch(model, audios, opts_cb)
    d = transcribe_batch(spec_model, audios, opts_cb)
    assert _toks(c) == _toks(d)


def test_spec_stats_accumulate(model, draft, rng):
    """Every spec decode updates speculative.TOTALS (serve_http diffs it
    around each batch to expose acceptance gauges on /metrics)."""
    from openai_whisper_coreml_tpu import speculative

    audios = _audios(rng, [0.8])
    opts = ServeOptions(scheduler="static", batch_size=1, language="en",
                        temperature=(0.0,), sample_len=10, spec_k=3,
                        no_speech_threshold=None, logprob_threshold=None,
                        compression_ratio_threshold=None)
    before = dict(speculative.TOTALS)
    transcribe_batch(dataclasses.replace(model, draft=draft), audios, opts)
    after = speculative.TOTALS
    assert after["iters"] > before["iters"]
    assert after["tokens"] >= before["tokens"] + after["iters"] - before["iters"]
    assert after["drafted"] == before["drafted"] + 3 * (after["iters"]
                                                        - before["iters"])
    assert speculative.LAST_STATS is not None
    assert 0.0 <= speculative.LAST_STATS["acceptance_rate"] <= 1.0
