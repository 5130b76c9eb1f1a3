"""Acceptance governor: automatic draft fallback when speculative decoding
stops paying (speculative.SpecGovernor + the serve.py / transcribe.py wiring).

Why it exists (measured): at the acceptance floor a speculative serving
batch ran 27% SLOWER than plain (docs/benchmarks.md round 4 — every
iteration drafts K and commits ~1). The governor watches tokens/iteration
and withholds the draft below the measured break-even, re-probing so
recoveries re-enable it. Reference counterpart: none (the reference never
loops its decoder — Whisper.swift:36); this is serving robustness for the
round-4 speculative tier.
"""

import dataclasses

import numpy as np
import pytest

import jax

from openai_whisper_coreml_tpu import speculative
from openai_whisper_coreml_tpu.config import tiny_test_config
from openai_whisper_coreml_tpu.models.whisper import WhisperModel
from openai_whisper_coreml_tpu.params import init_params
from openai_whisper_coreml_tpu.serve import (
    ServeOptions,
    spec_governor,
    transcribe_batch,
)
from openai_whisper_coreml_tpu.speculative import (
    SpecGovernor,
    break_even_tokens_per_iter,
)


# -- unit: the governor itself ------------------------------------------------


def test_break_even_model():
    # round-5 same-session sweep (tpu_queue_r5.sh): K=4 -> 29.06 ms/iter vs
    # 8.95 ms/token two-level at B24
    assert break_even_tokens_per_iter(4) == pytest.approx(3.25, abs=0.02)
    assert break_even_tokens_per_iter(8) == pytest.approx(4.21, abs=0.02)
    # batch-1 calibration (streaming): measured 3.70 / 4.41 on chip
    assert break_even_tokens_per_iter(4, batch=1) == pytest.approx(
        3.70, abs=0.02)
    assert break_even_tokens_per_iter(8, batch=1) == pytest.approx(
        4.41, abs=0.02)
    # per-batch sweep points (same-session baselines at each geometry)
    assert break_even_tokens_per_iter(4, batch=8) == pytest.approx(
        2.90, abs=0.02)
    assert break_even_tokens_per_iter(4, batch=16) == pytest.approx(
        3.48, abs=0.02)
    assert break_even_tokens_per_iter(4, batch=32) == pytest.approx(
        3.42, abs=0.02)
    # B1 keeps the highest break-even (fixed draft overhead vs cheaper
    # per-token target steps); B8 is the sweep's most spec-favourable point
    assert (break_even_tokens_per_iter(4, batch=1)
            > break_even_tokens_per_iter(4, batch=24)
            > break_even_tokens_per_iter(4, batch=8))
    # nearest-in-log-batch selection: 4 -> B8 cal (log-nearer than B1),
    # 48 -> B32 cal
    assert (break_even_tokens_per_iter(4, batch=4)
            == break_even_tokens_per_iter(4, batch=8))
    assert (break_even_tokens_per_iter(4, batch=48)
            == break_even_tokens_per_iter(4, batch=32))
    # monotonic in K, and always above 1 token/iter
    for b in (1, 8, 16, 24, 32):
        vals = [break_even_tokens_per_iter(k, batch=b)
                for k in (1, 2, 4, 8, 16)]
        assert all(y > x for x, y in zip(vals, vals[1:]))
        assert vals[0] > 1.0


def test_governor_threshold_validation():
    with pytest.raises(ValueError, match="threshold"):
        SpecGovernor(threshold=1.0)


def test_governor_disables_below_threshold_and_reprobes():
    gov = SpecGovernor(threshold=3.0, min_iters=32, window=8,
                       reprobe_every=4)
    assert gov.permit()  # no evidence yet: draft runs
    gov.observe({"tokens": 20, "iters": 20})  # tpi 1.0, not enough mass
    assert not gov.disabled
    gov.observe({"tokens": 20, "iters": 20})  # 40 iters >= 32: verdict
    assert gov.disabled
    # withheld for reprobe_every-1 batches, then one probe batch
    permits = [gov.permit() for _ in range(8)]
    assert permits == [False, False, False, True, False, False, False, True]


def test_governor_reenables_on_recovery():
    gov = SpecGovernor(threshold=3.0, min_iters=16, window=8,
                       reprobe_every=2)
    gov.observe({"tokens": 16, "iters": 16})
    assert gov.disabled
    # probe batches now measure high acceptance (tpi 4.0); the disable
    # cleared the damning window, so recovery needs min_iters of fresh mass
    gov.observe({"tokens": 32, "iters": 8})
    assert gov.disabled  # 8 iters < min_iters: verdict unchanged
    gov.observe({"tokens": 32, "iters": 8})
    assert not gov.disabled  # 16 fresh iters at tpi 4.0: draft is back
    assert gov.permit()


def test_governor_ignores_non_spec_decodes():
    gov = SpecGovernor(threshold=3.0, min_iters=1)
    gov.observe(None)  # decode took a non-speculative path inside decoding
    gov.observe({"tokens": 0, "iters": 0})
    assert gov.tokens_per_iter is None
    assert not gov.disabled


def test_governor_live_calibration():
    """Once both cost terms have walled evidence at the live geometry the
    threshold is their ratio, not the static prior (round-5: a B48 server
    no longer runs the B24 table numbers)."""
    gov = SpecGovernor(threshold=3.0, calib_min_obs=3)
    assert gov.threshold == 3.0 and not gov.calibrated
    for _ in range(3):  # spec: 0.24 s for 10 iterations -> 24 ms/iter
        gov.observe_timing({"path": "spec", "wall_s": 0.24, "units": 10})
    assert not gov.calibrated  # needs BOTH terms
    assert gov.live_iter_ms == pytest.approx(24.0)
    for _ in range(3):  # plain: 0.12 s for 10 tokens -> 12 ms/token
        gov.observe_timing({"path": "plain", "wall_s": 0.12, "units": 10})
    assert gov.calibrated
    assert gov.live_tok_ms == pytest.approx(12.0)
    assert gov.threshold == pytest.approx(2.0)  # 24 / 12


def test_governor_calibration_buckets_by_geometry():
    """Walls from a DIFFERENT batch must not contaminate the live ratio:
    per-batch kinetics differ ~4x (ms/token 2.27 at B1 vs 8.95 at B24), so
    a remainder chunk's B1 plain walls mixed into a B24 server's
    calibration would set an unreachable threshold and permanently
    withhold a profitable draft (round-5 review finding)."""
    gov = SpecGovernor(threshold=3.0, calib_min_obs=3)
    for _ in range(3):  # spec walls at the serving geometry (B24, K4)
        gov.observe_timing({"path": "spec", "wall_s": 0.29, "units": 10,
                            "batch": 24, "k": 4, "temperature": 0.0})
    for _ in range(3):  # plain walls from a B1 remainder chunk: 2.27 ms/tok
        gov.observe_timing({"path": "plain", "wall_s": 0.0227, "units": 10,
                            "batch": 1, "temperature": 0.0})
    # no plain evidence AT B24 yet: the prior holds (NOT 29/2.27 ~ 12.8)
    assert not gov.calibrated
    assert gov.threshold == pytest.approx(3.0)
    for _ in range(3):  # plain walls at the matched batch: 8.95 ms/token
        gov.observe_timing({"path": "plain", "wall_s": 0.0895, "units": 10,
                            "batch": 24, "temperature": 0.0})
    assert gov.calibrated
    assert gov.threshold == pytest.approx(0.29 * 1e3 / 10 / 8.95)


def test_governor_regimes_are_independent():
    """A burst of low-acceptance t>0 rejection-sampling rungs must not
    disable the draft for healthy greedy traffic (round-5 review finding:
    the regimes verify differently, so their evidence never mixes)."""
    gov = SpecGovernor(threshold=3.0, min_iters=16, window=8,
                       reprobe_every=4)
    # healthy greedy traffic
    gov.observe({"tokens": 64, "iters": 16}, sampled=False)  # tpi 4.0
    assert not gov.disabled
    # hard-audio fallback rungs: rejection sampling accepts almost nothing
    gov.observe({"tokens": 17, "iters": 16}, sampled=True)  # tpi ~1.06
    assert gov.disabled_sampled
    assert not gov.disabled  # greedy verdict untouched
    assert gov.permit(sampled=False)  # greedy rungs keep the draft
    assert not gov.permit(sampled=True)  # sampled rungs withhold it
    # sampled recovery reprobes without spending greedy probes
    permits = [gov.permit(sampled=True) for _ in range(4)]
    assert permits == [False, False, True, False]


def test_governor_calibration_median_kills_compile_wall():
    """The first wall per compiled graph includes XLA compile; the windowed
    MEDIAN discards it without any explicit first-call special case."""
    gov = SpecGovernor(threshold=3.0, calib_min_obs=3)
    gov.observe_timing({"path": "spec", "wall_s": 30.0, "units": 10})  # compile
    for _ in range(4):
        gov.observe_timing({"path": "spec", "wall_s": 0.24, "units": 10})
    assert gov.live_iter_ms == pytest.approx(24.0)


def test_governor_live_threshold_drives_verdict():
    """Acceptance above the LIVE break-even but below the stale prior keeps
    the draft — the verdict follows the calibrated number."""
    gov = SpecGovernor(threshold=3.5, min_iters=16, calib_min_obs=3)
    for _ in range(3):
        gov.observe_timing({"path": "spec", "wall_s": 0.24, "units": 10})
        gov.observe_timing({"path": "plain", "wall_s": 0.12, "units": 10})
    assert gov.threshold == pytest.approx(2.0)
    gov.observe({"tokens": 50, "iters": 20})  # tpi 2.5: > live, < prior
    assert not gov.disabled
    gov.observe({"tokens": 20, "iters": 20})  # window tpi 1.75 < live 2.0
    assert gov.disabled


def test_governor_pinned_threshold_ignores_calibration():
    """An explicit user threshold is pinned: timings are dropped and the
    threshold never moves (ServeOptions.spec_fallback_threshold)."""
    gov = SpecGovernor(threshold=1.5, pinned=True)
    for _ in range(5):
        gov.observe_timing({"path": "spec", "wall_s": 0.24, "units": 10})
        gov.observe_timing({"path": "plain", "wall_s": 0.12, "units": 10})
    assert not gov.calibrated
    assert gov.live_iter_ms is None and gov.live_tok_ms is None
    assert gov.threshold == pytest.approx(1.5)


def test_governor_timing_none_safe():
    gov = SpecGovernor(threshold=3.0)
    gov.observe_timing(None)  # beam/best_of decode published no timing
    gov.observe_timing({"path": "plain", "wall_s": 0.1, "units": 0})
    gov.observe_timing({"path": "beam", "wall_s": 0.1, "units": 10})
    assert gov.live_iter_ms is None and gov.live_tok_ms is None


def test_governor_calibration_window_slides():
    gov = SpecGovernor(threshold=3.0, calib_window=4)
    for _ in range(4):
        gov.observe_timing({"path": "spec", "wall_s": 0.40, "units": 10})
    for _ in range(4):  # the cheap regime pushes the old walls out
        gov.observe_timing({"path": "spec", "wall_s": 0.20, "units": 10})
    assert gov.live_iter_ms == pytest.approx(20.0)


def test_governor_window_slides():
    gov = SpecGovernor(threshold=3.0, min_iters=4, window=2,
                       reprobe_every=2)
    gov.observe({"tokens": 40, "iters": 10})  # tpi 4.0: fine
    assert not gov.disabled
    # two low batches push the good one out of the 2-wide window
    gov.observe({"tokens": 10, "iters": 10})
    gov.observe({"tokens": 10, "iters": 10})
    assert gov.disabled


# -- integration: the serving ladder ------------------------------------------


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


def _toks(results):
    return [[t for seg in r["segments"] for t in seg["tokens"]]
            for r in results]


_OPTS = dict(scheduler="static", language="en", temperature=(0.0,),
             spec_k=3, no_speech_threshold=None, logprob_threshold=None,
             compression_ratio_threshold=None)


def test_serving_governor_withholds_floor_draft(model, rng):
    """Disagreeing draft (acceptance floor): the first batch gathers the
    evidence, later batches run PLAIN (no spec iterations recorded), and
    transcripts stay identical throughout."""
    draft = WhisperModel(cfg=model.cfg,
                         params=init_params(model.cfg, jax.random.PRNGKey(7)))
    spec_model = dataclasses.replace(model, draft=draft)
    audios = _audios(rng, [0.9, 1.2])
    # sample_len 20 x 2 rows ~ 40 spec iterations at the floor: enough
    # evidence mass (min_iters=32) for a verdict inside one batch
    opts = ServeOptions(batch_size=2, sample_len=20, **_OPTS)
    plain = transcribe_batch(model, audios, opts)

    before = dict(speculative.TOTALS)
    first = transcribe_batch(spec_model, audios, opts)
    gov = spec_governor(spec_model, opts)
    assert speculative.TOTALS["iters"] > before["iters"]  # spec ran once
    assert gov.disabled  # floor acceptance measured below break-even

    mid = dict(speculative.TOTALS)
    second = transcribe_batch(spec_model, audios, opts)
    assert speculative.TOTALS["iters"] == mid["iters"]  # draft withheld

    assert _toks(plain) == _toks(first) == _toks(second)

    # the serving wiring honours the probe: on the reprobe_every-th withheld
    # batch, permit() lets the draft run so recoveries can be noticed
    gov._skips[False] = gov.reprobe_every - 1  # greedy regime's counter
    third = transcribe_batch(spec_model, audios, opts)
    assert speculative.TOTALS["iters"] > mid["iters"]  # probe batch ran spec
    assert _toks(third) == _toks(plain)


def test_serving_governor_calibration_feeds(model, rng):
    """The serving ladder walls every decode: the first (speculative) batch
    feeds ms/iteration, withheld (plain) batches feed ms/token — the two
    terms of the live break-even."""
    draft = WhisperModel(cfg=model.cfg,
                         params=init_params(model.cfg, jax.random.PRNGKey(7)))
    spec_model = dataclasses.replace(model, draft=draft)
    audios = _audios(rng, [0.9, 1.2])
    opts = ServeOptions(batch_size=2, sample_len=20, **_OPTS)
    transcribe_batch(spec_model, audios, opts)  # spec batch (floor verdict)
    gov = spec_governor(spec_model, opts)
    assert gov.live_iter_ms is not None and gov.live_iter_ms > 0
    assert gov.disabled
    transcribe_batch(spec_model, audios, opts)  # withheld -> plain wall
    assert gov.live_tok_ms is not None and gov.live_tok_ms > 0


def test_serving_governor_keeps_agreeing_draft(model, rng):
    """Draft == target: fp32 determinism makes every proposal match
    (tokens/iter = K+1 > break-even), so the governor never withholds."""
    draft = dataclasses.replace(model)
    spec_model = dataclasses.replace(model, draft=draft)
    audios = _audios(rng, [0.9, 1.2])
    opts = ServeOptions(batch_size=2, sample_len=20, **_OPTS)

    before = dict(speculative.TOTALS)
    transcribe_batch(spec_model, audios, opts)
    mid = dict(speculative.TOTALS)
    assert mid["iters"] > before["iters"]
    transcribe_batch(spec_model, audios, opts)
    assert speculative.TOTALS["iters"] > mid["iters"]  # still speculative

    gov = spec_governor(spec_model, opts)
    assert not gov.disabled
    assert gov.tokens_per_iter == pytest.approx(4.0)  # K+1 at alpha=1


def test_serving_spec_fallback_opt_out(model, rng):
    """spec_fallback=False: the draft always runs, no governor attached."""
    draft = WhisperModel(cfg=model.cfg,
                         params=init_params(model.cfg, jax.random.PRNGKey(7)))
    spec_model = dataclasses.replace(model, draft=draft)
    audios = _audios(rng, [0.9])
    opts = ServeOptions(batch_size=1, sample_len=20, spec_fallback=False,
                        **_OPTS)
    before = dict(speculative.TOTALS)
    transcribe_batch(spec_model, audios, opts)
    mid = dict(speculative.TOTALS)
    transcribe_batch(spec_model, audios, opts)
    assert speculative.TOTALS["iters"] > mid["iters"] > before["iters"]
    assert getattr(spec_model, "_spec_governor", None) is None


def test_serving_custom_threshold(model, rng):
    """spec_fallback_threshold below the floor's tpi (~1) keeps even the
    disagreeing draft active — the knob reaches the governor."""
    draft = WhisperModel(cfg=model.cfg,
                         params=init_params(model.cfg, jax.random.PRNGKey(7)))
    spec_model = dataclasses.replace(model, draft=draft)
    audios = _audios(rng, [0.9, 1.2])
    opts = ServeOptions(batch_size=2, sample_len=20,
                        spec_fallback_threshold=1.01, **_OPTS)
    transcribe_batch(spec_model, audios, opts)
    gov = spec_governor(spec_model, opts)
    assert gov.threshold == pytest.approx(1.01)
    assert not gov.disabled
    mid = dict(speculative.TOTALS)
    transcribe_batch(spec_model, audios, opts)
    assert speculative.TOTALS["iters"] > mid["iters"]


def test_streaming_governor_wiring(model, rng):
    """StreamingTranscriber ticks feed the governor; a floor draft is
    withheld after enough evidence and confirmed tokens match the plain
    stream (fp32 spec is token-exact, and withheld ticks ARE plain)."""
    from openai_whisper_coreml_tpu.stream import StreamingTranscriber

    draft = WhisperModel(cfg=model.cfg,
                         params=init_params(model.cfg, jax.random.PRNGKey(7)))
    audio = _audios(rng, [8.0])[0]

    def run(draft_model):
        st = StreamingTranscriber(model, language="en", agreement=1,
                                  decode_interval=2.0, sample_len=24,
                                  draft_model=draft_model, spec_k=3)
        toks: list = []
        for off in range(0, len(audio), 2 * 16000):
            for ev in st.feed(audio[off: off + 2 * 16000]):
                toks.extend(ev.tokens)
        for ev in st.finish():
            toks.extend(ev.tokens)
        return toks, st

    plain_toks, _ = run(None)
    before = dict(speculative.TOTALS)
    spec_toks, st = run(draft)
    assert speculative.TOTALS["iters"] > before["iters"]  # spec ran
    assert st._spec_gov is not None
    assert st._spec_gov.disabled  # floor acceptance: draft withheld
    assert spec_toks == plain_toks


def test_multistream_governor_wiring(model, rng):
    """MultiStreamTranscriber's batched tick decodes carry the draft under
    ONE tier-level governor; a floor draft is withheld and confirmations
    match the draft-less tier."""
    from openai_whisper_coreml_tpu.stream import MultiStreamTranscriber

    draft = WhisperModel(cfg=model.cfg,
                         params=init_params(model.cfg, jax.random.PRNGKey(7)))
    audio = _audios(rng, [8.0])[0]

    def run(draft_model):
        mst = MultiStreamTranscriber(model, n_streams=2, language="en",
                                     agreement=1, decode_interval=2.0,
                                     sample_len=24, draft_model=draft_model,
                                     spec_k=3)
        confirmed = {0: [], 1: []}
        for off in range(0, len(audio), 2 * 16000):
            chunk = audio[off: off + 2 * 16000]
            mst.feed(0, chunk)
            mst.feed(1, chunk)
            for i, evs in mst.poll().items():
                for ev in evs:
                    confirmed[i].extend(ev.tokens)
        return confirmed, mst

    plain, _ = run(None)
    before = dict(speculative.TOTALS)
    spec, mst = run(draft)
    assert speculative.TOTALS["iters"] > before["iters"]  # spec ran batched
    assert mst._spec_gov is not None and mst._spec_gov.disabled
    assert spec == plain


def test_transcribe_governor_wiring(model, rng):
    """transcribe(draft_model=...) keeps a per-call governor; transcripts
    match the plain path regardless of its verdict."""
    from openai_whisper_coreml_tpu.transcribe import transcribe

    draft = WhisperModel(cfg=model.cfg,
                         params=init_params(model.cfg, jax.random.PRNGKey(7)))
    audio = _audios(rng, [0.9])[0]
    kw = dict(language="en", temperature=0.0, sample_len=16,
              no_speech_threshold=None, logprob_threshold=None,
              compression_ratio_threshold=None, condition_on_previous_text=False)
    plain = transcribe(model, audio, **kw)
    before = dict(speculative.TOTALS)
    spec = transcribe(model, audio, draft_model=draft, **kw)
    assert speculative.TOTALS["iters"] > before["iters"]
    p = [t for s in plain["segments"] for t in s["tokens"]]
    s = [t for s_ in spec["segments"] for t in s_["tokens"]]
    assert p == s

    # spec_fallback=False is popped before DecodingOptions sees it and the
    # draft still runs ungoverned
    mid = dict(speculative.TOTALS)
    spec2 = transcribe(model, audio, draft_model=draft, spec_fallback=False,
                       **kw)
    assert speculative.TOTALS["iters"] > mid["iters"]
    s2 = [t for s_ in spec2["segments"] for t in s_["tokens"]]
    assert s2 == p
