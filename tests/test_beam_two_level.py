"""Two-level beam decode parity: the phased frozen-prefix + deferred-
reordering path (beam.beam_decode_core two_level=True) must match the flat
per-step full-cache-gather path candidate for candidate.

Multi-phase geometries are exercised with small stage_width values (the
width is a sweepable static — BENCH_STAGE_WIDTH) so the tiny test config's
96-column text context spans several staging blocks:

- stage_width 32, bucket 4  -> 3 phases, frozen prefix grows twice, with
  per-step beam reordering crossing every boundary (origin composition +
  phase-end materialisation both exercised)
- stage_width 32, bucket 32 -> prefill split: the prefill cache covers
  [0, 64) and is split into frozen [0, 32) + staging [32, 64) BEFORE the
  first sampled step, origin starting at identity
- early-exit inside a later phase (unimprovable finished set) must leave
  the finished buffers identical
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openai_whisper_coreml_tpu import beam
from openai_whisper_coreml_tpu.config import tiny_test_config
from openai_whisper_coreml_tpu.params import init_params

N_CTX = 32


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config(n_audio_ctx=N_CTX, n_text_ctx=96)
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)
    feats = jnp.asarray(
        rng.standard_normal((2, cfg.n_audio_ctx, cfg.n_audio_state)),
        jnp.float32)
    return cfg, params, feats


def _run(cfg, params, feats, *, bucket, sample_len, beam_size, two_level,
         stage_width=128, use_timestamps=True, suppress_eot=False):
    pad = 0 if bucket <= 4 else 4
    rng = np.random.default_rng(13)
    b = feats.shape[0]
    toks = rng.integers(0, cfg.timestamp_begin,
                        size=(b, bucket)).astype(np.int32)
    toks[:, pad] = cfg.sot_token
    suppress = np.zeros((cfg.n_vocab,), bool)
    if suppress_eot:
        suppress[cfg.eot_token] = True
    out = beam.beam_decode_core(
        params, cfg, feats, jnp.asarray(toks), jnp.asarray(suppress),
        jnp.zeros((cfg.n_vocab,), bool), jnp.int32(50), jnp.int32(pad),
        jnp.int32(pad), sample_len=sample_len, use_timestamps=use_timestamps,
        prompt_len=bucket, beam_size=beam_size,
        max_candidates=beam_size, two_level=two_level,
        stage_width=stage_width)
    return [np.asarray(o) for o in out]


def _assert_same(flat, two):
    np.testing.assert_array_equal(flat[0], two[0])  # candidate tokens
    np.testing.assert_allclose(flat[1], two[1], rtol=0, atol=2e-4)  # scores
    np.testing.assert_array_equal(flat[2], two[2])  # lengths
    np.testing.assert_allclose(flat[3], two[3], atol=1e-5)  # no_speech


@pytest.mark.parametrize(
    "bucket,sample_len,width",
    [(4, 80, 32), (32, 60, 32), (4, 40, 128)],
    ids=["three-phase", "prefill-split", "single-phase"],
)
def test_beam_two_level_candidate_exact(setup, bucket, sample_len, width):
    cfg, params, feats = setup
    flat = _run(cfg, params, feats, bucket=bucket, sample_len=sample_len,
                beam_size=3, two_level=False)
    two = _run(cfg, params, feats, bucket=bucket, sample_len=sample_len,
               beam_size=3, two_level=True, stage_width=width)
    _assert_same(flat, two)


def test_beam_two_level_full_length(setup):
    """EOT suppressed: every beam row survives to total_len, maximising the
    number of phase crossings and origin compositions."""
    cfg, params, feats = setup
    kw = dict(bucket=4, sample_len=90, beam_size=2, suppress_eot=True,
              use_timestamps=False)
    flat = _run(cfg, params, feats, two_level=False, **kw)
    two = _run(cfg, params, feats, two_level=True, stage_width=32, **kw)
    _assert_same(flat, two)


def test_beam_two_level_int8_cache_falls_back(setup):
    """cache_dtype=int8 gates two_level off; both flags must agree."""
    cfg, params, feats = setup
    rng = np.random.default_rng(13)
    b = feats.shape[0]
    toks = rng.integers(0, cfg.timestamp_begin, size=(b, 4)).astype(np.int32)
    toks[:, 0] = cfg.sot_token
    outs = []
    for tl in (False, True):
        out = beam.beam_decode_core(
            params, cfg, feats, jnp.asarray(toks),
            jnp.zeros((cfg.n_vocab,), bool), jnp.zeros((cfg.n_vocab,), bool),
            jnp.int32(50), jnp.int32(0), jnp.int32(0), sample_len=30,
            use_timestamps=True, prompt_len=4, beam_size=2,
            max_candidates=2, cache_dtype="int8", two_level=tl)
        outs.append(np.asarray(out[0]))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_beam_two_level_sharded_candidate_exact():
    """Deferred reordering under a DP x TP mesh: the origin gather, the
    phase-end materialisation, and the KV_PSPEC-constrained concat must all
    stay candidate-exact vs the flat unsharded path."""
    from openai_whisper_coreml_tpu.parallel import make_mesh, shard_params

    cfg = tiny_test_config(n_state=128, n_head=4, n_layer=2,
                           n_audio_ctx=N_CTX, n_text_ctx=96)
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(9)
    feats = jnp.asarray(
        rng.standard_normal((2, cfg.n_audio_ctx, cfg.n_audio_state)),
        jnp.float32)
    flat = _run(cfg, params, feats, bucket=4, sample_len=70, beam_size=2,
                two_level=False)
    mesh = make_mesh(n_data=2, n_model=4)
    with jax.set_mesh(mesh):
        sharded_params = shard_params(params, cfg, mesh)
        two_sh = _run(cfg, sharded_params, feats, bucket=4, sample_len=70,
                      beam_size=2, two_level=True, stage_width=32)
    _assert_same(flat, two_sh)
