"""Two-level (frozen-prefix + staging-block) decode parity tests.

The two-level path phases the greedy decode loop over 128-column staging
blocks so the per-step whole-cache layout-conversion cost (linear in live
capacity — docs/benchmarks.md round 3) stays pinned at the 128-column
figure. These tests pin token-exactness against the flat single-loop path
across the geometries that exercise every structural branch:

- bucket 4  -> first block starts at column 0 (no frozen split at prefill)
- bucket 224 -> prefill cache spans [0, 256) and is SPLIT into a frozen
  [0, 128) prefix + a staging [128, 256) block before the first phase
- sample lengths long enough to cross >= 1 block boundary (phase re-entry
  with a grown frozen prefix)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openai_whisper_coreml_tpu import decoding
from openai_whisper_coreml_tpu.config import tiny_test_config
from openai_whisper_coreml_tpu.params import init_params

N_AUDIO_CTX = 32


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config(n_audio_ctx=N_AUDIO_CTX)
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    feats = jnp.asarray(
        rng.standard_normal((3, cfg.n_audio_ctx, cfg.n_audio_state)),
        jnp.float32)
    return cfg, params, feats


def _run(cfg, params, feats, *, prompt_bucket, sample_len, two_level,
         temperature=0.0, seed=1, suppress_eot=False, stage_width=128):
    pad = 0 if prompt_bucket <= 4 else 4
    rng = np.random.default_rng(11)
    b = feats.shape[0]
    toks = rng.integers(0, cfg.timestamp_begin,
                        size=(b, prompt_bucket)).astype(np.int32)
    toks[:, pad] = cfg.sot_token
    suppress = np.zeros((cfg.n_vocab,), bool)
    if suppress_eot:
        suppress[cfg.eot_token] = True
    out = decoding.greedy_decode_core(
        params, cfg, feats, jnp.asarray(toks),
        jnp.asarray(suppress), jnp.zeros((cfg.n_vocab,), bool),
        jnp.float32(temperature), jax.random.PRNGKey(seed), jnp.int32(50),
        jnp.full((b,), pad, jnp.int32), jnp.full((b,), pad, jnp.int32),
        sample_len=sample_len, use_timestamps=True,
        prompt_len=prompt_bucket, two_level=two_level,
        stage_width=stage_width)
    return [np.asarray(o) for o in out]


@pytest.mark.parametrize(
    "bucket,sample_len",
    [(4, 40), (4, 150), (32, 140), (224, 120)],
    ids=["single-phase", "two-phase", "bucket32-cross", "prefill-split"],
)
def test_two_level_token_exact(setup, bucket, sample_len):
    cfg, params, feats = setup
    flat = _run(cfg, params, feats, prompt_bucket=bucket,
                sample_len=sample_len, two_level=False)
    two = _run(cfg, params, feats, prompt_bucket=bucket,
               sample_len=sample_len, two_level=True)
    np.testing.assert_array_equal(flat[0], two[0])  # tokens
    np.testing.assert_array_equal(flat[2], two[2])  # n_sampled
    np.testing.assert_allclose(flat[1], two[1], atol=1e-4)  # sum_logprobs
    np.testing.assert_allclose(flat[3], two[3], atol=1e-5)  # no_speech


@pytest.mark.parametrize("width", [64, 256])
def test_two_level_stage_width_token_exact(setup, width):
    """Non-default staging widths (sweepable via BENCH_STAGE_WIDTH) must
    stay token-exact vs the flat path: 64 exercises more phases per decode
    and a narrower-than-cache_len-rounding block; 256 exercises a width
    that is wider than the 128-column cache_len rounding unit, so the last
    block is cut short by cache_len itself."""
    cfg, params, feats = setup
    flat = _run(cfg, params, feats, prompt_bucket=32, sample_len=150,
                two_level=False)
    two = _run(cfg, params, feats, prompt_bucket=32, sample_len=150,
               two_level=True, stage_width=width)
    np.testing.assert_array_equal(flat[0], two[0])
    np.testing.assert_allclose(flat[1], two[1], atol=1e-4)


def test_two_level_full_length_three_phases(setup):
    """EOT suppressed -> every row decodes to total_len, so every phase
    loop runs to its boundary (max phase count for the geometry)."""
    cfg, params, feats = setup
    flat = _run(cfg, params, feats, prompt_bucket=4, sample_len=300,
                two_level=False, suppress_eot=True)
    two = _run(cfg, params, feats, prompt_bucket=4, sample_len=300,
               two_level=True, suppress_eot=True)
    np.testing.assert_array_equal(flat[0], two[0])
    assert int(flat[2].min()) == 300  # proves no early finish


def test_two_level_sampled_path(setup):
    """temperature > 0 with a fixed key: the PRNG split sequence is
    identical across paths, so sampled tokens must match too."""
    cfg, params, feats = setup
    flat = _run(cfg, params, feats, prompt_bucket=4, sample_len=140,
                two_level=False, temperature=0.7)
    two = _run(cfg, params, feats, prompt_bucket=4, sample_len=140,
               two_level=True, temperature=0.7)
    np.testing.assert_array_equal(flat[0], two[0])


def test_two_level_heterogeneous_pads(setup):
    """Per-row pad_len (different left-pad per batch row) must survive the
    frozen/staging mask split: the valid_from bound applies to BOTH the
    frozen-prefix mask and the staging mask."""
    cfg, params, feats = setup
    rng = np.random.default_rng(11)
    b = feats.shape[0]
    bucket, sample_len = 32, 140
    toks = rng.integers(0, cfg.timestamp_begin,
                        size=(b, bucket)).astype(np.int32)
    pads = np.asarray([0, 7, 19][:b], np.int32)
    for i, p in enumerate(pads):
        toks[i, p] = cfg.sot_token
    outs = []
    for tl in (False, True):
        out = decoding.greedy_decode_core(
            params, cfg, feats, jnp.asarray(toks),
            jnp.zeros((cfg.n_vocab,), bool), jnp.zeros((cfg.n_vocab,), bool),
            jnp.float32(0.0), jax.random.PRNGKey(1), jnp.int32(50),
            jnp.asarray(pads), jnp.asarray(pads),
            sample_len=sample_len, use_timestamps=True,
            prompt_len=bucket, two_level=tl)
        outs.append([np.asarray(o) for o in out])
    np.testing.assert_array_equal(outs[0][0], outs[1][0])


def test_two_level_sharded_token_exact():
    """Multi-phase two-level decode under a DP x TP mesh: the frozen-prefix
    concat carries a KV_PSPEC constraint between phases — prove the sharded
    result is token-exact vs unsharded two-level AND vs the flat path."""
    from openai_whisper_coreml_tpu.parallel import make_mesh, shard_params

    cfg = tiny_test_config(n_state=128, n_head=4, n_layer=2, n_audio_ctx=32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    feats = jnp.asarray(
        rng.standard_normal((4, cfg.n_audio_ctx, cfg.n_audio_state)),
        jnp.float32)
    flat = _run(cfg, params, feats, prompt_bucket=4, sample_len=150,
                two_level=False)
    mesh = make_mesh(n_data=2, n_model=4)
    with jax.set_mesh(mesh):
        sharded_params = shard_params(params, cfg, mesh)
        two_sh = _run(cfg, sharded_params, feats, prompt_bucket=4,
                      sample_len=150, two_level=True)
    np.testing.assert_array_equal(flat[0], two_sh[0])
    np.testing.assert_allclose(flat[1], two_sh[1], atol=1e-4)


def test_two_level_int8_cache_falls_back(setup):
    """cache_dtype=int8 silently uses the flat path (two_level is gated
    off); result must equal the explicit flat int8 decode."""
    cfg, params, feats = setup
    kw = dict(prompt_bucket=4, sample_len=60)
    rng = np.random.default_rng(11)
    b = feats.shape[0]
    toks = rng.integers(0, cfg.timestamp_begin, size=(b, 4)).astype(np.int32)
    outs = []
    for tl in (False, True):
        out = decoding.greedy_decode_core(
            params, cfg, feats, jnp.asarray(toks),
            jnp.zeros((cfg.n_vocab,), bool), jnp.zeros((cfg.n_vocab,), bool),
            jnp.float32(0.0), jax.random.PRNGKey(1), jnp.int32(50),
            jnp.zeros((b,), jnp.int32), jnp.zeros((b,), jnp.int32),
            sample_len=kw["sample_len"], use_timestamps=True,
            prompt_len=4, cache_dtype="int8", two_level=tl)
        outs.append(np.asarray(out[0]))
    np.testing.assert_array_equal(outs[0], outs[1])
