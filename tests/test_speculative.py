"""Speculative decoding parity tests.

spec_decode_core must be TOKEN-EXACT against the flat greedy loop: the
acceptance walk applies the identical logit-rule grammar at every position,
and the first mismatch position's target logits carry over so the correction
token is recomputed bit-identically (fp32 on CPU). Geometries cover:

- a DISAGREEING draft (independently-initialised params: near-zero
  acceptance -> the correction path does all the work),
- the SELF-draft (draft params == target params: near-total acceptance ->
  the multi-accept bookkeeping, EOT-inside-the-accept-chain, and the
  total_len clamp do all the work),
- timestamps on/off, per-row prompts (per-row pad/sot), int8 cross-KV,
  spec_k in {1, 3, 5}, and a DP x TP mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openai_whisper_coreml_tpu import decoding
from openai_whisper_coreml_tpu.config import tiny_test_config
from openai_whisper_coreml_tpu.params import init_params
from openai_whisper_coreml_tpu.speculative import spec_decode_core, spec_stats

N_AUDIO_CTX = 32


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config(n_audio_ctx=N_AUDIO_CTX)
    # the draft shares the token space but is a smaller decoder
    cfg_d = tiny_test_config(n_audio_ctx=N_AUDIO_CTX)
    params = init_params(cfg, jax.random.PRNGKey(0))
    params_d = init_params(cfg_d, jax.random.PRNGKey(7))
    rng = np.random.default_rng(3)
    feats = jnp.asarray(
        rng.standard_normal((3, cfg.n_audio_ctx, cfg.n_audio_state)),
        jnp.float32)
    return cfg, cfg_d, params, params_d, feats


def _inputs(cfg, b, prompt_bucket, per_row_pad=False):
    pad = 0 if prompt_bucket <= 4 else 4
    rng = np.random.default_rng(11)
    toks = rng.integers(0, cfg.timestamp_begin,
                        size=(b, prompt_bucket)).astype(np.int32)
    if per_row_pad:
        pads = np.asarray([0, 2, pad][:b], np.int32)
        for i, p in enumerate(pads):
            toks[i, :p] = cfg.eot_token
            toks[i, p] = cfg.sot_token
        return toks, pads, pads
    toks[:, pad] = cfg.sot_token
    return toks, np.full((b,), pad, np.int32), np.full((b,), pad, np.int32)


def _flat(cfg, params, feats, toks, pads, sots, *, sample_len,
          use_timestamps, kv_dtype="bf16"):
    out = decoding.greedy_decode_core(
        params, cfg, feats, jnp.asarray(toks),
        jnp.zeros((cfg.n_vocab,), bool), jnp.zeros((cfg.n_vocab,), bool),
        jnp.float32(0.0), jax.random.PRNGKey(1), jnp.int32(50),
        jnp.asarray(pads), jnp.asarray(sots),
        sample_len=sample_len, use_timestamps=use_timestamps,
        prompt_len=toks.shape[1], kv_dtype=kv_dtype, two_level=False)
    return [np.asarray(o) for o in out]


def _spec(cfg, cfg_d, params, params_d, feats, toks, pads, sots, *,
          sample_len, use_timestamps, spec_k, kv_dtype="bf16",
          temperature=None, seed=1):
    sampled = temperature is not None
    out = spec_decode_core(
        params, params_d, cfg, cfg_d, feats, feats,
        jnp.asarray(toks),
        jnp.zeros((cfg.n_vocab,), bool), jnp.zeros((cfg.n_vocab,), bool),
        jnp.int32(50), jnp.asarray(pads), jnp.asarray(sots),
        jnp.float32(temperature) if sampled else None,
        jax.random.PRNGKey(seed) if sampled else None,
        sample_len=sample_len, use_timestamps=use_timestamps,
        prompt_len=toks.shape[1], spec_k=spec_k, kv_dtype=kv_dtype,
        sampled=sampled)
    return [np.asarray(o) for o in out]


def _flat_sampled(cfg, params, feats, toks, pads, sots, *, sample_len,
                  use_timestamps, temperature, seed=1):
    out = decoding.greedy_decode_core(
        params, cfg, feats, jnp.asarray(toks),
        jnp.zeros((cfg.n_vocab,), bool), jnp.zeros((cfg.n_vocab,), bool),
        jnp.float32(temperature), jax.random.PRNGKey(seed), jnp.int32(50),
        jnp.asarray(pads), jnp.asarray(sots),
        sample_len=sample_len, use_timestamps=use_timestamps,
        prompt_len=toks.shape[1], two_level=False)
    return [np.asarray(o) for o in out]


@pytest.mark.parametrize(
    "bucket,sample_len,use_ts,spec_k",
    [(4, 40, True, 3), (4, 40, False, 3), (32, 60, True, 5),
     (4, 25, True, 1)],
    ids=["ts-k3", "nots-k3", "bucket32-k5", "k1"],
)
def test_spec_token_exact_disagreeing_draft(setup, bucket, sample_len,
                                            use_ts, spec_k):
    cfg, cfg_d, params, params_d, feats = setup
    toks, pads, sots = _inputs(cfg, 3, bucket)
    flat = _flat(cfg, params, feats, toks, pads, sots,
                 sample_len=sample_len, use_timestamps=use_ts)
    spec = _spec(cfg, cfg_d, params, params_d, feats, toks, pads, sots,
                 sample_len=sample_len, use_timestamps=use_ts, spec_k=spec_k)
    np.testing.assert_array_equal(flat[0], spec[0])  # tokens
    np.testing.assert_array_equal(flat[2], spec[2])  # n_sampled
    np.testing.assert_allclose(flat[1], spec[1], atol=1e-4)  # sum_logprobs
    np.testing.assert_allclose(flat[3], spec[3], atol=1e-5)  # no_speech


def test_spec_self_draft_full_acceptance(setup):
    """Draft == target: every proposal matches (fp32 determinism), so the
    loop must commit spec_k+1 tokens per verify and stay token-exact."""
    cfg, _, params, _, feats = setup
    toks, pads, sots = _inputs(cfg, 3, 4)
    flat = _flat(cfg, params, feats, toks, pads, sots,
                 sample_len=40, use_timestamps=True)
    spec = _spec(cfg, cfg, params, params, feats, toks, pads, sots,
                 sample_len=40, use_timestamps=True, spec_k=4)
    np.testing.assert_array_equal(flat[0], spec[0])
    np.testing.assert_array_equal(flat[2], spec[2])
    stats = spec_stats(spec[2], spec[4], spec[5])
    # no EOT with random weights at 40 tokens is typical; the self-draft
    # should accept essentially everything -> ~K+1 tokens per iteration
    assert stats["tokens_per_iter"] > 3.5, stats
    assert stats["acceptance_rate"] > 0.85, stats


def test_spec_per_row_prompts(setup):
    cfg, cfg_d, params, params_d, feats = setup
    toks, pads, sots = _inputs(cfg, 3, 8, per_row_pad=True)
    flat = _flat(cfg, params, feats, toks, pads, sots,
                 sample_len=30, use_timestamps=True)
    spec = _spec(cfg, cfg_d, params, params_d, feats, toks, pads, sots,
                 sample_len=30, use_timestamps=True, spec_k=3)
    np.testing.assert_array_equal(flat[0], spec[0])
    np.testing.assert_array_equal(flat[2], spec[2])


def test_spec_int8_cross_kv(setup):
    cfg, cfg_d, params, params_d, feats = setup
    toks, pads, sots = _inputs(cfg, 3, 4)
    flat = _flat(cfg, params, feats, toks, pads, sots,
                 sample_len=30, use_timestamps=True, kv_dtype="int8")
    spec = _spec(cfg, cfg_d, params, params_d, feats, toks, pads, sots,
                 sample_len=30, use_timestamps=True, spec_k=3,
                 kv_dtype="int8")
    np.testing.assert_array_equal(flat[0], spec[0])
    np.testing.assert_array_equal(flat[2], spec[2])


def test_spec_eot_suppressed_runs_to_total_len(setup):
    """With EOT never sampled, every row must stop exactly at total_len and
    the candidate-slack columns must not leak into the returned buffer."""
    cfg, _, params, _, feats = setup
    toks, pads, sots = _inputs(cfg, 3, 4)
    sample_len = 23  # deliberately not aligned to spec_k+1
    spec = _spec(cfg, cfg, params, params, feats, toks, pads, sots,
                 sample_len=sample_len, use_timestamps=True, spec_k=4)
    tokens, _, n_sampled = spec[0], spec[1], spec[2]
    assert tokens.shape[1] == 4 + sample_len
    # rows without an early EOT must fill the horizon exactly
    sampled = tokens[:, 4:]
    for i in range(3):
        eots = np.nonzero(sampled[i] == cfg.eot_token)[0]
        n = int(eots[0]) if len(eots) else sample_len
        assert n == int(n_sampled[i])


def test_spec_through_decode_api(setup):
    """decode(model, ..., draft=...) end to end, including text harvest."""
    from openai_whisper_coreml_tpu.models.whisper import WhisperModel

    cfg, cfg_d, params, params_d, feats = setup
    model = WhisperModel(cfg=cfg, params=params)
    draft = WhisperModel(cfg=cfg_d, params=params_d)
    opts = decoding.DecodingOptions(language="en", sample_len=24, spec_k=3)
    base = decoding.decode(model, feats, opts, from_features=True)
    spec = decoding.decode(model, feats, opts, from_features=True,
                           draft=draft)
    assert [r.tokens for r in base] == [r.tokens for r in spec]
    assert [r.text for r in base] == [r.text for r in spec]
    for a, b in zip(base, spec):
        assert abs(a.avg_logprob - b.avg_logprob) < 1e-4
        assert abs(a.no_speech_prob - b.no_speech_prob) < 1e-5


# -- sampled (rejection) speculative decoding — round 5 -----------------------


def test_spec_sampled_seed_exact_self_draft(setup):
    """Draft == target at temperature > 0: every ratio p/q is 1, nothing is
    rejected, and the counter-based per-(row, position) keys make the
    committed sequence SEED-EXACT vs the plain sampled loop (fp32 CPU)."""
    cfg, _, params, _, feats = setup
    toks, pads, sots = _inputs(cfg, 3, 4)
    for temp, seed in ((0.8, 1), (1.3, 5)):
        plain = _flat_sampled(cfg, params, feats, toks, pads, sots,
                              sample_len=36, use_timestamps=True,
                              temperature=temp, seed=seed)
        spec = _spec(cfg, cfg, params, params, feats, toks, pads, sots,
                     sample_len=36, use_timestamps=True, spec_k=4,
                     temperature=temp, seed=seed)
        np.testing.assert_array_equal(plain[0], spec[0])
        np.testing.assert_array_equal(plain[2], spec[2])
        np.testing.assert_allclose(plain[1], spec[1], atol=1e-4)


def test_spec_sampled_distribution_preserved(setup):
    """Rejection sampling must keep the committed sequence distributed
    exactly as plain sampling: Monte-Carlo over seeds with a DISAGREEING
    draft (frequent rejections -> the residual path does real work),
    comparing the joint frequency of the first two sampled tokens.

    The suppression mask narrows the live vocabulary to 12 tokens (the
    rules filter both p and q, so this is a legal grammar, not a hack) —
    a support small enough for empirical distributions to converge.
    Total-variation distance between the two joints must sit at sampling
    noise; a residual bug (committing from q, or reusing the rejected
    proposal's randomness) shifts mass detectably (TV ~ 0.5+)."""
    cfg, cfg_d, params, params_d, feats3 = setup
    b, n_seeds = 32, 100
    rng = np.random.default_rng(17)
    feats = jnp.asarray(
        rng.standard_normal((b, cfg.n_audio_ctx, cfg.n_audio_state)),
        jnp.float32)
    toks, pads, sots = _inputs(cfg, b, 4)
    allowed = np.arange(100, 112)
    suppress = np.ones((cfg.n_vocab,), bool)
    suppress[allowed] = False  # EOT stays suppressed: rows decode 2 tokens

    def run(fn_params, spec_mode, seed):
        kw = dict(sample_len=2, use_timestamps=False, temperature=1.0,
                  seed=seed)
        if spec_mode:
            out = spec_decode_core(
                params, params_d, cfg, cfg_d, feats, feats,
                jnp.asarray(toks), jnp.asarray(suppress),
                jnp.zeros((cfg.n_vocab,), bool), jnp.int32(50),
                jnp.asarray(pads), jnp.asarray(sots),
                jnp.float32(1.0), jax.random.PRNGKey(seed),
                sample_len=2, use_timestamps=False, prompt_len=4,
                spec_k=1, sampled=True)
        else:
            out = decoding.greedy_decode_core(
                params, cfg, feats, jnp.asarray(toks),
                jnp.asarray(suppress), jnp.zeros((cfg.n_vocab,), bool),
                jnp.float32(1.0), jax.random.PRNGKey(seed), jnp.int32(50),
                jnp.asarray(pads), jnp.asarray(sots),
                sample_len=2, use_timestamps=False, prompt_len=4,
                two_level=False)
        return [np.asarray(o) for o in out]

    from collections import Counter

    joint_plain, joint_spec = Counter(), Counter()
    rejected_any = 0
    for seed in range(n_seeds):
        plain = run(params, False, seed)
        spec = run(params, True, seed)
        for row in plain[0]:
            joint_plain[(int(row[4]), int(row[5]))] += 1
        for row in spec[0]:
            joint_spec[(int(row[4]), int(row[5]))] += 1
        stats = spec_stats(spec[2], spec[4], spec[5])
        rejected_any += stats["drafted"] - (stats["tokens"] - stats["iters"])
    n = b * n_seeds
    keys = set(joint_plain) | set(joint_spec)
    tv = 0.5 * sum(abs(joint_plain[k_] - joint_spec[k_]) for k_ in keys) / n
    # every committed token obeys the grammar
    for (t1, t2) in keys:
        assert t1 in allowed and t2 in allowed
    # the disagreeing draft must actually exercise the rejection path
    assert rejected_any > n_seeds, rejected_any
    assert tv < 0.15, (tv, sorted(joint_plain.items())[:8],
                       sorted(joint_spec.items())[:8])


def test_spec_sampled_grammar_and_determinism(setup):
    """Sampled spec under the timestamp grammar: same seed -> identical
    output (pure function of the key), rejections occur, and committed
    rows terminate inside the horizon with sane bookkeeping."""
    cfg, cfg_d, params, params_d, feats = setup
    toks, pads, sots = _inputs(cfg, 3, 4)
    a = _spec(cfg, cfg_d, params, params_d, feats, toks, pads, sots,
              sample_len=30, use_timestamps=True, spec_k=3,
              temperature=0.7, seed=9)
    b_ = _spec(cfg, cfg_d, params, params_d, feats, toks, pads, sots,
               sample_len=30, use_timestamps=True, spec_k=3,
               temperature=0.7, seed=9)
    np.testing.assert_array_equal(a[0], b_[0])
    np.testing.assert_array_equal(a[2], b_[2])
    c = _spec(cfg, cfg_d, params, params_d, feats, toks, pads, sots,
              sample_len=30, use_timestamps=True, spec_k=3,
              temperature=0.7, seed=10)
    assert not np.array_equal(a[0], c[0])  # a different seed moves tokens
    assert a[0].shape[1] == 4 + 30
    assert (a[2] <= 30).all() and (a[2] >= 1).all()


def test_spec_sampled_through_decode_api(setup):
    """decode(draft=..., temperature>0) routes to the sampled spec core and
    the stats/timing plumbing reports a spec decode."""
    from openai_whisper_coreml_tpu import speculative
    from openai_whisper_coreml_tpu.models.whisper import WhisperModel

    cfg, cfg_d, params, params_d, feats = setup
    model = WhisperModel(cfg=cfg, params=params)
    draft = WhisperModel(cfg=cfg_d, params=params_d)
    opts = decoding.DecodingOptions(language="en", sample_len=16, spec_k=3,
                                    temperature=0.8)
    before = dict(speculative.TOTALS)
    r1 = decoding.decode(model, feats, opts, from_features=True, draft=draft,
                         seed=3)
    assert speculative.TOTALS["iters"] > before["iters"]
    assert speculative.LAST_TIMING["path"] == "spec"
    r2 = decoding.decode(model, feats, opts, from_features=True, draft=draft,
                         seed=3)
    assert [r.tokens for r in r1] == [r.tokens for r in r2]  # deterministic
    # best_of fan-out keeps the plain path (no spec geometry for candidates)
    before = dict(speculative.TOTALS)
    decoding.decode(model, feats,
                    decoding.DecodingOptions(language="en", sample_len=8,
                                             temperature=0.8, best_of=2),
                    from_features=True, draft=draft, seed=3)
    assert speculative.TOTALS["iters"] == before["iters"]
    assert speculative.LAST_TIMING is None


def test_spec_draft_token_space_mismatch():
    from openai_whisper_coreml_tpu.speculative import check_pair

    cfg = tiny_test_config(n_audio_ctx=N_AUDIO_CTX)
    bad = tiny_test_config(n_vocab=51866, n_audio_ctx=N_AUDIO_CTX)
    with pytest.raises(ValueError, match="token spaces differ"):
        check_pair(cfg, bad)


def test_spec_under_mesh(setup):
    """Spec decode under a DP x TP mesh: the per-row caches and the K+1
    verify scatter must compile and stay token-exact data/model-sharded."""
    from openai_whisper_coreml_tpu.parallel.mesh import make_mesh

    cfg, cfg_d, params, params_d, feats = setup
    toks, pads, sots = _inputs(cfg, 3, 4)
    flat = _flat(cfg, params, feats, toks, pads, sots,
                 sample_len=20, use_timestamps=True)
    mesh = make_mesh(n_data=2, n_model=2, devices=jax.devices()[:4])
    with jax.set_mesh(mesh):
        # batch 3 does not divide the data axis; pad to 4 then trim
        feats4 = jnp.concatenate([feats, feats[-1:]], axis=0)
        toks4 = np.concatenate([toks, toks[-1:]], axis=0)
        pads4 = np.concatenate([pads, pads[-1:]])
        sots4 = np.concatenate([sots, sots[-1:]])
        spec = _spec(cfg, cfg_d, params, params_d, feats4, toks4, pads4,
                     sots4, sample_len=20, use_timestamps=True, spec_k=3)
    np.testing.assert_array_equal(flat[0], spec[0][:3])
    np.testing.assert_array_equal(flat[2], spec[2][:3])
