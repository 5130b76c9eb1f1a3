"""Decode-loop tests: language ID parity, greedy loop invariants, logit rules."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openai_whisper_coreml_tpu.config import tiny_test_config
from openai_whisper_coreml_tpu.decoding import (
    DecodingOptions,
    build_suppress_mask,
    decode,
    detect_language,
)
from openai_whisper_coreml_tpu.models.whisper import WhisperModel
from openai_whisper_coreml_tpu.params import init_params
from openai_whisper_coreml_tpu.tokenizer import get_tokenizer

N_CTX = 64  # small audio context for CPU speed


@pytest.fixture(scope="module")
def model():
    cfg = tiny_test_config(n_audio_ctx=N_CTX, n_text_ctx=96)
    params = init_params(cfg, jax.random.PRNGKey(0))
    return WhisperModel(cfg=cfg, params=params)


@pytest.fixture(scope="module")
def mel(model):
    rng = np.random.default_rng(7)
    return rng.standard_normal((2, model.cfg.n_mels, 2 * N_CTX)).astype(np.float32)


def test_detect_language(model, mel):
    codes, probs = detect_language(model, mel)
    assert len(codes) == 2
    assert all(c in probs[0] for c in ("en", "zh", "su"))
    for code, p in zip(codes, probs):
        np.testing.assert_allclose(sum(p.values()), 1.0, atol=1e-4)
        # argmax of the dict must equal the returned code
        assert max(p, key=p.get) == code


def test_detect_language_matches_reference_semantics(model, mel):
    """The reference argmaxes raw logits over the 99 language ids
    (Whisper.swift:37-39); our softmax+argmax must select the same index."""
    feats = model.encode(mel)
    logits = model.logits(
        np.full((2, 1), model.cfg.sot_token, np.int32), feats)
    lang_slice = np.asarray(logits[:, 0,
        model.cfg.lang_token_start : model.cfg.lang_token_start + model.cfg.n_langs])
    expected = lang_slice.argmax(axis=-1)
    codes, _ = detect_language(model, feats, from_features=True)
    from openai_whisper_coreml_tpu.tokenizer import LANGUAGES

    assert [LANGUAGES[i] for i in expected] == codes


def test_greedy_decode_runs_and_respects_rules(model, mel):
    opts = DecodingOptions(language="en", sample_len=10)
    results = decode(model, mel, opts)
    assert len(results) == 2
    tok = get_tokenizer(model.cfg, language="en")
    suppress = build_suppress_mask(tok, opts)
    for r in results:
        assert r.language == "en"
        assert all(0 <= t < model.cfg.n_vocab for t in r.tokens)
        # suppressed ids must never appear
        assert not any(suppress[t] for t in r.tokens)
        # with timestamps on, the first sampled token must be a timestamp
        # within max_initial_timestamp (1.0s -> <=50 steps of 0.02)
        assert r.tokens[0] >= model.cfg.timestamp_begin
        assert r.tokens[0] <= model.cfg.timestamp_begin + 50
        assert isinstance(r.avg_logprob, float) and r.avg_logprob <= 0
        assert 0.0 <= r.no_speech_prob <= 1.0


def test_timestamp_monotonic_and_paired(model, mel):
    results = decode(model, mel, DecodingOptions(language="en", sample_len=24))
    begin = model.cfg.timestamp_begin
    for r in results:
        ts = [t for t in r.tokens if t >= begin]
        assert ts == sorted(ts), "timestamps must be non-decreasing"
        # opening timestamp is followed by text, not another timestamp
        if len(r.tokens) > 1:
            assert r.tokens[0] >= begin and r.tokens[1] < begin
        # never three timestamps in a row
        for a, b, c in zip(r.tokens, r.tokens[1:], r.tokens[2:]):
            assert not (a >= begin and b >= begin and c >= begin)
        # a lone timestamp is always followed by another timestamp or ends
        # the sequence; i.e. text->ts->text never happens (pairing rule)
        for i in range(1, len(r.tokens) - 1):
            if r.tokens[i] >= begin and r.tokens[i - 1] < begin:
                assert r.tokens[i + 1] >= begin


def test_without_timestamps(model, mel):
    results = decode(
        model, mel,
        DecodingOptions(language="en", sample_len=10, without_timestamps=True))
    for r in results:
        assert all(t < model.cfg.timestamp_begin for t in r.tokens)


def test_temperature_sampling_changes_output(model, mel):
    r0 = decode(model, mel, DecodingOptions(language="en", sample_len=12))
    r1 = decode(model, mel,
                DecodingOptions(language="en", sample_len=12, temperature=1.5),
                seed=3)
    # with a random model and high temperature, outputs should differ
    assert (r0[0].tokens != r1[0].tokens) or (r0[1].tokens != r1[1].tokens)
    assert r1[0].temperature == 1.5


def test_prompt_and_prefix(model, mel):
    tok = get_tokenizer(model.cfg, language="en")
    prompt = tok.encode(" previous context")
    results = decode(
        model, mel,
        DecodingOptions(language="en", sample_len=8, prompt=prompt,
                        without_timestamps=True))
    assert len(results) == 2  # runs with sot_prev-prefixed prompt


def test_tokenizer_roundtrip_bytes():
    cfg = tiny_test_config()
    tok = get_tokenizer(cfg)
    text = "Hello, world! ¿Cómo estás? 你好"
    ids = tok.encode(text)
    assert tok.decode(ids) == text
    # special ids match the reference's constants (Whisper.swift:35,37)
    assert tok.sot == 50258
    assert tok.eot == 50257
    assert tok.language_token("en") == 50259
    assert tok.language_token("su") == 50357


def test_tokenizer_timestamp_decode():
    cfg = tiny_test_config()
    tok = get_tokenizer(cfg)
    ids = [cfg.timestamp_begin] + tok.encode(" hi") + [cfg.timestamp_begin + 100]
    s = tok.decode_with_timestamps(ids)
    assert s.startswith("<|0.00|>")
    assert s.endswith("<|2.00|>")
    assert " hi" in s


def test_best_of_sampling(model, mel):
    r1 = decode(model, mel, DecodingOptions(
        language="en", sample_len=8, temperature=0.9, best_of=4,
        without_timestamps=True), seed=1)
    assert len(r1) == 2
    # best_of must not yield a worse average logprob than a single sample
    # with the same seed (it includes more candidates)
    r0 = decode(model, mel, DecodingOptions(
        language="en", sample_len=8, temperature=0.9,
        without_timestamps=True), seed=1)
    for a, b in zip(r1, r0):
        assert a.avg_logprob >= b.avg_logprob - 1e-5


def test_timestamp_rule_c_openai_semantics():
    """Rule c must match openai ApplyTimestampRules exactly: after a LONE
    timestamp the pairing timestamp may be EQUAL; after text (with some
    timestamp already sampled) the next timestamp must be STRICTLY greater;
    before any timestamp is sampled nothing in the timestamp range is
    suppressed (beyond rules a/b/d)."""
    from openai_whisper_coreml_tpu.config import tiny_test_config
    from openai_whisper_coreml_tpu.decoding import NEG_INF, _apply_logit_rules

    cfg = tiny_test_config(n_text_ctx=96)
    tb = cfg.timestamp_begin
    v = cfg.n_vocab
    prompt_len = 4
    no_sup = jnp.zeros(v, bool)
    suppressed = float(NEG_INF) / 2  # anything below this counts as -inf

    def rules(sampled, ts_max):
        toks = [0] * prompt_len + list(sampled)
        pos = len(toks)
        toks = toks + [0] * (16 - len(toks))
        out = _apply_logit_rules(
            jnp.zeros((1, v), jnp.float32), jnp.asarray([toks], jnp.int32),
            jnp.int32(pos), cfg, prompt_len, no_sup, no_sup, True,
            jnp.asarray([ts_max], jnp.int32), jnp.int32(-1))
        return np.asarray(out)[0]

    # lone timestamp just sampled -> pairing timestamp may be EQUAL
    out = rules([tb + 5, 7, 8, tb + 5], ts_max=tb + 5)
    assert out[tb + 5] > suppressed, "equal pairing timestamp must be allowed"
    assert out[tb + 4] < suppressed, "earlier timestamp must be suppressed"

    # pair completed, then text -> next timestamp strictly greater
    out = rules([tb + 5, tb + 5, 7, 8], ts_max=tb + 5)
    assert out[tb + 5] < suppressed, "equal timestamp forbidden after text"
    assert out[tb + 6] > suppressed

    # no timestamp sampled yet (sentinel ts_max = tb - 1): <|0.00|> allowed
    out = rules([7, 8], ts_max=tb - 1)
    assert out[tb] > suppressed


def test_long_prefix_is_truncated(model, mel):
    """A prefix longer than the text context must not overflow the decode
    buffer (openai trims; code-review finding)."""
    from openai_whisper_coreml_tpu.decoding import DecodingOptions, decode

    long_prefix = list(range(300, 300 + model.cfg.n_text_ctx + 50))
    res = decode(model, mel, DecodingOptions(
        language="en", sample_len=4, prefix=long_prefix))
    assert res and isinstance(res[0].tokens, list)


def test_per_sample_prompts_match_individual_decodes(model, mel):
    """A batch with PER-SAMPLE prompts (per-row left-pads in one bucketed
    graph) must emit exactly what each row gets when decoded alone with its
    own prompt (fp32 CPU: masked padding is numerically inert)."""
    prompts = [[51, 52, 53, 54, 55], [61, 62]]
    batch = decode(model, mel, DecodingOptions(
        language="en", sample_len=8, prompt=prompts))
    for i, p in enumerate(prompts):
        solo = decode(model, mel[i : i + 1], DecodingOptions(
            language="en", sample_len=8, prompt=p))[0]
        assert batch[i].tokens == solo.tokens
        np.testing.assert_allclose(batch[i].avg_logprob, solo.avg_logprob,
                                   atol=1e-4)
        np.testing.assert_allclose(batch[i].no_speech_prob,
                                   solo.no_speech_prob, atol=1e-4)


def test_per_sample_prompts_none_entries(model, mel):
    """None entries in a per-sample prompt list mean 'no conditioning' for
    that row, matching a promptless solo decode."""
    batch = decode(model, mel, DecodingOptions(
        language="en", sample_len=6, prompt=[[71, 72, 73], None]))
    solo = decode(model, mel[1:2], DecodingOptions(
        language="en", sample_len=6))[0]
    assert batch[1].tokens == solo.tokens


def test_per_sample_prompts_reject_beam(model, mel):
    with pytest.raises(ValueError, match="per-sample"):
        decode(model, mel, DecodingOptions(
            language="en", sample_len=4, beam_size=2,
            prompt=[[1, 2], [3]]))


def test_per_sample_prompt_wrong_length_rejected(model, mel):
    with pytest.raises(ValueError, match="entries for batch"):
        decode(model, mel, DecodingOptions(
            language="en", sample_len=4, prompt=[[1, 2]]))


def test_two_level_option_plumbing(model, mel):
    """DecodingOptions.two_level / stage_width reach the decode cores: the
    flat and two-level paths must agree through the public decode() API
    (greedy AND beam), and invalid widths are rejected up front."""
    for extra in ({}, {"beam_size": 2}):
        flat = decode(model, mel, DecodingOptions(
            language="en", sample_len=10, two_level=False, **extra))
        two = decode(model, mel, DecodingOptions(
            language="en", sample_len=10, two_level=True, stage_width=8,
            **extra))
        for f, t in zip(flat, two):
            assert f.tokens == t.tokens
    with pytest.raises(ValueError, match="stage_width"):
        DecodingOptions(stage_width=12)


def test_model_decode_method_openai_parity(model):
    """model.decode(mel[, options]) mirrors openai's API: unbatched mel ->
    one DecodingResult; batched mel -> a list; kwargs build options."""
    from openai_whisper_coreml_tpu.decoding import DecodingOptions, decode

    rng = np.random.default_rng(0)
    mel = rng.standard_normal(
        (model.cfg.n_mels, 2 * model.cfg.n_audio_ctx)).astype(np.float32)
    opts = DecodingOptions(language="en", sample_len=6)
    r1 = model.decode(mel, opts)
    assert hasattr(r1, "tokens") and not isinstance(r1, list)
    r2 = model.decode(mel[None], opts)
    assert isinstance(r2, list) and r2[0].tokens == r1.tokens
    r3 = model.decode(mel, language="en", sample_len=6)
    assert r3.tokens == r1.tokens
    ref = decode(model, np.asarray(mel)[None], opts)[0]
    assert ref.tokens == r1.tokens


def test_decoding_options_task_validated():
    from openai_whisper_coreml_tpu.decoding import DecodingOptions

    with pytest.raises(ValueError, match="task"):
        DecodingOptions(task="transcibe")
    DecodingOptions(task="translate")  # ok


def test_model_decode_kwargs_override_options(model):
    """openai parity: decode(mel, options, **kwargs) applies kwargs over
    the given options instead of silently dropping them."""
    from openai_whisper_coreml_tpu.decoding import DecodingOptions

    rng = np.random.default_rng(1)
    mel = rng.standard_normal(
        (model.cfg.n_mels, 2 * model.cfg.n_audio_ctx)).astype(np.float32)
    opts = DecodingOptions(language="en", sample_len=4)
    r = model.decode(mel, opts, sample_len=8)
    assert len(r.tokens) <= 8 and len(r.tokens) > 4 or len(r.tokens) <= 8
    r2 = model.decode(mel, DecodingOptions(language="en", sample_len=8))
    assert r.tokens == r2.tokens
