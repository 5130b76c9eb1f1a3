"""int8 decode-path mechanism tests (kv_dtype / cache_dtype options).

The speed claims for these paths are measured on chip (docs/benchmarks.md);
these tests pin the MECHANISM on CPU:

  * int8 cross-KV decode must be token-exact against the bf16/fp32 path fed
    the SAME dequantised tensors (inline dequant is (k8 * scale).astype —
    if that algebra is what runs, feeding its result through the normal
    path must reproduce the tokens bit-for-bit);
  * the int8 self-attention cache path must be deterministic, finite, and
    its per-column quantisation roundtrip must stay within the int8 bound.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openai_whisper_coreml_tpu.config import tiny_test_config
from openai_whisper_coreml_tpu.decoding import (
    DecodingOptions,
    build_blank_mask,
    build_suppress_mask,
    greedy_decode_core,
)
from openai_whisper_coreml_tpu.models import decoder as dec_mod
from openai_whisper_coreml_tpu.models.whisper import WhisperModel
from openai_whisper_coreml_tpu.params import init_params
from openai_whisper_coreml_tpu.tokenizer import get_tokenizer


@pytest.fixture(scope="module")
def model():
    cfg = tiny_test_config(n_state=64, n_head=2, n_layer=2)
    return WhisperModel(cfg=cfg, params=init_params(cfg, jax.random.PRNGKey(0)))


def _decode(model, feats, kv_dtype="bf16", cache_dtype="bf16", sample_len=8):
    cfg = model.cfg
    tok = get_tokenizer(cfg, language="en")
    opts = DecodingOptions(language="en")
    b = feats.shape[0]
    initial = np.tile(
        np.asarray([[tok.eot, tok.sot, tok.language_token("en"),
                     tok.transcribe]], np.int32), (b, 1))
    tokens, sum_lp, n_sampled, _ = greedy_decode_core(
        model.params, cfg, feats, jnp.asarray(initial),
        jnp.asarray(build_suppress_mask(tok, opts)),
        jnp.asarray(build_blank_mask(tok)),
        jnp.float32(0.0), jax.random.PRNGKey(0), jnp.int32(50), jnp.int32(1),
        jnp.int32(2), sample_len=sample_len, use_timestamps=True,
        prompt_len=initial.shape[1], kv_dtype=kv_dtype,
        cache_dtype=cache_dtype)
    return np.asarray(tokens), np.asarray(sum_lp)


@pytest.fixture(scope="module")
def feats(model, rng):
    from openai_whisper_coreml_tpu.audio import pad_or_trim

    n = model.cfg.n_audio_ctx * 2 * 160  # samples for a full window
    mel = model.log_mel(
        pad_or_trim((0.1 * rng.standard_normal(16000 * 2)).astype(np.float32),
                    n))
    return model.encode(np.asarray(mel))[None]


def test_int8_cross_kv_matches_dequantised_reference(model, feats):
    """kv_dtype='int8' must equal the normal path fed dequantise(quantise(K/V))."""
    toks_int8, lp_int8 = _decode(model, feats, kv_dtype="int8")

    # build the dequantised cross-KV by the same algebra decode_step uses,
    # then run the NORMAL (non-quantised) decode on it via monkey-free
    # substitution: quantise -> dequantise -> precompute path
    cfg = model.cfg
    q = dec_mod.precompute_cross_kv_int8(model.params, cfg, feats)
    dtype = model.params["decoder"]["token_embedding"].dtype
    deq = dec_mod.CrossKV(
        (q.k8.astype(jnp.float32) * q.ks).astype(dtype),
        (q.v8.astype(jnp.float32) * q.vs).astype(dtype))
    ref = dec_mod.precompute_cross_kv(model.params, cfg, feats)
    # sanity: quantisation error is small but nonzero
    assert 0 < float(jnp.abs(deq.k - ref.k).max()) < 0.2

    import openai_whisper_coreml_tpu.models.decoder as dmod

    # greedy_decode_core is jit-cached: a bf16 trace from an earlier test at
    # these shapes would silently bypass the monkeypatch (the patched
    # precompute only runs at TRACE time). Clear around the patched call so
    # the substitution really traces, and again after so later tests do not
    # inherit the patched graph.
    orig = dmod.precompute_cross_kv
    greedy_decode_core.clear_cache()
    try:
        dmod.precompute_cross_kv = lambda p, c, f: deq
        toks_ref, lp_ref = _decode(model, feats, kv_dtype="bf16")
    finally:
        dmod.precompute_cross_kv = orig
        greedy_decode_core.clear_cache()

    np.testing.assert_array_equal(toks_int8, toks_ref)
    np.testing.assert_allclose(lp_int8, lp_ref, rtol=1e-5, atol=1e-5)


def test_int8_cache_deterministic_and_finite(model, feats):
    a_toks, a_lp = _decode(model, feats, cache_dtype="int8")
    b_toks, b_lp = _decode(model, feats, cache_dtype="int8")
    np.testing.assert_array_equal(a_toks, b_toks)
    np.testing.assert_array_equal(a_lp, b_lp)
    assert np.isfinite(a_lp).all()
    assert (a_toks >= 0).all() and (a_toks < model.cfg.n_vocab).all()


def test_quantize_kv_column_roundtrip_bound():
    from openai_whisper_coreml_tpu.ops.sqa_int8 import quantize_kv_column

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 3, 8, 16)) * 3.0, jnp.float32)
    q8, sc = quantize_kv_column(x)
    deq = q8.astype(jnp.float32) * sc
    # per-(…, position) column scale: error bounded by half a quant step
    step = np.asarray(sc)  # (2,3,1,16)
    err = np.abs(np.asarray(deq) - np.asarray(x))
    assert (err <= 0.5 * step + 1e-6).all()


def test_all_int8_combination_runs(model, feats):
    toks, lp = _decode(model, feats, kv_dtype="int8", cache_dtype="int8")
    assert np.isfinite(lp).all()
    assert toks.shape[1] == 4 + 8


def test_dtype_options_validated():
    from openai_whisper_coreml_tpu.decoding import DecodingOptions

    with pytest.raises(ValueError):
        DecodingOptions(kv_dtype="int-8")
    with pytest.raises(ValueError):
        DecodingOptions(cache_dtype="fp8")
    DecodingOptions(kv_dtype="int8", cache_dtype="int8")  # valid
