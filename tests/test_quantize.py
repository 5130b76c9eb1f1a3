"""Weights-only int8 quantization tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openai_whisper_coreml_tpu.config import tiny_test_config
from openai_whisper_coreml_tpu.models import decoder as dec_mod
from openai_whisper_coreml_tpu.models import encoder as enc_mod
from openai_whisper_coreml_tpu.models.layers import linear
from openai_whisper_coreml_tpu.params import init_params
from openai_whisper_coreml_tpu.quantize import (
    quantize_linear,
    quantize_params,
    quantized_fraction,
)


def test_quantize_linear_roundtrip(rng):
    w = jnp.asarray(rng.standard_normal((256, 512)).astype(np.float32) * 0.05)
    q = quantize_linear(w)
    assert q["w_q"].dtype == jnp.int8
    deq = q["w_q"].astype(np.float32) * np.asarray(q["scale"])
    rel = np.abs(deq - np.asarray(w)).max() / np.abs(np.asarray(w)).max()
    assert rel < 0.01  # <=0.5 LSB of 127 per channel


def test_quantized_linear_matches(rng):
    w = jnp.asarray(rng.standard_normal((256, 512)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.standard_normal(512).astype(np.float32) * 0.01)
    x = jnp.asarray(rng.standard_normal((4, 256)).astype(np.float32))
    y_fp = linear(x, {"w": w, "b": b})
    qp = quantize_linear(w)
    qp["b"] = b
    y_q = linear(x, qp)
    err = np.abs(np.asarray(y_fp) - np.asarray(y_q))
    assert err.max() < 0.05 * np.abs(np.asarray(y_fp)).max() + 1e-3


def test_quantized_model_forward(rng):
    cfg = tiny_test_config(n_state=256, n_head=4, n_layer=2, n_audio_ctx=64,
                           n_text_ctx=64)
    params = init_params(cfg, jax.random.PRNGKey(0))
    qparams = quantize_params(params)
    # tiny test config is embedding-dominated; real sizes quantize >60% of
    # bytes (the embedding stays float as a gather table)
    assert quantized_fraction(qparams) > 0.05

    mel = rng.standard_normal((1, cfg.n_mels, 128)).astype(np.float32)
    tokens = rng.integers(0, cfg.n_vocab, (1, 5)).astype(np.int32)

    feats = enc_mod.encode(params, cfg, mel)
    feats_q = enc_mod.encode(qparams, cfg, mel)
    # activations should track closely (int8 weight noise only)
    rel = (np.abs(np.asarray(feats - feats_q)).mean()
           / (np.abs(np.asarray(feats)).mean() + 1e-9))
    assert rel < 0.05

    logits = dec_mod.decoder_forward(params, cfg, tokens, audio_features=feats)
    logits_q = dec_mod.decoder_forward(qparams, cfg, tokens,
                                       audio_features=feats_q)
    # argmax (the decode decision) should agree for most positions
    agree = (np.argmax(np.asarray(logits), -1)
             == np.argmax(np.asarray(logits_q), -1)).mean()
    assert agree >= 0.6


def test_quantized_decode_runs(rng):
    from openai_whisper_coreml_tpu.decoding import DecodingOptions, decode
    from openai_whisper_coreml_tpu.models.whisper import WhisperModel

    cfg = tiny_test_config(n_state=256, n_head=4, n_layer=2, n_audio_ctx=64,
                           n_text_ctx=64)
    params = quantize_params(init_params(cfg, jax.random.PRNGKey(0)))
    model = WhisperModel(cfg=cfg, params=params)
    mel = rng.standard_normal((1, cfg.n_mels, 128)).astype(np.float32)
    res = decode(model, mel, DecodingOptions(language="en", sample_len=6))
    assert res[0].tokens


def test_int8_cross_kv_decode_matches_bf16(rng):
    """kv_dtype=int8 greedy decode should track the bf16 path closely
    (argmax decisions mostly identical on a random model)."""
    from openai_whisper_coreml_tpu.decoding import DecodingOptions, decode
    from openai_whisper_coreml_tpu.models.whisper import WhisperModel

    cfg = tiny_test_config(n_state=256, n_head=4, n_layer=2, n_audio_ctx=64,
                           n_text_ctx=64)
    model = WhisperModel(cfg=cfg, params=init_params(cfg, jax.random.PRNGKey(0)))
    mel = rng.standard_normal((2, cfg.n_mels, 128)).astype(np.float32)
    a = decode(model, mel, DecodingOptions(language="en", sample_len=8,
                                           without_timestamps=True))
    b = decode(model, mel, DecodingOptions(language="en", sample_len=8,
                                           without_timestamps=True,
                                           kv_dtype="int8"))
    # identical lengths; tokens should agree at most positions
    agree = np.mean([x == y for x, y in zip(a[0].tokens, b[0].tokens)])
    assert agree >= 0.5
    assert abs(a[0].avg_logprob - b[0].avg_logprob) < 0.5


def test_int8_self_kv_cache_decode_matches_bf16(rng):
    """cache_dtype=int8 (quantised self-attention KV cache, inline dequant)
    greedy decode should track the bf16 cache closely."""
    from openai_whisper_coreml_tpu.decoding import DecodingOptions, decode
    from openai_whisper_coreml_tpu.models.whisper import WhisperModel

    cfg = tiny_test_config(n_state=256, n_head=4, n_layer=2, n_audio_ctx=64,
                           n_text_ctx=64)
    model = WhisperModel(cfg=cfg, params=init_params(cfg, jax.random.PRNGKey(0)))
    mel = rng.standard_normal((2, cfg.n_mels, 128)).astype(np.float32)
    a = decode(model, mel, DecodingOptions(language="en", sample_len=8,
                                           without_timestamps=True))
    b = decode(model, mel, DecodingOptions(language="en", sample_len=8,
                                           without_timestamps=True,
                                           cache_dtype="int8"))
    agree = np.mean([x == y for x, y in zip(a[0].tokens, b[0].tokens)])
    assert agree >= 0.5
    assert abs(a[0].avg_logprob - b[0].avg_logprob) < 0.5


def test_int8_everything_beam_decode_runs(rng):
    """Beam search with int8 cross-KV + int8 self-cache (gather_cache path)."""
    from openai_whisper_coreml_tpu.decoding import DecodingOptions, decode
    from openai_whisper_coreml_tpu.models.whisper import WhisperModel

    cfg = tiny_test_config(n_state=256, n_head=4, n_layer=2, n_audio_ctx=64,
                           n_text_ctx=64)
    model = WhisperModel(cfg=cfg, params=init_params(cfg, jax.random.PRNGKey(0)))
    mel = rng.standard_normal((1, cfg.n_mels, 128)).astype(np.float32)
    res = decode(model, mel, DecodingOptions(
        language="en", sample_len=6, beam_size=2, without_timestamps=True,
        kv_dtype="int8", cache_dtype="int8"))
    assert res[0].tokens
    assert all(0 <= t < cfg.n_vocab for t in res[0].tokens)


def test_quant_cache_prefill_matches_stepwise(rng):
    """Prefill (T>1) then stepwise decode on the int8 cache must produce the
    same logits trajectory as pure stepwise updates (quantisation is
    per-position, so block vs single-position writes are identical)."""
    import jax.numpy as jnp

    from openai_whisper_coreml_tpu.models import decoder as dec_mod

    cfg = tiny_test_config(n_state=128, n_head=4, n_layer=2, n_audio_ctx=32,
                           n_text_ctx=32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    feats = jnp.asarray(
        rng.standard_normal((1, cfg.n_audio_ctx, 128)).astype(np.float32))
    cross = dec_mod.precompute_cross_kv(params, cfg, feats)
    toks = jnp.asarray(rng.integers(0, cfg.n_base_tokens, (1, 5)), jnp.int32)

    cache_a = dec_mod.init_kv_cache_int8(cfg, 1, ctx=16)
    logits_block, cache_a = dec_mod.decode_step(
        params, cfg, toks, cross, cache_a, 0)

    cache_b = dec_mod.init_kv_cache_int8(cfg, 1, ctx=16)
    outs = []
    for t in range(5):
        lg, cache_b = dec_mod.decode_step(
            params, cfg, toks[:, t : t + 1], cross, cache_b, t)
        outs.append(np.asarray(lg)[:, 0])
    np.testing.assert_allclose(
        np.asarray(logits_block)[0], np.stack(outs, axis=1)[0], atol=5e-4)
