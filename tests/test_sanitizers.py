"""Numerical-sanitizer tests (SURVEY.md §5: the TPU-native stand-in for the
reference's absent race/sanitizer story is jax_debug_nans + interpret-mode
kernel validation, both exercised here)."""

import numpy as np
import pytest

import jax

from openai_whisper_coreml_tpu.config import tiny_test_config
from openai_whisper_coreml_tpu.models import decoder as dec_mod
from openai_whisper_coreml_tpu.models import encoder as enc_mod
from openai_whisper_coreml_tpu.params import init_params


def test_forward_clean_under_debug_nans(rng):
    """encode + teacher-forcing decode must not trip jax_debug_nans — the
    -1e30 mask values and fp32 softmax are designed to avoid inf-inf NaNs."""
    cfg = tiny_test_config(n_state=64, n_head=2, n_layer=2, n_audio_ctx=64,
                           n_text_ctx=64)
    params = init_params(cfg, jax.random.PRNGKey(0))
    mel = rng.standard_normal((2, cfg.n_mels, 128)).astype(np.float32)
    tokens = rng.integers(0, cfg.n_vocab, (2, 5)).astype(np.int32)
    with jax.debug_nans(True):
        feats = enc_mod.encode(params, cfg, mel)
        logits = dec_mod.decoder_forward(params, cfg, tokens,
                                         audio_features=feats)
        np.asarray(logits)


def test_decode_loop_clean_under_debug_nans(rng):
    from openai_whisper_coreml_tpu.decoding import DecodingOptions, decode
    from openai_whisper_coreml_tpu.models.whisper import WhisperModel

    cfg = tiny_test_config(n_state=64, n_head=2, n_layer=2, n_audio_ctx=64,
                           n_text_ctx=64)
    model = WhisperModel(cfg=cfg, params=init_params(cfg, jax.random.PRNGKey(0)))
    mel = rng.standard_normal((1, cfg.n_mels, 128)).astype(np.float32)
    with jax.debug_nans(True):
        results = decode(model, mel,
                         DecodingOptions(language="en", sample_len=6))
    assert results[0].tokens


def test_flash_attention_fully_masked_rows_are_finite(rng):
    """Padded query rows see only masked keys; the l==0 guard must keep the
    output finite (no 0/0)."""
    from openai_whisper_coreml_tpu.ops.flash_attention import flash_attention

    q = rng.standard_normal((1, 130, 2, 64)).astype(np.float32)
    k = rng.standard_normal((1, 130, 2, 64)).astype(np.float32)
    v = rng.standard_normal((1, 130, 2, 64)).astype(np.float32)
    out = np.asarray(flash_attention(q, k, v))  # pads 130 -> 256 internally
    assert np.isfinite(out).all()
