"""Encoder/decoder logit parity vs torch Whisper (SURVEY.md §4).

No network: we instantiate a randomly-initialised HuggingFace
WhisperForConditionalGeneration (architecture identical to openai/whisper),
convert its state dict through our HF converter, and require logit agreement.
This exercises the converter + encoder + decoder numerics end to end.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

from openai_whisper_coreml_tpu.config import tiny_test_config  # noqa: E402
from openai_whisper_coreml_tpu.models import decoder as dec_mod  # noqa: E402
from openai_whisper_coreml_tpu.models import encoder as enc_mod  # noqa: E402
from openai_whisper_coreml_tpu.models.layers import sinusoids  # noqa: E402
from openai_whisper_coreml_tpu.params import (  # noqa: E402
    count_params,
    init_params,
    params_from_hf_state_dict,
)

N_STATE, N_HEAD, N_LAYER = 64, 2, 2
N_AUDIO_CTX = 96  # keep the CPU test fast; real model uses 1500
N_VOCAB = 51865


@pytest.fixture(scope="module")
def hf_model():
    hf_cfg = transformers.WhisperConfig(
        vocab_size=N_VOCAB,
        num_mel_bins=80,
        d_model=N_STATE,
        encoder_layers=N_LAYER,
        encoder_attention_heads=N_HEAD,
        decoder_layers=N_LAYER,
        decoder_attention_heads=N_HEAD,
        encoder_ffn_dim=4 * N_STATE,
        decoder_ffn_dim=4 * N_STATE,
        max_source_positions=N_AUDIO_CTX,
        max_target_positions=448,
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        activation_function="gelu",
    )
    torch.manual_seed(0)
    model = transformers.WhisperForConditionalGeneration(hf_cfg)
    # Force the encoder positional table to the sinusoid definition (openai
    # semantics; some transformers versions random-init it).
    with torch.no_grad():
        model.model.encoder.embed_positions.weight.copy_(
            torch.from_numpy(np.asarray(sinusoids(N_AUDIO_CTX, N_STATE)))
        )
    model.eval()
    return model


@pytest.fixture(scope="module")
def cfg():
    return tiny_test_config(n_state=N_STATE, n_head=N_HEAD, n_layer=N_LAYER,
                            n_audio_ctx=N_AUDIO_CTX, n_vocab=N_VOCAB)


@pytest.fixture(scope="module")
def params(hf_model, cfg):
    return params_from_hf_state_dict(cfg, hf_model.state_dict())


def test_param_count_matches(hf_model, params):
    hf_n = sum(p.numel() for name, p in hf_model.named_parameters()
               if name != "proj_out.weight")  # tied, not a separate param
    # ours excludes the encoder positional table (computed, not stored)
    ours = count_params(params)
    hf_pos = hf_model.model.encoder.embed_positions.weight.numel()
    assert ours == hf_n - hf_pos


def test_encoder_parity(hf_model, cfg, params, rng):
    mel = rng.standard_normal((2, 80, 2 * N_AUDIO_CTX)).astype(np.float32)
    ours = np.asarray(enc_mod.encode(params, cfg, mel))
    with torch.no_grad():
        theirs = hf_model.model.encoder(torch.from_numpy(mel)).last_hidden_state
    np.testing.assert_allclose(ours, theirs.numpy(), atol=2e-4)


def test_full_logit_parity(hf_model, cfg, params, rng):
    mel = rng.standard_normal((2, 80, 2 * N_AUDIO_CTX)).astype(np.float32)
    tokens = rng.integers(0, N_VOCAB, size=(2, 7)).astype(np.int32)

    feats = enc_mod.encode(params, cfg, mel)
    ours = np.asarray(dec_mod.decoder_forward(params, cfg, tokens,
                                              audio_features=feats))
    with torch.no_grad():
        theirs = hf_model(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.from_numpy(tokens.astype(np.int64)),
        ).logits.numpy()
    # logits have magnitude ~10; 1e-3 gate from BASELINE.md
    np.testing.assert_allclose(ours, theirs, atol=1e-3)
    assert np.abs(ours - theirs).mean() < 1e-4


def test_incremental_matches_teacher_forcing(cfg, rng):
    """KV-cache decode must reproduce full-sequence logits exactly
    (the invariant the reference never needed — its decoder is single-step,
    whisper_to_cml.py:28-32)."""
    import jax.numpy as jnp
    import jax

    params = init_params(cfg, jax.random.PRNGKey(1))
    feats = jnp.asarray(
        rng.standard_normal((2, N_AUDIO_CTX, N_STATE)).astype(np.float32))
    tokens = jnp.asarray(rng.integers(0, N_VOCAB, size=(2, 6)), jnp.int32)

    full = dec_mod.decoder_forward(params, cfg, tokens, audio_features=feats)

    cross_kv = dec_mod.precompute_cross_kv(params, cfg, feats)
    cache = dec_mod.init_kv_cache(cfg, batch=2)

    # prefill first 3 tokens at once, then step one-by-one
    logits_p, cache = dec_mod.decode_step(params, cfg, tokens[:, :3], cross_kv,
                                          cache, 0)
    np.testing.assert_allclose(np.asarray(logits_p), np.asarray(full[:, :3]),
                               atol=1e-4)
    for t in range(3, 6):
        step_logits, cache = dec_mod.decode_step(
            params, cfg, tokens[:, t : t + 1], cross_kv, cache, t)
        np.testing.assert_allclose(np.asarray(step_logits[:, 0]),
                                   np.asarray(full[:, t]), atol=1e-4)
