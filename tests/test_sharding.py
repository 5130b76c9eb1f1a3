"""Mesh/sharding tests on the 8-device virtual CPU backend (SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from openai_whisper_coreml_tpu.config import tiny_test_config
from openai_whisper_coreml_tpu.models import decoder as dec_mod
from openai_whisper_coreml_tpu.models import encoder as enc_mod
from openai_whisper_coreml_tpu.parallel import (
    make_mesh,
    param_pspecs,
    shard_params,
)
from openai_whisper_coreml_tpu.params import init_params


@pytest.fixture(scope="module")
def cfg():
    # widths divisible by the model axis (4): 128/4=32, heads 4
    return tiny_test_config(n_state=128, n_head=4, n_layer=2, n_audio_ctx=64,
                            n_text_ctx=64)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_pspec_tree_matches_param_tree(cfg):
    params = init_params(cfg, jax.random.PRNGKey(0))
    specs = param_pspecs(cfg)
    ps = jax.tree.structure(params)
    ss = jax.tree.structure(specs, is_leaf=lambda x: isinstance(x, P))
    assert ps == ss


@pytest.mark.parametrize("n_model", [2, 4])
def test_sharded_forward_matches_single_device(cfg, n_model):
    """TP+DP forward must be numerically identical to unsharded execution."""
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((4, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(np.float32)
    tokens = rng.integers(0, cfg.n_vocab, (4, 5)).astype(np.int32)

    feats_ref = enc_mod.encode(params, cfg, mel)
    logits_ref = dec_mod.decoder_forward(params, cfg, tokens,
                                         audio_features=feats_ref)

    mesh = make_mesh(n_model=n_model)
    with jax.set_mesh(mesh):
        sharded = shard_params(params, cfg, mesh)

        @jax.jit
        def fwd(p, mel, tokens):
            feats = enc_mod.encode(p, cfg, mel)
            return dec_mod.decoder_forward(p, cfg, tokens,
                                           audio_features=feats)

        logits = fwd(sharded, mel, tokens)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits_ref),
                               atol=2e-3)
    mean_err = np.abs(np.asarray(logits) - np.asarray(logits_ref)).mean()
    assert mean_err < 2e-4


def test_train_step_runs_sharded(cfg):
    from openai_whisper_coreml_tpu.tokenizer import get_tokenizer
    from openai_whisper_coreml_tpu.train import (
        TrainConfig,
        make_batch,
        make_train_step,
    )

    params = init_params(cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(n_model=2)  # 4-way DP x 2-way TP
    init_fn, step_fn = make_train_step(cfg, mesh, TrainConfig(remat=True))
    params, opt_state = init_fn(params)

    tok = get_tokenizer(cfg)
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((4, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(np.float32)
    mel, tokens, mask = make_batch(cfg, tok, mel,
                                   ["hello there", "two words", "a", "longer text here"],
                                   max_len=24)

    losses = []
    for _ in range(3):
        params, opt_state, metrics = step_fn(params, opt_state, mel,
                                             jnp.asarray(tokens),
                                             jnp.asarray(mask))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # optimizing on a fixed batch must reduce the loss
    assert losses[-1] < losses[0]


# ---------------------------------------------------------------------------
# Sharded DECODE path (the production serving graph, not just forward)
# ---------------------------------------------------------------------------

def _make_models(cfg, n_data, n_model):
    """(unsharded, mesh-sharded) WhisperModel pair with identical params."""
    from openai_whisper_coreml_tpu.models.whisper import WhisperModel
    from openai_whisper_coreml_tpu.parallel.sharding import shard_params

    params = init_params(cfg, jax.random.PRNGKey(0))
    ref = WhisperModel(cfg=cfg, params=params)
    mesh = make_mesh(n_data=n_data, n_model=n_model)
    sharded = WhisperModel(cfg=cfg, params=shard_params(params, cfg, mesh),
                           mesh=mesh)
    return ref, sharded


@pytest.mark.parametrize("n_data,n_model", [(2, 4), (4, 2)])
def test_sharded_greedy_decode_token_exact(cfg, n_data, n_model):
    """The full KV-cache greedy decode loop under a DP x TP mesh must emit
    the exact token sequences of unsharded execution."""
    from openai_whisper_coreml_tpu.decoding import DecodingOptions, decode

    ref, sharded = _make_models(cfg, n_data, n_model)
    rng = np.random.default_rng(3)
    mel = rng.standard_normal((4, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(np.float32)
    opts = DecodingOptions(language="en", sample_len=12)

    res_ref = decode(ref, mel, opts)
    res_sh = decode(sharded, mel, opts)
    for a, b in zip(res_ref, res_sh):
        assert a.tokens == b.tokens
        np.testing.assert_allclose(a.avg_logprob, b.avg_logprob, atol=1e-3)
        np.testing.assert_allclose(a.no_speech_prob, b.no_speech_prob,
                                   atol=1e-3)


def test_sharded_beam_decode_token_exact(cfg):
    """Beam search (cache gather/reorder per step) under the mesh must match
    unsharded beams token for token."""
    from openai_whisper_coreml_tpu.decoding import DecodingOptions, decode

    ref, sharded = _make_models(cfg, 2, 4)
    rng = np.random.default_rng(4)
    mel = rng.standard_normal((2, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(np.float32)
    opts = DecodingOptions(language="en", sample_len=8, beam_size=2)

    res_ref = decode(ref, mel, opts)
    res_sh = decode(sharded, mel, opts)
    for a, b in zip(res_ref, res_sh):
        assert a.tokens == b.tokens


def test_sharded_decode_pads_odd_batch(cfg):
    """Batches that do not divide the data axis are padded and trimmed."""
    from openai_whisper_coreml_tpu.decoding import DecodingOptions, decode

    ref, sharded = _make_models(cfg, 4, 2)
    rng = np.random.default_rng(5)
    mel = rng.standard_normal((3, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(np.float32)
    opts = DecodingOptions(language="en", sample_len=6)
    res_ref = decode(ref, mel, opts)
    res_sh = decode(sharded, mel, opts)
    assert len(res_sh) == 3
    for a, b in zip(res_ref, res_sh):
        assert a.tokens == b.tokens


def test_sharded_language_detection(cfg):
    """detect_language (the reference's capability) under the mesh."""
    from openai_whisper_coreml_tpu.decoding import detect_language

    ref, sharded = _make_models(cfg, 2, 4)
    rng = np.random.default_rng(6)
    mel = rng.standard_normal((2, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(np.float32)
    codes_ref, probs_ref = detect_language(ref, mel)
    codes_sh, probs_sh = detect_language(sharded, mel)
    assert codes_ref == codes_sh
    for pr, ps in zip(probs_ref, probs_sh):
        top_r = max(pr, key=pr.get)
        np.testing.assert_allclose(pr[top_r], ps[top_r], atol=1e-3)


def test_sharded_continuous_batching_token_exact(cfg):
    """The continuous-batching engine under a DP x TP mesh must match the
    unsharded STATIC scheduler token-for-token (fp32: same decode math,
    different scheduling + sharding)."""
    from openai_whisper_coreml_tpu.serve import ServeOptions, transcribe_batch

    # serve windows are always 3000 mel frames -> needs the full 1500-pos
    # audio context (the module cfg fixture truncates it); stay narrow for
    # CPU speed, widths divisible by the model axis
    cfg = tiny_test_config(n_state=128, n_head=4, n_layer=2)
    ref, sharded = _make_models(cfg, 4, 2)
    rng = np.random.default_rng(7)
    sr = 16000
    audios = [(0.2 * np.sin(2 * np.pi * (200 + 40 * i)
                            * np.arange(int(sr * d)) / sr)
               + 0.02 * rng.standard_normal(int(sr * d))).astype(np.float32)
              for i, d in enumerate([0.9, 1.2, 0.8, 1.1, 0.7])]
    common = dict(language="en", temperature=(0.0,), sample_len=8,
                  no_speech_threshold=None, logprob_threshold=None,
                  compression_ratio_threshold=None)
    res_ref = transcribe_batch(ref, audios,
                               ServeOptions(scheduler="static", batch_size=4,
                                            **common))
    res_sh = transcribe_batch(sharded, audios,
                              ServeOptions(scheduler="continuous",
                                           batch_size=4, **common))
    for a, b in zip(res_ref, res_sh):
        toks_a = [t for seg in a["segments"] for t in seg["tokens"]]
        toks_b = [t for seg in b["segments"] for t in seg["tokens"]]
        assert toks_a == toks_b


def test_sharded_flash_encoder_matches(cfg):
    """flash=True under a DP x TP mesh (shard_map-wrapped Pallas kernel) must
    match the unsharded jnp path (round-2 verdict #2: TP previously lost the
    1.6x encoder kernel because flash+mesh was forbidden)."""
    import functools

    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(8)
    mel = rng.standard_normal((4, cfg.n_mels,
                               2 * cfg.n_audio_ctx)).astype(np.float32)
    feats_ref = enc_mod.encode(params, cfg, mel)

    mesh = make_mesh(n_data=4, n_model=2)
    with jax.set_mesh(mesh):
        sharded = shard_params(params, cfg, mesh)
        feats = jax.jit(functools.partial(enc_mod.encode, cfg=cfg,
                                          flash=True))(sharded, mel=mel)
    np.testing.assert_allclose(np.asarray(feats), np.asarray(feats_ref),
                               atol=2e-3)
    assert np.abs(np.asarray(feats) - np.asarray(feats_ref)).mean() < 2e-4


def test_sharded_flash_odd_heads_falls_back(cfg):
    """Head counts the model axis cannot divide fall back to the jnp path
    inside flash_attention_auto (returns None) instead of crashing."""
    c = tiny_test_config(n_state=96, n_head=3, n_layer=1, n_audio_ctx=64,
                         n_text_ctx=64)
    params = init_params(c, jax.random.PRNGKey(0))
    rng = np.random.default_rng(9)
    mel = rng.standard_normal((4, c.n_mels,
                               2 * c.n_audio_ctx)).astype(np.float32)
    feats_ref = enc_mod.encode(params, c, mel)
    import functools

    mesh = make_mesh(n_data=4, n_model=2)
    with jax.set_mesh(mesh):
        # params stay host-side (3 heads won't TP-shard) — replicate them
        feats = jax.jit(functools.partial(enc_mod.encode, cfg=c,
                                          flash=True))(params, mel=mel)
    np.testing.assert_allclose(np.asarray(feats), np.asarray(feats_ref),
                               atol=2e-3)
