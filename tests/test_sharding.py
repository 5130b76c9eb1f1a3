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
