"""End-to-end fine-tune driver test (subprocess, tiny corpus, few steps)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from openai_whisper_coreml_tpu.utils import audio_io

    root = tmp_path_factory.mktemp("ft_corpus")
    rng = np.random.default_rng(0)
    for i in range(4):
        t = np.arange(16000) / 16000
        x = (0.2 * np.sin(2 * np.pi * (160 + 30 * i) * t)
             + 0.01 * rng.standard_normal(t.shape)).astype(np.float32)
        audio_io.save_wav(str(root / f"u{i}.wav"), x, 16000)
        (root / f"u{i}.txt").write_text(f"utterance number {i}")
    return str(root)


@pytest.mark.slow
def test_finetune_runs_and_saves(corpus, tmp_path):
    out = str(tmp_path / "ft")
    # tiny real model is too slow for CPU CI; monkeypatch via env-config is
    # overkill — run 2 steps at batch 2 with the real 'tiny' model but the
    # shortest possible sequences
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "finetune.py"), corpus,
         "--model", "tiny", "--steps", "2", "--batch-size", "2",
         "--max-len", "12", "--log-every", "1", "--output", out],
        capture_output=True, text=True, timeout=1800,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "loss=" in proc.stdout
    assert os.path.exists(out + "-final.safetensors")


def test_selective_finetune_freezes_pattern_complement():
    """TrainConfig(trainable=...): frozen leaves stay bit-exact through an
    optimizer step, trained leaves move, and a no-match pattern raises."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from openai_whisper_coreml_tpu.config import tiny_test_config
    from openai_whisper_coreml_tpu.params import init_params
    from openai_whisper_coreml_tpu.parallel import make_mesh
    from openai_whisper_coreml_tpu.tokenizer import get_tokenizer
    from openai_whisper_coreml_tpu.train import (
        TrainConfig, make_batch, make_train_step)

    cfg = tiny_test_config(n_state=64, n_head=2, n_layer=2,
                           n_audio_ctx=32, n_text_ctx=32)
    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    params0 = init_params(cfg, jax.random.PRNGKey(0))
    before = jax.tree.map(np.asarray, params0)

    init_fn, step_fn = make_train_step(
        cfg, mesh, TrainConfig(learning_rate=1e-2, trainable="^decoder",
                               remat=False))
    params, opt_state = init_fn(params0)
    tok = get_tokenizer(cfg)
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, cfg.n_mels, 64)).astype(np.float32)
    mel, tokens, mask = make_batch(cfg, tok, mel, ["a b", "c d"], max_len=12)
    params, opt_state, metrics = step_fn(
        params, opt_state, jnp.asarray(mel), jnp.asarray(tokens),
        jnp.asarray(mask))
    assert np.isfinite(float(metrics["loss"]))

    after = jax.tree.map(np.asarray, params)
    np.testing.assert_array_equal(
        after["encoder"]["blocks"]["attn"]["q"]["w"],
        before["encoder"]["blocks"]["attn"]["q"]["w"])
    assert not np.array_equal(
        after["decoder"]["blocks"]["attn"]["q"]["w"],
        before["decoder"]["blocks"]["attn"]["q"]["w"])

    with pytest.raises(ValueError, match="matches no parameters"):
        ifn, _ = make_train_step(
            cfg, mesh, TrainConfig(trainable="nonexistent_leaf_zz"))
        ifn(init_params(cfg, jax.random.PRNGKey(1)))


def test_trainable_clip_ignores_frozen_gradients():
    """The global-norm clip is computed over trainable gradients only:
    adapter updates are identical whether frozen-leaf gradients are tiny
    or enormous (review finding: clip-before-freeze throttled adapters)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from openai_whisper_coreml_tpu.train import TrainConfig, make_optimizer

    params = {"base": {"w": jnp.ones((4, 4))},
              "head": {"lora_a": jnp.ones((4, 2))}}
    tc = TrainConfig(learning_rate=1e-2, trainable="lora_",
                     max_grad_norm=1.0)
    small = {"base": {"w": jnp.zeros((4, 4))},
             "head": {"lora_a": jnp.full((4, 2), 0.1)}}
    huge = {"base": {"w": jnp.full((4, 4), 1e6)},
            "head": {"lora_a": jnp.full((4, 2), 0.1)}}

    for grads_a, grads_b in [(small, huge)]:
        opt = make_optimizer(tc, params=params)
        st = opt.init(params)
        upd_a, _ = opt.update(grads_a, st, params)
        opt2 = make_optimizer(tc, params=params)
        st2 = opt2.init(params)
        upd_b, _ = opt2.update(grads_b, st2, params)
    np.testing.assert_allclose(np.asarray(upd_a["head"]["lora_a"]),
                               np.asarray(upd_b["head"]["lora_a"]),
                               atol=1e-7)
    np.testing.assert_array_equal(np.asarray(upd_b["base"]["w"]), 0.0)
