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


def test_train_state_resume_bit_exact(tmp_path):
    """save_train_state at step 2, restore into a FRESH train step, continue
    — final params bit-identical to the uninterrupted 4-step run. Cosine
    schedule + grad accumulation ride along: their positions live in
    opt_state."""
    import jax
    import jax.numpy as jnp

    from openai_whisper_coreml_tpu.config import tiny_test_config
    from openai_whisper_coreml_tpu.params import init_params
    from openai_whisper_coreml_tpu.parallel import make_mesh
    from openai_whisper_coreml_tpu.tokenizer import get_tokenizer
    from openai_whisper_coreml_tpu.train import (
        TrainConfig, make_batch, make_train_step)
    from openai_whisper_coreml_tpu.utils.checkpoint import (
        restore_train_state, save_train_state)

    cfg = tiny_test_config(n_state=64, n_head=2, n_layer=2,
                           n_audio_ctx=32, n_text_ctx=32)
    tc = TrainConfig(learning_rate=1e-2, schedule="cosine", warmup_steps=1,
                     total_steps=2, accum_steps=2, remat=False)
    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    tok = get_tokenizer(cfg)
    rng = np.random.default_rng(0)
    batches = []
    for s in range(4):
        mel = rng.standard_normal((2, cfg.n_mels, 64)).astype(np.float32)
        mel, tokens, mask = make_batch(cfg, tok, mel,
                                       [f"a {s}", f"b {s}"], max_len=12)
        batches.append((jnp.asarray(mel), jnp.asarray(tokens),
                        jnp.asarray(mask)))

    # uninterrupted 4 steps (fresh init_params per run: init_fn's
    # device_put can alias its input, which step_fn then donates)
    init_fn, step_fn = make_train_step(cfg, mesh, tc)
    params, opt_state = init_fn(init_params(cfg, jax.random.PRNGKey(0)))
    for mel, tokens, mask in batches:
        params, opt_state, _ = step_fn(params, opt_state, mel, tokens, mask)
    want = jax.device_get(params)

    # interrupted at step 2 + resumed into a fresh step/optimizer
    init_fn, step_fn = make_train_step(cfg, mesh, tc)
    params, opt_state = init_fn(init_params(cfg, jax.random.PRNGKey(0)))
    for mel, tokens, mask in batches[:2]:
        params, opt_state, _ = step_fn(params, opt_state, mel, tokens, mask)
    ckpt = str(tmp_path / "state")
    save_train_state(ckpt, jax.device_get(params),
                     opt_state=jax.device_get(opt_state), step=2)

    init_fn2, step_fn2 = make_train_step(cfg, mesh, tc)
    params2, opt_state2 = init_fn2(init_params(cfg, jax.random.PRNGKey(7)))
    template = {"params": params2, "opt_state": opt_state2,
                "step": np.asarray(0, np.int64)}
    state = restore_train_state(ckpt, template)
    assert int(state["step"]) == 2
    params2, opt_state2 = state["params"], state["opt_state"]
    for mel, tokens, mask in batches[2:]:
        params2, opt_state2, _ = step_fn2(params2, opt_state2, mel, tokens,
                                          mask)
    got = jax.device_get(params2)
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eval_batches_pad_rows_carry_zero_weight(tmp_path):
    """The cycle-padded tail rows of the last eval batch contribute no
    tokens, and run_eval token-weights across batches."""
    import sys as _sys

    if REPO not in _sys.path:
        _sys.path.insert(0, REPO)
    from types import SimpleNamespace

    from openai_whisper_coreml_tpu.config import tiny_test_config
    from openai_whisper_coreml_tpu.tokenizer import get_tokenizer
    from openai_whisper_coreml_tpu.utils import audio_io
    from tools.finetune import eval_batches, run_eval

    cfg = tiny_test_config(n_state=64, n_head=2, n_layer=2)
    tok = get_tokenizer(cfg)
    utts = []
    for i in range(3):
        p = str(tmp_path / f"e{i}.wav")
        audio_io.save_wav(p, np.zeros(16000, np.float32), 16000)
        utts.append(SimpleNamespace(utt_id=f"e{i}", audio_path=p,
                                    reference=f"ref number {i}"))

    batches = eval_batches(utts, 2, cfg, tok, max_len=12)
    assert len(batches) == 2
    _, _, mask_last = batches[-1]
    assert mask_last.shape[0] == 2
    assert mask_last[0].sum() > 0  # the real row
    assert mask_last[1].sum() == 0  # the cycled pad row

    # token-weighted aggregation: batch weights follow their token counts
    fake = [({"loss": 1.0, "accuracy": 1.0, "tokens": 3.0},),
            ({"loss": 2.0, "accuracy": 0.0, "tokens": 1.0},)]
    it = iter(fake)

    def stub_eval(params, mel, tokens, mask):
        return next(it)[0]

    loss, acc = run_eval(stub_eval, None, [(None, None, None)] * 2)
    assert loss == pytest.approx((1.0 * 3 + 2.0 * 1) / 4)
    assert acc == pytest.approx(3 / 4)


@pytest.mark.slow
def test_finetune_runs_and_saves(corpus, tmp_path):
    out = str(tmp_path / "ft")
    # tiny real model is too slow for CPU CI; monkeypatch via env-config is
    # overkill — run 2 steps at batch 2 with the real 'tiny' model but the
    # shortest possible sequences
    state_dir = str(tmp_path / "state")
    common = [sys.executable, os.path.join(REPO, "tools", "finetune.py"),
              corpus, "--model", "tiny", "--batch-size", "2",
              "--max-len", "12", "--log-every", "1", "--output", out,
              "--schedule", "cosine", "--warmup-steps", "1",
              "--holdout", "0.25", "--eval-every", "2",
              "--save-state", state_dir]
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    proc = subprocess.run(common + ["--steps", "2"], capture_output=True,
                          text=True, timeout=1800, env=env)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "loss=" in proc.stdout
    assert "3 train / 1 held-out" in proc.stdout
    assert "eval step 2:" in proc.stdout
    assert os.path.exists(out + "-final.safetensors")
    assert os.path.isdir(state_dir)

    # resume from the saved state and run one more step
    proc = subprocess.run(common + ["--steps", "3", "--resume", state_dir],
                          capture_output=True, text=True, timeout=1800,
                          env=env)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "resumed" in proc.stdout and "at step 2" in proc.stdout
    assert "step 3: loss=" in proc.stdout
    assert "eval step 3:" in proc.stdout


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
