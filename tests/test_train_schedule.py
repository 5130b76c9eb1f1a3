"""LR schedules (warmup/linear/cosine) and gradient accumulation.

Optimizer-level exactness first (warmup zero-step, accumulation ==
concatenated-batch step), then the mesh-sharded train step end-to-end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openai_whisper_coreml_tpu.config import tiny_test_config
from openai_whisper_coreml_tpu.params import init_params
from openai_whisper_coreml_tpu.train import (
    TrainConfig,
    learning_rate_schedule,
    make_optimizer,
)


def _tree_norm(tree):
    return float(jnp.sqrt(sum(jnp.sum(x * x) for x in jax.tree.leaves(tree))))


def test_warmup_starts_at_zero_lr():
    tc = TrainConfig(learning_rate=1e-2, warmup_steps=4)
    sched = learning_rate_schedule(tc)
    assert float(sched(0)) == 0.0
    assert float(sched(4)) == pytest.approx(1e-2)
    assert float(sched(100)) == pytest.approx(1e-2)  # constant after warmup

    params = {"w": jnp.ones((4, 4))}
    grads = {"w": jnp.full((4, 4), 0.5)}
    opt = make_optimizer(tc)
    state = opt.init(params)
    updates, state = opt.update(grads, state, params)
    assert _tree_norm(updates) == 0.0  # lr 0 on the first step
    updates, state = opt.update(grads, state, params)
    assert _tree_norm(updates) > 0.0


def test_cosine_and_linear_decay_to_zero():
    for kind in ("cosine", "linear"):
        tc = TrainConfig(learning_rate=1e-3, schedule=kind, warmup_steps=2,
                         total_steps=10)
        sched = learning_rate_schedule(tc)
        assert float(sched(2)) == pytest.approx(1e-3)
        mid, end = float(sched(6)), float(sched(10))
        assert 0.0 < mid < 1e-3
        assert end == pytest.approx(0.0, abs=1e-9)


def test_decay_schedules_require_total_steps():
    with pytest.raises(ValueError, match="total_steps"):
        learning_rate_schedule(TrainConfig(schedule="cosine"))
    with pytest.raises(ValueError, match="total_steps"):
        learning_rate_schedule(
            TrainConfig(schedule="linear", warmup_steps=5, total_steps=5))
    with pytest.raises(ValueError, match="unknown schedule"):
        learning_rate_schedule(TrainConfig(schedule="exponential"))
    with pytest.raises(ValueError, match="accum_steps"):
        make_optimizer(TrainConfig(accum_steps=0))


def test_accumulation_matches_mean_gradient_step():
    """Two accumulated micro-grads == one step on their mean: the first
    micro-step must not move the params, the completed window must match
    an accum_steps=1 optimizer fed the mean gradient exactly."""
    params = {"w": jnp.linspace(-1, 1, 16).reshape(4, 4)}
    g1 = {"w": jnp.full((4, 4), 0.3)}
    g2 = {"w": jnp.full((4, 4), -0.1)}
    g_mean = jax.tree.map(lambda a, b: (a + b) / 2, g1, g2)

    tc2 = TrainConfig(learning_rate=1e-2, accum_steps=2)
    opt2 = make_optimizer(tc2)
    s = opt2.init(params)
    u1, s = opt2.update(g1, s, params)
    assert _tree_norm(u1) == 0.0  # mid-window: no update emitted
    u2, s = opt2.update(g2, s, params)

    opt1 = make_optimizer(TrainConfig(learning_rate=1e-2, accum_steps=1))
    s1 = opt1.init(params)
    u_ref, _ = opt1.update(g_mean, s1, params)
    np.testing.assert_allclose(np.asarray(u2["w"]), np.asarray(u_ref["w"]),
                               rtol=1e-6, atol=1e-8)


def test_train_step_with_accumulation_and_schedule(monkeypatch):
    """Mesh-sharded step with accum_steps=2 + cosine schedule: params are
    bit-identical after the mid-window micro-step and move at window end."""
    from openai_whisper_coreml_tpu.parallel import make_mesh
    from openai_whisper_coreml_tpu.tokenizer import get_tokenizer
    from openai_whisper_coreml_tpu.train import make_batch, make_train_step

    cfg = tiny_test_config(n_state=64, n_head=2, n_layer=2)
    params = init_params(cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(n_model=2)
    init_fn, step_fn = make_train_step(
        cfg, mesh, TrainConfig(learning_rate=1e-3, schedule="cosine",
                               warmup_steps=0, total_steps=4, accum_steps=2,
                               remat=False))
    params, opt_state = init_fn(params)
    before = jax.device_get(params)

    tok = get_tokenizer(cfg)
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((4, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(
        np.float32)
    mel, tokens, mask = make_batch(cfg, tok, mel,
                                   ["a b", "c d", "e f", "g h"], max_len=16)

    params, opt_state, _ = step_fn(params, opt_state, mel,
                                   jnp.asarray(tokens), jnp.asarray(mask))
    mid = jax.device_get(params)
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(mid)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    params, opt_state, _ = step_fn(params, opt_state, mel,
                                   jnp.asarray(tokens), jnp.asarray(mask))
    # window complete: the accumulated update must now be applied
    after = jax.device_get(params)
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)))


def test_train_step_bf16_params():
    """The bf16-loaded model must be trainable (tools/finetune.py on TPU
    loads bf16 by default). Regression: the conv stem's widened-f32 output
    (preferred_element_type) made the conv non-differentiable with bf16
    operands — backward fed the f32 cotangent into a conv against bf16
    weights and lax rejected the dtype mix (hit on-chip, round 4)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from openai_whisper_coreml_tpu.config import tiny_test_config
    from openai_whisper_coreml_tpu.params import init_params
    from openai_whisper_coreml_tpu.parallel import make_mesh
    from openai_whisper_coreml_tpu.tokenizer import get_tokenizer
    from openai_whisper_coreml_tpu.train import (
        TrainConfig, make_batch, make_train_step)

    cfg = tiny_test_config(n_state=64, n_head=2, n_layer=1,
                           n_audio_ctx=64, n_text_ctx=64)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    init_fn, step_fn = make_train_step(cfg, mesh, TrainConfig(remat=True))
    params, opt = init_fn(params)
    tok = get_tokenizer(cfg)
    rng = np.random.default_rng(0)
    mel = rng.standard_normal(
        (2, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(np.float32)
    mel, tokens, mask = make_batch(cfg, tok, mel, ["a b", "c d"], max_len=12)
    _, _, metrics = step_fn(params, opt, jnp.asarray(mel),
                            jnp.asarray(tokens), jnp.asarray(mask))
    assert np.isfinite(float(metrics["loss"]))
