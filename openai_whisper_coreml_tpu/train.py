"""Training / fine-tuning: sharded cross-entropy step over a (data, model) mesh.

The reference has no training story (weights are baked into .mlpackage files
at export time, /root/reference/whisper_to_cml.py:45-52). A production
framework needs fine-tuning: this module provides a pjit-able train step —
teacher-forcing cross entropy on (mel, tokens) pairs, AdamW via optax, DP over
the batch axis + TP over the model axis, with rematerialised blocks so
activation memory stays flat in depth.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .config import WhisperConfig
from .models import decoder as dec_mod
from .models import encoder as enc_mod
from .parallel.mesh import AXIS_DATA, AXIS_MODEL
from .parallel.sharding import param_shardings

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-5
    weight_decay: float = 0.01
    b1: float = 0.9
    b2: float = 0.98
    eps: float = 1e-6
    max_grad_norm: float = 1.0
    remat: bool = True
    # Pallas flash-attention in the encoder forward (backward = reference
    # recompute via the kernel's custom VJP — ops/flash_attention.py)
    flash: bool = False
    # selective fine-tuning: regex over slash-joined param paths (e.g.
    # "^decoder" trains only the decoder; "ln|bias" is BitFit-style).
    # Frozen leaves keep their values bit-exactly AND allocate no AdamW
    # moments — at whisper scale, decoder-only tuning drops ~2/3 of the
    # optimizer HBM. None = full fine-tune.
    trainable: Optional[str] = None
    # learning-rate schedule: "constant" (default), "linear", or "cosine" —
    # each preceded by a linear 0 -> learning_rate warmup over warmup_steps.
    # Decaying schedules need total_steps (the full horizon in OPTIMIZER
    # updates — with gradient accumulation that is micro_steps/accum_steps).
    schedule: str = "constant"
    warmup_steps: int = 0
    total_steps: Optional[int] = None
    # gradient accumulation: average grads over this many micro-batches per
    # optimizer update (optax.MultiSteps). Costs one params-sized fp32
    # accumulator in HBM; the effective batch is accum_steps * batch_size.
    accum_steps: int = 1


def _param_path_labels(params: Params, pattern: str) -> Params:
    """'train'/'freeze' label per leaf by regex over 'decoder/blocks/...'
    paths (the flatten_params naming used across checkpoints/sharding)."""
    import re

    rx = re.compile(pattern)

    def path_str(path) -> str:
        return "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path)

    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: "train" if rx.search(path_str(path)) else "freeze",
        params)
    if not any(v == "train" for v in jax.tree.leaves(labels)):
        raise ValueError(
            f"trainable pattern {pattern!r} matches no parameters")
    return labels


def learning_rate_schedule(tc: TrainConfig):
    """Resolve TrainConfig's schedule fields to an optax learning rate
    (a float for the bare constant case, else a step -> lr schedule)."""
    if tc.schedule not in ("constant", "linear", "cosine"):
        raise ValueError(f"unknown schedule {tc.schedule!r} "
                         "(constant | linear | cosine)")
    if tc.schedule == "constant":
        if tc.warmup_steps <= 0:
            return tc.learning_rate
        return optax.join_schedules(
            [optax.linear_schedule(0.0, tc.learning_rate, tc.warmup_steps),
             optax.constant_schedule(tc.learning_rate)],
            [tc.warmup_steps])
    if tc.total_steps is None or tc.total_steps <= tc.warmup_steps:
        raise ValueError(
            f"{tc.schedule} schedule needs total_steps > warmup_steps "
            f"(got total_steps={tc.total_steps}, "
            f"warmup_steps={tc.warmup_steps})")
    decay_steps = tc.total_steps - tc.warmup_steps
    if tc.schedule == "cosine":
        decay = optax.cosine_decay_schedule(tc.learning_rate, decay_steps)
    else:
        decay = optax.linear_schedule(tc.learning_rate, 0.0, decay_steps)
    return optax.join_schedules(
        [optax.linear_schedule(0.0, tc.learning_rate,
                               max(tc.warmup_steps, 1)),
         decay],
        [tc.warmup_steps])


def make_optimizer(tc: TrainConfig,
                   params: Optional[Params] = None
                   ) -> optax.GradientTransformation:
    lr = learning_rate_schedule(tc)
    adamw = optax.adamw(lr, b1=tc.b1, b2=tc.b2, eps=tc.eps,
                        weight_decay=tc.weight_decay)
    if tc.trainable is None:
        opt = optax.chain(
            optax.clip_by_global_norm(tc.max_grad_norm),
            adamw,
        )
    else:
        if params is None:
            raise ValueError("trainable pattern needs the params tree to "
                             "derive labels (pass params=)")
        labels = _param_path_labels(params, tc.trainable)
        opt = optax.chain(
            # zero frozen grads FIRST so the global-norm clip is computed
            # over the trainable set only — otherwise large frozen-base
            # gradients throttle the (tiny) adapter updates by a
            # step-varying factor
            optax.multi_transform(
                {"train": optax.identity(), "freeze": optax.set_to_zero()},
                param_labels=labels),
            optax.clip_by_global_norm(tc.max_grad_norm),
            # the freeze transform again around AdamW: zero grads alone
            # would still apply weight decay and allocate moments on
            # frozen leaves
            optax.multi_transform(
                {"train": adamw, "freeze": optax.set_to_zero()},
                param_labels=labels),
        )
    if tc.accum_steps < 1:
        raise ValueError(f"accum_steps must be >= 1, got {tc.accum_steps}")
    if tc.accum_steps > 1:
        # grads are MEANED over the window, so the update equals one step
        # on the concatenated batch; the wrapped schedule advances once per
        # completed window, not per micro-batch
        opt = optax.MultiSteps(opt, every_k_schedule=tc.accum_steps)
    return opt


def loss_fn(
    params: Params,
    cfg: WhisperConfig,
    mel: jax.Array,  # (B, n_mels, 3000)
    tokens: jax.Array,  # (B, T) — [sot_sequence, text..., eot], padded
    loss_mask: jax.Array,  # (B, T) float — 1 where the NEXT token is a target
    *,
    remat: bool = True,
    flash: bool = False,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Teacher-forcing CE: predict tokens[:, 1:] from tokens[:, :-1]."""
    feats = enc_mod.encode(params, cfg, mel, remat=remat, flash=flash)
    logits = dec_mod.decoder_forward(params, cfg, tokens[:, :-1],
                                     audio_features=feats, remat=remat)
    targets = tokens[:, 1:]
    mask = loss_mask[:, 1:].astype(jnp.float32)

    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logprobs, targets[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(mask.sum(), 1.0)
    loss = (nll * mask).sum() / denom

    acc = ((jnp.argmax(logits, axis=-1) == targets) * mask).sum() / denom
    return loss, {"loss": loss, "accuracy": acc, "tokens": mask.sum()}


def make_train_step(
    cfg: WhisperConfig,
    mesh: Mesh,
    tc: TrainConfig = TrainConfig(),
):
    """Build (init_fn, step_fn) jitted over the mesh.

    step_fn(params, opt_state, batch) -> (params, opt_state, metrics), with
    params/opt_state TP-sharded and the batch DP-sharded; XLA inserts the
    gradient all-reduce over "data" and the TP collectives over "model".
    """
    # the optimizer is built on first use: trainable-pattern labels need
    # the params TREE (structure only — label derivation never reads values,
    # so tracing through step_fn is fine)
    _opt_cell: Dict[str, Any] = {}

    def _optimizer(params) -> optax.GradientTransformation:
        if "opt" not in _opt_cell:
            _opt_cell["opt"] = make_optimizer(tc, params=params)
        return _opt_cell["opt"]

    batch_sharding = NamedSharding(mesh, P(AXIS_DATA))
    rep = NamedSharding(mesh, P())

    def init_opt_state(params: Params):
        return _optimizer(params).init(params)

    def _build_step(params):
        # shardings are aligned to the ACTUAL params tree (extra leaves like
        # LoRA adapters get replicated specs), so the jitted step is built
        # on first use rather than at make_train_step time
        pshard = param_shardings(cfg, mesh, params=params)

        @functools.partial(
            jax.jit,
            in_shardings=(pshard, None, batch_sharding, batch_sharding,
                          batch_sharding),
            out_shardings=(pshard, None, rep),
            donate_argnums=(0, 1),
        )
        def step(params, opt_state, mel, tokens, loss_mask):
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, cfg, mel, tokens, loss_mask,
                                       remat=tc.remat, flash=tc.flash)
            updates, opt_state = _optimizer(params).update(
                grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        return step

    def step_fn(params, opt_state, mel, tokens, loss_mask):
        if "step" not in _opt_cell:
            _opt_cell["step"] = _build_step(params)
        return _opt_cell["step"](params, opt_state, mel, tokens, loss_mask)

    def init_fn(params: Params):
        params = jax.device_put(
            params, param_shardings(cfg, mesh, params=params))
        opt_state = jax.jit(init_opt_state)(params)
        return params, opt_state

    return init_fn, step_fn


def make_eval_step(
    cfg: WhisperConfig,
    mesh: Mesh,
    tc: TrainConfig = TrainConfig(),
):
    """Jitted forward-only metrics over the mesh (held-out evaluation).

    eval_fn(params, mel, tokens, loss_mask) -> {"loss", "accuracy",
    "tokens"}; params stay TP-sharded, the batch is DP-sharded, nothing is
    donated. remat is off — there is no backward pass to pay for.
    """
    batch_sharding = NamedSharding(mesh, P(AXIS_DATA))
    rep = NamedSharding(mesh, P())
    _cell: Dict[str, Any] = {}

    def eval_fn(params, mel, tokens, loss_mask):
        if "step" not in _cell:
            pshard = param_shardings(cfg, mesh, params=params)

            @functools.partial(
                jax.jit,
                in_shardings=(pshard, batch_sharding, batch_sharding,
                              batch_sharding),
                out_shardings=rep,
            )
            def step(params, mel, tokens, loss_mask):
                _, metrics = loss_fn(params, cfg, mel, tokens, loss_mask,
                                     remat=False, flash=tc.flash)
                return metrics

            _cell["step"] = step
        return _cell["step"](params, mel, tokens, loss_mask)

    return eval_fn


def make_batch(cfg: WhisperConfig, tokenizer, mel, texts, language="en",
               max_len: Optional[int] = None):
    """Host-side batch assembly: [sot_seq] + text + [eot], right-padded.

    loss_mask covers the text+eot region (prompt positions excluded).
    """
    import numpy as np

    sot_seq = list(tokenizer.sot_sequence_including_notimestamps)
    rows, masks = [], []
    for text in texts:
        ids = sot_seq + tokenizer.encode(" " + text.strip()) + [tokenizer.eot]
        mask = [0] * len(sot_seq) + [1] * (len(ids) - len(sot_seq))
        rows.append(ids)
        masks.append(mask)
    L = max_len or max(len(r) for r in rows)
    tokens = np.full((len(rows), L), tokenizer.eot, np.int32)
    loss_mask = np.zeros((len(rows), L), np.float32)
    for i, (r, m) in enumerate(zip(rows, masks)):
        r, m = r[:L], m[:L]
        tokens[i, : len(r)] = r
        loss_mask[i, : len(m)] = m
    return mel, tokens, loss_mask
