"""LoRA adapters: low-rank fine-tuning on frozen (optionally int8) weights.

Beyond the reference's capability set (it has no training at all) and beyond
openai/whisper: LoRA is the production recipe for adapting Whisper cheaply —
train two small matrices per targeted projection while the base weights stay
frozen (and, QLoRA-style, may stay int8-quantized). On TPU this composes
with the rest of the framework:

  * the runtime hook is models/layers.linear — a node carrying
    `lora_a`/`lora_b` adds `x @ A @ B` to its output, so EVERY path
    (training, greedy/beam decode, serving, TP meshes) picks adapters up
    with no other code changes;
  * training uses TrainConfig(trainable="lora_") — the multi_transform
    freeze allocates AdamW moments ONLY for the adapters (train.py);
  * sharding: adapter leaves get replicated specs via
    parallel.sharding.align_pspecs (they are tiny; GSPMD inserts the
    collectives around the column/row-parallel base matmuls).

Scaling note: the conventional alpha/rank factor is folded into A's
initialisation instead of a separate runtime multiplier, so the adapter
contribution is exactly `x @ A @ B` everywhere (one fewer pytree leaf, and
`trainable="lora_"` cannot accidentally train a scale scalar).
"""

from __future__ import annotations

import re
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

# attention q/v projections (the LoRA-paper default target set), both self-
# and cross-attention
DEFAULT_TARGETS = r"(attn|cross_attn)/(q|v)$"


def add_lora(params: Params, *, rank: int = 8, alpha: float = 16.0,
             targets: str = DEFAULT_TARGETS, seed: int = 0,
             dtype=jnp.float32) -> Params:
    """Return params with zero-initialised LoRA adapters on every linear
    node whose path matches `targets` (stacked layer dims are preserved:
    w (L, in, out) gets lora_a (L, in, r) and lora_b (L, r, out)).

    B starts at zero, so the adapted model is bit-identical to the base
    until training moves the adapters."""
    if rank < 1:
        raise ValueError(f"rank must be >= 1, got {rank}")
    rx = re.compile(targets)
    key = jax.random.PRNGKey(seed)
    added = 0

    def walk(node, path):
        nonlocal key, added
        if not isinstance(node, dict):
            return node
        if ("w" in node or "w_q" in node) and rx.search(path):
            w = node["w"] if "w" in node else node["w_q"]
            *lead, din, dout = w.shape
            key, sub = jax.random.split(key)
            # alpha/rank folded into A's init scale (see module docstring)
            a = (jax.random.normal(sub, (*lead, din, rank), jnp.float32)
                 * (alpha / rank) / np.sqrt(din)).astype(dtype)
            new = dict(node)
            new["lora_a"] = a
            new["lora_b"] = jnp.zeros((*lead, rank, dout), dtype)
            added += 1
            return new
        return {k: walk(v, f"{path}/{k}" if path else k)
                for k, v in node.items()}

    out = walk(params, "")
    if not added:
        raise ValueError(f"LoRA targets {targets!r} matched no linear nodes")
    return out


def merge_lora(params: Params) -> Params:
    """Fold adapters into the base weights (w += A @ B) and drop the
    adapter leaves — zero serving overhead once training is done.
    Quantized bases (w_q) cannot be merged; serve them unmerged (linear
    applies the adapter at runtime) or merge before quantizing."""

    def walk(node, path):
        if not isinstance(node, dict):
            return node
        if "lora_a" in node:
            if "w" not in node:
                raise ValueError(
                    f"cannot merge LoRA into quantized base at {path!r} "
                    "(w_q); merge before quantizing, or serve unmerged")
            delta = jnp.einsum("...ir,...ro->...io",
                               node["lora_a"].astype(jnp.float32),
                               node["lora_b"].astype(jnp.float32))
            new = {k: v for k, v in node.items()
                   if k not in ("lora_a", "lora_b")}
            new["w"] = (node["w"].astype(jnp.float32)
                        + delta).astype(node["w"].dtype)
            return new
        return {k: walk(v, f"{path}/{k}" if path else k)
                for k, v in node.items()}

    return walk(params, "")


def count_lora_params(params: Params) -> int:
    flat = jax.tree_util.tree_leaves_with_path(params)
    total = 0
    for path, leaf in flat:
        keys = [str(getattr(k, "key", k)) for k in path]
        if keys and keys[-1] in ("lora_a", "lora_b"):
            total += int(np.prod(leaf.shape))
    return total
