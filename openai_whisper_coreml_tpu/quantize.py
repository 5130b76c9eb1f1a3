"""Weights-only int8 quantization for serving.

Autoregressive decode at small batch is HBM-bandwidth-bound on the weight
stream (every step reads every decoder weight once). Per-output-channel int8
halves that traffic vs bf16: y = (x @ W_q) * scale, with the dequant scale
applied AFTER the matmul (a per-output-channel scale commutes with the
contraction over in-features), so the MXU reads 1 byte per weight.

Scope: 2-D linear weights above a size threshold (attention/MLP projections).
Conv stems, embeddings, norms, and biases stay in the float dtype — they are
a tiny fraction of traffic and the embedding doubles as a gather table.
Quantized trees keep the same nested-dict shape with {"w_q", "scale"[, "b"]}
leaves, and `models.layers.linear` dispatches on the key.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

MIN_QUANT_SIZE = 1 << 16  # don't bother below 64k elements


def quantize_linear(w: jax.Array) -> Params:
    """(..., in, out) float weights -> int8 + per-output-channel fp32 scale.

    Stacked per-layer weights (L, in, out) quantize with per-(layer, out)
    scales; the contraction axis is always -2.
    """
    w32 = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(w32), axis=-2, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return {"w_q": q, "scale": scale}


def quantize_params(params: Params, *, min_size: int = MIN_QUANT_SIZE) -> Params:
    """Quantize every eligible linear weight in a param pytree."""

    NON_LINEAR = {"conv1", "conv2"}  # lax.conv consumes these directly

    def walk(node, name=""):
        if not isinstance(node, dict):
            return node
        if "w" in node and not isinstance(node["w"], dict):
            w = node["w"]
            if (name not in NON_LINEAR and w.ndim in (2, 3)
                    and w.size >= min_size):
                out = quantize_linear(w)
                for extra in ("b", "lora_a", "lora_b"):
                    if extra in node:  # adapters ride along in float
                        out[extra] = node[extra]
                return out
            return node
        return {k: walk(v, k) for k, v in node.items()}

    return walk(params)


def quantized_fraction(params: Params) -> float:
    """Fraction of parameter bytes stored as int8 (diagnostics)."""
    q_bytes = 0
    total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        nbytes = leaf.size * leaf.dtype.itemsize
        total += nbytes
        if any(getattr(k, "key", None) == "w_q" for k in path):
            q_bytes += nbytes
    return q_bytes / max(total, 1)
