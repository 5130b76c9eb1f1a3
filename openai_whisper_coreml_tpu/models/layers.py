"""Core transformer layers (pure functions over param pytrees).

These are the building blocks the reference gets for free from the CoreML
export of openai/whisper (the traced graph inside encoder/decoder.mlpackage,
/root/reference/whisper_to_cml.py:10-43). Re-designed TPU-first:

  * everything is a pure function of (params, inputs) -> outputs, jit/pjit/vmap
    composable;
  * matmuls carry `preferred_element_type=float32` so bf16 params accumulate
    in fp32 on the MXU;
  * layer norm and softmax run in fp32 regardless of activation dtype
    (numerics rule for bf16 TPU inference);
  * attention dispatches to the Pallas flash kernel when profitable, with this
    jnp implementation as the always-available fallback and test oracle.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def matmul_precision(dtype) -> jax.lax.Precision:
    """fp32 operands get exact fp32 passes (parity/golden paths); bf16 rides
    the fast MXU default with fp32 accumulation via preferred_element_type."""
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def layer_norm(x: Array, p, eps: float = 1e-5) -> Array:
    """LayerNorm in fp32, output cast back to input dtype."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(dtype)


def linear(x: Array, p) -> Array:
    if "w_q" in p:
        # weights-only int8 (see quantize.py): MXU reads 1 byte/weight; the
        # per-output-channel scale is applied after the contraction
        y = jnp.dot(x, p["w_q"], preferred_element_type=jnp.float32)
        y = y * p["scale"]
    else:
        y = jnp.dot(x, p["w"].astype(x.dtype),
                    preferred_element_type=jnp.float32,
                    precision=matmul_precision(x.dtype))
    if "lora_a" in p:
        # LoRA adapter (lora.py): rank-r bottleneck, negligible FLOPs next
        # to the base matmul; works on float AND int8 (w_q) bases
        xa = jnp.dot(x, p["lora_a"].astype(x.dtype),
                     preferred_element_type=jnp.float32,
                     precision=matmul_precision(x.dtype))
        y = y + jnp.dot(xa.astype(x.dtype), p["lora_b"].astype(x.dtype),
                        preferred_element_type=jnp.float32,
                        precision=matmul_precision(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def gelu(x: Array) -> Array:
    """Exact (erf) GELU — openai/whisper uses F.gelu, not the tanh approx."""
    return jax.nn.gelu(x, approximate=False)


def mlp(x: Array, p) -> Array:
    return linear(gelu(linear(x, p["fc1"])), p["fc2"])


def split_heads(x: Array, n_head: int) -> Array:
    """(B, T, n_state) -> (B, T, H, D)."""
    b, t, n = x.shape
    return x.reshape(b, t, n_head, n // n_head)


def merge_heads(x: Array) -> Array:
    b, t, h, d = x.shape
    return x.reshape(b, t, h * d)


def attention_core(
    q: Array,  # (B, Tq, H, D)
    k: Array,  # (B, Tk, H, D)
    v: Array,  # (B, Tk, H, D)
    mask: Optional[Array] = None,  # broadcastable to (B, H, Tq, Tk); True=keep
    bias: Optional[Array] = None,  # additive, same broadcast
) -> Array:
    """Scaled dot-product attention, softmax in fp32.

    Matches openai/whisper numerics: q and k each scaled by D**-0.25 before
    the product (equivalent to the usual D**-0.5 joint scale).
    """
    d = q.shape[-1]
    scale = d ** -0.25
    qs = (q * scale).astype(q.dtype)
    ks = (k * scale).astype(k.dtype)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qs, ks,
                        preferred_element_type=jnp.float32,
                        precision=matmul_precision(q.dtype))
    if bias is not None:
        logits = logits + bias
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.float32(-1e30))
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(v.dtype), v,
                     preferred_element_type=jnp.float32,
                     precision=matmul_precision(v.dtype))
    return out.astype(q.dtype)


def self_attention(x: Array, p, n_head: int,
                   mask: Optional[Array] = None,
                   flash: bool = False,
                   causal: bool = False) -> Array:
    """Full-sequence self-attention (encoder, or decoder teacher-forcing)."""
    q = split_heads(linear(x, p["q"]), n_head)
    k = split_heads(linear(x, p["k"]), n_head)
    v = split_heads(linear(x, p["v"]), n_head)
    out = None
    if flash:
        from ..ops.flash_attention import flash_attention_auto

        # None when the active mesh cannot shard_map these shapes
        out = flash_attention_auto(q, k, v, causal=causal)
    if out is None:
        if causal and mask is None:
            t = x.shape[1]
            mask = jnp.tril(jnp.ones((t, t), jnp.bool_))[None, None]
        out = attention_core(q, k, v, mask=mask)
    return linear(merge_heads(out), p["out"])


def cross_attention(x: Array, p, n_head: int,
                    k: Array, v: Array,
                    flash: bool = False) -> Array:
    """Cross-attention against precomputed audio K/V (B, S, n_state) —
    merged-head storage (HBM tiling; see decoder.KVCache), split here."""
    q = split_heads(linear(x, p["q"]), n_head)
    k = split_heads(k, n_head)
    v = split_heads(v, n_head)
    out = None
    if flash:
        from ..ops.flash_attention import flash_attention_auto

        out = flash_attention_auto(q, k, v, causal=False)
    if out is None:
        out = attention_core(q, k, v)
    return linear(merge_heads(out), p["out"])


def sinusoids(length: int, channels: int, max_timescale: float = 10_000.0) -> Array:
    """Sinusoidal position embedding (encoder), openai/whisper formulation."""
    assert channels % 2 == 0
    log_inc = jnp.log(max_timescale) / (channels // 2 - 1)
    inv = jnp.exp(-log_inc * jnp.arange(channels // 2, dtype=jnp.float32))
    scaled = jnp.arange(length, dtype=jnp.float32)[:, None] * inv[None, :]
    return jnp.concatenate([jnp.sin(scaled), jnp.cos(scaled)], axis=1)
