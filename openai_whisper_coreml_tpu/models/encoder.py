"""Whisper audio encoder: conv stem + pre-LN transformer stack.

The reference runs this as an opaque CoreML graph traced at (1, 80, 3000)
(/root/reference/whisper_to_cml.py:10-23, invoked at
/root/reference/Whisper/Whisper/Whisper.swift:29). Here it is a pure function
compiled by XLA: the per-layer weights are stacked and the block is a single
`lax.scan` body, optionally rematerialised, with a flash-attention Pallas
kernel for the 1500-position self-attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import WhisperConfig
from .layers import (
    gelu,
    layer_norm,
    matmul_precision as layers_precision,
    mlp,
    self_attention,
    sinusoids,
)


def _conv1d(x: jax.Array, p, stride: int) -> jax.Array:
    """x: (B, C_in, T); p["w"]: (kernel, C_in, C_out); 'same' padding (k=3).

    preferred_element_type is requested only when it equals the operand
    dtype (fp32): with bf16 operands a widened f32 conv OUTPUT makes the
    conv non-differentiable — the transpose rule feeds the f32 cotangent
    back into a conv against the bf16 weights and lax rejects the dtype mix
    (hit on-chip by tools/finetune.py, which trains the bf16-loaded model;
    CPU tests run fp32 and never saw it). The MXU accumulates in fp32
    either way; bf16 output costs one extra rounding before the f32 bias
    add, within bf16 serving noise (fp32 parity gates are unaffected).
    """
    f32 = x.dtype == jnp.float32
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(stride,),
        padding=[(1, 1)],
        dimension_numbers=("NCH", "HIO", "NCH"),
        preferred_element_type=jnp.float32 if f32 else None,
        precision=layers_precision(x.dtype),
    )
    return (y.astype(jnp.float32)
            + p["b"].astype(jnp.float32)[None, :, None]).astype(x.dtype)


def encoder_block(x: jax.Array, p, n_head: int, flash: bool) -> jax.Array:
    x = x + self_attention(layer_norm(x, p["attn_ln"]), p["attn"], n_head,
                           flash=flash)
    x = x + mlp(layer_norm(x, p["mlp_ln"]), p["mlp"])
    return x


def encode(
    params,
    cfg: WhisperConfig,
    mel: jax.Array,
    *,
    flash: bool = False,
    remat: bool = False,
    compute_dtype=None,
) -> jax.Array:
    """mel (B, n_mels, 3000) -> audio features (B, 1500, n_audio_state).

    `remat=True` rematerialises each block on the backward pass (training
    memory/HBM trade, jax.checkpoint).
    """
    enc = params["encoder"]
    if compute_dtype is None:
        compute_dtype = enc["conv1"]["w"].dtype
    x = mel.astype(compute_dtype)

    x = gelu(_conv1d(x, enc["conv1"], stride=1))
    x = gelu(_conv1d(x, enc["conv2"], stride=2))  # (B, n_state, 1500)
    x = jnp.swapaxes(x, 1, 2)  # (B, 1500, n_state)

    if x.shape[1] != cfg.n_audio_ctx:
        raise ValueError(
            f"audio context {x.shape[1]} != configured {cfg.n_audio_ctx}; "
            "mel input must cover exactly one 30s chunk (3000 frames)"
        )
    pos = sinusoids(cfg.n_audio_ctx, cfg.n_audio_state).astype(compute_dtype)
    x = x + pos[None]

    block = functools.partial(encoder_block, n_head=cfg.n_audio_head, flash=flash)
    if remat:
        block = jax.checkpoint(block)

    def body(carry, layer_params):
        return block(carry, layer_params), None

    x, _ = jax.lax.scan(body, x, enc["blocks"])
    return layer_norm(x, enc["ln_post"])
