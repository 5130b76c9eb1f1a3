"""Parameter pytrees: initialisation and checkpoint conversion.

This is the build's L0, replacing the reference's offline CoreML export
toolchain (/root/reference/whisper_to_cml.py — torch.jit.trace + ct.convert to
.mlpackage). Instead of baking weights into a compiled artifact, weights live
in a plain nested-dict pytree that `jit`/`pjit` close over, so the same
checkpoint serves any batch size, mesh, or decode schedule.

Layout convention:
  * Linear weights are stored (in_features, out_features) so forward is x @ w.
  * Per-layer transformer weights are STACKED along a leading n_layer axis and
    consumed with `lax.scan` — one compiled block body regardless of depth
    (compile-time and HBM-layout win on TPU; 32-layer large-v3 traces as fast
    as tiny).

Converters accept both public checkpoint formats:
  * openai/whisper `.pt` state dicts (keys like
    `encoder.blocks.0.attn.query.weight`) — the format the reference feeds to
    its tracer (/root/reference/whisper_to_cml.py:7),
  * HuggingFace `WhisperForConditionalGeneration` state dicts (keys like
    `model.encoder.layers.0.self_attn.q_proj.weight`).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from .config import WhisperConfig

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Random initialisation (for tests / training-from-scratch).
# ---------------------------------------------------------------------------

def init_params(cfg: WhisperConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    """Random-normal init with fan-in scaling; shapes identical to converted
    checkpoints so all tests exercise the production layout."""
    n, nh = cfg.n_audio_state, 4 * cfg.n_audio_state
    nt = cfg.n_text_state

    n_keys = cfg.n_audio_layer + cfg.n_text_layer + 8
    keys = iter(jax.random.split(key, n_keys))

    def dense(k, fan_in, shape):
        return (jax.random.normal(k, shape) / np.sqrt(fan_in)).astype(dtype)

    def attn_block(k, width):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        return {
            "q": {"w": dense(k1, width, (width, width)),
                  "b": jnp.zeros((width,), dtype)},
            "k": {"w": dense(k2, width, (width, width))},  # no bias (openai)
            "v": {"w": dense(k3, width, (width, width)),
                  "b": jnp.zeros((width,), dtype)},
            "out": {"w": dense(k4, width, (width, width)),
                    "b": jnp.zeros((width,), dtype)},
        }

    def ln(width):
        return {"scale": jnp.ones((width,), dtype),
                "bias": jnp.zeros((width,), dtype)}

    def mlp_block(k, width):
        k1, k2 = jax.random.split(k)
        return {
            "fc1": {"w": dense(k1, width, (width, 4 * width)),
                    "b": jnp.zeros((4 * width,), dtype)},
            "fc2": {"w": dense(k2, 4 * width, (4 * width, width)),
                    "b": jnp.zeros((width,), dtype)},
        }

    def enc_layer(k):
        k1, k2 = jax.random.split(k)
        return {
            "attn": attn_block(k1, n),
            "attn_ln": ln(n),
            "mlp": mlp_block(k2, n),
            "mlp_ln": ln(n),
        }

    def dec_layer(k):
        k1, k2, k3 = jax.random.split(k, 3)
        return {
            "attn": attn_block(k1, nt),
            "attn_ln": ln(nt),
            "cross_attn": attn_block(k2, nt),
            "cross_attn_ln": ln(nt),
            "mlp": mlp_block(k3, nt),
            "mlp_ln": ln(nt),
        }

    enc_layers = [enc_layer(next(keys)) for _ in range(cfg.n_audio_layer)]
    dec_layers = [dec_layer(next(keys)) for _ in range(cfg.n_text_layer)]

    return {
        "encoder": {
            "conv1": {
                "w": dense(next(keys), 3 * cfg.n_mels, (3, cfg.n_mels, n)),
                "b": jnp.zeros((n,), dtype),
            },
            "conv2": {
                "w": dense(next(keys), 3 * n, (3, n, n)),
                "b": jnp.zeros((n,), dtype),
            },
            "blocks": stack_layers(enc_layers),
            "ln_post": ln(n),
        },
        "decoder": {
            "token_embedding": dense(next(keys), nt, (cfg.n_vocab, nt)),
            "positional_embedding": (
                0.01 * jax.random.normal(next(keys), (cfg.n_text_ctx, nt))
            ).astype(dtype),
            "blocks": stack_layers(dec_layers),
            "ln": ln(nt),
        },
    }


def stack_layers(layers: list) -> Params:
    """List of per-layer pytrees -> single pytree with leading layer axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *layers)


def unstack_layers(stacked: Params, n_layers: int) -> list:
    return [jax.tree.map(lambda x: x[i], stacked) for i in range(n_layers)]


# ---------------------------------------------------------------------------
# Conversion from public checkpoints.
# ---------------------------------------------------------------------------

def _t(x) -> np.ndarray:
    """torch tensor / array -> numpy (weights transposed to (in, out))."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().float().numpy()
    return np.asarray(x)


def _linear(sd: Mapping[str, Any], prefix: str, bias: bool = True) -> Params:
    out = {"w": _t(sd[f"{prefix}.weight"]).T}  # torch stores (out, in)
    if bias:
        out["b"] = _t(sd[f"{prefix}.bias"])
    return out


def _ln(sd: Mapping[str, Any], prefix: str) -> Params:
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def params_from_openai_state_dict(cfg: WhisperConfig, sd: Mapping[str, Any],
                                  dtype=jnp.float32) -> Params:
    """openai/whisper checkpoint ("model_state_dict" contents) -> our pytree."""
    def attn(prefix):
        return {
            "q": _linear(sd, f"{prefix}.query"),
            "k": _linear(sd, f"{prefix}.key", bias=False),
            "v": _linear(sd, f"{prefix}.value"),
            "out": _linear(sd, f"{prefix}.out"),
        }

    def mlp(prefix):
        return {"fc1": _linear(sd, f"{prefix}.0"), "fc2": _linear(sd, f"{prefix}.2")}

    enc_layers = []
    for i in range(cfg.n_audio_layer):
        p = f"encoder.blocks.{i}"
        enc_layers.append({
            "attn": attn(f"{p}.attn"),
            "attn_ln": _ln(sd, f"{p}.attn_ln"),
            "mlp": mlp(f"{p}.mlp"),
            "mlp_ln": _ln(sd, f"{p}.mlp_ln"),
        })
    dec_layers = []
    for i in range(cfg.n_text_layer):
        p = f"decoder.blocks.{i}"
        dec_layers.append({
            "attn": attn(f"{p}.attn"),
            "attn_ln": _ln(sd, f"{p}.attn_ln"),
            "cross_attn": attn(f"{p}.cross_attn"),
            "cross_attn_ln": _ln(sd, f"{p}.cross_attn_ln"),
            "mlp": mlp(f"{p}.mlp"),
            "mlp_ln": _ln(sd, f"{p}.mlp_ln"),
        })

    # openai conv weight: (out, in, kernel) -> ours (kernel, in, out)
    def conv(prefix):
        return {
            "w": _t(sd[f"{prefix}.weight"]).transpose(2, 1, 0),
            "b": _t(sd[f"{prefix}.bias"]),
        }

    params = {
        "encoder": {
            "conv1": conv("encoder.conv1"),
            "conv2": conv("encoder.conv2"),
            "blocks": stack_layers(enc_layers),
            "ln_post": _ln(sd, "encoder.ln_post"),
        },
        "decoder": {
            "token_embedding": _t(sd["decoder.token_embedding.weight"]),
            "positional_embedding": _t(sd["decoder.positional_embedding"]),
            "blocks": stack_layers(dec_layers),
            "ln": _ln(sd, "decoder.ln"),
        },
    }
    return jax.tree.map(lambda x: jnp.asarray(x, dtype), params)


_HF_PREFIX = re.compile(r"^(model\.|proj_out\.)")


def params_from_hf_state_dict(cfg: WhisperConfig, sd: Mapping[str, Any],
                              dtype=jnp.float32) -> Params:
    """HuggingFace WhisperForConditionalGeneration/WhisperModel state dict ->
    our pytree. HF's architecture is weight-compatible with openai's (q/k/v
    projections, gelu MLP, pre-LN); only naming differs."""
    sd = {_HF_PREFIX.sub("", k): v for k, v in sd.items()}

    def attn(prefix):
        return {
            "q": _linear(sd, f"{prefix}.q_proj"),
            "k": _linear(sd, f"{prefix}.k_proj", bias=False),
            "v": _linear(sd, f"{prefix}.v_proj"),
            "out": _linear(sd, f"{prefix}.out_proj"),
        }

    def mlp(prefix_fc1, prefix_fc2):
        return {"fc1": _linear(sd, prefix_fc1), "fc2": _linear(sd, prefix_fc2)}

    enc_layers = []
    for i in range(cfg.n_audio_layer):
        p = f"encoder.layers.{i}"
        enc_layers.append({
            "attn": attn(f"{p}.self_attn"),
            "attn_ln": _ln(sd, f"{p}.self_attn_layer_norm"),
            "mlp": mlp(f"{p}.fc1", f"{p}.fc2"),
            "mlp_ln": _ln(sd, f"{p}.final_layer_norm"),
        })
    dec_layers = []
    for i in range(cfg.n_text_layer):
        p = f"decoder.layers.{i}"
        dec_layers.append({
            "attn": attn(f"{p}.self_attn"),
            "attn_ln": _ln(sd, f"{p}.self_attn_layer_norm"),
            "cross_attn": attn(f"{p}.encoder_attn"),
            "cross_attn_ln": _ln(sd, f"{p}.encoder_attn_layer_norm"),
            "mlp": mlp(f"{p}.fc1", f"{p}.fc2"),
            "mlp_ln": _ln(sd, f"{p}.final_layer_norm"),
        })

    def conv(prefix):  # HF conv: (out, in, kernel) like openai
        return {
            "w": _t(sd[f"{prefix}.weight"]).transpose(2, 1, 0),
            "b": _t(sd[f"{prefix}.bias"]),
        }

    params = {
        "encoder": {
            "conv1": conv("encoder.conv1"),
            "conv2": conv("encoder.conv2"),
            "blocks": stack_layers(enc_layers),
            "ln_post": _ln(sd, "encoder.layer_norm"),
        },
        "decoder": {
            "token_embedding": _t(sd["decoder.embed_tokens.weight"]),
            "positional_embedding": _t(sd["decoder.embed_positions.weight"]),
            "blocks": stack_layers(dec_layers),
            "ln": _ln(sd, "decoder.layer_norm"),
        },
    }
    return jax.tree.map(lambda x: jnp.asarray(x, dtype), params)


def count_params(params: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
