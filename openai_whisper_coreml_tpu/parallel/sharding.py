"""GSPMD sharding rules for Whisper parameter pytrees.

Tensor-parallel layout (Megatron-style column/row pairing, expressed purely
as NamedSharding annotations — XLA inserts the all-reduces):

  * attention q/k/v and mlp fc1: COLUMN-parallel (out-features on "model"),
    so each chip owns a contiguous block of heads / hidden units;
  * attention out-proj and mlp fc2: ROW-parallel (in-features on "model"),
    closing the pair with one psum per block;
  * token embedding: replicated (the vocab is small and indivisible by the
    model axis; XLA still parallelises the tied logit matmul);
  * layer norms, biases of row-parallel layers, positional tables: replicated.

The stacked-layer leading axis (params["*"]["blocks"]) is never sharded —
lax.scan iterates it sequentially.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import WhisperConfig
from .mesh import AXIS_DATA, AXIS_MODEL

Params = Dict[str, Any]

# ---------------------------------------------------------------------------
# Activation / decode-state PartitionSpecs
#
# The KV cache and cross-KV are stored d-major (L, B, H, D, S): batch on the
# "data" axis, heads on the "model" axis (matching the column-parallel k/v
# projections, so cache writes need no resharding); D and S stay local — the
# softmax reduction over S and the (D,S) tiles never cross chips.
# ---------------------------------------------------------------------------

KV_PSPEC = P(None, AXIS_DATA, AXIS_MODEL, None, None)  # (L, B, H, D, S)
KV_SCALE_PSPEC = P(None, AXIS_DATA, AXIS_MODEL, None, None)  # (L, B, H, 1, S)
# host-input batches are placed data-sharded by WhisperModel.shard_batch
# (rank-generic device_put there); no in-graph activation constraints are
# needed beyond the cache/cross-KV ones — GSPMD propagates the rest


def constrain(x, spec: P):
    """with_sharding_constraint iff a mesh context is active (jax.set_mesh);
    a no-op otherwise, so unsharded single-chip paths are untouched."""
    if jax.sharding.get_abstract_mesh().empty:
        return x
    return jax.lax.with_sharding_constraint(x, spec)


def _attn_specs(stacked: bool) -> Params:
    L = (None,) if stacked else ()
    col_w = P(*L, None, AXIS_MODEL)
    col_b = P(*L, AXIS_MODEL)
    row_w = P(*L, AXIS_MODEL, None)
    rep_b = P(*L, None)
    return {
        "q": {"w": col_w, "b": col_b},
        "k": {"w": col_w},
        "v": {"w": col_w, "b": col_b},
        "out": {"w": row_w, "b": rep_b},
    }


def _mlp_specs(stacked: bool) -> Params:
    L = (None,) if stacked else ()
    return {
        "fc1": {"w": P(*L, None, AXIS_MODEL), "b": P(*L, AXIS_MODEL)},
        "fc2": {"w": P(*L, AXIS_MODEL, None), "b": P(*L, None)},
    }


def _ln_specs(stacked: bool) -> Params:
    L = (None,) if stacked else ()
    return {"scale": P(*L, None), "bias": P(*L, None)}


def param_pspecs(cfg: WhisperConfig) -> Params:
    """PartitionSpec pytree with the same structure as params."""
    return {
        "encoder": {
            "conv1": {"w": P(None, None, AXIS_MODEL), "b": P(AXIS_MODEL)},
            "conv2": {"w": P(None, None, AXIS_MODEL), "b": P(AXIS_MODEL)},
            "blocks": {
                "attn": _attn_specs(True),
                "attn_ln": _ln_specs(True),
                "mlp": _mlp_specs(True),
                "mlp_ln": _ln_specs(True),
            },
            "ln_post": _ln_specs(False),
        },
        "decoder": {
            # replicated: the 51865/51866 vocab is not divisible by typical
            # model-axis sizes and the table is small (<=133 MB at large-v3);
            # replication avoids padded-vocab logit hazards entirely
            "token_embedding": P(None, None),
            "positional_embedding": P(None, None),
            "blocks": {
                "attn": _attn_specs(True),
                "attn_ln": _ln_specs(True),
                "cross_attn": _attn_specs(True),
                "cross_attn_ln": _ln_specs(True),
                "mlp": _mlp_specs(True),
                "mlp_ln": _ln_specs(True),
            },
            "ln": _ln_specs(False),
        },
    }


def align_pspecs(pspecs: Params, params: Params) -> Params:
    """Mirror `params`' exact structure: keys the static spec tree does not
    know (LoRA adapters, quantization scales, future extras) fall back to
    fully-replicated specs — small tensors where GSPMD's inserted
    collectives cost nothing, and replication is always shape-valid."""
    if not isinstance(params, dict):
        return pspecs
    out: Params = {}
    for k, v in params.items():
        if isinstance(pspecs, dict) and k in pspecs:
            out[k] = align_pspecs(pspecs[k], v)
        else:
            out[k] = jax.tree.map(lambda _: P(), v)
    return out


def param_shardings(cfg: WhisperConfig, mesh: Mesh,
                    params: Params = None) -> Params:
    specs = param_pspecs(cfg)
    if params is not None:
        specs = align_pspecs(specs, params)
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(params: Params, cfg: WhisperConfig, mesh: Mesh) -> Params:
    """Place a parameter pytree onto the mesh with TP shardings.

    Replaces the reference's opaque CoreML model placement
    (/root/reference/Whisper/Whisper/Whisper.swift:17-21) with explicit,
    inspectable device layouts.
    """
    shardings = param_shardings(cfg, mesh, params=params)
    return jax.tree.map(jax.device_put, params, shardings)
