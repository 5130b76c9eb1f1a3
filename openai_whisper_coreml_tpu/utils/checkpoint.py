"""Checkpoint save/load: flat safetensors with nested-key flattening.

Replaces the reference's weight story (parameters baked into compiled
.mlpackage artifacts at export time, /root/reference/whisper_to_cml.py:45-52)
with an inspectable on-disk format: one .safetensors file whose keys are
"/"-joined pytree paths, plus a JSON metadata header (model name, dtype).
Orbax is supported for sharded/async checkpoints of training state.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

_LAYER_KEY = re.compile(r"^\d+$")


def flatten_params(params: Params, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for key, val in params.items():
        path = f"{prefix}/{key}" if prefix else key
        if isinstance(val, dict):
            out.update(flatten_params(val, path))
        else:
            out[path] = np.asarray(val)
    return out


def unflatten_params(flat: Dict[str, np.ndarray]) -> Params:
    tree: Params = {}
    for path, val in flat.items():
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def save_params(params: Params, path: str, *, model_name: str = "",
                extra_meta: Optional[Dict[str, str]] = None) -> None:
    from safetensors.numpy import save_file

    flat = {k: np.asarray(v) for k, v in flatten_params(params).items()}
    # safetensors has no bf16 numpy dtype bridge in some versions; store raw
    flat = {k: (v.astype(np.float32) if v.dtype == jnp.bfloat16 else v)
            for k, v in flat.items()}
    meta = {"format": "whisper-tpu-v1", "model": model_name}
    if any(k.endswith("/w_q") for k in flat):
        # int8 serving checkpoint (quantize.quantize_params tree): loaders
        # must keep w_q int8 and skip re-quantization
        meta["quantized"] = "int8"
    meta.update(extra_meta or {})
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    save_file(flat, path, metadata=meta)


def read_metadata(path: str) -> Dict[str, str]:
    """Read the JSON metadata header of a whisper-tpu safetensors file
    (model name, and optional alignment_heads carried by tools/convert)."""
    from safetensors import safe_open

    with safe_open(path, framework="numpy") as f:
        return dict(f.metadata() or {})


def load_params(path: str, *, cfg=None, dtype=jnp.float32) -> Params:
    """Load a checkpoint saved by save_params (or convert via tools/convert).

    Quantized (int8) checkpoints round-trip: `w_q` stays int8 and the
    per-channel `scale` stays fp32 regardless of the requested compute
    dtype — only float weights/biases are cast."""
    from safetensors.numpy import load_file

    raw = load_file(path)
    flat = {}
    for k, v in raw.items():
        if k.endswith("/w_q"):
            arr = jnp.asarray(v)  # int8
        elif (k.endswith("/scale")
              and k[: -len("scale")] + "w_q" in raw):
            # the quantization scale paired with a w_q leaf stays fp32;
            # LayerNorm "scale" leaves (no w_q sibling) follow the compute
            # dtype like every other float weight
            arr = jnp.asarray(v, jnp.float32)
        else:
            arr = jnp.asarray(v, dtype)
        flat[k] = arr
    params = unflatten_params(flat)
    if cfg is not None:
        _validate_shapes(params, cfg)
    return params


def _validate_shapes(params: Params, cfg) -> None:
    emb = params["decoder"]["token_embedding"]
    if emb.shape != (cfg.n_vocab, cfg.n_text_state):
        raise ValueError(
            f"checkpoint/config mismatch: token_embedding {emb.shape} != "
            f"({cfg.n_vocab}, {cfg.n_text_state}) for model {cfg.name!r}")
    q = params["decoder"]["blocks"]["attn"]["q"]
    n_layers = (q["w"] if "w" in q else q["w_q"]).shape[0]
    if n_layers != cfg.n_text_layer:
        raise ValueError(
            f"checkpoint has {n_layers} decoder layers, config expects "
            f"{cfg.n_text_layer}")


# -- orbax (training state: params + optimizer moments, possibly sharded) ----

def save_train_state(path: str, params: Params, opt_state=None,
                     step: "int | None" = None) -> None:
    """Full training state for exact resume: params (+ optimizer moments,
    + the completed-step counter — LR-schedule position lives in opt_state,
    the data-iterator position derives from step)."""
    import numpy as np
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    state = {"params": params}
    if opt_state is not None:
        state["opt_state"] = opt_state
    if step is not None:
        state["step"] = np.asarray(step, np.int64)
    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()


def restore_train_state(path: str, template) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)
