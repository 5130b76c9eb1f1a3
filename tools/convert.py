#!/usr/bin/env python
"""Convert public Whisper checkpoints to the TPU-native format.

This is the framework's L0 toolchain, replacing the reference's CoreML export
pipeline (/root/reference/whisper_to_cml.py: torch.jit.trace + coremltools ->
.mlpackage) and its filterbank exporter (/root/reference/export_m80.py — the
mel filterbank needs no asset here; it is derived in closed form, see
openai_whisper_coreml_tpu/audio.py).

Supported inputs:
  * openai/whisper .pt files (the dict with "dims" and "model_state_dict")
  * HuggingFace checkpoints: a directory containing model.safetensors (or
    pytorch_model.bin) for Whisper* models
  * this framework's own float checkpoints (whisper-tpu-v1 safetensors),
    e.g. to re-write one as an int8 serving checkpoint via --quantize

Usage:
  python tools/convert.py --input small.pt --output ckpts/small.safetensors
  python tools/convert.py --input /path/to/hf/whisper-small --model small \
      --output ckpts/small.safetensors
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


_DIMS_TO_NAME = {
    # (n_audio_state, n_audio_layer, n_mels, n_vocab) -> model name
    (384, 4, 80, 51865): "tiny",
    (384, 4, 80, 51864): "tiny.en",
    (512, 6, 80, 51865): "base",
    (512, 6, 80, 51864): "base.en",
    (768, 12, 80, 51865): "small",
    (768, 12, 80, 51864): "small.en",
    (1024, 24, 80, 51865): "medium",
    (1024, 24, 80, 51864): "medium.en",
    (1280, 32, 80, 51865): "large-v2",
    (1280, 32, 128, 51866): "large-v3",
}


def load_state_dict(path: str):
    """Returns (state_dict, detected_model_name_or_None, format)."""
    if os.path.isdir(path):
        # HuggingFace directory
        st = os.path.join(path, "model.safetensors")
        if os.path.exists(st):
            from safetensors.torch import load_file

            return load_file(st), None, "hf"
        index = os.path.join(path, "model.safetensors.index.json")
        if os.path.exists(index):
            # sharded save_pretrained output: merge every shard the index
            # references (large fp32 checkpoints split at ~5 GB)
            import json

            from safetensors.torch import load_file

            with open(index, encoding="utf-8") as f:
                weight_map = json.load(f)["weight_map"]
            sd = {}
            for shard in sorted(set(weight_map.values())):
                sd.update(load_file(os.path.join(path, shard)))
            return sd, None, "hf"
        bin_path = os.path.join(path, "pytorch_model.bin")
        if os.path.exists(bin_path):
            import torch

            return torch.load(bin_path, map_location="cpu",
                              weights_only=True), None, "hf"
        raise FileNotFoundError(f"no model weights found under {path}")

    if path.endswith(".safetensors"):
        from openai_whisper_coreml_tpu.utils.checkpoint import read_metadata

        meta = read_metadata(path)
        if meta.get("format") == "whisper-tpu-v1":
            # already in this framework's format (e.g. re-converting a float
            # checkpoint to an int8 serving checkpoint): load as-is
            return meta, meta.get("model") or None, "native"

        from safetensors.torch import load_file

        sd = load_file(path)
        fmt = "hf" if any(k.startswith(("model.", "proj_out."))
                          or k.startswith("encoder.layers") for k in sd) else "openai"
        return sd, None, fmt

    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        dims = obj.get("dims", {})
        key = (dims.get("n_audio_state"), dims.get("n_audio_layer"),
               dims.get("n_mels"), dims.get("n_vocab"))
        name = _DIMS_TO_NAME.get(key)
        # large-v3-turbo: same dims signature except decoder depth
        if name == "large-v3" and dims.get("n_text_layer") == 4:
            name = "large-v3-turbo"
        # NOTE: large-v1 and large-v2 share every dims field; the detected
        # name defaults to "large-v2" (pass --model large-v1 to override)
        return obj["model_state_dict"], name, "openai"
    return obj, None, "openai"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help=".pt / .safetensors file or HF checkpoint dir")
    ap.add_argument("--model", default=None,
                    help="model size name (auto-detected for openai .pt)")
    ap.add_argument("--output", required=True, help="output .safetensors path")
    ap.add_argument("--dtype", choices=("float32", "bfloat16"),
                    default="float32")
    ap.add_argument("--quantize", choices=("int8",), default=None,
                    help="write an int8 serving checkpoint (w_q + per-"
                         "channel scales; ~4x smaller than fp32, no "
                         "quantization work at load time)")
    args = ap.parse_args(argv)

    from openai_whisper_coreml_tpu.utils.platform import sync_platform_from_env

    sync_platform_from_env()

    import jax.numpy as jnp

    from openai_whisper_coreml_tpu.config import get_config
    from openai_whisper_coreml_tpu.params import (
        count_params,
        params_from_hf_state_dict,
        params_from_openai_state_dict,
    )
    from openai_whisper_coreml_tpu.utils.checkpoint import save_params

    sd, detected, fmt = load_state_dict(args.input)
    name = args.model or detected
    if name is None:
        raise SystemExit("could not auto-detect model size; pass --model")
    if detected and args.model and args.model != detected:
        # large-v1/v2 share dims, so allow that pair; anything else would
        # silently truncate layers / mislabel the converted checkpoint
        allowed = {detected, "large-v1" if detected == "large-v2" else detected}
        if args.model not in allowed:
            raise SystemExit(
                f"--model {args.model!r} contradicts the checkpoint's "
                f"detected size {detected!r}; converting would truncate or "
                f"mislabel weights (drop --model to use the detected size)")
    cfg = get_config(name)
    dtype = jnp.float32 if args.dtype == "float32" else jnp.bfloat16

    if fmt == "native":
        from openai_whisper_coreml_tpu.utils.checkpoint import load_params

        if sd.get("quantized"):
            raise SystemExit(
                f"{args.input} is already an int8 serving checkpoint; "
                "re-convert from the float checkpoint instead")
        params = load_params(args.input, cfg=cfg, dtype=dtype)
    elif fmt == "hf":
        params = params_from_hf_state_dict(cfg, sd, dtype=dtype)
    else:
        params = params_from_openai_state_dict(cfg, sd, dtype=dtype)

    extra = {"source_format": fmt, "dtype": args.dtype}
    if fmt == "native" and sd.get("alignment_heads"):
        extra["alignment_heads"] = sd["alignment_heads"]
    # HF checkpoints ship per-model alignment heads (word-timestamp quality)
    # in generation_config.json — carry them into the checkpoint metadata
    if os.path.isdir(args.input):
        gc_path = os.path.join(args.input, "generation_config.json")
        if os.path.exists(gc_path):
            import json

            with open(gc_path, encoding="utf-8") as f:
                gc = json.load(f)
            if gc.get("alignment_heads"):
                extra["alignment_heads"] = json.dumps(gc["alignment_heads"])

    if args.quantize == "int8":
        from openai_whisper_coreml_tpu.quantize import quantize_params

        params = quantize_params(params)

    save_params(params, args.output, model_name=name, extra_meta=extra)
    print(f"wrote {args.output}: {name} ({count_params(params)/1e6:.1f}M "
          f"params, {fmt} source"
          + (", int8-quantized" if args.quantize else "") + ")")
    return 0


if __name__ == "__main__":
    sys.exit(main())
