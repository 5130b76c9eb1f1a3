#!/usr/bin/env python
"""End-to-end RTFx sweep over int8 configurations (one TPU process).

Round-1 measured (large-v3, B24, sample_len 224): bf16 179.0, +int8 weights
195.3, +int8 cross-KV 210.3, both 233.0, both@B32 223.7. This sweep adds the
round-2 int8 SELF-attention cache (cache_dtype) and probes the batch ceiling
once every KV stream is int8 (cross-KV storage halves again).

Each config runs the same workload as bench.py (mel -> encoder -> greedy
decode of SAMPLE_LEN tokens); one JSON line per config is appended to
--out so a crash mid-sweep keeps earlier results.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openai_whisper_coreml_tpu.utils.platform import sync_platform_from_env

sync_platform_from_env()  # honour JAX_PLATFORMS despite sitecustomize


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="large-v3")
    ap.add_argument("--sample-len", type=int, default=224)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default="/tmp/int8_sweep.jsonl")
    ap.add_argument("--configs", default=(
        "24:int8:int8:int8,32:int8:int8:int8,40:int8:int8:int8,"
        "48:int8:int8:int8,64:int8:int8:int8,24:none:int8:int8"),
        help="comma list of batch:quantize:kv_dtype:cache_dtype; OOM-risky "
             "large batches belong late in the list (a worker crash kills "
             "the process; earlier lines are already on disk)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import openai_whisper_coreml_tpu as wt
    from openai_whisper_coreml_tpu.audio import log_mel_spectrogram
    from openai_whisper_coreml_tpu.decoding import (
        DecodingOptions,
        build_blank_mask,
        build_suppress_mask,
        greedy_decode_core,
    )
    from openai_whisper_coreml_tpu.tokenizer import get_tokenizer

    configs = []
    for spec in args.configs.split(","):
        b, q, kv, cache = spec.strip().split(":")
        configs.append((int(b), None if q == "none" else q, kv, cache))

    # hold ONE model at a time: two weight copies resident would steal the
    # HBM headroom the large-batch probes are trying to measure
    cur_quant, model = object(), None
    cfg = None
    tok = None
    opts = DecodingOptions(language="en")
    rng = np.random.default_rng(0)

    out = open(args.out, "a")
    for batch, quantize, kv_dtype, cache_dtype in configs:
        name = (f"b{batch}_w{quantize or 'bf16'}_kv{kv_dtype}_"
                f"cache{cache_dtype}")
        try:
            if quantize is not cur_quant and quantize != cur_quant:
                model = None
                import gc
                gc.collect()
                model = wt.load_model(args.model, quantize=quantize)
                cur_quant = quantize
            cfg = model.cfg
            tok = tok or get_tokenizer(cfg, language="en")
            suppress = jnp.asarray(build_suppress_mask(tok, opts))
            blank = jnp.asarray(build_blank_mask(tok))
            initial = np.tile(
                np.asarray([[tok.eot, tok.sot, tok.language_token("en"),
                             tok.transcribe]], np.int32), (batch, 1))
            prompt_len = initial.shape[1]
            initial_dev = jnp.asarray(initial)
            key = jax.random.PRNGKey(0)
            audio = (rng.standard_normal((batch, 480_000)) * 0.1
                     ).astype(np.float32)
            audio_dev = jax.device_put(jnp.asarray(audio))

            def run(audio_in):
                mel = log_mel_spectrogram(audio_in, n_mels=cfg.n_mels)
                feats = model._encode_jit(model.params, mel=mel)
                tokens, *_ = greedy_decode_core(
                    model.params, cfg, feats, initial_dev, suppress, blank,
                    jnp.float32(0.0), key, jnp.int32(50), jnp.int32(1),
                    jnp.int32(2), sample_len=args.sample_len,
                    use_timestamps=True, prompt_len=prompt_len,
                    kv_dtype=kv_dtype, cache_dtype=cache_dtype)
                return tokens

            def fence(x):
                return np.asarray(x[:1, :1])

            fence(run(audio_dev))  # compile
            times = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                fence(run(audio_dev))
                times.append(time.perf_counter() - t0)
            rtfx = batch * 30.0 / min(times)
            rec = {"config": name, "rtfx": round(rtfx, 2),
                   "vs_baseline": round(rtfx / 150.0, 3),
                   "times": [round(t, 3) for t in times]}
        except Exception as e:  # OOM probes are expected to fail
            rec = {"config": name, "error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps(rec), flush=True)
        out.write(json.dumps(rec) + "\n")
        out.flush()
    out.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
