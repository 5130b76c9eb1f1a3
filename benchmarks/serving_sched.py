#!/usr/bin/env python
"""Static vs continuous scheduler on mixed-finish-time serving workloads.

Random weights never emit EOT, so every window would decode the full horizon
and both schedulers would tie by construction. To get the mixed decode
lengths real traffic has (~50-150 tokens per 30 s window), the EOT token's
embedding row is scaled up and decoding runs at temperature 1.0: the
per-step EOT probability becomes a scale-continuous hazard rate, so window
lengths come out geometrically distributed — genuinely mixed, like real
traffic. (Greedy argmax is a step-function in the scale: every window
finishes at token 1 or never, measured on-chip at large-v3 — scale 4.0 ->
all 224, scale 4.5 -> all 1.) A synthetic workload generator, not a
quality claim.
The resulting per-window token-count spread is reported alongside the
timings so the workload is inspectable.

Measures serve.transcribe_batch wall time with scheduler='static' vs
'continuous' on the same windows + model. One JSON line per scheduler.
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
    ap.add_argument("--windows", type=int, default=96,
                    help="number of 30 s windows (requests)")
    ap.add_argument("--batch-size", type=int, default=24)
    ap.add_argument("--sample-len", type=int, default=224)
    ap.add_argument("--eot-scale", type=float, default=18.0,
                    help="EOT embedding scale; tune for mean ~80-120 tokens")
    ap.add_argument("--quantize", default="int8")
    ap.add_argument("--kv-dtype", default="int8")
    ap.add_argument("--refill", type=int, default=None,
                    help="refill_size (default: batch_size // 4)")
    ap.add_argument("--chunk", type=int, default=32,
                    help="chunk_tokens between host syncs")
    ap.add_argument("--out", default="/tmp/serving_sched.jsonl")
    ap.add_argument("--calibrate", default=None,
                    help="comma list of EOT scales: decode ONE static batch "
                         "per scale (same compiled graph — params are jit "
                         "args) and print the token-length spread, then exit")
    args = ap.parse_args()

    import jax.numpy as jnp

    import openai_whisper_coreml_tpu as wt
    from openai_whisper_coreml_tpu.serve import ServeOptions, transcribe_batch

    model = wt.load_model(
        args.model, quantize=args.quantize if args.quantize != "none" else None)

    # synthetic mixed-length workload: boost EOT reachability (see docstring)
    emb0 = model.params["decoder"]["token_embedding"]
    eot = model.cfg.eot_token

    def set_scale(c: float):
        model.params["decoder"]["token_embedding"] = emb0.at[eot].set(
            emb0[eot] * c)

    rng = np.random.default_rng(0)
    audios = [(rng.standard_normal(480_000) * 0.1).astype(np.float32)
              for _ in range(args.windows)]

    if args.calibrate:
        cal_audios = audios[: args.batch_size]
        for c in (float(x) for x in args.calibrate.split(",")):
            set_scale(c)
            opts = ServeOptions(scheduler="static", language="en",
                                batch_size=args.batch_size,
                                sample_len=args.sample_len,
                                kv_dtype=args.kv_dtype, temperature=(1.0,),
                                logprob_threshold=None,
                                compression_ratio_threshold=None,
                                no_speech_threshold=None)
            results = transcribe_batch(model, cal_audios, opts)
            lens = [sum(len(s["tokens"]) for s in r["segments"]) or 1
                    for r in results]
            print(json.dumps({"eot_scale": c,
                              "len_min_mean_max": [int(np.min(lens)),
                                                   round(float(np.mean(lens)), 1),
                                                   int(np.max(lens))]}),
                  flush=True)
        return 0

    set_scale(args.eot_scale)

    out = open(args.out, "a")
    base = dict(language="en", batch_size=args.batch_size,
                sample_len=args.sample_len, kv_dtype=args.kv_dtype,
                refill_size=args.refill, chunk_tokens=args.chunk,
                temperature=(1.0,), logprob_threshold=None,
                compression_ratio_threshold=None, no_speech_threshold=None)
    for sched in ("continuous", "static"):
        opts = ServeOptions(scheduler=sched, **base)
        # warmup must cover EVERY graph the timed run uses — for the
        # continuous scheduler that includes the refill path (encode +
        # prefill at refill_size + scatter), which only triggers once the
        # queue outlives the initial fill. batch_size + 2*refill windows
        # guarantees at least one mid-flight refill.
        refill = opts.refill_size or max(1, opts.batch_size // 4)
        transcribe_batch(model, audios[: opts.batch_size + 2 * refill], opts)
        t0 = time.perf_counter()
        results = transcribe_batch(model, audios, opts)
        dt = time.perf_counter() - t0
        lens = [sum(len(s["tokens"]) for s in r["segments"]) or 1
                for r in results]
        rec = {"scheduler": sched, "windows": args.windows,
               "refill": args.refill, "chunk": args.chunk,
               "wall_s": round(dt, 2),
               "rtfx": round(args.windows * 30.0 / dt, 1),
               "token_len_min_mean_max": [int(np.min(lens)),
                                          round(float(np.mean(lens)), 1),
                                          int(np.max(lens))]}
        print(json.dumps(rec), flush=True)
        out.write(json.dumps(rec) + "\n")
        out.flush()
    out.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
