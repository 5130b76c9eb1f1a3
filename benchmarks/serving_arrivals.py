#!/usr/bin/env python
"""Open-loop serving benchmark: CB vs static under Poisson arrival traffic.

The round-3 scheduler comparison (benchmarks/serving_sched.py) ran a FINITE
pre-materialised batch — the one regime where static batching is hard to
beat (every slot starts full). This benchmark measures the regime continuous
batching exists for: requests ARRIVE over time, and a static server must
either wait to fill a batch or run it underfull, while the CB engine
prefends arrivals into slots freed mid-flight.

Protocol (mel excluded, as in serving_sched — the frontend is scheduler-
independent and axon-upload noise dominates it):
  * N requests, one 30 s window each, mixed decode lengths via the
    EOT-scaled-embedding workload generator (temperature 1.0 -> geometric
    token counts; serving_sched.py docstring);
  * arrival times ~ Poisson(lambda) for each offered load in --loads
    (requests/second), simulated against the REAL wall clock;
  * static server: greedily takes every arrived request up to batch_size,
    decodes the batch (underfull batches EOT-pad — the compiled graph is
    fixed), repeats. batch-fill waiting is implicit: requests that arrive
    mid-batch wait for the next one;
  * CB server: ContinuousBatcher.run(arrivals=...) — the open-loop path;
  * per-request latency = completion wall time - arrival wall time.

One JSON line per (scheduler, load): p50/p95/mean latency, makespan,
achieved throughput. Loads past the chip's capacity show as diverging
latency (queueing), not as errors.
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

sync_platform_from_env()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="large-v3")
    ap.add_argument("--requests", type=int, default=96)
    ap.add_argument("--batch-size", type=int, default=24)
    ap.add_argument("--sample-len", type=int, default=224)
    ap.add_argument("--eot-scale", type=float, default=18.0)
    ap.add_argument("--quantize", default="int8")
    ap.add_argument("--kv-dtype", default="int8")
    ap.add_argument("--chunk", type=int, default=16,
                    help="CB chunk_tokens (smaller = finer arrival latency)")
    ap.add_argument("--refill", type=int, default=None)
    ap.add_argument("--loads", default="3,6,9",
                    help="offered loads in requests/second")
    ap.add_argument("--schedulers", default="static,continuous")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="/tmp/serving_arrivals.jsonl")
    args = ap.parse_args()

    import jax.numpy as jnp

    import openai_whisper_coreml_tpu as wt
    from openai_whisper_coreml_tpu.audio import log_mel_spectrogram
    from openai_whisper_coreml_tpu.serve import ServeOptions, _Window
    from openai_whisper_coreml_tpu.serve import _decode_windows_static
    from openai_whisper_coreml_tpu.serve_cb import ContinuousBatcher

    model = wt.load_model(
        args.model, quantize=args.quantize if args.quantize != "none" else None)
    cfg = model.cfg

    # mixed-length workload: EOT embedding scaled (serving_sched.py recipe).
    # The scale knob is exponentially brittle (hazard ~ exp(scale * logit)),
    # so it is CALIBRATED at runtime: bisect until the mean decode length
    # of one static batch lands in [40, 170] tokens.
    emb0 = model.params["decoder"]["token_embedding"]
    eot = cfg.eot_token

    def set_scale(c: float):
        model.params["decoder"]["token_embedding"] = emb0.at[eot].set(
            emb0[eot] * c)

    rng = np.random.default_rng(args.seed)
    print(json.dumps({"stage": "mel", "requests": args.requests}), flush=True)
    mels = []
    group = 24  # batched mel frontend, off the timed path
    audio = (rng.standard_normal((group, 480_000)) * 0.1).astype(np.float32)
    for i in range(0, args.requests, group):
        audio = np.roll(audio, 1, axis=0)  # distinct-ish windows, one graph
        out = np.asarray(log_mel_spectrogram(audio, n_mels=cfg.n_mels))
        mels.extend(out[: min(group, args.requests - i)])

    opts = ServeOptions(
        language="en", batch_size=args.batch_size,
        sample_len=args.sample_len, temperature=(1.0,),
        kv_dtype=args.kv_dtype, chunk_tokens=args.chunk,
        refill_size=args.refill,
        logprob_threshold=None, compression_ratio_threshold=None,
        no_speech_threshold=None)

    def fresh_windows():
        return [_Window(i, 0, mels[i]) for i in range(args.requests)]

    # ---- calibrate the workload, compile every graph off the timed path ----
    print(json.dumps({"stage": "warmup"}), flush=True)
    scale, counts = args.eot_scale, None
    for _ in range(8):  # bisection-ish: halve when too short, 1.5x when long
        set_scale(scale)
        warm = fresh_windows()[: args.batch_size]
        _decode_windows_static(model, warm, opts)
        counts = [len(w.result.tokens) for w in warm if w.result]
        mean = float(np.mean(counts))
        print(json.dumps({"stage": "calibrate", "eot_scale": round(scale, 2),
                          "token_len_mean": round(mean, 1)}), flush=True)
        if 40.0 <= mean <= 170.0:
            break
        scale = scale * (0.6 if mean < 40.0 else 1.5)
    token_counts = counts
    import gc

    cb = ContinuousBatcher(model, opts)
    cb_warm = fresh_windows()[: max(2, args.batch_size // 2)]
    cb.run(cb_warm)  # compiles encode/prefill/chunk/scatter (incl. underfull)
    del cb  # its device-resident cross-KV pool (~3 GB at B24 int8) must be
    gc.collect()  # freed before the measured engines allocate their own
    print(json.dumps({"stage": "workload",
                      "token_len_min": int(np.min(token_counts)),
                      "token_len_mean": round(float(np.mean(token_counts)), 1),
                      "token_len_max": int(np.max(token_counts))}),
          flush=True)

    out_f = open(args.out, "a")
    for load in (float(x) for x in args.loads.split(",")):
        inter = rng.exponential(1.0 / load, args.requests)
        arrival_offsets = np.cumsum(inter)
        for sched in args.schedulers.split(","):
            gc.collect()  # release the previous engine's device pool
            windows = fresh_windows()
            done_at = [None] * args.requests
            t0 = time.perf_counter()

            def now():
                return time.perf_counter() - t0

            cursor = 0

            def arrived():
                nonlocal cursor
                t = now()
                got = []
                while (cursor < args.requests
                       and arrival_offsets[cursor] <= t):
                    got.append(windows[cursor])
                    cursor += 1
                return got

            def stamp():
                t = now()
                for i, w in enumerate(windows):
                    if done_at[i] is None and w.result is not None:
                        done_at[i] = t

            if sched == "static":
                served, queued = 0, []
                while served < args.requests:
                    queued.extend(arrived())
                    if not queued:
                        time.sleep(0.002)
                        continue
                    batch = queued[: args.batch_size]
                    queued = queued[args.batch_size:]
                    _decode_windows_static(model, batch, opts)
                    stamp()
                    served += len(batch)
            else:
                def cb_arrivals():
                    stamp()
                    got = arrived()
                    if not got and cursor >= args.requests:
                        return None
                    return got

                ContinuousBatcher(model, opts).run([], arrivals=cb_arrivals)
            stamp()
            makespan = now()

            lat = np.asarray([done_at[i] - arrival_offsets[i]
                              for i in range(args.requests)])
            rec = {
                "scheduler": sched,
                "offered_load_rps": load,
                "requests": args.requests,
                "latency_p50_s": round(float(np.percentile(lat, 50)), 2),
                "latency_p95_s": round(float(np.percentile(lat, 95)), 2),
                "latency_mean_s": round(float(np.mean(lat)), 2),
                "makespan_s": round(makespan, 2),
                "achieved_rps": round(args.requests / makespan, 2),
                "batch_size": args.batch_size,
                "chunk_tokens": args.chunk,
            }
            print(json.dumps(rec), flush=True)
            out_f.write(json.dumps(rec) + "\n")
    out_f.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
