#!/usr/bin/env python
"""Streaming per-tick latency benchmark (batch-1 real-time serving).

Simulates a live microphone: audio arrives in `--chunk`-second pieces and
StreamingTranscriber decodes every `--interval` seconds. Reports per-tick
wall latency (p50/p95/max) — the number a realtime caption UI experiences —
for each model, with the duration-proportional sample_len cap on and off.

Random weights never emit EOT, so every tick decodes its full (possibly
capped) horizon: this measures the WORST-CASE tick; real checkpoints stop at
EOT and run faster. One JSON line per (model, cap) config.
"""

from __future__ import annotations

import argparse
import json
import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openai_whisper_coreml_tpu.utils.platform import sync_platform_from_env

sync_platform_from_env()  # honour JAX_PLATFORMS despite sitecustomize


def run_stream(model, seconds: float, chunk: float, interval: float,
               cap: bool):
    from openai_whisper_coreml_tpu.stream import StreamingTranscriber

    st = StreamingTranscriber(
        model, language="en", decode_interval=interval,
        max_tokens_per_second=8.0 if cap else None)
    rng = np.random.default_rng(0)
    sr = 16000
    n_chunk = int(chunk * sr)
    lat = []
    fed = 0
    while fed < seconds * sr:
        piece = (0.1 * rng.standard_normal(n_chunk)).astype(np.float32)
        will_decode = (st._since_decode + n_chunk
                       >= st.decode_interval * sr)
        t0 = time.perf_counter()
        st.feed(piece)
        dt = time.perf_counter() - t0
        if will_decode:
            lat.append(dt)
        fed += n_chunk
    return lat


def run_multistream(model, n_streams: int, seconds: float, chunk: float,
                    interval: float):
    """Per-tick wall latency for N concurrent streams through ONE batched
    decode (stream.MultiStreamTranscriber.poll)."""
    from openai_whisper_coreml_tpu.stream import MultiStreamTranscriber

    mst = MultiStreamTranscriber(model, n_streams, language="en",
                                 decode_interval=interval)
    rng = np.random.default_rng(0)
    sr = 16000
    n_chunk = int(chunk * sr)
    lat = []
    fed = 0
    while fed < seconds * sr:
        for i in range(n_streams):
            mst.feed(i, (0.1 * rng.standard_normal(n_chunk))
                     .astype(np.float32))
        t0 = time.perf_counter()
        mst.poll()
        dt = time.perf_counter() - t0
        if dt > 1e-4:  # only ticks that actually decoded
            lat.append(dt)
        fed += n_chunk
    return lat


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="base,large-v3")
    ap.add_argument("--seconds", type=float, default=45.0)
    ap.add_argument("--chunk", type=float, default=0.5)
    ap.add_argument("--interval", type=float, default=1.0)
    ap.add_argument("--streams", type=int, default=0,
                    help=">0: also measure N concurrent streams through the "
                         "batched MultiStreamTranscriber tier")
    ap.add_argument("--out", default="/tmp/streaming_latency.jsonl")
    args = ap.parse_args()

    import openai_whisper_coreml_tpu as wt

    out = open(args.out, "a")
    for name in args.models.split(","):
        model = wt.load_model(name.strip())
        for cap in (True, False):
            lat = run_stream(model, args.seconds, args.chunk, args.interval,
                             cap)
            # each new (prompt_bucket, sample_len) pair compiles once;
            # separate those spikes from steady-state ticks
            med = float(np.median(lat))
            warm = [t for t in lat if t < 3 * med] or lat
            spikes = [t for t in lat if t >= 3 * med]
            rec = {
                "model": name.strip(), "sample_len_cap": cap,
                "ticks": len(warm),
                "p50_ms": round(1e3 * float(np.percentile(warm, 50)), 1),
                "p95_ms": round(1e3 * float(np.percentile(warm, 95)), 1),
                "max_ms": round(1e3 * float(np.max(warm)), 1),
                "compile_spike_ms": [round(1e3 * t, 1) for t in spikes],
            }
            print(json.dumps(rec), flush=True)
            out.write(json.dumps(rec) + "\n")
            out.flush()
        if args.streams > 0:
            lat = run_multistream(model, args.streams, args.seconds,
                                  args.chunk, args.interval)
            med = float(np.median(lat))
            warm = [t for t in lat if t < 3 * med] or lat
            rec = {
                "model": name.strip(), "multistream": args.streams,
                "ticks": len(warm),
                "p50_ms": round(1e3 * float(np.percentile(warm, 50)), 1),
                "p95_ms": round(1e3 * float(np.percentile(warm, 95)), 1),
                "per_stream_p50_ms": round(
                    1e3 * float(np.percentile(warm, 50)) / args.streams, 1),
            }
            print(json.dumps(rec), flush=True)
            out.write(json.dumps(rec) + "\n")
            out.flush()
        del model
    out.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
