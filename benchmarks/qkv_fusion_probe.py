#!/usr/bin/env python
"""Probe: fused QKV projection vs three separate dots in the decode chain.

docs/benchmarks.md lever #1: the champion decode step runs ~1.7x above its
HBM floor — dependency-chain latency across the 32 unrolled layers. Each
layer currently issues THREE sequential(ish) weight matmuls for q/k/v at
T=1. Concatenating the weights (in, 3*out) turns them into one (B, in) @
(in, 3*out) dot: same HBM traffic, 2 fewer ops per layer, better MXU row
utilisation at small B.

Chains 32 layers x `iters` steps inside one jit (per CLAUDE.md dispatch
rules) at large-v3 decode shapes, bf16 and int8-weight variants. If the
fused form wins >0.5 ms/step, restructure decode_step to consume fused
weights (transform at load time; checkpoint format unchanged).
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
    ap.add_argument("--batch", type=int, default=40)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--iters", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    l, b, n = args.layers, args.batch, args.width
    rng = np.random.default_rng(0)

    def mk(shape, dtype=jnp.bfloat16):
        return jnp.asarray(rng.standard_normal(shape) * 0.02, dtype)

    wq, wk, wv = mk((l, n, n)), mk((l, n, n)), mk((l, n, n))
    wqkv = jnp.concatenate([wq, wk, wv], axis=-1)  # (L, n, 3n)
    x0 = mk((b, n))

    def norm(x):
        return (x / jnp.maximum(jnp.sqrt(jnp.mean(x * x)), 1e-3)).astype(
            jnp.bfloat16)

    @jax.jit
    def chain_sep(x, wq, wk, wv):
        def layer(x, ws):
            q = jnp.dot(x, ws[0], preferred_element_type=jnp.float32)
            k = jnp.dot(x, ws[1], preferred_element_type=jnp.float32)
            v = jnp.dot(x, ws[2], preferred_element_type=jnp.float32)
            return norm((q + k + v).astype(jnp.bfloat16)), None

        def step(x, _):
            x, _ = jax.lax.scan(layer, x, (wq, wk, wv))
            return x, None

        x, _ = jax.lax.scan(step, x, None, length=args.iters)
        return x

    @jax.jit
    def chain_fused(x, wqkv):
        def layer(x, w):
            qkv = jnp.dot(x, w, preferred_element_type=jnp.float32)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            return norm((q + k + v).astype(jnp.bfloat16)), None

        def step(x, _):
            x, _ = jax.lax.scan(layer, x, wqkv)
            return x, None

        x, _ = jax.lax.scan(step, x, None, length=args.iters)
        return x

    def timed(name, fn, *xs):
        np.asarray(fn(*xs)[:1, :1])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(*xs)[:1, :1])
            ts.append(time.perf_counter() - t0)
        print(json.dumps({"impl": name,
                          "per_step_ms": round(1e3 * min(ts) / args.iters, 3)}),
              flush=True)

    timed("three_dots", chain_sep, x0, wq, wk, wv)
    timed("fused_qkv", chain_fused, x0, wqkv)
    return 0


if __name__ == "__main__":
    sys.exit(main())
