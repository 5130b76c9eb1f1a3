#!/usr/bin/env python
"""Probe: block-diagonal int8 single-query-attention kernel vs inline dequant.

Measures ONE decode step's worth of cross-attention (32 layers chained, each
layer's output feeding the next query — the real dependency structure of
decode_step) at large-v3 shapes, three ways:

  * kernel:  ops/sqa_int8.sqa_int8 (v2: all heads in one block-diagonal MXU
             matmul pair, dequant in VMEM)
  * inline:  the production path — XLA einsum over k8.astype(f32)*scale
             (decode_step's quant_cross branch, models/decoder.py)
  * bf16:    einsum over bf16 K/V (the no-quant reference)

Round-1 v1 kernel (per-head matvec loop) measured 36 ms vs 31 ms inline for
this chain; the v2 rewrite batches heads into one matmul per grid cell.
HBM floor for the int8 chain is ~3.6 ms (2.95 GB at 819 GB/s).
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openai_whisper_coreml_tpu.utils.platform import sync_platform_from_env

sync_platform_from_env()  # honour JAX_PLATFORMS despite sitecustomize


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--heads", type=int, default=20)
    ap.add_argument("--dhead", type=int, default=64)
    ap.add_argument("--seq", type=int, default=1500)
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--iters", type=int, default=32,
                    help="chained steps inside one jit (amortise dispatch)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from openai_whisper_coreml_tpu.ops.sqa_int8 import (
        pack_kv, quantize_kv_column, sqa_int8)

    l, b, h, d, s = args.layers, args.batch, args.heads, args.dhead, args.seq
    rng = np.random.default_rng(0)
    kf = jnp.asarray(rng.standard_normal((l, b, h, d, s)), jnp.bfloat16)
    vf = jnp.asarray(rng.standard_normal((l, b, h, d, s)), jnp.bfloat16)
    q0 = jnp.asarray(rng.standard_normal((b, h, d)), jnp.bfloat16)
    pos = jnp.int32(s - 1)
    valid = jnp.int32(0)

    def norm(x):
        return (x / jnp.maximum(jnp.sqrt(jnp.mean(x * x)), 1e-3)).astype(
            jnp.bfloat16)

    @jax.jit
    def chain_kernel(q, k8p, ksp, v8p, vsp):
        def layer(x, xs):
            kk, kss, vv, vss = xs
            o = sqa_int8(x, kk, kss, vv, vss, pos, valid, interpret=False)
            return norm(o + x), None

        def step(x, _):
            x, _ = jax.lax.scan(layer, x, (k8p, ksp, v8p, vsp))
            return x, None

        x, _ = jax.lax.scan(step, q, None, length=args.iters)
        return x

    @jax.jit
    def chain_inline(q, k8, ks, v8, vs):
        def layer(x, xs):
            kk8, kks, vv8, vvs = xs
            kd = (kk8.astype(jnp.float32) * kks).astype(jnp.bfloat16)
            vd = (vv8.astype(jnp.float32) * vvs).astype(jnp.bfloat16)
            lg = jnp.einsum("bhd,bhds->bhs", x, kd,
                            preferred_element_type=jnp.float32) * (d ** -0.5)
            w = jax.nn.softmax(lg, axis=-1)
            o = jnp.einsum("bhs,bhds->bhd", w.astype(jnp.bfloat16), vd,
                           preferred_element_type=jnp.float32)
            return norm(o.astype(jnp.bfloat16) + x), None

        def step(x, _):
            x, _ = jax.lax.scan(layer, x, (k8, ks, v8, vs))
            return x, None

        x, _ = jax.lax.scan(step, q, None, length=args.iters)
        return x

    @jax.jit
    def chain_bf16(q, kf, vf):
        def layer(x, xs):
            kk, vv = xs
            lg = jnp.einsum("bhd,bhds->bhs", x, kk,
                            preferred_element_type=jnp.float32) * (d ** -0.5)
            w = jax.nn.softmax(lg, axis=-1)
            o = jnp.einsum("bhs,bhds->bhd", w.astype(jnp.bfloat16), vv,
                           preferred_element_type=jnp.float32)
            return norm(o.astype(jnp.bfloat16) + x), None

        def step(x, _):
            x, _ = jax.lax.scan(layer, x, (kf, vf), unroll=1)
            return x, None

        x, _ = jax.lax.scan(step, q, None, length=args.iters)
        return x

    def timed(name, fn, *xs):
        out = fn(*xs)
        np.asarray(out[:1, :1])  # fence (axon relay)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(*xs)[:1, :1])
            ts.append(time.perf_counter() - t0)
        per_step_ms = 1e3 * min(ts) / args.iters
        print(json.dumps({"impl": name, "per_step_ms": round(per_step_ms, 3),
                          "layers": l, "batch": b, "seq": s}), flush=True)

    # HBM discipline: bf16 K/V (5.9 GB) + int8 (3.3 GB) + packed int8
    # (3.3 GB) cannot coexist on a 16 GB chip — free each representation
    # after its timing.
    import gc

    timed("bf16", chain_bf16, q0, kf, vf)
    k8, ks = jax.jit(quantize_kv_column)(kf)
    v8, vs = jax.jit(quantize_kv_column)(vf)
    del kf, vf
    gc.collect()
    timed("inline_int8", chain_inline, q0, k8, ks, v8, vs)
    # packed layout for the kernel: (L, B, H*D, S) / (L, B, H, S)
    k8p, ksp = jax.jit(jax.vmap(pack_kv))(k8, ks)
    v8p, vsp = jax.jit(jax.vmap(pack_kv))(v8, vs)
    del k8, ks, v8, vs
    gc.collect()
    timed("kernel_int8_v2", chain_kernel, q0, k8p, ksp, v8p, vsp)
    return 0


if __name__ == "__main__":
    sys.exit(main())
