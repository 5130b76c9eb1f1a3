#!/usr/bin/env python
"""Probe: native int8xint8 MXU matmuls for single-query cross-attention.

Round-2 analysis (docs/benchmarks.md) left the int8 cross-attn chain at
5.72 ms (B24, 32 layers) — 1.6x above its 3.6 ms HBM floor.  The timing is
consistent with an MXU *ingest* floor instead: single-query attention is a
batched matvec, so the MXU streams the K/V "weight" matrices at ~128 elems
per MXU per cycle regardless of the wasted M rows; at 4 MXUs / 940 MHz that
is ~481 G elem/s — BELOW the 819 GB/s HBM int8 stream.  v5e's int8 MXU mode
doubles ingest (394 TOPS int8 vs 197 TFLOPS bf16), which would push the
chain back to HBM-bound.

Variants (all 32-layer chains with the real serial dependency):
  inline_int8   production path: dequant to bf16, bf16 einsums
  qk_native     QK^T as int8xint8 -> int32 (q quantized per (b,h) row);
                AV stays bf16 inline-dequant
  full_native   QK and AV both int8xint8 (softmax probs are scaled by the
                per-position V column scale, then row-quantized to int8 —
                folding the column scale into the probs is what makes the
                int8 AV matmul exact-in-structure)
Plus raw ingest microbenchmarks (qk einsum only, bf16 vs int8) to measure
the ingest rate directly.
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
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--heads", type=int, default=20)
    ap.add_argument("--dhead", type=int, default=64)
    ap.add_argument("--seq", type=int, default=1500)
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--iters", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from openai_whisper_coreml_tpu.ops.sqa_int8 import quantize_kv_column

    l, b, h, d, s = args.layers, args.batch, args.heads, args.dhead, args.seq
    rng = np.random.default_rng(0)
    kf = jnp.asarray(rng.standard_normal((l, b, h, d, s)), jnp.bfloat16)
    vf = jnp.asarray(rng.standard_normal((l, b, h, d, s)), jnp.bfloat16)
    q0 = jnp.asarray(rng.standard_normal((b, h, d)), jnp.bfloat16)

    def norm(x):
        return (x / jnp.maximum(jnp.sqrt(jnp.mean(x * x)), 1e-3)).astype(
            jnp.bfloat16)

    def quant_q(x):
        """(B,H,D) bf16 -> int8 with per-(b,h) scale."""
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
        scale = jnp.maximum(amax, 1e-6) / 127.0
        q8 = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127
                      ).astype(jnp.int8)
        return q8, scale  # scale (B,H,1)

    def chain(layer_fn):
        @jax.jit
        def run(x0, *streams):
            def layer(x, xs):
                return norm(layer_fn(x, *xs) + x), None

            def step(x, _):
                x, _ = jax.lax.scan(layer, x, streams)
                return x, None

            x, _ = jax.lax.scan(step, x0, None, length=args.iters)
            return x
        return run

    def layer_inline(x, k8, ks, v8, vs):
        kd = (k8.astype(jnp.float32) * ks).astype(jnp.bfloat16)
        vd = (v8.astype(jnp.float32) * vs).astype(jnp.bfloat16)
        lg = jnp.einsum("bhd,bhds->bhs", x, kd,
                        preferred_element_type=jnp.float32) * (d ** -0.5)
        w = jax.nn.softmax(lg, axis=-1)
        o = jnp.einsum("bhs,bhds->bhd", w.astype(jnp.bfloat16), vd,
                       preferred_element_type=jnp.float32)
        return o.astype(jnp.bfloat16)

    def layer_qk_native(x, k8, ks, v8, vs):
        q8, qs = quant_q(x)
        lg_i = jnp.einsum("bhd,bhds->bhs", q8, k8,
                          preferred_element_type=jnp.int32)
        lg = lg_i.astype(jnp.float32) * qs * ks[:, :, 0, :] * (d ** -0.5)
        w = jax.nn.softmax(lg, axis=-1)
        vd = (v8.astype(jnp.float32) * vs).astype(jnp.bfloat16)
        o = jnp.einsum("bhs,bhds->bhd", w.astype(jnp.bfloat16), vd,
                       preferred_element_type=jnp.float32)
        return o.astype(jnp.bfloat16)

    def layer_full_native(x, k8, ks, v8, vs):
        q8, qs = quant_q(x)
        lg_i = jnp.einsum("bhd,bhds->bhs", q8, k8,
                          preferred_element_type=jnp.int32)
        lg = lg_i.astype(jnp.float32) * qs * ks[:, :, 0, :] * (d ** -0.5)
        w = jax.nn.softmax(lg, axis=-1)
        # fold V's per-position column scale into the probs, then row-quantize
        wv = w * vs[:, :, 0, :]  # (B,H,S) f32
        wmax = jnp.max(wv, axis=-1, keepdims=True)
        wscale = jnp.maximum(wmax, 1e-20) / 127.0
        w8 = jnp.clip(jnp.round(wv / wscale), -127, 127).astype(jnp.int8)
        o_i = jnp.einsum("bhs,bhds->bhd", w8, v8,
                         preferred_element_type=jnp.int32)
        o = o_i.astype(jnp.float32) * wscale
        return o.astype(jnp.bfloat16)

    def timed(name, fn, *xs):
        out = fn(*xs)
        np.asarray(out[:1, :1])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(*xs)[:1, :1])
            ts.append(time.perf_counter() - t0)
        per_step_ms = 1e3 * min(ts) / args.iters
        print(json.dumps({"impl": name, "per_step_ms": round(per_step_ms, 3),
                          "layers": l, "batch": b, "seq": s}), flush=True)
        return out

    import gc

    # correctness spot-check on small shapes (CPU-friendly math, on device)
    k8, ks = jax.jit(quantize_kv_column)(kf)
    v8, vs = jax.jit(quantize_kv_column)(vf)
    del kf, vf
    gc.collect()

    ref = layer_inline(q0, k8[0], ks[0], v8[0], vs[0])
    got = layer_full_native(q0, k8[0], ks[0], v8[0], vs[0])
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) -
                                got.astype(jnp.float32))))
    rms = float(jnp.sqrt(jnp.mean(ref.astype(jnp.float32) ** 2)))
    print(json.dumps({"check": "full_native vs inline", "max_abs_err": err,
                      "ref_rms": rms}), flush=True)

    timed("inline_int8", chain(layer_inline), q0, k8, ks, v8, vs)
    timed("qk_native", chain(layer_qk_native), q0, k8, ks, v8, vs)
    timed("full_native", chain(layer_full_native), q0, k8, ks, v8, vs)

    # raw ingest microbench: QK einsum alone over the 32-layer stream
    @jax.jit
    def qk_bf16_raw(q, k8, ks):
        def body(acc, xs):
            (k8l, ksl) = xs
            kd = (k8l.astype(jnp.float32) * ksl).astype(jnp.bfloat16)
            lg = jnp.einsum("bhd,bhds->bhs", q, kd,
                            preferred_element_type=jnp.float32)
            return acc + jnp.sum(lg), None

        def step(acc, _):
            acc, _ = jax.lax.scan(body, acc, (k8, ks))
            return acc, None

        acc, _ = jax.lax.scan(step, jnp.float32(0), None, length=args.iters)
        return acc

    @jax.jit
    def qk_int8_raw(q8, k8):
        def body(acc, k8l):
            lg = jnp.einsum("bhd,bhds->bhs", q8, k8l,
                            preferred_element_type=jnp.int32)
            return acc + jnp.sum(lg.astype(jnp.float32)), None

        def step(acc, _):
            acc, _ = jax.lax.scan(body, acc, k8)
            return acc, None

        acc, _ = jax.lax.scan(step, jnp.float32(0), None, length=args.iters)
        return acc

    q8c, _ = quant_q(q0)

    def timed_scalar(name, fn, *xs):
        np.asarray(fn(*xs))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(*xs))
            ts.append(time.perf_counter() - t0)
        per_step_ms = 1e3 * min(ts) / args.iters
        gb = l * b * h * d * s / 1e9
        print(json.dumps({"impl": name, "per_step_ms": round(per_step_ms, 3),
                          "eff_GBps": round(gb / (per_step_ms / 1e3), 1)}),
              flush=True)

    timed_scalar("qk_only_dequant_bf16", qk_bf16_raw, q0, k8, ks)
    timed_scalar("qk_only_int8_native", qk_int8_raw, q8c, k8)
    return 0


if __name__ == "__main__":
    sys.exit(main())
