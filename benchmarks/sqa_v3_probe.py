#!/usr/bin/env python
"""Probe: v3 fused int8-MXU SQA kernel vs XLA inline dequant (32-layer chain).

Same harness as benchmarks/sqa_probe.py (the real serial dependency of a
decode step's cross-attention chain). XLA inline dequant measured 5.75 ms at
B24 (HBM floor ~3.6 ms); v2 kernel 7.71 ms. v3 uses native int8xint8->int32
MXU dots for QK (and optionally AV) with scales folded outside.
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
    ap.add_argument("--seq-pad", type=int, default=1536)
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--iters", type=int, default=32)
    
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from openai_whisper_coreml_tpu.ops.sqa_int8 import quantize_kv_column
    from openai_whisper_coreml_tpu.ops.sqa_v3 import (
        sqa_cross_int8, sqa_cross_reference)

    l, b, h, d = args.layers, args.batch, args.heads, args.dhead
    s, sp = args.seq, args.seq_pad
    rng = np.random.default_rng(0)
    kf = jnp.asarray(rng.standard_normal((l, b, h, d, s)), jnp.bfloat16)
    vf = jnp.asarray(rng.standard_normal((l, b, h, d, s)), jnp.bfloat16)
    q0 = jnp.asarray(rng.standard_normal((b, h, d)), jnp.bfloat16)

    k8, ks = jax.jit(quantize_kv_column)(kf)
    v8, vs = jax.jit(quantize_kv_column)(vf)
    del kf, vf
    import gc
    gc.collect()
    # pad the lane dim to 1536 once (as the production layout would store it)
    pad = [(0, 0)] * 4 + [(0, sp - s)]
    k8 = jnp.pad(k8, pad)
    v8 = jnp.pad(v8, pad)
    ks = jnp.pad(ks, pad)
    vs = jnp.pad(vs, pad)

    def norm(x):
        return (x / jnp.maximum(jnp.sqrt(jnp.mean(x * x)), 1e-3)).astype(
            jnp.bfloat16)

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
                          "layers": l, "batch": b}), flush=True)

    # on-chip parity first (compiled kernel can differ from interpret!)
    ref1 = sqa_cross_reference(q0, k8[0], ks[0], v8[0], vs[0], s_len=s)
    for av in (True, False):
        got = sqa_cross_int8(q0, k8[0], ks[0], v8[0], vs[0], s_len=s,
                             av_int8=av)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - ref1.astype(jnp.float32))))
        print(json.dumps({"check": f"av_int8={av}", "max_abs_err": err}),
              flush=True)

    def layer_inline(x, k8l, ksl, v8l, vsl):
        kd = (k8l.astype(jnp.float32) * ksl).astype(jnp.bfloat16)
        vd = (v8l.astype(jnp.float32) * vsl).astype(jnp.bfloat16)
        lg = jnp.einsum("bhd,bhds->bhs", x, kd,
                        preferred_element_type=jnp.float32) * (d ** -0.5)
        lg = jnp.where(jnp.arange(sp)[None, None, :] < s, lg, -1e30)
        w = jax.nn.softmax(lg, axis=-1)
        o = jnp.einsum("bhs,bhds->bhd", w.astype(jnp.bfloat16), vd,
                       preferred_element_type=jnp.float32)
        return o.astype(jnp.bfloat16)

    timed("inline_int8", chain(layer_inline), q0, k8, ks, v8, vs)
    for av in (True, False):
        def layer_kernel(x, k8l, ksl, v8l, vsl, av=av):
            return sqa_cross_int8(x, k8l, ksl, v8l, vsl, s_len=s,
                                  av_int8=av,
                                  interpret=False).astype(jnp.bfloat16)

        timed(f"v3_av{'8' if av else 'bf16'}",
              chain(layer_kernel), q0, k8, ks, v8, vs)
    return 0


if __name__ == "__main__":
    sys.exit(main())
