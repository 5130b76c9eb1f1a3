#!/usr/bin/env python
"""Probe: int4 cross-KV via even/odd position split (inline XLA dequant).

int8 cross-KV won 17% end to end because XLA fuses the convert+scale into
the attention einsum — no dequantised tensor ever hits HBM. int4 halves the
stream again IF the nibble unpack also fuses. Naive unpack (shift+mask+
interleave to (…,S)) materialises; instead keep the packed layout and split
the attention by position parity:

  k4[..., j] packs positions 2j (low nibble) and 2j+1 (high nibble)
  logits_even = q @ dequant(lo(k4)), logits_odd = q @ dequant(hi(k4))
  logits = interleave(logits_even, logits_odd)      # (B,H,S) — small
  out    = w_even @ dequant(lo(v4)) + w_odd @ dequant(hi(v4))

The shifts/masks are elementwise on the packed operand of each einsum, so
they can fuse exactly like the int8 convert did. Compares one decode step of
32 chained cross-attention layers: int8 inline vs int4-split inline vs the
int4 accuracy of the quantisation itself.
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

    l, b, h, d, s = args.layers, args.batch, args.heads, args.dhead, args.seq
    assert s % 2 == 0
    rng = np.random.default_rng(0)
    kf = jnp.asarray(rng.standard_normal((l, b, h, d, s)), jnp.bfloat16)
    vf = jnp.asarray(rng.standard_normal((l, b, h, d, s)), jnp.bfloat16)
    q0 = jnp.asarray(rng.standard_normal((b, h, d)), jnp.bfloat16)

    def norm(x):
        return (x / jnp.maximum(jnp.sqrt(jnp.mean(x * x)), 1e-3)).astype(
            jnp.bfloat16)

    # ---- quantisers ------------------------------------------------------
    def quant8(x):
        x32 = x.astype(jnp.float32)
        sc = jnp.maximum(jnp.max(jnp.abs(x32), axis=-2, keepdims=True) / 127.0,
                         1e-12)
        return jnp.clip(jnp.round(x32 / sc), -127, 127).astype(jnp.int8), sc

    def quant4_layer(x):
        """(..., D, S) -> packed (..., D, S//2) uint8 + (..., 1, S) scales.
        Position 2j -> low nibble, 2j+1 -> high nibble; values in [-8, 7]."""
        x32 = x.astype(jnp.float32)
        sc = jnp.maximum(jnp.max(jnp.abs(x32), axis=-2, keepdims=True) / 7.0,
                         1e-12)
        q = (jnp.clip(jnp.round(x32 / sc), -8, 7) + 8).astype(jnp.uint8)
        lo, hi = q[..., 0::2], q[..., 1::2]
        return lo | (hi << 4), sc

    def quant4(x):
        # per-layer map: a whole-tensor int32 intermediate at
        # (L,B,H,D,S) is 5.9 GB and OOMs the chip (measured)
        return jax.lax.map(quant4_layer, x)

    # ---- chains ----------------------------------------------------------
    @jax.jit
    def chain_int8(q, k8, ks, v8, vs):
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
    def chain_int4(q, k4, ks, v4, vs):
        ks_e, ks_o = ks[..., 0::2], ks[..., 1::2]  # (L,B,H,1,S/2) each
        vs_e, vs_o = vs[..., 0::2], vs[..., 1::2]

        def layer(x, xs):
            kk4, kse, kso, vv4, vse, vso = xs

            def deq(p4, nib, sc):
                v = ((p4 >> 4) if nib else (p4 & 0xF)).astype(jnp.float32) - 8.0
                return (v * sc).astype(jnp.bfloat16)

            lg_e = jnp.einsum("bhd,bhds->bhs", x, deq(kk4, 0, kse),
                              preferred_element_type=jnp.float32)
            lg_o = jnp.einsum("bhd,bhds->bhs", x, deq(kk4, 1, kso),
                              preferred_element_type=jnp.float32)
            lg = jnp.stack([lg_e, lg_o], axis=-1).reshape(b, h, s)
            lg = lg * (d ** -0.5)
            w = jax.nn.softmax(lg, axis=-1).astype(jnp.bfloat16)
            w2 = w.reshape(b, h, s // 2, 2)
            o = (jnp.einsum("bhs,bhds->bhd", w2[..., 0], deq(vv4, 0, vse),
                            preferred_element_type=jnp.float32)
                 + jnp.einsum("bhs,bhds->bhd", w2[..., 1], deq(vv4, 1, vso),
                              preferred_element_type=jnp.float32))
            return norm(o.astype(jnp.bfloat16) + x), None

        def step(x, _):
            x, _ = jax.lax.scan(layer, x, (k4, ks_e, ks_o, v4, vs_e, vs_o))
            return x, None

        x, _ = jax.lax.scan(step, q, None, length=args.iters)
        return x

    def timed(name, fn, *xs):
        out = fn(*xs)
        np.asarray(out[:1, :1])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(*xs)[:1, :1])
            ts.append(time.perf_counter() - t0)
        print(json.dumps({"impl": name,
                          "per_step_ms": round(1e3 * min(ts) / args.iters, 3)}),
              flush=True)

    import gc

    # accuracy of the int4 representation itself (one layer, vs fp32)
    k8, ks8 = jax.jit(quant8)(kf[0])
    k4, ks4 = jax.jit(quant4)(kf[0])
    kd8 = np.asarray(k8.astype(jnp.float32) * ks8)
    lo = (k4 & 0xF).astype(jnp.int32) - 8
    hi = (k4 >> 4).astype(jnp.int32) - 8
    kd4 = np.empty((b, h, d, s), np.float32)
    kd4[..., 0::2] = np.asarray(lo.astype(jnp.float32) * ks4[..., 0::2])
    kd4[..., 1::2] = np.asarray(hi.astype(jnp.float32) * ks4[..., 1::2])
    ref = np.asarray(kf[0], np.float32)
    print(json.dumps({
        "rel_err_int8": round(float(np.abs(kd8 - ref).mean()
                                    / np.abs(ref).mean()), 4),
        "rel_err_int4": round(float(np.abs(kd4 - ref).mean()
                                    / np.abs(ref).mean()), 4)}), flush=True)
    del k8, ks8, k4, ks4, kd8, kd4, lo, hi, ref
    gc.collect()

    k8, ks = jax.jit(quant8)(kf)
    v8, vs = jax.jit(quant8)(vf)
    k4, ks4 = jax.jit(quant4)(kf)
    v4, vs4 = jax.jit(quant4)(vf)
    del kf, vf
    gc.collect()
    timed("inline_int8", chain_int8, q0, k8, ks, v8, vs)
    del k8, v8
    gc.collect()
    timed("inline_int4_split", chain_int4, q0, k4, ks4, v4, vs4)
    return 0


if __name__ == "__main__":
    sys.exit(main())
