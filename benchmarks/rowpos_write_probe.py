#!/usr/bin/env python
"""Probe: per-row-position KV-cache write strategies (continuous batching).

The CB engine measured 6.5x SLOWER than static at large-v3 (348 s vs 54 s
for the same 96-window workload): suspicion is the per-row cache write
`buf.at[l, arange(B), :, :, pos].set(v)` lowering to a generic TPU scatter.
This probe times one decode step's worth of cache writes (32 layers x 4
buffers) three ways at large-v3 shapes:

  scatter:  buf.at[l, rows, :, :, pos].set(val)        (current serve_cb)
  onehot:   masked read-modify-write over the C dim     (dense, fusable)
  vmap_dus: vmapped dynamic_update_slice per batch row

and the lockstep dynamic_update_slice reference.
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
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--heads", type=int, default=20)
    ap.add_argument("--dhead", type=int, default=64)
    ap.add_argument("--ctx", type=int, default=256)
    ap.add_argument("--iters", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    l, b, h, d, c = (args.layers, args.batch, args.heads, args.dhead,
                     args.ctx)
    rng = np.random.default_rng(0)
    buf0 = jnp.asarray(rng.standard_normal((l, b, h, d, c)), jnp.bfloat16)
    val0 = jnp.asarray(rng.standard_normal((b, h, d, 1)), jnp.bfloat16)
    pos0 = jnp.asarray(rng.integers(0, c, (b,)), jnp.int32)
    rows = jnp.arange(b)

    def mk_chain(write):
        @jax.jit
        def chain(buf, val, pos):
            def step(carry, _):
                buf, pos = carry
                for li in range(l):
                    buf = write(buf, li, val, pos)
                return (buf, (pos + 1) % c), None

            (buf, _), _ = jax.lax.scan(step, (buf, pos), None,
                                       length=args.iters)
            return buf

        return chain

    def w_scatter(buf, li, val, pos):
        return buf.at[li, rows, :, :, pos].set(val[..., 0])

    def w_onehot(buf, li, val, pos):
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (b, 1, 1, c), 3)
                  == pos[:, None, None, None])
        layer = jnp.where(onehot, val, buf[li])
        return jax.lax.dynamic_update_slice(buf, layer[None],
                                            (li, 0, 0, 0, 0))

    def w_vmap_dus(buf, li, val, pos):
        layer = jax.vmap(
            lambda bb, vv, pp: jax.lax.dynamic_update_slice(bb, vv, (0, 0, pp))
        )(buf[li], val, pos)
        return jax.lax.dynamic_update_slice(buf, layer[None],
                                            (li, 0, 0, 0, 0))

    def w_lockstep(buf, li, val, pos):
        return jax.lax.dynamic_update_slice(buf, val[None], (li, 0, 0, 0, 0))

    def timed(name, fn):
        out = fn(buf0, val0, pos0)
        np.asarray(out[:1, :1, :1, :1, :1])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(buf0, val0, pos0)[:1, :1, :1, :1, :1])
            ts.append(time.perf_counter() - t0)
        print(json.dumps({"impl": name,
                          "per_step_ms": round(1e3 * min(ts) / args.iters, 3)}),
              flush=True)

    timed("lockstep_dus_ref", mk_chain(w_lockstep))
    timed("onehot", mk_chain(w_onehot))
    timed("vmap_dus", mk_chain(w_vmap_dus))
    timed("scatter_current", mk_chain(w_scatter))
    return 0


if __name__ == "__main__":
    sys.exit(main())
