#!/usr/bin/env python
"""Isolate the per-step KV-cache write cost by layout (round-3 deep dive).

step_ablation shows the 64 per-layer cache column writes cost 5.49 ms/step
at B40 (write-then-read), and that neither breaking the same-step read
(-36x regression) nor an optimization_barrier changes it. Hypothesis: a
d-major cache writes ONE LANE at a DYNAMIC offset — a lane-masked RMW that
touches every 128-lane tile of the layer slice (~52 MB read+write), i.e.
the cost is the WRITE ITSELF, not a fusion artifact.

Timed variants (32 layers x K+V per step, scan over 64 steps, buffer
created in-graph per the CLAUDE.md rule):
  dmajor_dyn      (L,B,H,D,C), column write at traced pos (production)
  dmajor_static0  same, pos fixed 0 (compiler-known lane offset)
  seqmajor_dyn    (L,B,C,N) merged heads, ROW write at traced pos (the
                  round-1 layout's write pattern)
  subln_dyn       (L,B,H,C,D): write dim = sublane, D minor (lane padding
                  aside — isolates write-dim cost)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openai_whisper_coreml_tpu.utils.platform import sync_platform_from_env

sync_platform_from_env()


def main() -> int:
    import jax
    import jax.numpy as jnp

    L, B, H, D, C = 32, 40, 20, 64, 256
    N = H * D
    iters = 64
    rng = np.random.default_rng(0)
    upd_d = jnp.asarray(rng.standard_normal((2, B, H, D)), jnp.bfloat16)

    def timed(name, fn, *xs):
        np.asarray(fn(*xs))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(*xs))
            ts.append(time.perf_counter() - t0)
        print(json.dumps({"variant": name,
                          "per_step_ms": round(1e3 * min(ts) / iters, 3)}),
              flush=True)

    def make_dmajor(static0):
        @jax.jit
        def dmajor(upd):
            k = jnp.zeros((L, B, H, D, C), jnp.bfloat16)
            v = jnp.zeros((L, B, H, D, C), jnp.bfloat16)

            def step(carry, i):
                k, v = carry
                pos = 0 if static0 else i % C
                for l in range(L):
                    u = (upd[0] + i.astype(jnp.bfloat16))[..., None]
                    k = jax.lax.dynamic_update_slice(
                        k, u[None], (l, 0, 0, 0, pos))
                    v = jax.lax.dynamic_update_slice(
                        v, (upd[1])[..., None][None], (l, 0, 0, 0, pos))
                return (k, v), None

            (k, v), _ = jax.lax.scan(step, (k, v), jnp.arange(iters))
            return k[0, 0, 0, 0, :8] + v[0, 0, 0, 0, :8]
        return dmajor

    @jax.jit
    def seqmajor(upd):
        k = jnp.zeros((L, B, C, N), jnp.bfloat16)
        v = jnp.zeros((L, B, C, N), jnp.bfloat16)
        um = upd.reshape(2, B, N)

        def step(carry, i):
            k, v = carry
            pos = i % C
            for l in range(L):
                u = (um[0] + i.astype(jnp.bfloat16))[:, None]
                k = jax.lax.dynamic_update_slice(k, u[None], (l, 0, pos, 0))
                v = jax.lax.dynamic_update_slice(
                    v, um[1][:, None][None], (l, 0, pos, 0))
            return (k, v), None

        (k, v), _ = jax.lax.scan(step, (k, v), jnp.arange(iters))
        return k[0, 0, :8, 0] + v[0, 0, :8, 0]

    @jax.jit
    def sublane(upd):
        k = jnp.zeros((L, B, H, C, D), jnp.bfloat16)
        v = jnp.zeros((L, B, H, C, D), jnp.bfloat16)

        def step(carry, i):
            k, v = carry
            pos = i % C
            for l in range(L):
                u = (upd[0] + i.astype(jnp.bfloat16))[:, :, None]
                k = jax.lax.dynamic_update_slice(k, u[None], (l, 0, 0, pos, 0))
                v = jax.lax.dynamic_update_slice(
                    v, upd[1][:, :, None][None], (l, 0, 0, pos, 0))
            return (k, v), None

        (k, v), _ = jax.lax.scan(step, (k, v), jnp.arange(iters))
        return k[0, 0, 0, :8, 0] + v[0, 0, 0, :8, 0]

    timed("dmajor_dyn", make_dmajor(False), upd_d)
    timed("dmajor_static0", make_dmajor(True), upd_d)
    timed("seqmajor_dyn", seqmajor, upd_d)
    timed("subln_dyn", sublane, upd_d)
    return 0


if __name__ == "__main__":
    sys.exit(main())
