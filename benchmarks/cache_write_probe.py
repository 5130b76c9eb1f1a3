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

    L, B, H, D = 32, 40, 20, 64
    C = int(os.environ.get('PROBE_C', '256'))
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


if __name__ == "__main__" and not os.environ.get("ATTN_VARIANTS"):
    sys.exit(main())


def attn_variants() -> int:
    """writes+attention-reads together (the real self sublayer minus
    projections): is the 5.49 ms an interaction cost?"""
    import jax
    import jax.numpy as jnp

    L, B, H, D = 32, 40, 20, 64
    C = int(os.environ.get('PROBE_C', '256'))
    iters = 64
    rng = np.random.default_rng(0)
    upd = jnp.asarray(rng.standard_normal((2, B, H, D)), jnp.bfloat16)
    q0 = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.bfloat16)

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

    def make(write: bool, read: bool, barrier=False, perlayer=False,
             scatter=False):
        @jax.jit
        def run(upd, q):
            if perlayer:
                ks = [jnp.zeros((B, H, D, C), jnp.bfloat16)
                      for _ in range(L)]
                vs = [jnp.zeros((B, H, D, C), jnp.bfloat16)
                      for _ in range(L)]
            else:
                ks = jnp.zeros((L, B, H, D, C), jnp.bfloat16)
                vs = jnp.zeros((L, B, H, D, C), jnp.bfloat16)

            def step(carry, i):
                k, v, q = carry
                pos = i % C
                mask = (jnp.arange(C)[None, None, None, :]
                        <= pos)  # (1,1,1,C)
                for l in range(L):
                    if write:
                        u = (upd[0] * q[:, 0].mean())[..., None]
                        uv = upd[1][..., None]
                        if perlayer:
                            k[l] = jax.lax.dynamic_update_slice(
                                k[l], u, (0, 0, 0, pos))
                            v[l] = jax.lax.dynamic_update_slice(
                                v[l], uv, (0, 0, 0, pos))
                            if barrier:
                                k[l], v[l] = jax.lax.optimization_barrier(
                                    (k[l], v[l]))
                        elif scatter:
                            k = k.at[l, :, :, :, pos].set(u[..., 0])
                            v = v.at[l, :, :, :, pos].set(uv[..., 0])
                        else:
                            k = jax.lax.dynamic_update_slice(
                                k, u[None], (l, 0, 0, 0, pos))
                            v = jax.lax.dynamic_update_slice(
                                v, uv[None], (l, 0, 0, 0, pos))
                            if barrier:
                                k, v = jax.lax.optimization_barrier((k, v))
                    if read:
                        kl = k[l]
                        vl = v[l]
                        lg = jnp.einsum(
                            "bthd,bhds->bhts", q, kl,
                            preferred_element_type=jnp.float32) * (D ** -0.5)
                        lg = jnp.where(mask, lg, -1e30)
                        w = jax.nn.softmax(lg, axis=-1)
                        o = jnp.einsum("bhts,bhds->bthd",
                                       w.astype(jnp.bfloat16), vl,
                                       preferred_element_type=jnp.float32)
                        q = (q + 0.01 * o.astype(q.dtype))  # serial dep
                return (k, v, q), None

            (k, v, q), _ = jax.lax.scan(step, (ks, vs, q0),
                                        jnp.arange(iters))
            k0 = k[0]
            v0 = v[0]
            return q[:1, 0, 0, :8] + k0[0, 0, 0, :8] + v0[0, 0, 0, :8]
        return run

    which = os.environ.get("ATTN_VARIANTS", "base")
    if which == "base":
        timed("selfchain_write_read", make(True, True), upd, q0)
        timed("selfchain_read_only", make(False, True), upd, q0)
        timed("selfchain_write_only", make(True, False), upd, q0)
    elif which == "mitig":
        timed("wr_barrier", make(True, True, barrier=True), upd, q0)
        timed("wr_perlayer", make(True, True, perlayer=True), upd, q0)
    else:
        # wide-8 write: broadcast the new column to 8 lanes so the dynamic
        # update is not a single-lane slice; columns pos+1..pos+7 hold
        # garbage that the <=pos mask excludes and later steps overwrite.
        # Goal: stop XLA keeping a second (D-minor) layout of the cache for
        # the write and converting per step (the 3.6 ms interaction - see
        # the OOM dump's remat_compressed/uncompressed copy pair).
        @jax.jit
        def wide8(upd, q):
            CP = C + 8
            k = jnp.zeros((L, B, H, D, CP), jnp.bfloat16)
            v = jnp.zeros((L, B, H, D, CP), jnp.bfloat16)

            def step(carry, i):
                k, v, q = carry
                pos = i % C
                mask = (jnp.arange(CP)[None, None, None, :] <= pos)
                for l in range(L):
                    u = jnp.broadcast_to(
                        (upd[0] * q[:, 0].mean())[..., None],
                        (B, H, D, 8))
                    uv = jnp.broadcast_to(upd[1][..., None], (B, H, D, 8))
                    k = jax.lax.dynamic_update_slice(
                        k, u[None], (l, 0, 0, 0, pos))
                    v = jax.lax.dynamic_update_slice(
                        v, uv[None], (l, 0, 0, 0, pos))
                    lg = jnp.einsum(
                        "bthd,bhds->bhts", q, k[l],
                        preferred_element_type=jnp.float32) * (D ** -0.5)
                    lg = jnp.where(mask, lg, -1e30)
                    w = jax.nn.softmax(lg, axis=-1)
                    o = jnp.einsum("bhts,bhds->bthd",
                                   w.astype(jnp.bfloat16), v[l],
                                   preferred_element_type=jnp.float32)
                    q = (q + 0.01 * o.astype(q.dtype))
                return (k, v, q), None

            (k, v, q), _ = jax.lax.scan(step, (k, v, q0),
                                        jnp.arange(iters))
            return q[:1, 0, 0, :8] + k[0, 0, 0, 0, :8] + v[0, 0, 0, 0, :8]

        if which == "wide8":
            timed("wr_wide8", wide8, upd, q0)

        # sublane-major store (L,B,H,C,D): the write is a sublane-row
        # update (cheap standalone: 0.545) and the read einsum contracts
        # over the minor D dim (64 -> 128 lane padding: 2x read bytes).
        @jax.jit
        def subln_rw(upd, q):
            k = jnp.zeros((L, B, H, C, D), jnp.bfloat16)
            v = jnp.zeros((L, B, H, C, D), jnp.bfloat16)

            def step(carry, i):
                k, v, q = carry
                pos = i % C
                mask = (jnp.arange(C)[None, None, None, :] <= pos)
                for l in range(L):
                    u = (upd[0] * q[:, 0].mean())[:, :, None]
                    uv = upd[1][:, :, None]
                    k = jax.lax.dynamic_update_slice(
                        k, u[None], (l, 0, 0, pos, 0))
                    v = jax.lax.dynamic_update_slice(
                        v, uv[None], (l, 0, 0, pos, 0))
                    lg = jnp.einsum(
                        "bthd,bhsd->bhts", q, k[l],
                        preferred_element_type=jnp.float32) * (D ** -0.5)
                    lg = jnp.where(mask, lg, -1e30)
                    w = jnp.einsum("bhts->bhts", jax.nn.softmax(lg, axis=-1))
                    o = jnp.einsum("bhts,bhsd->bthd",
                                   w.astype(jnp.bfloat16), v[l],
                                   preferred_element_type=jnp.float32)
                    q = (q + 0.01 * o.astype(q.dtype))
                return (k, v, q), None

            (k, v, q), _ = jax.lax.scan(step, (k, v, q0),
                                        jnp.arange(iters))
            return q[:1, 0, 0, :8] + k[0, 0, 0, :8, 0] + v[0, 0, 0, :8, 0]

        if which == "subln":
            timed("wr_subln_rw", subln_rw, upd, q0)

        # two-level cache: a FROZEN prefix (loop-invariant — never written
        # inside the loop, so it never pays the dual-layout conversion) plus
        # a 128-column staging buffer that takes the writes. Attention =
        # concat(frozen logits, staging logits) -> softmax -> two AV einsums.
        # Models the production candidate: phase loops re-entered with a
        # larger frozen prefix every 128 steps; interaction cost pinned at
        # the C=128 figure (~1.6 ms) regardless of context length.
        SG = 128
        CF = C - SG  # frozen columns (phase where C-128 tokens are frozen)

        @jax.jit
        def twolevel(upd, q, kf, vf):
            ks = jnp.zeros((L, B, H, D, SG), jnp.bfloat16)
            vs = jnp.zeros((L, B, H, D, SG), jnp.bfloat16)

            def step(carry, i):
                ks, vs, q = carry
                pos = i % SG
                maskf = jnp.ones((1, 1, 1, CF), jnp.bool_)
                masks = (jnp.arange(SG)[None, None, None, :] <= pos)
                for l in range(L):
                    u = (upd[0] * q[:, 0].mean())[..., None]
                    uv = upd[1][..., None]
                    ks = jax.lax.dynamic_update_slice(
                        ks, u[None], (l, 0, 0, 0, pos))
                    vs = jax.lax.dynamic_update_slice(
                        vs, uv[None], (l, 0, 0, 0, pos))
                    lgf = jnp.einsum(
                        "bthd,bhds->bhts", q, kf[l],
                        preferred_element_type=jnp.float32) * (D ** -0.5)
                    lgs = jnp.einsum(
                        "bthd,bhds->bhts", q, ks[l],
                        preferred_element_type=jnp.float32) * (D ** -0.5)
                    lg = jnp.concatenate(
                        [jnp.where(maskf, lgf, -1e30),
                         jnp.where(masks, lgs, -1e30)], axis=-1)
                    w = jax.nn.softmax(lg, axis=-1)
                    of = jnp.einsum(
                        "bhts,bhds->bthd",
                        w[..., :CF].astype(jnp.bfloat16), vf[l],
                        preferred_element_type=jnp.float32)
                    os_ = jnp.einsum(
                        "bhts,bhds->bthd",
                        w[..., CF:].astype(jnp.bfloat16), vs[l],
                        preferred_element_type=jnp.float32)
                    q = (q + 0.01 * (of + os_).astype(q.dtype))
                return (ks, vs, q), None

            (ks, vs, q), _ = jax.lax.scan(step, (ks, vs, q0),
                                          jnp.arange(iters))
            return q[:1, 0, 0, :8] + ks[0, 0, 0, 0, :8] + vs[0, 0, 0, 0, :8]

        if which == "twolevel":
            rngf = np.random.default_rng(1)
            kf = jnp.asarray(rngf.standard_normal((L, B, H, D, CF)),
                             jnp.bfloat16)
            vf = jnp.asarray(rngf.standard_normal((L, B, H, D, CF)),
                             jnp.bfloat16)
            timed("wr_twolevel", twolevel, upd, q0, kf, vf)

        # two-level with an INT8 frozen prefix: the frozen blocks are
        # written once per phase and read every step — the same
        # write-once/read-many shape that made int8 cross-KV win. Inline
        # dequant per read (the XLA pattern production cross-KV uses);
        # per-column scales. If the frozen read is HBM-bound like bf16
        # cross-KV was (not MXU-ingest-bound), halving its bytes should
        # show up at these shapes.
        @jax.jit
        def twolevel_int8f(upd, q, kf8, kfs, vf8, vfs):
            ks = jnp.zeros((L, B, H, D, SG), jnp.bfloat16)
            vs = jnp.zeros((L, B, H, D, SG), jnp.bfloat16)

            def step(carry, i):
                ks, vs, q = carry
                pos = i % SG
                maskf = jnp.ones((1, 1, 1, CF), jnp.bool_)
                masks = (jnp.arange(SG)[None, None, None, :] <= pos)
                for l in range(L):
                    u = (upd[0] * q[:, 0].mean())[..., None]
                    uv = upd[1][..., None]
                    ks = jax.lax.dynamic_update_slice(
                        ks, u[None], (l, 0, 0, 0, pos))
                    vs = jax.lax.dynamic_update_slice(
                        vs, uv[None], (l, 0, 0, 0, pos))
                    kfl = (kf8[l].astype(jnp.float32)
                           * kfs[l]).astype(jnp.bfloat16)
                    vfl = (vf8[l].astype(jnp.float32)
                           * vfs[l]).astype(jnp.bfloat16)
                    lgf = jnp.einsum(
                        "bthd,bhds->bhts", q, kfl,
                        preferred_element_type=jnp.float32) * (D ** -0.5)
                    lgs = jnp.einsum(
                        "bthd,bhds->bhts", q, ks[l],
                        preferred_element_type=jnp.float32) * (D ** -0.5)
                    lg = jnp.concatenate(
                        [jnp.where(maskf, lgf, -1e30),
                         jnp.where(masks, lgs, -1e30)], axis=-1)
                    w = jax.nn.softmax(lg, axis=-1)
                    of = jnp.einsum(
                        "bhts,bhds->bthd",
                        w[..., :CF].astype(jnp.bfloat16), vfl,
                        preferred_element_type=jnp.float32)
                    os_ = jnp.einsum(
                        "bhts,bhds->bthd",
                        w[..., CF:].astype(jnp.bfloat16), vs[l],
                        preferred_element_type=jnp.float32)
                    q = (q + 0.01 * (of + os_).astype(q.dtype))
                return (ks, vs, q), None

            (ks, vs, q), _ = jax.lax.scan(step, (ks, vs, q0),
                                          jnp.arange(iters))
            return q[:1, 0, 0, :8] + ks[0, 0, 0, 0, :8] + vs[0, 0, 0, 0, :8]

        if which == "int8f":
            rngf = np.random.default_rng(1)
            kf8 = jnp.asarray(
                rngf.integers(-127, 128, (L, B, H, D, CF)), jnp.int8)
            vf8 = jnp.asarray(
                rngf.integers(-127, 128, (L, B, H, D, CF)), jnp.int8)
            kfs = jnp.asarray(0.01 * rngf.random((L, B, H, 1, CF)),
                              jnp.float32)
            vfs = jnp.asarray(0.01 * rngf.random((L, B, H, 1, CF)),
                              jnp.float32)
            timed("wr_twolevel_int8f", twolevel_int8f,
                  upd, q0, kf8, kfs, vf8, vfs)
    return 0


if __name__ == "__main__" and os.environ.get("ATTN_VARIANTS"):
    attn_variants()
