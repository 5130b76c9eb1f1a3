#!/usr/bin/env python
"""Bisect the step_ablation.py 'full' anomaly (549 ms/step vs production 18).

Variants of the SAME full chain:
  a) cache passed in, undonated (the anomalous original)
  b) cache created INSIDE the jit (production greedy_decode_core shape)
  c) cache passed in + donated
  d) like (b) at batch 24
"""

from __future__ import annotations

import argparse
import functools
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
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--ctx", type=int, default=256)
    args = ap.parse_args()

    import gc

    import jax
    import jax.numpy as jnp

    import openai_whisper_coreml_tpu as wt
    from openai_whisper_coreml_tpu.models import decoder as dec

    model = wt.load_model(args.model, quantize="int8")
    cfg = model.cfg
    rng = np.random.default_rng(0)

    def cross_for(b):
        feats = jnp.asarray(rng.standard_normal(
            (b, cfg.n_audio_ctx, cfg.n_audio_state)) * 0.1, jnp.bfloat16)
        out = jax.jit(dec.precompute_cross_kv_int8,
                      static_argnames=("cfg",))(model.params, cfg, feats)
        del feats
        gc.collect()
        return out

    def chain_cache_arg(donate):
        kw = dict(donate_argnums=(2,)) if donate else {}

        @functools.partial(jax.jit, **kw)
        def run(params, cross, cache, tok):
            def body(carry, i):
                cache, tok = carry
                logits, cache = dec.decode_step(
                    params, cfg, tok, cross, cache, i + 4, valid_from=1)
                tok = jnp.argmax(logits[:, 0], axis=-1
                                 ).astype(jnp.int32)[:, None]
                return (cache, tok), None

            (cache, tok), _ = jax.lax.scan(
                body, (cache, tok), jnp.arange(args.iters))
            return tok
        return run

    def chain_cache_inside(b):
        @jax.jit
        def run(params, cross, tok):
            cache = dec.init_kv_cache(cfg, b, dtype=jnp.bfloat16,
                                      ctx=args.ctx)

            def body(carry, i):
                cache, tok = carry
                logits, cache = dec.decode_step(
                    params, cfg, tok, cross, cache, i + 4, valid_from=1)
                tok = jnp.argmax(logits[:, 0], axis=-1
                                 ).astype(jnp.int32)[:, None]
                return (cache, tok), None

            (cache, tok), _ = jax.lax.scan(
                body, (cache, tok), jnp.arange(args.iters))
            return tok
        return run

    def timed(name, fn, *xs, fresh_cache=None):
        def call():
            a = list(xs)
            if fresh_cache is not None:
                a.insert(2, fresh_cache())
            return fn(*a)

        np.asarray(call())[:1]
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(call())[:1]
            ts.append(time.perf_counter() - t0)
        ms = 1e3 * min(ts) / args.iters
        print(json.dumps({"variant": name, "per_step_ms": round(ms, 3)}),
              flush=True)

    b = 40
    cross40 = cross_for(b)
    tok0 = jnp.asarray(rng.integers(0, cfg.n_vocab, (b, 1)), jnp.int32)
    cache_mk = lambda: dec.init_kv_cache(cfg, b, dtype=jnp.bfloat16,
                                         ctx=args.ctx)

    timed("b40_cache_inside", chain_cache_inside(b),
          model.params, cross40, tok0)
    timed("b40_cache_arg", chain_cache_arg(False),
          model.params, cross40, tok0, fresh_cache=cache_mk)
    timed("b40_cache_arg_donated", chain_cache_arg(True),
          model.params, cross40, tok0, fresh_cache=cache_mk)

    del cross40
    gc.collect()
    b = 24
    cross24 = cross_for(b)
    tok24 = jnp.asarray(rng.integers(0, cfg.n_vocab, (b, 1)), jnp.int32)
    timed("b24_cache_inside", chain_cache_inside(b),
          model.params, cross24, tok24)
    return 0


if __name__ == "__main__":
    sys.exit(main())
