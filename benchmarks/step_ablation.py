#!/usr/bin/env python
"""Attribute the champion decode step's time to its sublayers, on-chip.

The B40 champion step measures 17.9 ms; the component floors (MXU-ingest at
~512 elem/cycle for the matvec-shaped reads + HBM for bf16 streams) sum to
~12.7 ms, and the cross-attention chain alone is already AT its floor
(benchmarks/sqa_v3_probe.py: XLA inline 5.71 ms at B24 vs three slower
Pallas formulations). This probe finds where the remaining ~5 ms lives by
ablating one sublayer kind at a time from the PRODUCTION decode_step
(models/decoder.py `_ablate`) and timing the 224-token-equivalent chain:

  full            the real step (loop body of greedy_decode_core)
  -cross          cross-attention sublayers skipped
  -self           self-attention sublayers skipped (incl. cache writes)
  -mlp            MLP sublayers skipped
  logits_only     the final_logits vocab projection chain
  embed_sample    embed + sampling-side ops (step minus all sublayers)

Deltas (full - ablated) attribute time per kind; the non-additivity
residual measures XLA's cross-sublayer overlap.
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
    ap.add_argument("--model", default="large-v3")
    ap.add_argument("--batch", type=int, default=40)
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--ctx", type=int, default=256)
    ap.add_argument("--quantize", default="int8")
    ap.add_argument("--kv-dtype", default="int8")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import openai_whisper_coreml_tpu as wt
    from openai_whisper_coreml_tpu.models import decoder as dec

    model = wt.load_model(args.model, quantize=args.quantize or None)
    cfg = model.cfg
    b = args.batch
    rng = np.random.default_rng(0)

    feats = jnp.asarray(rng.standard_normal(
        (b, cfg.n_audio_ctx, cfg.n_audio_state)) * 0.1, jnp.bfloat16)
    if args.kv_dtype == "int8":
        cross = jax.jit(dec.precompute_cross_kv_int8,
                        static_argnames=("cfg",))(model.params, cfg, feats)
    else:
        cross = jax.jit(dec.precompute_cross_kv,
                        static_argnames=("cfg",))(model.params, cfg, feats)
    del feats
    import gc
    gc.collect()

    tok0 = jnp.asarray(rng.integers(0, cfg.n_vocab, (b, 1)), jnp.int32)

    def make_chain(ablate, self_kernel=False,
                   write_barrier=bool(os.environ.get("WRITE_BARRIER"))):
        # cache created INSIDE the jit — an argument cache defeats in-place
        # scan updates (551 vs 18 ms/step measured; see step_ablation2.py
        # and the CLAUDE.md rule it produced)
        @jax.jit
        def run(params, cross, tok):
            cache = dec.init_kv_cache(cfg, b, dtype=jnp.bfloat16,
                                      ctx=args.ctx)

            def body(carry, i):
                cache, tok = carry
                logits, cache = dec.decode_step(
                    params, cfg, tok, cross, cache, i + 4, valid_from=1,
                    self_kernel=self_kernel, write_barrier=write_barrier,
                    _ablate=ablate)
                tok = jnp.argmax(logits[:, 0], axis=-1
                                 ).astype(jnp.int32)[:, None]
                return (cache, tok), None

            (cache, tok), _ = jax.lax.scan(
                body, (cache, tok), jnp.arange(args.iters))
            return tok

        return run

    @jax.jit
    def logits_chain(params, x0):
        def body(x, _):
            lg = dec.final_logits(params, x)
            tok = jnp.argmax(lg[:, 0], axis=-1)
            return x + 1e-6 * tok[:, None, None].astype(x.dtype), None

        x, _ = jax.lax.scan(body, x0, None, length=args.iters)
        return x

    def timed(name, fn, *xs):
        np.asarray(fn(*xs))[:1]
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(*xs))[:1]
            ts.append(time.perf_counter() - t0)
        ms = 1e3 * min(ts) / args.iters
        print(json.dumps({"variant": name,
                          "per_step_ms": round(ms, 3)}), flush=True)
        return ms

    import argparse as _a  # noqa: F401  (keep imports stable)
    variants = os.environ.get(
        "ABLATE_VARIANTS", "full,cross,self,mlp").split(",")
    results = {}
    for v in variants:
        ablate = None if v == "full" else v
        name = "full" if ablate is None else f"-{ablate}"
        results[name] = timed(name, make_chain(ablate),
                              model.params, cross, tok0)

    if os.environ.get("ABLATE_SELFKERNEL"):
        results["full_selfkernel"] = timed(
            "full_selfkernel", make_chain(None, self_kernel=True),
            model.params, cross, tok0)

    x0 = jnp.asarray(rng.standard_normal((b, 1, cfg.n_text_state)) * 0.1,
                     jnp.bfloat16)
    results["logits_only"] = timed("logits_only", logits_chain,
                                   model.params, x0)

    full = results.get("full", 0.0)
    attributed = {k: round(full - v, 3) for k, v in results.items()
                  if k.startswith("-")}
    print(json.dumps({"full_ms": round(full, 3),
                      "attributed_deltas_ms": attributed,
                      "logits_only_ms": round(results["logits_only"], 3),
                      "sum_deltas": round(sum(attributed.values()), 3)}),
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
