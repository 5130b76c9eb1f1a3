#!/usr/bin/env python
"""Native int8xint8 MXU probe at ENCODER shapes (round-4 verdict #5).

Decode-side int8 could not beat inline dequant because M=1 matvecs are
MXU-ingest-bound (docs/benchmarks.md round 3). The encoder is the opposite
regime — M=1500 matmuls — where the v5e's 2x int8 MXU peak could actually
pay. Probe the encoder's dominant op (x @ W, x (B*1500, d), W (d, d)) four
ways over a chained stack (serial dependency, one jit, fenced):

  a. bf16 x bf16 (production encoder compute);
  b. int8 WEIGHTS, inline dequant to bf16 before the dot (the current
     quantize=int8 serving path — weights halve HBM, MXU still bf16);
  c. native int8 x int8 -> int32, activations row-quantized per step
     (dynamic activation quantization, scales applied after the dot);
  d. same as (c) but activation quantization COSTED SEPARATELY via a
     no-requant variant (upper bound: weights-stationary activations).

One JSON line with ms/layer for each. A clear (c) win at equal accuracy
budget would justify an int8-activation encoder tier; a loss closes the
question at the sqa-verdict standard.

Env: ENC_MODEL (large-v3), ENC_BATCH (8 -> M = 12000 rows), ENC_LAYERS
(32), ENC_REPEATS (3).
"""

from __future__ import annotations

import functools
import json
import os
import time

import numpy as np

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openai_whisper_coreml_tpu.utils.platform import sync_platform_from_env

sync_platform_from_env()


def main() -> None:
    import jax
    import jax.numpy as jnp

    from openai_whisper_coreml_tpu.config import get_config

    model_name = os.environ.get("ENC_MODEL", "large-v3")
    batch = int(os.environ.get("ENC_BATCH", "8"))
    layers = int(os.environ.get("ENC_LAYERS", "32"))
    repeats = int(os.environ.get("ENC_REPEATS", "3"))

    cfg = get_config(model_name)
    d = cfg.n_audio_state
    m = batch * cfg.n_audio_ctx  # 8 * 1500 = 12000 rows

    rng = np.random.default_rng(0)
    x0 = jnp.asarray((rng.standard_normal((m, d)) * 0.1), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((layers, d, d)) * (d ** -0.5),
                    jnp.bfloat16)
    # per-output-channel weight quantization (the quantize.py scheme)
    w_absmax = jnp.max(jnp.abs(w), axis=1, keepdims=True)
    w_scale = (w_absmax / 127.0).astype(jnp.float32)
    w_q = jnp.clip(jnp.round(w / w_absmax * 127.0), -127, 127).astype(jnp.int8)

    def quant_rows(x):
        ax = jnp.max(jnp.abs(x), axis=1, keepdims=True).astype(jnp.float32)
        s = jnp.maximum(ax / 127.0, 1e-8)
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127,
                     127).astype(jnp.int8)
        return q, s

    @functools.partial(jax.jit, static_argnames=("mode",))
    def chain(x, w, w_q, w_scale, *, mode):
        def body(x, xs):
            wl, wql, wsl = xs
            if mode == "bf16":
                y = jnp.dot(x, wl, preferred_element_type=jnp.float32)
            elif mode == "w8_dequant":
                wd = (wql.astype(jnp.float32) * wsl).astype(x.dtype)
                y = jnp.dot(x, wd, preferred_element_type=jnp.float32)
            elif mode == "native_int8":
                q, s = quant_rows(x)
                acc = jax.lax.dot_general(
                    q, wql, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                y = acc.astype(jnp.float32) * s * wsl
            elif mode == "native_int8_norequant":
                # activations already int8 (upper bound: amortised quant)
                q = x  # int8 input threaded through
                acc = jax.lax.dot_general(
                    q, wql, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                y = acc.astype(jnp.float32) * wsl
                # renormalise so the chain stays bounded, output int8 again
                qq, _ = quant_rows(y.astype(jnp.bfloat16))
                return qq, y[0, 0]
            else:
                raise ValueError(mode)
            y = y / jnp.maximum(jnp.max(jnp.abs(y)), 1.0)  # keep bounded
            return y.astype(jnp.bfloat16), y[0, 0]

        x_in = x
        if mode == "native_int8_norequant":
            x_in, _ = quant_rows(x)
        out, ys = jax.lax.scan(body, x_in, (w, w_q, w_scale))
        return ys

    def fence(y):
        return np.asarray(y)[:1]

    results = {}
    for mode in ("bf16", "w8_dequant", "native_int8", "native_int8_norequant"):
        try:
            fn = lambda: chain(x0, w, w_q, w_scale, mode=mode)
            fence(fn())
            times = []
            for _ in range(repeats):
                t0 = time.perf_counter()
                fence(fn())
                times.append(time.perf_counter() - t0)
            results[mode] = round(min(times) / layers * 1e3, 4)
        except Exception as e:  # Mosaic/XLA int8 lowering can reject shapes
            results[mode] = f"error: {type(e).__name__}: {e}"[:160]

    print(json.dumps({
        "metric": f"int8_encoder_probe_{model_name.replace('-', '_')}"
                  f"_m{m}_d{d}",
        "unit": "ms_per_layer",
        "value": results.get("native_int8"),
        "detail": results,
        "layers": layers,
    }))


if __name__ == "__main__":
    main()
