#!/usr/bin/env python
"""Flash-attention kernel tuning probe at ENCODER geometry (round-4 encoder
lever: encoder is ~25% of the B48 champion wall, docs/benchmarks.md).

At Whisper's encoder shape (T=1500 -> ONE padded 1536-column KV block) the
shipped online-softmax kernel runs its full flash recurrence — fp32 m/l/acc
scratch init + alpha-rescale exp + accumulator read-modify-write — for a
single KV block where plain softmax is mathematically identical. This probe
A/Bs the shipped kernel against the scratch-free single-pass specialisation
(ops/flash_attention._fa_kernel_single) across block_q, plus the XLA
attention oracle (models.layers.attention_core), on a 32-deep chain with a
serial dependency (attention output feeds the next layer's queries), fenced
with a device->host readback per the axon relay rules.

Variants:
  online_bq512        shipped kernel, the round-1 tuned default
  single_bq{256,512,768,1536}  single-pass softmax kernel
  xla                 attention_core (einsum + jax.nn.softmax)

One JSON line: ms/layer per variant + max|diff| vs the online kernel on the
first layer (bf16 parity evidence).

Env: FLASH_MODEL (large-v3), FLASH_BATCH (8), FLASH_LAYERS (32),
FLASH_REPEATS (3).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openai_whisper_coreml_tpu.utils.platform import sync_platform_from_env

sync_platform_from_env()


def main() -> None:
    import jax
    import jax.numpy as jnp

    from openai_whisper_coreml_tpu.config import get_config
    from openai_whisper_coreml_tpu.models.layers import attention_core
    from openai_whisper_coreml_tpu.ops.flash_attention import flash_attention

    model_name = os.environ.get("FLASH_MODEL", "large-v3")
    batch = int(os.environ.get("FLASH_BATCH", "8"))
    layers = int(os.environ.get("FLASH_LAYERS", "32"))
    repeats = int(os.environ.get("FLASH_REPEATS", "3"))

    cfg = get_config(model_name)
    h = cfg.n_audio_head
    d = cfg.n_audio_state // h
    t = cfg.n_audio_ctx  # 1500

    rng = np.random.default_rng(0)
    shape = (batch, t, h, d)
    q0 = jnp.asarray(rng.standard_normal(shape) * 0.3, jnp.bfloat16)
    k0 = jnp.asarray(rng.standard_normal(shape) * 0.3, jnp.bfloat16)
    v0 = jnp.asarray(rng.standard_normal(shape) * 0.3, jnp.bfloat16)

    def make_chain(attn):
        @jax.jit
        def chain(q, k, v):
            def body(q, _):
                o = attn(q, k, v)
                return o, ()

            out, _ = jax.lax.scan(body, q, None, length=layers)
            return out

        return chain

    variants = {
        "online_bq512": make_chain(functools.partial(
            flash_attention, online=True, block_q=512)),
        "single_bq256": make_chain(functools.partial(
            flash_attention, online=False, block_q=256)),
        "single_bq512": make_chain(functools.partial(
            flash_attention, online=False, block_q=512)),
        "single_bq768": make_chain(functools.partial(
            flash_attention, online=False, block_q=768)),
        "single_bq1536": make_chain(functools.partial(
            flash_attention, online=False, block_q=1536)),
        "single_bq1536_split2": make_chain(functools.partial(
            flash_attention, online=False, block_q=1536, split=2)),
        "single_bq1536_split3": make_chain(functools.partial(
            flash_attention, online=False, block_q=1536, split=3)),
        "single_bq1536_split4": make_chain(functools.partial(
            flash_attention, online=False, block_q=1536, split=4)),
        "single_bq1536_split6": make_chain(functools.partial(
            flash_attention, online=False, block_q=1536, split=6)),
        "xla": make_chain(lambda q, k, v: attention_core(q, k, v)),
    }

    def fence(y):
        return np.asarray(y[0, 0, 0])

    # first-layer parity vs the shipped online kernel (bf16 evidence)
    ref1 = np.asarray(flash_attention(q0, k0, v0, online=True, block_q=512),
                      np.float32)
    parity = {}
    for name, force in (("single_bq512", (False, 512)),
                        ("single_bq1536_split2", (False, 1536, 2)),
                        ("xla", None)):
        if force is None:
            alt = attention_core(q0, k0, v0)
        else:
            alt = flash_attention(q0, k0, v0, online=force[0],
                                  block_q=force[1],
                                  split=force[2] if len(force) > 2 else 1)
        parity[name] = float(np.max(np.abs(np.asarray(alt, np.float32)
                                           - ref1)))

    results = {}
    for name, fn in variants.items():
        try:
            fence(fn(q0, k0, v0))  # compile + warm
            times = []
            for _ in range(repeats):
                t0 = time.perf_counter()
                fence(fn(q0, k0, v0))
                times.append(time.perf_counter() - t0)
            results[name] = round(min(times) / layers * 1e3, 4)
        except Exception as e:  # VMEM overflow at large block_q is expected
            results[name] = f"error: {type(e).__name__}: {e}"[:160]

    print(json.dumps({
        "metric": f"flash_tune_{model_name.replace('-', '_')}"
                  f"_b{batch}_t{t}_h{h}_d{d}",
        "unit": "ms_per_layer",
        "value": results.get("single_bq512"),
        "detail": results,
        "parity_max_abs_vs_online": parity,
        "layers": layers,
    }))


if __name__ == "__main__":
    main()
