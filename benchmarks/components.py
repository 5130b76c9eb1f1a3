#!/usr/bin/env python
"""Component micro-benchmarks: mel frontend, encoder, decode throughput.

Prints one JSON line per component (unlike the repo-root bench.py, which
reports the single headline RTFx number). Device dispatch through the axon
tunnel costs ~30 ms per call, so every measurement amortises N iterations
inside one compiled computation via lax.scan where possible.

Usage: python benchmarks/components.py [--model large-v3] [--batch 8]
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


def timed(fn, *args, warmup=1, iters=3):
    # fence with a device->host readback: block_until_ready can return
    # early through the axon relay (CLAUDE.md), yielding bogus ~0s timings
    def fence(x):
        leaves = [l for l in __import__("jax").tree.leaves(x)
                  if hasattr(l, "shape")]
        for l in leaves[:1]:
            np.asarray(l.reshape(-1)[:1])

    for _ in range(warmup):
        fence(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fence(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="large-v3")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--decode-steps", type=int, default=64)
    ap.add_argument("--kv-dtype", default="bf16", choices=("bf16", "int8"),
                    help="cross-KV dtype for the decode row; int8 is the "
                         "production B48 geometry (bf16 cross-KV OOMs there)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import openai_whisper_coreml_tpu as wt
    from openai_whisper_coreml_tpu.audio import log_mel_spectrogram
    from openai_whisper_coreml_tpu.models import decoder as dec_mod
    from openai_whisper_coreml_tpu.ops.mel_kernel import log_mel_pallas

    b = args.batch
    model = wt.load_model(args.model)
    cfg = model.cfg
    rng = np.random.default_rng(0)
    audio = jnp.asarray((rng.standard_normal((b, 480_000)) * 0.1)
                        .astype(np.float32))

    def emit(metric, seconds, unit, value):
        print(json.dumps({
            "metric": metric, "value": round(value, 2), "unit": unit,
            "seconds": round(seconds, 4), "model": args.model, "batch": b,
        }))

    # mel frontend (XLA vs Pallas)
    t = timed(jax.jit(lambda a: log_mel_spectrogram(a, n_mels=cfg.n_mels)),
              audio)
    emit("mel_xla", t, "audio_sec/sec", b * 30.0 / t)
    t = timed(jax.jit(lambda a: log_mel_pallas(a, cfg.n_mels)), audio)
    emit("mel_pallas", t, "audio_sec/sec", b * 30.0 / t)

    # encoder
    mel = log_mel_spectrogram(audio, n_mels=cfg.n_mels)
    enc = lambda m: model._encode_jit(model.params, mel=m)  # noqa: E731
    t = timed(enc, mel)
    emit("encoder", t, "audio_sec/sec", b * 30.0 / t)

    # flash vs naive encoder. NB: params must be jit ARGUMENTS — closing over
    # them embeds 3.2GB of constants and the compile never finishes.
    try:
        from openai_whisper_coreml_tpu.models import encoder as enc_mod

        flash_enc = jax.jit(functools.partial(enc_mod.encode, cfg=cfg,
                                              flash=True))
        t = timed(lambda m: flash_enc(model.params, mel=m), mel)
        emit("encoder_flash", t, "audio_sec/sec", b * 30.0 / t)
    except Exception as e:  # pallas may be unavailable on this backend
        print(json.dumps({"metric": "encoder_flash", "error": str(e)[:100]}))

    # decode loop throughput (greedy steps through the KV cache)
    feats = enc(mel)
    n_steps = args.decode_steps

    def decode_n(params, feats):
        if args.kv_dtype == "int8":
            cross_kv = dec_mod.precompute_cross_kv_int8(params, cfg, feats)
        else:
            cross_kv = dec_mod.precompute_cross_kv(params, cfg, feats)
        # right-sized cache, as production decodes do
        cache = dec_mod.init_kv_cache(cfg, b, dtype=feats.dtype,
                                      ctx=max(n_steps + 8, 64))
        tok0 = jnp.full((b, 1), cfg.sot_token, jnp.int32)
        # params must stay a traced ARGUMENT inside this jit: referencing
        # model.params here would embed multi-GB constants (see module note)
        logits, cache = dec_mod.decode_step(params, cfg, tok0,
                                            cross_kv, cache, 0)

        def body(carry, i):
            logits, cache = carry
            tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            logits, cache = dec_mod.decode_step(
                params, cfg, tok[:, None], cross_kv, cache, i)
            return (logits, cache), tok

        (_logits, _cache), toks = jax.lax.scan(
            body, (logits, cache), jnp.arange(1, n_steps + 1))
        return toks

    t = timed(jax.jit(decode_n), model.params, feats)
    emit("decode_greedy", t, "tokens/sec", b * n_steps / t)
    return 0


if __name__ == "__main__":
    sys.exit(main())
