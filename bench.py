"""Benchmark: batched whisper transcription throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload (BASELINE.json config 5, single-chip slice): whisper-large-v3,
batch of 30 s windows, mel frontend + encoder + greedy decode of SAMPLE_LEN
tokens through the preallocated-KV-cache loop. Random weights decode the full
SAMPLE_LEN (no early EOT), so this is a conservative (worst-case) RTFx: real
checkpoints emit ~50-150 tokens per window and stop early.

vs_baseline is value / 150 — the >=150x real-time per chip target from
BASELINE.md (the reference publishes no numbers; BASELINE.json "published": {}).

Default config (round-3 champion, docs/benchmarks.md "two-level decode"):
int8 weights + int8 cross-KV + two-level frozen-prefix decode at B48 with
64-column staging — 288.4 RTFx measured (round-2 flat B40 was 250.2; B48
w128 was 276.7). The quantised paths match
the fp32 oracle as closely as plain bf16 does on the agreement ladders
(benchmarks/int8_agreement.py, int8_agreement_trained.py; WER gate on real
checkpoints pending — tools/validate_real.py). Conservative bf16 repro:
  BENCH_QUANTIZE= BENCH_KV_DTYPE=bf16 BENCH_BATCH=24 python bench.py  # 179.0

Env overrides: BENCH_MODEL (default large-v3), BENCH_BATCH (default 48 —
the measured sweet spot under two-level int8 cross-KV: 40=271, 44=268,
48=276.7, 56 spills to 34, 64 fails; bf16 caps at 24), BENCH_SAMPLE_LEN
(default 224), BENCH_REPEATS (default 3), BENCH_QUANTIZE (default int8;
empty string disables), BENCH_KV_DTYPE / BENCH_CACHE_DTYPE (default
int8 / bf16 — cache int8 is a measured regression, see docs),
BENCH_TWO_LEVEL (default on; "0" reverts to the flat decode loop),
BENCH_STAGE_WIDTH (two-level staging-block columns, default 64 — the
measured sweet spot at B48: w64=288.4, w128=276.7, w192 fails).

BENCH_SPEC=1 decodes SPECULATIVELY instead (draft = BENCH_DRAFT, default
large-v3-turbo; proposals per verify = BENCH_SPEC_K, default 4) — the
reproducible spec row the round-4 verdict asked for. With this image's
random weights it measures the acceptance FLOOR (~1 token/iteration, a
deliberate worst case — docs/benchmarks.md round 4); with real
checkpoints the same command measures the production speculative RTFx.
Pair it with BENCH_BATCH per the round-5 batch sweep (B24 is the
spec-optimal serving batch; B48 needs the two cross-KV pools to fit).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main() -> None:
    # honour an explicit JAX_PLATFORMS env var (the axon sitecustomize
    # force-sets the platform in jax.config, which beats the env var):
    # JAX_PLATFORMS=cpu allows host-only smoke runs; no-op under the
    # driver, whose env pins the axon chip path
    from openai_whisper_coreml_tpu.utils.platform import sync_platform_from_env
    sync_platform_from_env()

    import jax
    import jax.numpy as jnp

    import openai_whisper_coreml_tpu as wt
    from openai_whisper_coreml_tpu.audio import log_mel_spectrogram
    from openai_whisper_coreml_tpu.decoding import (
        DecodingOptions,
        build_blank_mask,
        build_suppress_mask,
        greedy_decode_core,
    )
    from openai_whisper_coreml_tpu.tokenizer import get_tokenizer

    model_name = os.environ.get("BENCH_MODEL", "large-v3")
    batch = int(os.environ.get("BENCH_BATCH", "48"))
    sample_len = int(os.environ.get("BENCH_SAMPLE_LEN", "224"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    quantize = os.environ.get("BENCH_QUANTIZE", "int8") or None
    kv_dtype = os.environ.get("BENCH_KV_DTYPE", "int8")
    cache_dtype = os.environ.get("BENCH_CACHE_DTYPE", "bf16")
    # two-level (frozen-prefix) decode; "0" reverts to the flat loop for A/B
    two_level = os.environ.get("BENCH_TWO_LEVEL", "1") not in ("", "0")
    stage_width = int(os.environ.get("BENCH_STAGE_WIDTH", "64"))
    spec = os.environ.get("BENCH_SPEC", "") not in ("", "0")
    draft_name = os.environ.get("BENCH_DRAFT", "large-v3-turbo")
    spec_k = int(os.environ.get("BENCH_SPEC_K", "4"))

    model = wt.load_model(model_name, quantize=quantize)
    cfg = model.cfg
    draft = None
    if spec:
        from openai_whisper_coreml_tpu.speculative import check_pair

        draft = wt.load_model(draft_name, quantize=quantize, seed=1)
        check_pair(cfg, draft.cfg)
    tok = get_tokenizer(cfg, language="en")
    opts = DecodingOptions(language="en")

    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((batch, 480_000)) * 0.1).astype(np.float32)
    audio_dev = jax.device_put(jnp.asarray(audio))

    suppress = jnp.asarray(build_suppress_mask(tok, opts))
    blank = jnp.asarray(build_blank_mask(tok))
    initial = np.tile(
        np.asarray([[tok.eot, tok.sot, tok.language_token("en"),
                     tok.transcribe]], np.int32), (batch, 1))
    prompt_len = initial.shape[1]
    initial_dev = jnp.asarray(initial)
    key = jax.random.PRNGKey(0)

    def run(audio_in):
        mel = log_mel_spectrogram(audio_in, n_mels=cfg.n_mels)
        feats = model._encode_jit(model.params, mel=mel)
        if spec:
            from openai_whisper_coreml_tpu.speculative import spec_decode_core

            # turbo's decoder was distilled against the frozen large-v3
            # encoder: one encoder forward feeds both decoders
            out = spec_decode_core(
                model.params, draft.params, cfg, draft.cfg, feats, feats,
                initial_dev, suppress, blank, jnp.int32(50), jnp.int32(1),
                jnp.int32(2), sample_len=sample_len, use_timestamps=True,
                prompt_len=prompt_len, spec_k=spec_k, kv_dtype=kv_dtype)
            return out[0]
        tokens, sum_lp, n_sampled, nsp = greedy_decode_core(
            model.params, cfg, feats, initial_dev, suppress, blank,
            jnp.float32(0.0), key, jnp.int32(50), jnp.int32(1), jnp.int32(2),
            sample_len=sample_len, use_timestamps=True, prompt_len=prompt_len,
            kv_dtype=kv_dtype, cache_dtype=cache_dtype, two_level=two_level,
            stage_width=stage_width)
        return tokens

    def fence(x):
        # device->host readback: the only reliable execution fence on the
        # axon relay (block_until_ready can return early in degraded mode)
        return np.asarray(x[:1, :1])

    # warmup / compile
    fence(run(audio_dev))

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fence(run(audio_dev))
        times.append(time.perf_counter() - t0)

    elapsed = min(times)
    audio_seconds = batch * 30.0
    rtfx = audio_seconds / elapsed

    tag = "_spec" if spec else ""
    print(json.dumps({
        "metric": f"rtfx_{model_name.replace('-', '_')}_batched_b{batch}"
                  f"{tag}",
        "value": round(rtfx, 2),
        "unit": "audio_sec/sec/chip",
        "vs_baseline": round(rtfx / 150.0, 3),
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # one parseable line even when the relay is down
        model = os.environ.get("BENCH_MODEL", "large-v3").replace("-", "_")
        batch = os.environ.get("BENCH_BATCH", "48")
        print(json.dumps({
            "metric": f"rtfx_{model}_batched_b{batch}",
            "value": 0.0,
            "unit": "audio_sec/sec/chip",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}"[:400],
        }))
        raise
