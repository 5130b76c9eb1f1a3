#!/usr/bin/env python
"""Batched word-timestamp alignment throughput (round-4 shipped it for
serving — serve.py::_align_words / timing.find_word_alignment_batch — but
never measured it; round-5 verdict #5).

Measures ms/window of the alignment pass at B in {1, 8, 24}: teacher-forced
re-forward with attention capture, on-device head selection + per-frame
standardisation + median filter, DTW on host over the (T, S) cost matrix.
B=1 reproduces the round-3 single-window protocol (516 ms/window measured
then); the batched rows are what serving actually runs since round 4.

Env: WTS_MODEL (large-v3), WTS_TOKENS (48 text tokens/window — a typical
real transcript), WTS_BATCHES (1,8,24), WTS_QUANTIZE (int8),
WTS_REPEATS (3).
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
    import jax.numpy as jnp

    import openai_whisper_coreml_tpu as wt
    from openai_whisper_coreml_tpu.timing import (
        find_word_alignment, find_word_alignment_batch)
    from openai_whisper_coreml_tpu.tokenizer import get_tokenizer

    model_name = os.environ.get("WTS_MODEL", "large-v3")
    n_tokens = int(os.environ.get("WTS_TOKENS", "48"))
    batches = [int(s) for s in
               os.environ.get("WTS_BATCHES", "1,8,24").split(",") if s]
    quantize = os.environ.get("WTS_QUANTIZE", "int8") or None
    repeats = int(os.environ.get("WTS_REPEATS", "3"))

    model = wt.load_model(model_name, quantize=quantize)
    cfg = model.cfg
    tok = get_tokenizer(cfg, language="en")

    rng = np.random.default_rng(0)
    # realistic text tokens (sub-timestamp ids, no specials) + audio feats
    text = rng.integers(300, 20_000, size=(n_tokens,)).astype(int).tolist()
    num_frames = 3000  # full 30 s window

    for b in batches:
        feats = jnp.asarray(
            (rng.standard_normal((b, cfg.n_audio_ctx, cfg.n_audio_state))
             * 0.05).astype(np.float32), jnp.bfloat16)
        jobs = [(list(text), feats[i], num_frames) for i in range(b)]

        def run():
            if b == 1:
                # round-3 protocol: the single-window entry point
                return find_word_alignment(model, tok, text, feats[0],
                                           num_frames, language="en")
            return find_word_alignment_batch(model, tok, jobs,
                                             language="en")

        run()  # warmup/compile (host DTW is the implicit fence)
        walls = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            run()
            walls.append(time.perf_counter() - t0)
        wall = min(walls)
        print(json.dumps({
            "metric": f"wordts_align_{model_name.replace('-', '_')}_b{b}",
            "unit": "ms/window",
            "value": round(wall / b * 1e3, 1),
            "windows_per_s": round(b / wall, 2),
            "tokens_per_window": n_tokens,
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
