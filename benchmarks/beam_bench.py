#!/usr/bin/env python
"""On-chip RTFx for BASELINE config 4: beam search + word timestamps.

Round-2 verdict #4/weak-4: BENCH covered greedy only; beam search and the
word-timestamp (DTW alignment) pass had no TPU timing rows. This measures:

  * beam_decode_core RTFx (beam_size=5, timestamps, full sample_len — the
    same worst-case convention as bench.py's greedy rows);
  * the word-timestamp pass: teacher-forced re-forward with attention
    capture + vectorised DTW + per-word splitting, per 30 s window.

Env: BEAM_MODEL (medium), BEAM_BATCH (8), BEAM_SIZE (5), BEAM_SAMPLE_LEN
(224), BEAM_KV_DTYPE/BEAM_QUANTIZE (champion int8 by default),
BEAM_TWO_LEVEL (default on — phased frozen-prefix decode with deferred
beam reordering; "0" reverts to the per-step full-cache-gather loop),
BEAM_STAGE_WIDTH (staging columns, default 128), BEAM_SKIP_WTS ("1" skips
the word-timestamp half for quick decode A/Bs).
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

    import openai_whisper_coreml_tpu as wt
    from openai_whisper_coreml_tpu.audio import log_mel_spectrogram
    from openai_whisper_coreml_tpu.beam import beam_decode_core, rank_sequences
    from openai_whisper_coreml_tpu.decoding import (
        DecodingOptions, build_blank_mask, build_suppress_mask)
    from openai_whisper_coreml_tpu.tokenizer import get_tokenizer

    model_name = os.environ.get("BEAM_MODEL", "medium")
    batch = int(os.environ.get("BEAM_BATCH", "8"))
    beam_size = int(os.environ.get("BEAM_SIZE", "5"))
    sample_len = int(os.environ.get("BEAM_SAMPLE_LEN", "224"))
    repeats = int(os.environ.get("BEAM_REPEATS", "3"))
    quantize = os.environ.get("BEAM_QUANTIZE", "int8") or None
    kv_dtype = os.environ.get("BEAM_KV_DTYPE", "int8")
    two_level = os.environ.get("BEAM_TWO_LEVEL", "1") not in ("", "0")
    stage_width = int(os.environ.get("BEAM_STAGE_WIDTH", "128"))
    skip_wts = os.environ.get("BEAM_SKIP_WTS", "") == "1"

    model = wt.load_model(model_name, quantize=quantize)
    cfg = model.cfg
    tok = get_tokenizer(cfg, language="en")
    opts = DecodingOptions(language="en", beam_size=beam_size)

    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((batch, 480_000)) * 0.1).astype(np.float32)
    audio_dev = jax.device_put(jnp.asarray(audio))

    suppress = jnp.asarray(build_suppress_mask(tok, opts))
    blank = jnp.asarray(build_blank_mask(tok))
    initial = np.tile(np.asarray(
        [[tok.eot, tok.sot, tok.language_token("en"), tok.transcribe]],
        np.int32), (batch, 1))
    prompt_len = initial.shape[1]
    initial_dev = jnp.asarray(initial)

    def run_beam(audio_in):
        mel = log_mel_spectrogram(audio_in, n_mels=cfg.n_mels)
        feats = model._encode_jit(model.params, mel=mel)
        toks, scores, lens, nsp = beam_decode_core(
            model.params, cfg, feats, initial_dev, suppress, blank,
            jnp.int32(50), jnp.int32(1), jnp.int32(2),
            sample_len=sample_len, use_timestamps=True,
            prompt_len=prompt_len, beam_size=beam_size,
            max_candidates=beam_size, kv_dtype=kv_dtype,
            two_level=two_level, stage_width=stage_width)
        ranked = rank_sequences(scores, lens, None)
        best = jnp.argmax(ranked, axis=1)
        return jnp.take_along_axis(toks, best[:, None, None], axis=1)[:, 0]

    def fence(x):
        return np.asarray(x[:1, :1])

    fence(run_beam(audio_dev))  # compile
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fence(run_beam(audio_dev))
        times.append(time.perf_counter() - t0)
    rtfx = batch * 30.0 / min(times)
    print(json.dumps({
        "metric": f"rtfx_{model_name.replace('-', '_')}"
                  f"_beam{beam_size}_b{batch}",
        "value": round(rtfx, 2), "unit": "audio_sec/sec/chip",
        "two_level": two_level,
        "vs_baseline": round(rtfx / 150.0, 3)}), flush=True)
    if skip_wts:
        return 0

    # -- word-timestamp pass ------------------------------------------------
    from openai_whisper_coreml_tpu.timing import add_word_timestamps_to_segments
    from openai_whisper_coreml_tpu.transcribe import Segment

    mel1 = log_mel_spectrogram(audio_dev[:1], n_mels=cfg.n_mels)
    feats1 = model._encode_jit(model.params, mel=mel1)
    text_toks = tok.encode(" the quick brown fox jumps over the lazy dog "
                           "and keeps running through the field") * 3
    seg = lambda: Segment(id=0, seek=0, start=0.0, end=28.0,
                          text="", tokens=[cfg.timestamp_begin]
                          + text_toks + [cfg.timestamp_begin + 1400],
                          temperature=0.0, avg_logprob=-0.3,
                          compression_ratio=1.2, no_speech_prob=0.0)

    def run_wts():
        segs = [seg()]
        add_word_timestamps_to_segments(model, tok, segs, feats1,
                                        num_frames=3000, time_offset=0.0)
        return segs

    run_wts()  # compile
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        segs = run_wts()
        times.append(time.perf_counter() - t0)
    per_window = min(times)
    assert segs[0].words, "word timestamps not produced"
    print(json.dumps({
        "metric": f"word_timestamps_{model_name.replace('-', '_')}"
                  "_per_30s_window",
        "value": round(per_window * 1e3, 1), "unit": "ms",
        "rtfx_single_window": round(30.0 / per_window, 1)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
