#!/usr/bin/env python
"""Quality evidence for the int8 serving configs (no real weights available).

This image has zero egress, so WER on real checkpoints is impossible
(tools/validate_real.py is the gate for when they exist). The strongest
in-image evidence is a CONTROLLED comparison against the error the bf16
default already accepts:

  * fp32 greedy tokens = ground truth;
  * measure token agreement + first-divergence step for: bf16 (the shipped
    default), bf16 + int8 cross-KV, int8 weights + int8 cross-KV;
  * if the int8 configs agree with fp32 about as often as plain bf16 does,
    quantisation adds no NEW error class on top of the accepted bf16 noise
    (near-tie argmax flips on random-weight logit landscapes are the
    dominant divergence mechanism for both).

Random weights are the HARDEST case for this test: logits are near-uniform,
so tiny perturbations flip argmaxes far more often than a trained model's
peaked distributions would. Agreement numbers here are a LOWER bound on
real-checkpoint agreement.

One JSON line per (model, config).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openai_whisper_coreml_tpu.utils.platform import sync_platform_from_env

sync_platform_from_env()  # honour JAX_PLATFORMS despite sitecustomize


def decode_tokens(model, audio_dev, batch, sample_len, kv_dtype,
                  notimestamps=False):
    """Greedy decode; notimestamps=True conditions on the
    sot_sequence_including_notimestamps prompt with the timestamp grammar
    off — matching train.make_batch's teacher-forcing format (required
    when evaluating weights trained on that format). Suppression masks are
    the production defaults — the byte-fallback space-byte collapse that
    once destroyed trained-weight decodes is fixed in the tokenizer itself
    (Tokenizer.non_speech_tokens / blank_tokens, is_byte_fallback gate)."""
    import jax
    import jax.numpy as jnp

    from openai_whisper_coreml_tpu.audio import log_mel_spectrogram
    from openai_whisper_coreml_tpu.decoding import (
        DecodingOptions, build_blank_mask, build_suppress_mask,
        greedy_decode_core)
    from openai_whisper_coreml_tpu.tokenizer import get_tokenizer

    cfg = model.cfg
    tok = get_tokenizer(cfg, language="en")
    opts = DecodingOptions(language="en")
    suppress = jnp.asarray(build_suppress_mask(tok, opts))
    blank = jnp.asarray(build_blank_mask(tok))
    if notimestamps:
        row = [tok.sot, tok.language_token("en"), tok.transcribe,
               tok.no_timestamps]
        pad_len, sot_index = 0, 0
    else:
        row = [tok.eot, tok.sot, tok.language_token("en"), tok.transcribe]
        pad_len, sot_index = 1, 2
    initial = np.tile(np.asarray([row], np.int32), (batch, 1))
    mel = log_mel_spectrogram(audio_dev, n_mels=cfg.n_mels)
    feats = model._encode_jit(model.params, mel=mel)
    tokens, *_ = greedy_decode_core(
        model.params, cfg, feats, jnp.asarray(initial), suppress, blank,
        jnp.float32(0.0), jax.random.PRNGKey(0), jnp.int32(50),
        jnp.int32(pad_len), jnp.int32(sot_index),
        sample_len=sample_len, use_timestamps=not notimestamps,
        prompt_len=initial.shape[1], kv_dtype=kv_dtype, cache_dtype="bf16")
    return np.asarray(tokens)[:, initial.shape[1]:]


def agreement(a: np.ndarray, b: np.ndarray):
    agree = float((a == b).mean())
    div = np.argmax(a != b, axis=1)  # first divergence per row (0 if equal)
    any_div = (a != b).any(axis=1)
    first = [int(d) for d, x in zip(div, any_div) if x]
    return agree, (min(first) if first else None)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="tiny,small")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--sample-len", type=int, default=64)
    ap.add_argument("--out", default="/tmp/int8_agreement.jsonl")
    args = ap.parse_args()

    import gc

    import jax.numpy as jnp

    import openai_whisper_coreml_tpu as wt

    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        (rng.standard_normal((args.batch, 480_000)) * 0.1).astype(np.float32))

    out = open(args.out, "a")
    for name in args.models.split(","):
        name = name.strip()
        runs = {}
        # fp32 ground truth first, then each serving config; one model
        # resident at a time (HBM discipline)
        for label, load_kw, kv in (
                ("fp32", dict(dtype=jnp.float32), "bf16"),
                ("bf16", dict(), "bf16"),
                ("bf16_kvint8", dict(), "int8"),
                ("wint8_kvint8", dict(quantize="int8"), "int8")):
            model = wt.load_model(name, **load_kw)
            runs[label] = decode_tokens(model, audio, args.batch,
                                        args.sample_len, kv)
            del model
            gc.collect()
        for label in ("bf16", "bf16_kvint8", "wint8_kvint8"):
            agree, first = agreement(runs["fp32"], runs[label])
            rec = {"model": name, "config": label,
                   "token_agreement_vs_fp32": round(agree, 4),
                   "earliest_divergence_step": first}
            print(json.dumps(rec), flush=True)
            out.write(json.dumps(rec) + "\n")
        # and the direct delta the serving flip actually introduces
        agree, first = agreement(runs["bf16"], runs["wint8_kvint8"])
        rec = {"model": name, "config": "wint8_kvint8_vs_bf16",
               "token_agreement": round(agree, 4),
               "earliest_divergence_step": first}
        print(json.dumps(rec), flush=True)
        out.write(json.dumps(rec) + "\n")
        out.flush()
    out.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
