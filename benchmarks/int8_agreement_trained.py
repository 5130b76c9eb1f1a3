#!/usr/bin/env python
"""int8 promotion evidence on TRAINED (structured) weights.

Round-2's agreement ladder (benchmarks/int8_agreement.py) used random
weights — honest, but degenerate in both directions: near-tie argmaxes
exaggerate flips AND real failure modes (outlier channels that per-column
int8 scaling can clip) cannot appear. This script closes that gap in-image:

  1. train the real `tiny` config a few hundred steps on a synthetic
     tone->phrase task until its logit landscape is peaked (loss << 1);
  2. decode HELD-OUT noisy variants of the tones with the fp32 oracle, the
     bf16 default, bf16+int8 cross-KV, and int8 weights + int8 cross-KV;
  3. report token agreement vs fp32 AND real WER against the known ground
     truth phrases (the synthetic analogue of the impossible
     real-checkpoint WER gate in tools/validate_real.py).

One JSON line per config; --save-checkpoint persists the trained weights
(safetensors) for reuse.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openai_whisper_coreml_tpu.utils.platform import sync_platform_from_env

sync_platform_from_env()

PHRASES = [
    "the quick brown fox jumps over the lazy dog",
    "speech recognition on tensor processing units",
    "hello world this is a synthetic utterance",
    "quantization should not change the transcript",
    "we measure word error rate against ground truth",
    "a completely different sentence about boats",
    "numbers like seven forty two and nineteen",
    "the weather tomorrow will be cold and clear",
]


def tone_audio(class_id: int, seed: int, seconds: float = 8.0) -> np.ndarray:
    """Distinct multi-tone signature per class + noise; 16 kHz mono."""
    rng = np.random.default_rng(1000 * class_id + seed)
    t = np.arange(int(seconds * 16000)) / 16000
    f0 = 180 + 60 * class_id
    x = (0.30 * np.sin(2 * np.pi * f0 * t)
         + 0.20 * np.sin(2 * np.pi * (f0 * 1.5 + 17) * t)
         + 0.10 * np.sin(2 * np.pi * (f0 * 0.5 + 5) * t))
    x *= 1 + 0.4 * np.sin(2 * np.pi * (1.3 + 0.2 * class_id) * t)
    x += 0.02 * rng.standard_normal(t.shape)
    return x.astype(np.float32)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--sample-len", type=int, default=0,
                    help="0 = auto: longest target + eot + slack (a fixed "
                    "48 silently TRUNCATED the eot off 49/50-token rows, "
                    "so the model never learned to stop after the longest "
                    "phrases)")
    ap.add_argument("--target-loss", type=float, default=0.15)
    ap.add_argument("--save-checkpoint", default="")
    ap.add_argument("--checkpoint", default="",
                    help="skip training, load these trained weights")
    ap.add_argument("--out", default="/tmp/int8_agreement_trained.jsonl")
    args = ap.parse_args()

    import gc

    import jax
    import jax.numpy as jnp

    import openai_whisper_coreml_tpu as wt
    from openai_whisper_coreml_tpu.audio import log_mel_spectrogram, pad_or_trim
    from openai_whisper_coreml_tpu.config import get_config
    from openai_whisper_coreml_tpu.eval.wer import compute_wer
    from openai_whisper_coreml_tpu.models.whisper import WhisperModel
    from openai_whisper_coreml_tpu.params import init_params
    from openai_whisper_coreml_tpu.parallel import make_mesh
    from openai_whisper_coreml_tpu.quantize import quantize_params
    from openai_whisper_coreml_tpu.tokenizer import get_tokenizer
    from openai_whisper_coreml_tpu.train import (
        TrainConfig, make_batch, make_train_step)
    from openai_whisper_coreml_tpu.utils.checkpoint import (
        load_params, save_params)

    cfg = get_config(args.model)
    tok = get_tokenizer(cfg, language="en")
    n_cls = len(PHRASES)
    sot_len = len(tok.sot_sequence_including_notimestamps)
    longest = max(len(tok.encode(" " + p.strip())) for p in PHRASES)
    if args.sample_len <= 0:
        args.sample_len = longest + 5  # room for eot + a little drift
    train_len = sot_len + longest + 1  # full target incl. eot, no trunc

    # -- 1. train ----------------------------------------------------------
    if args.checkpoint:
        params32 = load_params(args.checkpoint, cfg=cfg, dtype=jnp.float32)
    else:
        params32 = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
        init_fn, step_fn = make_train_step(
            cfg, mesh, TrainConfig(learning_rate=3e-4, remat=True))
        params32, opt_state = init_fn(params32)

        rng = np.random.default_rng(0)
        loss = float("inf")
        for step in range(args.steps):
            cls = rng.integers(0, n_cls, args.batch)
            audio = np.stack([pad_or_trim(tone_audio(c, int(rng.integers(50))))
                              for c in cls])
            mel = np.asarray(log_mel_spectrogram(audio, n_mels=cfg.n_mels))
            _, tokens, mask = make_batch(cfg, tok, mel,
                                         [PHRASES[c] for c in cls],
                                         max_len=train_len)
            params32, opt_state, metrics = step_fn(
                params32, opt_state, jnp.asarray(mel), jnp.asarray(tokens),
                jnp.asarray(mask))
            if step % 25 == 0 or step == args.steps - 1:
                loss = float(metrics["loss"])
                print(json.dumps({"step": step, "loss": round(loss, 4),
                                  "acc": round(float(metrics["accuracy"]), 4)}),
                      flush=True)
                if loss < args.target_loss:
                    break
        del opt_state
        gc.collect()
        if args.save_checkpoint:
            save_params(jax.device_get(params32), args.save_checkpoint,
                        model_name=args.model)

    # -- 2. decode held-out variants under each serving config -------------
    eval_cls = [i % n_cls for i in range(args.batch)]
    eval_audio = jnp.asarray(np.stack(
        [pad_or_trim(tone_audio(c, seed=777 + i))
         for i, c in enumerate(eval_cls)]))
    refs = [PHRASES[c] for c in eval_cls]

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from int8_agreement import agreement, decode_tokens

    host32 = jax.device_get(params32)
    del params32
    gc.collect()

    def variant(label):
        if label == "fp32":
            return WhisperModel(cfg=cfg, params=jax.device_put(host32)), "bf16"
        p16 = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), host32)
        if label == "bf16":
            return WhisperModel(cfg=cfg, params=p16), "bf16"
        if label == "bf16_kvint8":
            return WhisperModel(cfg=cfg, params=p16), "int8"
        if label == "wint8_kvint8":
            return WhisperModel(cfg=cfg, params=quantize_params(p16)), "int8"
        raise ValueError(label)

    runs, texts = {}, {}
    out = open(args.out, "a")
    for label in ("fp32", "bf16", "bf16_kvint8", "wint8_kvint8"):
        model, kv = variant(label)
        toks = decode_tokens(model, eval_audio, args.batch,
                             args.sample_len, kv, notimestamps=True)
        runs[label] = toks
        texts[label] = [
            tok.decode([int(t) for t in row
                        if t < tok.eot]).strip()
            for row in toks]
        del model
        gc.collect()

    for label in ("bf16", "bf16_kvint8", "wint8_kvint8"):
        agree, first = agreement(runs["fp32"], runs[label])
        wer = compute_wer(refs, texts[label]).wer
        rec = {"model": args.model, "weights": "trained",
               "config": label,
               "token_agreement_vs_fp32": round(agree, 4),
               "earliest_divergence_step": first,
               "wer_vs_ground_truth": round(wer, 4)}
        print(json.dumps(rec), flush=True)
        out.write(json.dumps(rec) + "\n")
    wer32 = compute_wer(refs, texts["fp32"]).wer
    rec = {"model": args.model, "weights": "trained", "config": "fp32",
           "wer_vs_ground_truth": round(wer32, 4)}
    print(json.dumps(rec), flush=True)
    out.write(json.dumps(rec) + "\n")
    out.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
