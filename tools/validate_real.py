#!/usr/bin/env python
"""One-command real-checkpoint validation gate (BASELINE configs 1-3).

This build environment has ZERO network egress and ships no Whisper weights,
vocab, or speech corpora (verified: no *.pt/*.safetensors/vocab assets
anywhere on the image; tiktoken cannot fetch its ranks). Every numeric gate
that needs real weights therefore runs through THIS script the moment the
assets exist. Usage:

  python tools/validate_real.py \
      --weights /path/to/tiny.pt_or_hf_dir_or_converted.safetensors \
      --model tiny \
      --vocab /path/to/multilingual.tiktoken \
      --clip /path/to/jfk.wav --expect-transcript /path/to/jfk.txt \
      --librispeech /path/to/LibriSpeech/test-clean --limit 100

Gates (each prints PASS/FAIL and a JSON summary line at the end):
  A. transcript: greedy transcript of --clip equals --expect-transcript
     (BASELINE config 1: identical transcripts to openai/whisper), after
     openai-faithful normalisation (eval/normalizers.py);
  B. wer: WER over --librispeech (config 2) <= --wer-threshold (default
     0.08 for tiny; pass the published number for the size you validate);
  C. int8 deltas: WER of int8 weights / int8 cross-KV / int8 self-cache
     configurations within --int8-wer-delta (default 0.005 absolute) of the
     bf16 number — the promotion gate for flipping the measured-faster int8
     paths (docs/benchmarks.md "int8 options") to serving defaults.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ensure_converted(weights: str, model: str | None, dtype: str) -> tuple[str, str | None]:
    """Convert raw public checkpoints to our format if needed."""
    if weights.endswith(".safetensors") and not os.path.isdir(weights):
        from openai_whisper_coreml_tpu.utils.checkpoint import read_metadata

        meta = read_metadata(weights)
        if meta.get("format") == "whisper-tpu-v1":
            return weights, meta.get("model") or model
    out = os.path.join(tempfile.mkdtemp(prefix="whisper_tpu_ckpt_"),
                       "converted.safetensors")
    from tools.convert import main as convert_main

    argv = ["--input", weights, "--output", out, "--dtype", dtype]
    if model:
        argv += ["--model", model]
    convert_main(argv)
    return out, model


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--weights", required=True,
                    help="openai .pt, HF dir, or converted .safetensors")
    ap.add_argument("--model", default=None, help="model size name")
    ap.add_argument("--vocab", default=None,
                    help="tiktoken ranks / HF vocab.json (else "
                         "$WHISPER_TPU_VOCAB / bundled assets)")
    ap.add_argument("--clip", default=None, help="WAV for the transcript gate")
    ap.add_argument("--expect-transcript", default=None,
                    help="file holding the openai/whisper transcript of --clip")
    ap.add_argument("--librispeech", default=None,
                    help="LibriSpeech-style corpus dir for the WER gate")
    ap.add_argument("--limit", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--wer-threshold", type=float, default=0.08)
    ap.add_argument("--int8-wer-delta", type=float, default=0.005)
    ap.add_argument("--dtype", choices=("float32", "bfloat16"),
                    default="bfloat16")
    ap.add_argument("--skip-int8", action="store_true")
    args = ap.parse_args(argv)

    if args.vocab:
        os.environ["WHISPER_TPU_VOCAB"] = args.vocab

    from openai_whisper_coreml_tpu import load_model
    from openai_whisper_coreml_tpu.eval.harness import evaluate
    from openai_whisper_coreml_tpu.eval.normalizers import EnglishTextNormalizer

    ckpt, model_name = _ensure_converted(args.weights, args.model, args.dtype)
    if model_name is None:
        raise SystemExit("pass --model (could not detect from checkpoint)")

    summary = {"model": model_name, "checkpoint": ckpt}
    ok = True
    norm = EnglishTextNormalizer()

    def gate(name: str, passed: bool, detail):
        nonlocal ok
        ok &= passed
        summary[name] = {"pass": bool(passed), **detail}
        print(f"[{'PASS' if passed else 'FAIL'}] {name}: {detail}")

    # ---- gate A: transcript parity on one clip -----------------------------
    if args.clip:
        model = load_model(model_name, checkpoint=ckpt)
        result = model.transcribe(args.clip, language="en")
        hyp = norm(result["text"])
        if args.expect_transcript:
            with open(args.expect_transcript, encoding="utf-8") as f:
                ref = norm(f.read())
            gate("transcript", hyp == ref, {"hyp": hyp, "ref": ref})
        else:
            print(f"[INFO] transcript (no --expect-transcript): {hyp!r}")
            summary["transcript"] = {"hyp": hyp}

    # ---- gate B: LibriSpeech WER -------------------------------------------
    wer_bf16 = None
    if args.librispeech:
        model = load_model(model_name, checkpoint=ckpt)
        rep = evaluate(model, args.librispeech, limit=args.limit,
                       batch_size=args.batch_size)
        wer_bf16 = rep["wer"]
        gate("wer", wer_bf16 <= args.wer_threshold,
             {"wer": wer_bf16, "threshold": args.wer_threshold,
              "rtfx": rep["rtfx"], "n": rep["n_utterances"]})

        # ---- gate C: int8 configuration deltas -----------------------------
        if not args.skip_int8:
            for label, kwargs, serve_kwargs in (
                ("int8_weights", {"quantize": "int8"}, {}),
                ("int8_cross_kv", {}, {"kv_dtype": "int8"}),
                ("int8_self_cache", {}, {"cache_dtype": "int8"}),
                ("int8_all", {"quantize": "int8"},
                 {"kv_dtype": "int8", "cache_dtype": "int8"}),
            ):
                m = load_model(model_name, checkpoint=ckpt, **kwargs)
                rep = evaluate(m, args.librispeech, limit=args.limit,
                               batch_size=args.batch_size, **serve_kwargs)
                delta = rep["wer"] - wer_bf16
                gate(label, delta <= args.int8_wer_delta,
                     {"wer": rep["wer"], "delta_vs_bf16": round(delta, 4),
                      "rtfx": rep["rtfx"]})

    print(json.dumps({"ok": ok, **summary}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
