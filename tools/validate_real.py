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
  D. beam: WER at beam_size=5 within --beam-wer-delta of greedy (config 4);
  E. word_timestamps: words attached to every spoken segment of --clip,
     monotonically ordered inside each segment, and the TEXT unchanged vs
     the plain transcribe (the alignment pass must not perturb decoding);
  F. vad: WER with vad_filter=True within --vad-wer-delta of the plain run
     (energy VAD must not drop speech on a speech corpus);
  G. prequantized: an int8 checkpoint written by quantize-then-save decodes
     token-identically to quantize-at-load (the shipping path for int8
     serving checkpoints);
  H. scheduler: continuous batching's WER within --sched-wer-delta of the
     static scheduler on the same corpus (token-exact in fp32; bf16 may
     flip near-tie argmaxes — serve_cb.py docstring);
  I. http: the OpenAI-compatible /v1/audio/transcriptions endpoint returns
     the same normalised text as a direct transcribe() of --clip;
  J. speculative (needs --draft-weights): greedy speculative decoding's WER
     within --spec-wer-delta of plain greedy, with the measured acceptance
     rate reported (docs/benchmarks.md round 4 projects RTFx from it).
  L. streaming (needs --clip): StreamingTranscriber fed 0.5 s chunks must
     commit text whose WER against the batch transcribe() of the same clip
     is <= --stream-wer-delta (LocalAgreement confirmation is allowed to
     differ at hypothesis boundaries, not to drop content), with per-tick
     wall latency p50/p95 reported; MultiStreamTranscriber (2 concurrent
     copies of the clip, batched tick decodes + per-stream conditioning)
     must match the single-stream tier within the same delta on BOTH
     streams.
  K. lora (needs --lora-weights: a checkpoint saved by tools/finetune.py
     --lora-rank N --no-merge-lora, adapters unmerged): transcribing --clip
     with runtime adapters equals transcribing with lora.merge_lora-merged
     weights after normalisation (x@(w + ab) vs x@w + (x@a)@b round
     differently in bf16, so raw tokens may flip near-ties — run --dtype
     float32 for bit-exactness; token mismatches are reported either way).

Every gate runs only when its assets are supplied; the JSON summary names
the gates that ran so CI can assert coverage.
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
    ap.add_argument("--beam-wer-delta", type=float, default=0.01)
    ap.add_argument("--vad-wer-delta", type=float, default=0.01)
    ap.add_argument("--sched-wer-delta", type=float, default=0.005)
    ap.add_argument("--spec-wer-delta", type=float, default=0.005)
    ap.add_argument("--skip-beam", action="store_true")
    ap.add_argument("--skip-vad", action="store_true")
    ap.add_argument("--skip-sched", action="store_true")
    ap.add_argument("--skip-http", action="store_true")
    ap.add_argument("--skip-prequantized", action="store_true")
    ap.add_argument("--skip-streaming", action="store_true")
    ap.add_argument("--stream-wer-delta", type=float, default=0.05)
    ap.add_argument("--draft-weights", default=None,
                    help="draft checkpoint for the speculative gate (e.g. "
                         "large-v3-turbo when validating large-v3)")
    ap.add_argument("--draft-model", default=None,
                    help="draft model size name (e.g. large-v3-turbo)")
    ap.add_argument("--spec-k", type=int, default=4)
    ap.add_argument("--lora-weights", default=None,
                    help="fine-tuned checkpoint with UNMERGED adapters "
                         "(tools/finetune.py --lora-rank N --no-merge-lora) "
                         "for the runtime-vs-merged gate")
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
    clip_text = None
    if args.clip:
        model = load_model(model_name, checkpoint=ckpt)
        result = model.transcribe(args.clip, language="en")
        clip_text = result["text"]
        hyp = norm(clip_text)
        if args.expect_transcript:
            with open(args.expect_transcript, encoding="utf-8") as f:
                ref = norm(f.read())
            gate("transcript", hyp == ref, {"hyp": hyp, "ref": ref})
        else:
            print(f"[INFO] transcript (no --expect-transcript): {hyp!r}")
            summary["transcript"] = {"hyp": hyp}

    # ---- gate E: word timestamps on the clip --------------------------------
    if args.clip:
        model = load_model(model_name, checkpoint=ckpt)
        res = model.transcribe(args.clip, language="en",
                               word_timestamps=True)
        problems = []
        spoken = [s for s in res["segments"] if s["text"].strip()]
        wordless = 0
        any_words = False
        for s in spoken:
            words = s.get("words") or []
            if not words:
                # legitimate: merge_punctuations / degenerate alignment can
                # leave a short segment word-less (openai behaves the same);
                # reported as info, failed only if NO segment gets words
                wordless += 1
                continue
            any_words = True
            ends = -1e9
            for w in words:
                if w["start"] > w["end"]:
                    problems.append(f"word {w['word']!r} start>end")
                if w["start"] < ends - 1e-6:
                    problems.append(f"word {w['word']!r} overlaps previous")
                ends = w["end"]
        if spoken and not any_words:
            problems.append("no words attached to any spoken segment")
        same_text = norm(res["text"]) == norm(clip_text)
        if not same_text:
            problems.append("text changed by the alignment pass")
        gate("word_timestamps", not problems,
             {"segments": len(spoken), "segments_without_words": wordless,
              "problems": problems[:5]})

    # ---- gate I: OpenAI-compatible HTTP endpoint ----------------------------
    if args.clip and not args.skip_http:
        import io
        import json as _json
        import urllib.request

        from openai_whisper_coreml_tpu.serve_http import WhisperHTTPServer

        model = load_model(model_name, checkpoint=ckpt)
        srv = WhisperHTTPServer(model, port=0)
        srv.start()
        port = srv.port
        try:
            with open(args.clip, "rb") as f:
                payload = f.read()
            boundary = b"xxboundaryxx"
            body = (b"--" + boundary + b"\r\n"
                    b'Content-Disposition: form-data; name="file"; '
                    b'filename="clip.wav"\r\n'
                    b"Content-Type: audio/wav\r\n\r\n" + payload + b"\r\n"
                    b"--" + boundary + b"\r\n"
                    b'Content-Disposition: form-data; name="language"'
                    b"\r\n\r\nen\r\n"
                    b"--" + boundary + b"--\r\n")
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/v1/audio/transcriptions",
                data=body,
                headers={"Content-Type":
                         f"multipart/form-data; boundary={boundary.decode()}"})
            with urllib.request.urlopen(req, timeout=600) as resp:
                out = _json.load(io.TextIOWrapper(resp, encoding="utf-8"))
            gate("http", norm(out.get("text", "")) == norm(clip_text),
                 {"hyp": norm(out.get("text", ""))})
        finally:
            srv.stop()

    # ---- gate G: pre-quantized checkpoint parity ----------------------------
    if args.clip and not args.skip_prequantized:
        from openai_whisper_coreml_tpu.quantize import quantize_params
        from openai_whisper_coreml_tpu.utils.checkpoint import save_params

        base = load_model(model_name, checkpoint=ckpt)
        qpath = os.path.join(tempfile.mkdtemp(prefix="whisper_tpu_q_"),
                             "q.safetensors")
        save_params(quantize_params(base.params), qpath,
                    model_name=model_name)
        pre = load_model(model_name, checkpoint=qpath, quantize="int8")
        live = load_model(model_name, checkpoint=ckpt, quantize="int8")
        r_pre = pre.transcribe(args.clip, language="en")
        r_live = live.transcribe(args.clip, language="en")
        toks_pre = [t for s in r_pre["segments"] for t in s["tokens"]]
        toks_live = [t for s in r_live["segments"] for t in s["tokens"]]
        gate("prequantized", toks_pre == toks_live,
             {"tokens": len(toks_pre)})

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

        model = load_model(model_name, checkpoint=ckpt)

        # ---- gate D: beam search (BASELINE config 4) ------------------------
        if not args.skip_beam:
            rep = evaluate(model, args.librispeech, limit=args.limit,
                           batch_size=args.batch_size, beam_size=5)
            delta = rep["wer"] - wer_bf16
            gate("beam", delta <= args.beam_wer_delta,
                 {"wer": rep["wer"], "delta_vs_greedy": round(delta, 4),
                  "rtfx": rep["rtfx"]})

        # ---- gate F: energy-VAD window gating --------------------------------
        if not args.skip_vad:
            rep = evaluate(model, args.librispeech, limit=args.limit,
                           batch_size=args.batch_size, vad_filter=True)
            delta = rep["wer"] - wer_bf16
            gate("vad", delta <= args.vad_wer_delta,
                 {"wer": rep["wer"], "delta_vs_plain": round(delta, 4)})

        # ---- gate H: continuous-batching scheduler ---------------------------
        if not args.skip_sched:
            rep = evaluate(model, args.librispeech, limit=args.limit,
                           batch_size=args.batch_size,
                           scheduler="continuous")
            delta = abs(rep["wer"] - wer_bf16)
            gate("scheduler", delta <= args.sched_wer_delta,
                 {"wer": rep["wer"], "abs_delta_vs_static": round(delta, 4),
                  "rtfx": rep["rtfx"]})

    # ---- gate J: speculative decoding (needs a draft checkpoint) ------------
    if args.draft_weights and args.librispeech:
        import numpy as np

        from openai_whisper_coreml_tpu.decoding import DecodingOptions, decode
        from openai_whisper_coreml_tpu.eval.harness import discover
        from openai_whisper_coreml_tpu.eval.wer import compute_wer
        from openai_whisper_coreml_tpu.utils.audio_io import load_audio_batch
        from openai_whisper_coreml_tpu import audio as audio_mod

        dckpt, dname = _ensure_converted(args.draft_weights,
                                         args.draft_model, args.dtype)
        if dname is None:
            raise SystemExit("pass --draft-model")
        model = load_model(model_name, checkpoint=ckpt)
        draft = load_model(dname, checkpoint=dckpt)
        utts = discover(args.librispeech)[: args.limit]
        audios = load_audio_batch([u.audio_path for u in utts])
        opts = DecodingOptions(language="en", spec_k=args.spec_k)
        hyps_plain, hyps_spec = [], []
        import time as _time

        t_plain = t_spec = 0.0
        for i in range(0, len(audios), args.batch_size):
            batch = audios[i : i + args.batch_size]
            mels = np.stack([
                np.asarray(audio_mod.log_mel_spectrogram(
                    audio_mod.pad_or_trim(a), n_mels=model.cfg.n_mels))
                for a in batch])
            t0 = _time.perf_counter()
            hyps_plain += [r.text for r in decode(model, mels, opts)]
            t_plain += _time.perf_counter() - t0
            t0 = _time.perf_counter()
            hyps_spec += [r.text
                          for r in decode(model, mels, opts, draft=draft)]
            t_spec += _time.perf_counter() - t0
        refs = [u.reference for u in utts]
        wer_plain = compute_wer(refs, hyps_plain).wer
        wer_spec = compute_wer(refs, hyps_spec).wer
        delta = abs(wer_spec - wer_plain)
        from openai_whisper_coreml_tpu import speculative as spec_mod

        gate("speculative", delta <= args.spec_wer_delta,
             {"wer": wer_spec, "wer_plain": wer_plain,
              "abs_delta": round(delta, 4), "spec_k": args.spec_k,
              "wall_plain_s": round(t_plain, 2),
              "wall_spec_s": round(t_spec, 2),
              "last_batch_stats": spec_mod.LAST_STATS})

    # ---- gate L: streaming tiers ---------------------------------------------
    if args.clip and not args.skip_streaming:
        import time as _time

        import numpy as _np

        from openai_whisper_coreml_tpu.eval.wer import compute_wer
        from openai_whisper_coreml_tpu.stream import (
            MultiStreamTranscriber, StreamingTranscriber)
        from openai_whisper_coreml_tpu.utils.audio_io import load_audio

        model = load_model(model_name, checkpoint=ckpt)
        audio = load_audio(args.clip)
        chunk = int(0.5 * 16_000)

        st = StreamingTranscriber(model, language="en")
        stream_text, ticks = [], []
        for off in range(0, len(audio), chunk):
            t0 = _time.perf_counter()
            for ev in st.feed(audio[off : off + chunk]):
                stream_text.append(ev.text)
            ticks.append(_time.perf_counter() - t0)
        for ev in st.finish():
            stream_text.append(ev.text)
        stream_text = "".join(stream_text)
        # steady-state tick latency: drop the compile-spike ticks (first 3)
        steady = sorted(ticks[3:]) or sorted(ticks)
        p50 = steady[len(steady) // 2]
        p95 = steady[min(len(steady) - 1, int(len(steady) * 0.95))]
        ref = norm(clip_text)
        wer_stream = compute_wer([ref], [norm(stream_text)]).wer
        gate("streaming", wer_stream <= args.stream_wer_delta,
             {"wer_vs_batch": round(wer_stream, 4),
              "tick_p50_ms": round(p50 * 1e3, 1),
              "tick_p95_ms": round(p95 * 1e3, 1),
              "ticks": len(ticks)})

        # multi-stream tier: 2 concurrent copies, batched ticks + per-stream
        # prompt conditioning; both must match the batch transcript
        mst = MultiStreamTranscriber(model, n_streams=2, language="en")
        texts = {0: [], 1: []}
        for off in range(0, len(audio), chunk):
            mst.feed(0, audio[off : off + chunk])
            mst.feed(1, audio[off : off + chunk])
            for i, evs in mst.poll().items():
                for ev in evs:
                    texts[i].append(ev.text)
        for i in (0, 1):
            for ev in mst.finish(i):
                texts[i].append(ev.text)
        wers = [compute_wer([ref], [norm("".join(texts[i]))]).wer
                for i in (0, 1)]
        gate("multistream", max(wers) <= args.stream_wer_delta,
             {"wer_vs_batch": [round(w, 4) for w in wers]})

    # ---- gate K: LoRA runtime adapters == merged weights ---------------------
    if args.lora_weights and args.clip:
        import dataclasses

        from openai_whisper_coreml_tpu.lora import merge_lora

        lckpt, lname = _ensure_converted(args.lora_weights,
                                         args.model or model_name, args.dtype)
        tuned = load_model(lname or model_name, checkpoint=lckpt)
        merged = dataclasses.replace(tuned, params=merge_lora(tuned.params))
        r_rt = tuned.transcribe(args.clip, language="en")
        r_mg = merged.transcribe(args.clip, language="en")
        toks_rt = [t for s in r_rt["segments"] for t in s["tokens"]]
        toks_mg = [t for s in r_mg["segments"] for t in s["tokens"]]
        mismatch = (sum(a != b for a, b in zip(toks_rt, toks_mg))
                    + abs(len(toks_rt) - len(toks_mg)))
        gate("lora", norm(r_rt["text"]) == norm(r_mg["text"]),
             {"token_mismatches": mismatch, "tokens": len(toks_rt)})

    print(json.dumps({"ok": ok, **summary}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
