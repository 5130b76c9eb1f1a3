#!/usr/bin/env python
"""REAL acceptance-rate measurement for speculative decoding, on trained
weights — the in-image analogue of the large-v3 + large-v3-turbo pairing.

The kinetics benchmark (benchmarks/spec_bench.py) measures what an
iteration COSTS; this script measures what a real draft/target pair
ACCEPTS, reproducing the turbo distillation recipe at tiny scale:

  1. train the real `tiny` config on the synthetic tone->phrase corpus
     (same machinery as benchmarks/int8_agreement_trained.py) to a peaked
     logit landscape;
  2. build a HALF-DEPTH draft (tiny dims, n_text_layer // 2): copy the
     trained target's ENCODER into it, freeze the encoder, and train only
     its decoder on the same corpus — exactly how large-v3-turbo was
     distilled from large-v3 (frozen encoder, shallow decoder), which is
     what makes share-the-encoder-features speculative serving valid;
  3. greedy-decode HELD-OUT noisy tone variants with (a) the plain target
     loop and (b) spec_decode_core at several K; report the measured
     per-token acceptance rate, tokens/iteration, and the WER of both
     paths (they must match: speculative decoding is token-exact).

One JSON line per K. The acceptance numbers feed the derived RTFx table in
docs/benchmarks.md (spec_bench.py's alpha sweep).

Round-5 additions (verdict #1: "turn the derived claim into a measured
headline"):
  --long           train/eval on ~40-token concatenated phrases so the
                   decode horizon resembles real transcripts instead of
                   ~12-token fragments;
  --time-batches   after the acceptance measurement, wall-clock the REAL
                   end-to-end pipeline (mel + encoder + decode to EOT,
                   device-fenced) at each batch: plain two-level greedy
                   (the production champion loop) vs speculative at each
                   K with the trained pair's TRUE acceptance — a measured,
                   not derived, spec-vs-champion RTFx table. One JSON line
                   per (batch, K).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openai_whisper_coreml_tpu.utils.platform import sync_platform_from_env

sync_platform_from_env()

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from int8_agreement_trained import PHRASES as PHRASES_SHORT  # noqa: E402
from int8_agreement_trained import tone_audio  # noqa: E402

# --long corpus: ~40-token utterances (short phrases concatenated with
# distinct connectives) so the timed decode horizon matches real speech
# transcripts (~45 tokens / 8 s) instead of toy fragments
PHRASES_LONG = [
    (PHRASES_SHORT[i] + " and then "
     + PHRASES_SHORT[(i + 1) % len(PHRASES_SHORT)] + " while "
     + PHRASES_SHORT[(i + 3) % len(PHRASES_SHORT)] + " although "
     + PHRASES_SHORT[(i + 5) % len(PHRASES_SHORT)])
    for i in range(len(PHRASES_SHORT))
]

PHRASES = PHRASES_SHORT  # reassigned by --long in main()


def train_model(cfg, tok, steps, batch, target_loss, *, init_params_fn,
                trainable=None, encoder_from=None, seed=0):
    import jax
    import jax.numpy as jnp

    from openai_whisper_coreml_tpu.audio import log_mel_spectrogram, pad_or_trim
    from openai_whisper_coreml_tpu.parallel import make_mesh
    from openai_whisper_coreml_tpu.train import (
        TrainConfig, make_batch, make_train_step)

    params = init_params_fn(cfg, jax.random.PRNGKey(seed), dtype=jnp.float32)
    if encoder_from is not None:
        params = dict(params)
        # COPY: the train step donates its params, and a shared (aliased)
        # encoder would be deleted out from under the target model
        params["encoder"] = jax.tree.map(jnp.copy, encoder_from)
    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    init_fn, step_fn = make_train_step(
        cfg, mesh, TrainConfig(learning_rate=3e-4, remat=True,
                               trainable=trainable))
    params, opt_state = init_fn(params)

    n_cls = len(PHRASES)
    sot_len = len(tok.sot_sequence_including_notimestamps)
    longest = max(len(tok.encode(" " + p.strip())) for p in PHRASES)
    train_len = sot_len + longest + 1

    rng = np.random.default_rng(seed)
    for step in range(steps):
        cls = rng.integers(0, n_cls, batch)
        audio = np.stack([pad_or_trim(tone_audio(c, int(rng.integers(50))))
                          for c in cls])
        mel = np.asarray(log_mel_spectrogram(audio, n_mels=cfg.n_mels))
        _, tokens, mask = make_batch(cfg, tok, mel,
                                     [PHRASES[c] for c in cls],
                                     max_len=train_len)
        params, opt_state, metrics = step_fn(
            params, opt_state, jnp.asarray(mel), jnp.asarray(tokens),
            jnp.asarray(mask))
        if step % 25 == 0 or step == steps - 1:
            loss = float(metrics["loss"])
            print(json.dumps({"model": cfg.name, "step": step,
                              "loss": round(loss, 4)}), flush=True)
            if loss < target_loss:
                break
    del opt_state
    return params


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--draft-steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--target-loss", type=float, default=0.05)
    ap.add_argument("--ks", default="2,4,8")
    ap.add_argument("--out", default="/tmp/spec_acceptance_trained.jsonl")
    ap.add_argument("--long", action="store_true",
                    help="~40-token utterances (realistic decode horizon)")
    ap.add_argument("--time-batches", default="",
                    help="comma list: wall-clock plain-champion vs spec "
                         "end to end at each batch (measured headline)")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    global PHRASES
    if args.long:
        PHRASES = PHRASES_LONG

    import jax
    import jax.numpy as jnp

    from openai_whisper_coreml_tpu.audio import log_mel_spectrogram, pad_or_trim
    from openai_whisper_coreml_tpu.config import get_config
    from openai_whisper_coreml_tpu.decoding import (
        DecodingOptions, build_blank_mask, build_suppress_mask,
        greedy_decode_core)
    from openai_whisper_coreml_tpu.eval.wer import compute_wer
    from openai_whisper_coreml_tpu.params import init_params
    from openai_whisper_coreml_tpu.speculative import (
        spec_decode_core, spec_stats)
    from openai_whisper_coreml_tpu.tokenizer import get_tokenizer

    cfg = get_config(args.model)
    cfg_d = dataclasses.replace(
        cfg, name=f"{args.model}-draft",
        n_text_layer=max(1, cfg.n_text_layer // 2))
    tok = get_tokenizer(cfg, language="en")
    longest = max(len(tok.encode(" " + p.strip())) for p in PHRASES)
    sample_len = longest + 5

    # -- 1+2. train target, then frozen-encoder half-depth draft ------------
    params_t = train_model(cfg, tok, args.steps, args.batch,
                           args.target_loss, init_params_fn=init_params)
    params_d = train_model(cfg_d, tok, args.draft_steps, args.batch,
                           args.target_loss,
                           init_params_fn=init_params,
                           trainable="^decoder",
                           encoder_from=params_t["encoder"], seed=1)

    # -- 3. held-out decode: plain vs speculative ----------------------------
    n_cls = len(PHRASES)
    eval_cls = [i % n_cls for i in range(args.batch)]
    eval_audio = jnp.asarray(np.stack(
        [pad_or_trim(tone_audio(c, seed=777 + i))
         for i, c in enumerate(eval_cls)]))
    refs = [PHRASES[c] for c in eval_cls]
    mel = log_mel_spectrogram(eval_audio, n_mels=cfg.n_mels)

    from openai_whisper_coreml_tpu.models.encoder import encode

    feats = jax.jit(lambda p, m: encode(p, cfg, m))(params_t, mel)

    opts = DecodingOptions(language="en", without_timestamps=True)
    suppress = jnp.asarray(build_suppress_mask(tok, opts))
    blank = jnp.asarray(build_blank_mask(tok))
    seq = list(tok.sot_sequence_including_notimestamps)
    initial = np.tile(np.asarray([seq], np.int32), (args.batch, 1))
    prompt_len = initial.shape[1]
    sot_idx = seq.index(tok.sot)

    base = greedy_decode_core(
        params_t, cfg, feats, jnp.asarray(initial), suppress, blank,
        jnp.float32(0.0), jax.random.PRNGKey(0), jnp.int32(-1),
        jnp.int32(0), jnp.int32(sot_idx), sample_len=sample_len,
        use_timestamps=False, prompt_len=prompt_len, two_level=False)
    base_toks = np.asarray(base[0])

    def texts_of(toks):
        out = []
        for row in toks[:, prompt_len:]:
            eots = np.nonzero(row == tok.eot)[0]
            cut = int(eots[0]) if len(eots) else len(row)
            out.append(tok.decode([int(t) for t in row[:cut]]).strip())
        return out

    wer_plain = compute_wer(refs, texts_of(base_toks)).wer
    results = []
    out_f = open(args.out, "a")
    for k in [int(s) for s in args.ks.split(",") if s]:
        spec = spec_decode_core(
            params_t, params_d, cfg, cfg_d, feats, feats,
            jnp.asarray(initial), suppress, blank, jnp.int32(-1),
            jnp.int32(0), jnp.int32(sot_idx), sample_len=sample_len,
            use_timestamps=False, prompt_len=prompt_len, spec_k=k)
        stats = spec_stats(np.asarray(spec[2]), np.asarray(spec[4]),
                           np.asarray(spec[5]))
        spec_texts = texts_of(np.asarray(spec[0]))
        wer_spec = compute_wer(refs, spec_texts).wer
        exact = bool(np.array_equal(base_toks, np.asarray(spec[0])))
        rec = {
            "model": args.model,
            "draft_layers": cfg_d.n_text_layer,
            "spec_k": k,
            "acceptance_rate": round(stats["acceptance_rate"], 4),
            "tokens_per_iter": round(stats["tokens_per_iter"], 3),
            "wer_plain": round(wer_plain, 4),
            "wer_spec": round(wer_spec, 4),
            "token_exact_vs_plain": exact,
        }
        print(json.dumps(rec), flush=True)
        out_f.write(json.dumps(rec) + "\n")
        results.append(rec)

    # -- 4. measured end-to-end wall clock: plain champion vs spec ----------
    # (round-5) The REAL serving pipeline — mel + encoder + decode-to-EOT —
    # timed device-fenced at each batch with the trained pair's TRUE
    # acceptance. Plain baseline = two-level greedy (the bench champion
    # loop). bf16 params + int8 cross-KV = the shipping serving dtype.
    if args.time_batches:
        import time

        from openai_whisper_coreml_tpu.audio import (
            log_mel_spectrogram as _mel, pad_or_trim as _pt)

        params_tb = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params_t)
        params_db = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params_d)

        def fence(x):
            return np.asarray(x[..., :1])

        def timed(fn, *fargs):
            fence(fn(*fargs))  # warmup/compile
            ts = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                fence(fn(*fargs))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        @jax.jit
        def frontend(p, a):
            from openai_whisper_coreml_tpu.models.encoder import encode
            return encode(p, cfg, _mel(a, n_mels=cfg.n_mels))

        for b in [int(s) for s in args.time_batches.split(",") if s]:
            cls_b = [i % n_cls for i in range(b)]
            audio_b = jnp.asarray(np.stack(
                [_pt(tone_audio(c, seed=555 + i))
                 for i, c in enumerate(cls_b)]))
            init_b = jnp.asarray(np.tile(np.asarray([seq], np.int32),
                                         (b, 1)))
            t_front = timed(frontend, params_tb, audio_b)
            feats_b = frontend(params_tb, audio_b)
            feats_b.block_until_ready()

            def plain_run(f):
                return greedy_decode_core(
                    params_tb, cfg, f, init_b, suppress, blank,
                    jnp.float32(0.0), jax.random.PRNGKey(0), jnp.int32(-1),
                    jnp.int32(0), jnp.int32(sot_idx), sample_len=sample_len,
                    use_timestamps=False, prompt_len=prompt_len,
                    kv_dtype="int8", two_level=True)[0]

            t_plain = timed(plain_run, feats_b)
            rtfx_plain = b * 30.0 / (t_front + t_plain)
            audio_seconds = b * 30.0
            for k in [int(s) for s in args.ks.split(",") if s]:
                def spec_run(f, kk=k):
                    return spec_decode_core(
                        params_tb, params_db, cfg, cfg_d, f, f, init_b,
                        suppress, blank, jnp.int32(-1), jnp.int32(0),
                        jnp.int32(sot_idx), sample_len=sample_len,
                        use_timestamps=False, prompt_len=prompt_len,
                        spec_k=kk, kv_dtype="int8")[0]

                t_spec = timed(spec_run, feats_b)
                out_k = spec_decode_core(
                    params_tb, params_db, cfg, cfg_d, feats_b, feats_b,
                    init_b, suppress, blank, jnp.int32(-1), jnp.int32(0),
                    jnp.int32(sot_idx), sample_len=sample_len,
                    use_timestamps=False, prompt_len=prompt_len,
                    spec_k=k, kv_dtype="int8")
                st = spec_stats(np.asarray(out_k[2]), np.asarray(out_k[4]),
                                np.asarray(out_k[5]))
                rtfx_spec = audio_seconds / (t_front + t_spec)
                rec = {
                    "metric": "spec_trained_e2e",
                    "model": args.model,
                    "long": bool(args.long),
                    "batch": b,
                    "spec_k": k,
                    "sample_len": sample_len,
                    "frontend_s": round(t_front, 4),
                    "decode_plain_s": round(t_plain, 4),
                    "decode_spec_s": round(t_spec, 4),
                    "rtfx_plain_champion": round(rtfx_plain, 2),
                    "rtfx_spec": round(rtfx_spec, 2),
                    "speedup_e2e": round(rtfx_spec / rtfx_plain, 3),
                    "speedup_decode": round(t_plain / max(t_spec, 1e-9), 3),
                    "tokens_per_iter": round(st["tokens_per_iter"], 3),
                    "acceptance_rate": round(st["acceptance_rate"], 4),
                }
                print(json.dumps(rec), flush=True)
                out_f.write(json.dumps(rec) + "\n")
    out_f.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
