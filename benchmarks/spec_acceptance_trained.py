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
from int8_agreement_trained import PHRASES, tone_audio  # noqa: E402


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
    args = ap.parse_args()

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
    out_f.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
