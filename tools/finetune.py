#!/usr/bin/env python
"""Fine-tune Whisper on a local (audio, transcript) corpus.

Corpus layouts: the same ones eval/harness.py discovers (flat <name>.wav +
<name>.txt pairs, or LibriSpeech trees). Training runs the sharded train step
from openai_whisper_coreml_tpu.train over a (data, model) mesh and
checkpoints via safetensors (+ optional orbax full train state).

Usage:
  python tools/finetune.py /data/corpus --model tiny --steps 100 \
      --batch-size 8 --mesh-model 1 --save-every 50 --output ckpts/ft
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def data_iterator(utts, batch_size, cfg, tokenizer, seed=0, max_len=None):
    """Infinite shuffled batches of (mel, tokens, loss_mask)."""
    import jax.numpy as jnp

    from openai_whisper_coreml_tpu.audio import log_mel_spectrogram, pad_or_trim
    from openai_whisper_coreml_tpu.config import N_SAMPLES
    from openai_whisper_coreml_tpu.train import make_batch
    from openai_whisper_coreml_tpu.utils.audio_io import load_audio

    rng = np.random.default_rng(seed)
    cache = {}
    while True:
        idx = rng.choice(len(utts), size=batch_size, replace=len(utts) < batch_size)
        mels, texts = [], []
        for i in idx:
            u = utts[int(i)]
            if u.utt_id not in cache:
                audio = pad_or_trim(load_audio(u.audio_path), N_SAMPLES)
                cache[u.utt_id] = np.asarray(
                    log_mel_spectrogram(audio, n_mels=cfg.n_mels))
            mels.append(cache[u.utt_id])
            texts.append(u.reference)
        mel = np.stack(mels)
        mel, tokens, mask = make_batch(cfg, tokenizer, mel, texts,
                                       max_len=max_len)
        yield jnp.asarray(mel), jnp.asarray(tokens), jnp.asarray(mask)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("corpus")
    ap.add_argument("--model", default="tiny")
    ap.add_argument("--checkpoint", default=None, help="starting checkpoint")
    ap.add_argument("--output", default="ckpts/finetuned")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--learning-rate", type=float, default=1e-5)
    ap.add_argument("--schedule", choices=("constant", "linear", "cosine"),
                    default="constant",
                    help="LR schedule (decay horizon = --steps, in "
                         "optimizer updates)")
    ap.add_argument("--warmup-steps", type=int, default=0,
                    help="linear 0 -> lr warmup before the schedule")
    ap.add_argument("--accum-steps", type=int, default=1,
                    help="gradient accumulation: micro-batches per "
                         "optimizer update (effective batch = "
                         "batch-size * accum-steps)")
    ap.add_argument("--mesh-model", type=int, default=1,
                    help="TP degree (data axis gets the rest)")
    ap.add_argument("--max-len", type=int, default=None,
                    help="token sequence cap (default: longest in batch)")
    ap.add_argument("--save-every", type=int, default=0)
    ap.add_argument("--lora-rank", type=int, default=0,
                    help="train LoRA adapters of this rank instead of the "
                         "full model (0 = full fine-tune); composes with "
                         "int8-quantized bases and TP meshes")
    ap.add_argument("--lora-alpha", type=float, default=16.0)
    ap.add_argument("--lora-targets", default=None,
                    help="regex over linear paths (default: attention q/v)")
    ap.add_argument("--no-merge-lora", action="store_true",
                    help="save the final checkpoint with adapters separate "
                         "instead of merged into the base weights")
    ap.add_argument("--trainable", default=None,
                    help="regex over param paths to fine-tune selectively "
                         "(e.g. '^decoder', 'ln|bias'); frozen leaves "
                         "allocate no optimizer state")
    ap.add_argument("--flash", action="store_true",
                    help="Pallas flash attention in the encoder forward "
                         "(backward uses the reference recompute VJP)")
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from openai_whisper_coreml_tpu.utils.platform import sync_platform_from_env

    sync_platform_from_env()

    import jax

    from openai_whisper_coreml_tpu import load_model
    from openai_whisper_coreml_tpu.eval.harness import discover
    from openai_whisper_coreml_tpu.parallel import make_mesh
    from openai_whisper_coreml_tpu.tokenizer import get_tokenizer
    from openai_whisper_coreml_tpu.train import TrainConfig, make_train_step
    from openai_whisper_coreml_tpu.utils.checkpoint import save_params

    utts = discover(args.corpus)
    if not utts:
        raise SystemExit(f"no training utterances under {args.corpus}")
    print(f"{len(utts)} utterances; devices: {jax.device_count()} "
          f"({jax.default_backend()})")

    model = load_model(args.model, checkpoint=args.checkpoint, flash=False)
    cfg = model.cfg
    tokenizer = get_tokenizer(cfg, language="en" if cfg.multilingual else None)

    start_params = model.params
    trainable = args.trainable
    if args.lora_rank > 0:
        from openai_whisper_coreml_tpu.lora import add_lora, count_lora_params

        lora_kw = {"rank": args.lora_rank, "alpha": args.lora_alpha}
        if args.lora_targets:
            lora_kw["targets"] = args.lora_targets
        start_params = add_lora(start_params, **lora_kw)
        trainable = trainable or "lora_"
        print(f"LoRA rank {args.lora_rank}: "
              f"{count_lora_params(start_params)/1e6:.2f}M trainable "
              f"adapter params")

    mesh = make_mesh(n_model=args.mesh_model)
    n_data = mesh.shape["data"]
    if args.batch_size % n_data:
        rounded = -(-args.batch_size // n_data) * n_data
        print(f"batch size {args.batch_size} -> {rounded} "
              f"(the {n_data}-way data axis shards dimension 0)")
        args.batch_size = rounded
    # --steps counts micro-batches; decaying schedules run over optimizer
    # updates, which gradient accumulation divides by accum_steps
    total_updates = max(1, args.steps // args.accum_steps)
    init_fn, step_fn = make_train_step(
        cfg, mesh, TrainConfig(
            learning_rate=args.learning_rate,
            schedule=args.schedule, warmup_steps=args.warmup_steps,
            total_steps=(total_updates
                         if args.schedule != "constant" else None),
            accum_steps=args.accum_steps,
            trainable=trainable, flash=args.flash))
    params, opt_state = init_fn(start_params)

    it = data_iterator(utts, args.batch_size, cfg, tokenizer, seed=args.seed,
                       max_len=args.max_len)
    t0 = time.time()
    for step in range(1, args.steps + 1):
        mel, tokens, mask = next(it)
        params, opt_state, metrics = step_fn(params, opt_state, mel, tokens,
                                             mask)
        if step % args.log_every == 0 or step == 1:
            loss = float(metrics["loss"])
            acc = float(metrics["accuracy"])
            rate = step / (time.time() - t0)
            print(f"step {step}: loss={loss:.4f} acc={acc:.3f} "
                  f"({rate:.2f} steps/s)", flush=True)
        if args.save_every and step % args.save_every == 0:
            path = f"{args.output}-{step}.safetensors"
            save_params(jax.device_get(params), path, model_name=cfg.name)
            print(f"saved {path}", flush=True)

    final = jax.device_get(params)
    if args.lora_rank > 0 and not args.no_merge_lora:
        from openai_whisper_coreml_tpu.lora import merge_lora

        final = merge_lora(final)
        print("merged LoRA adapters into base weights")
    path = f"{args.output}-final.safetensors"
    save_params(final, path, model_name=cfg.name)
    print(f"saved {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
