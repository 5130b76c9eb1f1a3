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


def data_iterator(utts, batch_size, cfg, tokenizer, seed=0, max_len=None,
                  skip=0):
    """Infinite shuffled batches of (mel, tokens, loss_mask).

    skip: replay (and discard) this many batch draws first, so a resumed
    run sees exactly the batches an uninterrupted run would have — the RNG
    advances without touching any audio.
    """
    import jax.numpy as jnp

    from openai_whisper_coreml_tpu.audio import log_mel_spectrogram, pad_or_trim
    from openai_whisper_coreml_tpu.config import N_SAMPLES
    from openai_whisper_coreml_tpu.train import make_batch
    from openai_whisper_coreml_tpu.utils.audio_io import load_audio

    rng = np.random.default_rng(seed)
    cache = {}
    for _ in range(skip):
        rng.choice(len(utts), size=batch_size, replace=len(utts) < batch_size)
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


def eval_batches(utts, batch_size, cfg, tokenizer, max_len=None):
    """Fixed, deterministic batches over the whole held-out set.

    The last chunk is padded to batch_size by cycling earlier utterances
    with their loss masks ZEROED, so padding contributes no tokens to the
    weighted metrics."""
    from openai_whisper_coreml_tpu.audio import log_mel_spectrogram, pad_or_trim
    from openai_whisper_coreml_tpu.config import N_SAMPLES
    from openai_whisper_coreml_tpu.train import make_batch
    from openai_whisper_coreml_tpu.utils.audio_io import load_audio

    def _mel(u):
        audio = pad_or_trim(load_audio(u.audio_path), N_SAMPLES)
        return np.asarray(log_mel_spectrogram(audio, n_mels=cfg.n_mels))

    batches = []
    for start in range(0, len(utts), batch_size):
        chunk = utts[start:start + batch_size]
        n_real = len(chunk)
        while len(chunk) < batch_size:  # cycle-pad the final chunk
            chunk = chunk + utts[: batch_size - len(chunk)]
        mel = np.stack([_mel(u) for u in chunk])
        mel, tokens, mask = make_batch(cfg, tokenizer, mel,
                                       [u.reference for u in chunk],
                                       max_len=max_len)
        mask[n_real:] = 0.0
        batches.append((mel, tokens, mask))
    return batches


def run_eval(eval_fn, params, batches):
    """Token-weighted loss/accuracy over fixed batches."""
    tot_loss = tot_acc = tot_tok = 0.0
    for mel, tokens, mask in batches:
        m = eval_fn(params, mel, tokens, mask)
        n = float(m["tokens"])
        tot_loss += float(m["loss"]) * n
        tot_acc += float(m["accuracy"]) * n
        tot_tok += n
    denom = max(tot_tok, 1.0)
    return tot_loss / denom, tot_acc / denom


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
    ap.add_argument("--save-state", default=None, metavar="DIR",
                    help="also write the FULL train state (params + "
                         "optimizer moments + step) to this orbax dir at "
                         "every --save-every interval and at the end, for "
                         "exact --resume")
    ap.add_argument("--resume", default=None, metavar="DIR",
                    help="restore a --save-state dir and continue: the LR "
                         "schedule position rides in the optimizer state, "
                         "the data stream fast-forwards to the saved step")
    ap.add_argument("--holdout", type=float, default=0.0,
                    help="fraction of utterances held out of training for "
                         "evaluation (deterministic split by --seed)")
    ap.add_argument("--eval-every", type=int, default=0,
                    help="evaluate token-weighted loss/accuracy on the "
                         "held-out set every N steps (and after the last "
                         "step); needs --holdout > 0")
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

    eval_utts = []
    if not 0.0 <= args.holdout < 1.0:
        raise SystemExit(f"--holdout must be in [0, 1), got {args.holdout}")
    if args.eval_every and args.holdout == 0.0:
        raise SystemExit("--eval-every needs --holdout > 0")
    if args.holdout > 0.0:
        order = np.random.default_rng(args.seed).permutation(len(utts))
        n_eval = max(1, int(round(len(utts) * args.holdout)))
        if n_eval >= len(utts):
            raise SystemExit(
                f"--holdout {args.holdout} leaves no training utterances "
                f"({len(utts)} total)")
        eval_utts = [utts[int(i)] for i in order[:n_eval]]
        utts = [utts[int(i)] for i in order[n_eval:]]
    print(f"{len(utts)} train / {len(eval_utts)} held-out utterances; "
          f"devices: {jax.device_count()} ({jax.default_backend()})")

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

    start_step = 0
    if args.resume:
        from openai_whisper_coreml_tpu.utils.checkpoint import (
            restore_train_state)

        template = {"params": params, "opt_state": opt_state,
                    "step": np.asarray(0, np.int64)}
        state = restore_train_state(args.resume, template)
        params, opt_state = state["params"], state["opt_state"]
        start_step = int(state["step"])
        print(f"resumed {args.resume} at step {start_step}")
        if start_step >= args.steps:
            print(f"nothing to do: saved step {start_step} >= "
                  f"--steps {args.steps}")

    eval_fn = None
    if args.eval_every:
        from openai_whisper_coreml_tpu.train import make_eval_step

        eval_fn = make_eval_step(cfg, mesh, TrainConfig(flash=args.flash))
        held_out = eval_batches(eval_utts, args.batch_size, cfg, tokenizer,
                                max_len=args.max_len)

    def _save_state(step):
        if not args.save_state:
            return
        from openai_whisper_coreml_tpu.utils.checkpoint import (
            save_train_state)

        save_train_state(args.save_state, jax.device_get(params),
                         opt_state=jax.device_get(opt_state), step=step)
        print(f"saved train state {args.save_state} (step {step})",
              flush=True)

    it = data_iterator(utts, args.batch_size, cfg, tokenizer, seed=args.seed,
                       max_len=args.max_len, skip=start_step)
    t0 = time.time()
    last_state_saved = start_step if args.resume else -1
    for step in range(start_step + 1, args.steps + 1):
        mel, tokens, mask = next(it)
        params, opt_state, metrics = step_fn(params, opt_state, mel, tokens,
                                             mask)
        if step % args.log_every == 0 or step == start_step + 1:
            loss = float(metrics["loss"])
            acc = float(metrics["accuracy"])
            rate = (step - start_step) / (time.time() - t0)
            print(f"step {step}: loss={loss:.4f} acc={acc:.3f} "
                  f"({rate:.2f} steps/s)", flush=True)
        if eval_fn and (step % args.eval_every == 0 or step == args.steps):
            eloss, eacc = run_eval(eval_fn, params, held_out)
            print(f"eval step {step}: loss={eloss:.4f} acc={eacc:.3f} "
                  f"({len(eval_utts)} utts)", flush=True)
        if args.save_every and step % args.save_every == 0:
            path = f"{args.output}-{step}.safetensors"
            save_params(jax.device_get(params), path, model_name=cfg.name)
            print(f"saved {path}", flush=True)
            _save_state(step)
            last_state_saved = step
    if args.steps > last_state_saved:
        _save_state(args.steps)

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
