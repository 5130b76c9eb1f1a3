#!/usr/bin/env python
"""On-chip speculative-decoding benchmark (round-4: break the M=1 floor).

Three measurements, one JSON line each:

  A. verify-cost probe: per-row multi-token decode_step at T in {1,2,4,8}
     over a fixed cache geometry — the ingest math. If the chain is
     MXU-ingest-bound (benchmarks/int8_mxu_probe.py), a T-token step costs
     ~the same as a 1-token step and per-token cost divides by T.
  B. spec decode kinetics: full spec_decode_core with a REAL draft model at
     two horizons; the two-point fit separates per-iteration cost C_iter
     from the fixed setup (cross-KV precompute + prefill). Random weights
     give the acceptance FLOOR (alpha ~ 0: every iteration commits ~1
     token) — the measured worst case.
  C. derived RTFx(alpha) table from the measured C_iter/setup/mel+encode
     times: tokens/iteration at per-token acceptance alpha is the truncated
     geometric sum E = (1 - alpha^(K+1)) / (1 - alpha). Acceptance itself is
     a property of the checkpoint pair (real weights are not shippable in
     this image); the REAL acceptance measurement on trained weights lives
     in benchmarks/spec_acceptance_trained.py.

Env: SPEC_MODEL (large-v3), SPEC_DRAFT (large-v3-turbo), SPEC_BATCH (24),
SPEC_K (4) or SPEC_KS (comma list — one process, models loaded once),
SPEC_SAMPLE_LEN (224), SPEC_QUANTIZE (int8), SPEC_KV (int8),
SPEC_SKIP_PROBE / SPEC_PROBE_ONLY, SPEC_REPEATS (3), SPEC_TEMPERATURE
(>0 measures the round-5 REJECTION-SAMPLING iteration — the t>0 ladder
rungs' kinetics; baselines then sample at the same temperature),
SPEC_NO_BASELINE
(skip the flat/two-level baseline decodes — the round-5 B48 retry: the
round-4 "two cross-KV pools exceed HBM" negative was recorded from a
process that ALSO allocated the baselines' caches; spec alone may fit).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from openai_whisper_coreml_tpu.utils.platform import sync_platform_from_env
    sync_platform_from_env()

    import jax
    import jax.numpy as jnp

    import openai_whisper_coreml_tpu as wt
    from openai_whisper_coreml_tpu.audio import log_mel_spectrogram
    from openai_whisper_coreml_tpu.decoding import (
        DecodingOptions,
        build_blank_mask,
        build_suppress_mask,
        greedy_decode_core,
    )
    from openai_whisper_coreml_tpu.models import decoder as dec_mod
    from openai_whisper_coreml_tpu.speculative import spec_decode_core
    from openai_whisper_coreml_tpu.tokenizer import get_tokenizer

    model_name = os.environ.get("SPEC_MODEL", "large-v3")
    draft_name = os.environ.get("SPEC_DRAFT", "large-v3-turbo")
    batch = int(os.environ.get("SPEC_BATCH", "24"))
    ks = [int(k) for k in os.environ.get(
        "SPEC_KS", os.environ.get("SPEC_K", "4")).split(",")]
    no_baseline = bool(os.environ.get("SPEC_NO_BASELINE"))
    temp = float(os.environ.get("SPEC_TEMPERATURE", "0") or 0)
    sample_len = int(os.environ.get("SPEC_SAMPLE_LEN", "224"))
    quantize = os.environ.get("SPEC_QUANTIZE", "int8") or None
    kv_dtype = os.environ.get("SPEC_KV", "int8")
    repeats = int(os.environ.get("SPEC_REPEATS", "3"))

    model = wt.load_model(model_name, quantize=quantize)
    cfg = model.cfg

    def fence(x):
        # slice ON DEVICE first: np.asarray(x)[...] would pull the whole
        # array through the relay (the B24 feats are ~184 MB ~= 4 s of
        # tunnel bandwidth, which masqueraded as frontend compute time)
        return np.asarray(x[..., :1])

    def timed(fn, *args):
        fence(fn(*args))  # warmup/compile
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            fence(fn(*args))
            times.append(time.perf_counter() - t0)
        return min(times)

    rng = np.random.default_rng(0)

    # ---- A. multi-token verify probe ---------------------------------------
    if not os.environ.get("SPEC_SKIP_PROBE"):
        feats_p = jnp.asarray(
            (rng.standard_normal((batch, cfg.n_audio_ctx, cfg.n_audio_state))
             * 0.05).astype(np.float32), jnp.bfloat16)
        steps = 16

        import functools

        @functools.partial(jax.jit,
                           static_argnames=("cfg", "t", "steps", "kv"))
        def chain(params, cfg, feats, *, t, steps, kv):
            b = feats.shape[0]
            if kv == "int8":
                cross = dec_mod.precompute_cross_kv_int8(params, cfg, feats)
            else:
                cross = dec_mod.precompute_cross_kv(params, cfg, feats)
            cache = dec_mod.init_kv_cache(cfg, b, dtype=feats.dtype, ctx=256)
            toks = jnp.zeros((b, t), jnp.int32)
            pos0 = jnp.zeros((b,), jnp.int32)  # per-row: the spec geometry

            def body(carry, _):
                cache, pos = carry
                logits, cache = dec_mod.decode_step(
                    params, cfg, toks, cross, cache, pos, valid_from=0)
                return (cache, pos + t), logits[:, -1, 0]

            (_, _), ys = jax.lax.scan(body, (cache, pos0), None, length=steps)
            return ys

        probe = {}
        for t in (1, 2, 4, 8):
            wall = timed(lambda p, f, tt=t: chain(
                p, cfg, f, t=tt, steps=steps, kv=kv_dtype),
                model.params, feats_p)
            # subtract nothing: the cross-KV precompute is shared per call;
            # report ms/step and ms/token as-is (steps dominate at 16)
            probe[f"T{t}"] = {
                "ms_per_step": round(wall / steps * 1e3, 3),
                "ms_per_token": round(wall / (steps * t) * 1e3, 3),
            }
        print(json.dumps({
            "metric": f"spec_verify_probe_{model_name.replace('-', '_')}"
                      f"_b{batch}",
            "unit": "ms",
            "kv_dtype": kv_dtype,
            "steps": steps,
            "value": probe["T4"]["ms_per_token"],
            "detail": probe,
        }))
        if os.environ.get("SPEC_PROBE_ONLY"):
            return

    # ---- B. spec decode kinetics (real draft, acceptance floor) ------------
    draft = wt.load_model(draft_name, quantize=quantize, seed=1)
    from openai_whisper_coreml_tpu.speculative import check_pair
    check_pair(cfg, draft.cfg)

    tok = get_tokenizer(cfg, language="en")
    opts = DecodingOptions(language="en")
    suppress = jnp.asarray(build_suppress_mask(tok, opts))
    blank = jnp.asarray(build_blank_mask(tok))
    initial = np.tile(
        np.asarray([[tok.eot, tok.sot, tok.language_token("en"),
                     tok.transcribe]], np.int32), (batch, 1))
    prompt_len = initial.shape[1]
    initial_dev = jnp.asarray(initial)

    audio = (rng.standard_normal((batch, 480_000)) * 0.1).astype(np.float32)
    audio_dev = jax.device_put(jnp.asarray(audio))

    # ONE jit for mel+encode, params as an ARGUMENT (closing over them
    # embeds multi-GB constants — relay crash; CLAUDE.md). The first cut of
    # this bench ran log_mel un-jitted: ~9.5 s of 30 ms relay dispatches
    # that poisoned every derived RTFx number.
    @jax.jit
    def frontend(p, a):
        mel = log_mel_spectrogram(a, n_mels=cfg.n_mels)
        from openai_whisper_coreml_tpu.models import encoder as enc_mod
        return enc_mod.encode(p, cfg, mel)

    t_front = timed(frontend, model.params, audio_dev)
    feats = frontend(model.params, audio_dev)
    feats.block_until_ready()

    sampled = temp > 0

    def spec_core(f, sl, k):
        return spec_decode_core(
            model.params, draft.params, cfg, draft.cfg, f, f,
            initial_dev, suppress, blank, jnp.int32(50), jnp.int32(1),
            jnp.int32(1),
            jnp.float32(temp) if sampled else None,
            jax.random.PRNGKey(0) if sampled else None,
            sample_len=sl, use_timestamps=True,
            prompt_len=prompt_len, spec_k=k, kv_dtype=kv_dtype,
            sampled=sampled)

    def spec_run(f, sl, k):
        return spec_core(f, sl, k)[0]

    def flat_run(f, sl, two_level=False):
        return greedy_decode_core(
            model.params, cfg, f, initial_dev, suppress, blank,
            jnp.float32(temp), jax.random.PRNGKey(0), jnp.int32(50),
            jnp.int32(1), jnp.int32(1), sample_len=sl, use_timestamps=True,
            prompt_len=prompt_len, kv_dtype=kv_dtype,
            two_level=two_level)[0]

    audio_seconds = batch * 30.0

    # baselines are K-independent: measured once per process
    c_tok_flat = c_tok_champ = rtfx_flat = rtfx_champ = None
    base_short = 32
    if not no_baseline:
        t_flat = timed(lambda f: flat_run(f, sample_len), feats)
        t_flat_short = timed(lambda f: flat_run(f, base_short), feats)
        c_tok_flat = (t_flat - t_flat_short) / (sample_len - base_short)
        # the PRODUCTION baseline is two-level lockstep (the bench champion)
        # — break-even against it is the bar speculative decode must clear
        t_champ = timed(
            lambda f: flat_run(f, sample_len, two_level=True), feats)
        t_champ_short = timed(
            lambda f: flat_run(f, base_short, two_level=True), feats)
        c_tok_champ = (t_champ - t_champ_short) / (sample_len - base_short)
        rtfx_flat = audio_seconds / (t_front + t_flat)
        rtfx_champ = audio_seconds / (t_front + t_champ)

    for spec_k in ks:
        # two horizons separate setup (cross-KV + prefill) from per-iter cost
        short_len = max(32, spec_k + 2)
        t_short = timed(lambda f: spec_run(f, short_len, spec_k), feats)
        t_full = timed(lambda f: spec_run(f, sample_len, spec_k), feats)
        # iteration counts from an actual run (device arrays -> host)
        out = spec_core(feats, sample_len, spec_k)
        n_sampled = np.asarray(out[2])
        iters_full = int(np.max(np.asarray(out[4])))
        out_s = spec_core(feats, short_len, spec_k)
        iters_short = int(np.max(np.asarray(out_s[4])))

        c_iter = (t_full - t_short) / max(iters_full - iters_short, 1)
        t_setup = t_full - iters_full * c_iter

        tokens_per_iter = float(np.sum(n_sampled)) / max(
            float(np.sum(np.asarray(out[4]))), 1.0)
        rtfx_floor = audio_seconds / (t_front + t_full)

        # ---- C. derived RTFx(alpha) -----------------------------------------
        derived = {}
        for alpha in (0.5, 0.7, 0.8, 0.9, 1.0):
            if alpha >= 1.0:
                e = spec_k + 1.0
            else:
                e = (1 - alpha ** (spec_k + 1)) / (1 - alpha)
            iters = int(np.ceil(sample_len / e))
            t_dec = t_setup + iters * c_iter
            derived[f"alpha_{alpha}"] = {
                "tokens_per_iter": round(e, 2),
                "rtfx": round(audio_seconds / (t_front + t_dec), 1),
            }

        detail = {
            "alpha_floor_random_weights": {
                "tokens_per_iter": round(tokens_per_iter, 3),
                "rtfx": round(rtfx_floor, 2),
            },
            "ms_per_iteration": round(c_iter * 1e3, 2),
            "setup_s": round(t_setup, 3),
            "frontend_s": round(t_front, 3),
            "derived_rtfx_by_acceptance": derived,
        }
        if not no_baseline:
            detail.update({
                "flat_greedy_same_geometry_rtfx": round(rtfx_flat, 2),
                "two_level_champion_rtfx": round(rtfx_champ, 2),
                "ms_per_token_flat": round(c_tok_flat * 1e3, 2),
                "ms_per_token_two_level": round(c_tok_champ * 1e3, 2),
                "break_even_tokens_per_iter_vs_flat": round(
                    c_iter / max(c_tok_flat, 1e-9), 2),
                "break_even_tokens_per_iter_vs_champion": round(
                    c_iter / max(c_tok_champ, 1e-9), 2),
            })
        print(json.dumps({
            "metric": f"spec_decode_{model_name.replace('-', '_')}"
                      f"_draft_{draft_name.replace('-', '_')}"
                      f"_b{batch}_k{spec_k}"
                      + (f"_t{temp}" if sampled else ""),
            "unit": "audio_sec/sec/chip",
            "value": round(rtfx_floor, 2),
            "vs_baseline": round(rtfx_floor / 150.0, 3),
            "detail": detail,
        }), flush=True)


if __name__ == "__main__":
    main()
