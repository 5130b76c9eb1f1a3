#!/usr/bin/env python
"""Encoder sublayer attribution at the champion geometry (round-5 verdict
#7: encoder is ~25% of B48 champion wall and becomes the binding stage the
moment speculative decoding lands a real headline; components.py only
splits whole stages).

Times, device-fenced, at BATCH x 1500 x n_state:
  * full encode (conv stem + 32 blocks + ln_post) — the production path;
  * conv stem alone (conv1 + gelu + conv2 + gelu + positional add);
  * the attention-sublayer chain (x += attn(ln(x)), scanned over the real
    stacked layer weights — serial like production);
  * the MLP-sublayer chain (x += mlp(ln(x)), same);
and prints the share each takes of the measured full pass plus the
sum-vs-full overlap check (step_ablation.py's convention for decode).

Env: ENC_MODEL (large-v3), ENC_BATCH (48), ENC_QUANTIZE (int8 — champion),
ENC_FLASH (1), ENC_REPEATS (3).
"""

from __future__ import annotations

import functools
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
    from openai_whisper_coreml_tpu.models.encoder import _conv1d, encode
    from openai_whisper_coreml_tpu.models.layers import (
        gelu, layer_norm, mlp, self_attention, sinusoids)

    model_name = os.environ.get("ENC_MODEL", "large-v3")
    batch = int(os.environ.get("ENC_BATCH", "48"))
    quantize = os.environ.get("ENC_QUANTIZE", "int8") or None
    flash = os.environ.get("ENC_FLASH", "1") not in ("", "0")
    repeats = int(os.environ.get("ENC_REPEATS", "3"))

    model = wt.load_model(model_name, quantize=quantize)
    cfg = model.cfg
    n_head = cfg.n_audio_head

    rng = np.random.default_rng(0)
    mel = jnp.asarray((rng.standard_normal(
        (batch, cfg.n_mels, 3000)) * 0.3).astype(np.float32))
    feats_like = jnp.asarray((rng.standard_normal(
        (batch, cfg.n_audio_ctx, cfg.n_audio_state)) * 0.05
    ).astype(np.float32), jnp.bfloat16)

    def fence(x):
        return np.asarray(x[..., :1])

    def timed(fn, *args):
        fence(fn(*args))  # warmup/compile
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            fence(fn(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    @jax.jit
    def full(p, m):
        return encode(p, cfg, m, flash=flash)

    @jax.jit
    def stem(p, m):
        enc = p["encoder"]
        dt = enc["conv1"]["w"].dtype
        x = m.astype(dt)
        x = gelu(_conv1d(x, enc["conv1"], stride=1))
        x = gelu(_conv1d(x, enc["conv2"], stride=2))
        x = jnp.swapaxes(x, 1, 2)
        pos = sinusoids(cfg.n_audio_ctx, cfg.n_audio_state).astype(dt)
        return x + pos[None]

    @functools.partial(jax.jit, static_argnames=("which",))
    def chain(p, x, *, which):
        enc = p["encoder"]

        def body(carry, lp):
            if which == "attn":
                carry = carry + self_attention(
                    layer_norm(carry, lp["attn_ln"]), lp["attn"], n_head,
                    flash=flash)
            elif which == "attn_skipcore":
                # the attention sublayer with the QK/AV core REPLACED BY
                # IDENTITY: all four projections, LN, split/merge and the
                # residual still run (0*k + 0*v keeps the k/v matmuls from
                # being dead-code-eliminated — elementwise, ~free), so
                # t_attn - t_skipcore isolates the flash kernel IN SITU
                # (with XLA's real overlap) instead of in an isolated probe
                from openai_whisper_coreml_tpu.models.layers import (
                    linear, merge_heads, split_heads)

                h = layer_norm(carry, lp["attn_ln"])
                ap = lp["attn"]
                q = split_heads(linear(h, ap["q"]), n_head)
                k = split_heads(linear(h, ap["k"]), n_head)
                v = split_heads(linear(h, ap["v"]), n_head)
                out = q + 0.0 * k + 0.0 * v
                carry = carry + linear(merge_heads(out), ap["out"])
            else:
                carry = carry + mlp(layer_norm(carry, lp["mlp_ln"]),
                                    lp["mlp"])
            return carry, None

        out, _ = jax.lax.scan(body, x, enc["blocks"])
        return out

    t_full = timed(full, model.params, mel)
    t_stem = timed(stem, model.params, mel)
    t_attn = timed(lambda p, x: chain(p, x, which="attn"),
                   model.params, feats_like)
    t_skip = timed(lambda p, x: chain(p, x, which="attn_skipcore"),
                   model.params, feats_like)
    t_mlp = timed(lambda p, x: chain(p, x, which="mlp"),
                  model.params, feats_like)

    t_sum = t_stem + t_attn + t_mlp
    print(json.dumps({
        "metric": f"encoder_attrib_{model_name.replace('-', '_')}_b{batch}",
        "unit": "s",
        "value": round(t_full, 4),
        "flash": flash,
        "detail": {
            "full_s": round(t_full, 4),
            "conv_stem_s": round(t_stem, 4),
            "attention_chain_s": round(t_attn, 4),
            "attention_proj_glue_s": round(t_skip, 4),
            "attention_core_in_situ_s": round(t_attn - t_skip, 4),
            "mlp_chain_s": round(t_mlp, 4),
            "sum_vs_full": round(t_sum / max(t_full, 1e-9), 3),
            "share_of_full": {
                "conv_stem": round(t_stem / t_full, 3),
                "attention": round(t_attn / t_full, 3),
                "mlp": round(t_mlp / t_full, 3),
            },
        },
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
