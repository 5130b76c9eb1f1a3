#!/usr/bin/env python
"""On-chip sanity row: shard_map-wrapped flash attention on a 1-device mesh.

Round-3 change: flash+mesh is allowed (ops/flash_attention.flash_attention_auto
wraps the kernel in shard_map over (batch='data', heads='model')). The CPU
tests prove 8-virtual-device parity; this probe proves the wrapper costs
nothing REAL on hardware: encoder forward with
  a) flash kernel, no mesh (round-2 fast path)
  b) flash kernel through shard_map on a (1,1) mesh (the TP code path)
  c) jnp attention (oracle)
must agree numerically, and (b) must match (a)'s speed.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openai_whisper_coreml_tpu.utils.platform import sync_platform_from_env

sync_platform_from_env()


def main() -> int:
    import functools

    import jax
    import jax.numpy as jnp

    import openai_whisper_coreml_tpu as wt
    from openai_whisper_coreml_tpu.models import encoder as enc_mod
    from openai_whisper_coreml_tpu.parallel import make_mesh

    model_name = os.environ.get("FLASH_MODEL", "large-v3")
    batch = int(os.environ.get("FLASH_BATCH", "8"))
    model = wt.load_model(model_name, flash=False)
    cfg = model.cfg

    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal(
        (batch, cfg.n_mels, 2 * cfg.n_audio_ctx)) * 0.5, jnp.float32)

    def timed(name, fn, *xs):
        out = fn(*xs)
        np.asarray(out[:1, :1, :1])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*xs)
            np.asarray(out[:1, :1, :1])
            ts.append(time.perf_counter() - t0)
        print(json.dumps({"impl": name, "ms": round(1e3 * min(ts), 2)}),
              flush=True)
        return out

    jnp_fwd = jax.jit(functools.partial(enc_mod.encode, cfg=cfg, flash=False))
    flash_fwd = jax.jit(functools.partial(enc_mod.encode, cfg=cfg, flash=True))

    ref = timed("jnp", jnp_fwd, model.params, mel)
    fast = timed("flash_no_mesh", flash_fwd, model.params, mel)

    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    with jax.set_mesh(mesh):
        sharded = timed("flash_shard_map_tp1",
                        jax.jit(functools.partial(enc_mod.encode, cfg=cfg,
                                                  flash=True)),
                        model.params, mel)

    e_fast = float(jnp.max(jnp.abs(fast.astype(jnp.float32)
                                   - ref.astype(jnp.float32))))
    e_sh = float(jnp.max(jnp.abs(sharded.astype(jnp.float32)
                                 - fast.astype(jnp.float32))))
    print(json.dumps({"max_err_flash_vs_jnp": e_fast,
                      "max_err_shardmap_vs_flash": e_sh}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
