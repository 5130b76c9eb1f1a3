#!/bin/bash
# Round-4 on-chip queue, fourth pass: spec kinetics at B24 re-measured with
# the device-side fence (r4d steps 1-2 pulled the full feats array through
# the relay — ~4.3 s masquerading as frontend compute), plus an end-to-end
# serving smoke with the draft attached (transcribe_batch static greedy,
# the path production actually runs).
#
#   bash benchmarks/tpu_queue_r4e.sh 2>&1 | tee /tmp/tpu_queue_r4e.log
set -u
cd "$(dirname "$0")/.."

probe() {
  python - <<'EOF'
import time, jax, jax.numpy as jnp
t0 = time.time()
(jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()
print(f"probe ok in {time.time()-t0:.1f}s")
EOF
}

step() {
  local label="$1"; shift
  echo "=== ${label}: probe ==="
  if ! probe; then
    echo "=== ${label}: PROBE FAILED — leaving the tunnel alone ==="
    exit 1
  fi
  echo "=== ${label} ==="
  "$@" || echo "=== ${label}: step failed (continuing) ==="
}

step "[1] spec kinetics K=4 B24 (device-side fence)" \
  env SPEC_SKIP_PROBE=1 SPEC_K=4 python benchmarks/spec_bench.py

step "[2] spec kinetics K=8 B24 (device-side fence)" \
  env SPEC_SKIP_PROBE=1 SPEC_K=8 python benchmarks/spec_bench.py

step "[3] serving smoke with draft attached (large-v3 + turbo, B8, greedy)" \
  python - <<'EOF'
import dataclasses, json, time
import numpy as np
import openai_whisper_coreml_tpu as wt
from openai_whisper_coreml_tpu.serve import ServeOptions, transcribe_batch
from openai_whisper_coreml_tpu.speculative import check_pair

model = wt.load_model("large-v3", quantize="int8")
draft = wt.load_model("large-v3-turbo", quantize="int8", seed=1)
check_pair(model.cfg, draft.cfg)
rng = np.random.default_rng(0)
audios = [(0.1 * rng.standard_normal(16000 * 30)).astype(np.float32)
          for _ in range(8)]
opts = ServeOptions(scheduler="static", batch_size=8, language="en",
                    temperature=(0.0,), sample_len=64, kv_dtype="int8",
                    spec_k=4, no_speech_threshold=None,
                    logprob_threshold=None,
                    compression_ratio_threshold=None)
plain = transcribe_batch(model, audios, opts)          # compile + baseline
t0 = time.perf_counter(); plain = transcribe_batch(model, audios, opts)
t_plain = time.perf_counter() - t0
spec_model = dataclasses.replace(model, draft=draft)
spec = transcribe_batch(spec_model, audios, opts)      # compile
t0 = time.perf_counter(); spec = transcribe_batch(spec_model, audios, opts)
t_spec = time.perf_counter() - t0
toks = lambda rs: [[t for s in r["segments"] for t in s["tokens"]]
                   for r in rs]
from openai_whisper_coreml_tpu import speculative
print(json.dumps({
    "metric": "serve_spec_smoke_large_v3_b8",
    "token_exact": toks(plain) == toks(spec),
    "wall_plain_s": round(t_plain, 2),
    "wall_spec_s": round(t_spec, 2),
    "rtfx_plain": round(240.0 / t_plain, 1),
    "rtfx_spec": round(240.0 / t_spec, 1),
    "last_stats": speculative.LAST_STATS,
}))
EOF

echo "=== queue r4e complete ==="
