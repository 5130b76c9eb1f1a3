#!/bin/bash
# Round-4 on-chip queue, second pass: the spec-decoding kinetics that
# failed in r4b (stale file without the sys.path fix), plus the steps that
# crashed (arrivals OOM -> calibrated workload + pool release; components
# decode row -> int8 cross-KV; finetune -> fp32 master params) and the
# round-3 conditioned multi-stream latency debt.
#
#   bash benchmarks/tpu_queue_r4c.sh 2>&1 | tee /tmp/tpu_queue_r4c.log
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

step "[1] spec verify-cost probe (T sweep, B24)" \
  env SPEC_PROBE_ONLY=1 python benchmarks/spec_bench.py

step "[2] spec kinetics K=4 B24 (turbo draft, acceptance floor)" \
  env SPEC_SKIP_PROBE=1 SPEC_K=4 python benchmarks/spec_bench.py

step "[3] spec kinetics K=8 B24" \
  env SPEC_SKIP_PROBE=1 SPEC_K=8 python benchmarks/spec_bench.py

step "[4] spec acceptance on trained tiny pair (K=2,4,8)" \
  python benchmarks/spec_acceptance_trained.py --steps 300 --draft-steps 300

step "[5] open-loop arrivals: CB vs static (B24, loads 3/6/9 rps)" \
  python benchmarks/serving_arrivals.py --requests 96 --batch-size 24

step "[6] component decode row at B48 (int8 cross-KV, production geometry)" \
  python benchmarks/components.py --batch 48 --kv-dtype int8

step "[7] spec kinetics at B48 (champion batch; may OOM with two cross-KVs)" \
  env SPEC_SKIP_PROBE=1 SPEC_K=4 SPEC_BATCH=48 python benchmarks/spec_bench.py

step "[8] conditioned multi-stream latency (round-3 debt; stream.py now conditions)" \
  python benchmarks/streaming_latency.py --models large-v3 --streams 4

step "[9] finetune holdout-eval + exact resume on chip (tiny, 2+1 steps)" \
  bash -c '
    rm -rf /tmp/q6 && mkdir -p /tmp/q6/corpus && python - <<PYEOF
import numpy as np
from openai_whisper_coreml_tpu.utils import audio_io
rng = np.random.default_rng(0)
for i in range(4):
    t = np.arange(16000) / 16000
    x = (0.2*np.sin(2*np.pi*(160+30*i)*t)
         + 0.01*rng.standard_normal(t.shape)).astype(np.float32)
    audio_io.save_wav(f"/tmp/q6/corpus/u{i}.wav", x, 16000)
    open(f"/tmp/q6/corpus/u{i}.txt", "w").write(f"utterance number {i}")
PYEOF
    python tools/finetune.py /tmp/q6/corpus --model tiny --steps 2 \
      --batch-size 2 --max-len 12 --log-every 1 --schedule cosine \
      --warmup-steps 1 --holdout 0.25 --eval-every 2 \
      --save-state /tmp/q6/state --output /tmp/q6/ft \
    && python tools/finetune.py /tmp/q6/corpus --model tiny --steps 3 \
      --batch-size 2 --max-len 12 --log-every 1 --schedule cosine \
      --warmup-steps 1 --holdout 0.25 --eval-every 2 \
      --save-state /tmp/q6/state --resume /tmp/q6/state --output /tmp/q6/ft'

echo "=== queue r4c complete ==="
