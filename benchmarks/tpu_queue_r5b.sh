#!/bin/bash
# Round-5 on-chip queue B: the measured-headline work that round 4 left
# derived or unmeasured (VERDICT.md items 1, 5, 7) plus champion anchors.
# Probe-gated; ONE sequential TPU process at a time (CLAUDE.md relay rules).
#
#   bash benchmarks/tpu_queue_r5b.sh 2>&1 | tee /tmp/tpu_queue_r5b.log
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

step "[1] champion reconfirm (B48 w64 int8 single-pass flash)" \
  python bench.py

step "[2] bq1536 single-pass flash through the REAL champion bench" \
  env WHISPER_TPU_FLASH_BLOCK_Q=1536 python bench.py

step "[3] trained-pair MEASURED end-to-end: plain champion vs spec (long corpus)" \
  python benchmarks/spec_acceptance_trained.py --long --steps 800 \
    --draft-steps 800 --batch 8 --ks 4,8 --time-batches 8,16,24,32 \
    --target-loss 0.02 --out /tmp/spec_trained_e2e.jsonl

step "[4] encoder sublayer attribution at the champion batch" \
  env ENC_BATCH=48 python benchmarks/encoder_attrib.py

step "[5] batched word-timestamp alignment throughput (B1/8/24)" \
  python benchmarks/wordts_bench.py

step "[6] conditioned multi-stream at 8 streams (round-4 ran only 4)" \
  python benchmarks/streaming_latency.py --models large-v3 --streams 8

step "[7] beam + word-timestamps combined row (medium B8 champion int8)" \
  python benchmarks/beam_bench.py

step "[8] reproducible spec floor row via bench.py (BENCH_SPEC=1, B24)" \
  env BENCH_SPEC=1 BENCH_BATCH=24 python bench.py

step "[9] sampled-spec kinetics (rejection-sampling rung, B24 K4 t0.7)" \
  env SPEC_SKIP_PROBE=1 SPEC_KS=4 SPEC_BATCH=24 SPEC_TEMPERATURE=0.7 \
  python benchmarks/spec_bench.py

echo "=== queue r5b complete ==="
