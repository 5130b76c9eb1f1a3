#!/bin/bash
# Round-4 on-chip work queue (run ONE at a time — single sequential TPU
# process; CLAUDE.md relay rules). Probe-gated like tpu_queue.sh so a wedged
# relay is never hit with fresh clients.
#
#   bash benchmarks/tpu_queue_r4.sh 2>&1 | tee /tmp/tpu_queue_r4b.log
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

step "[6] int8 encoder probe (M=12000, native int8 dots)" \
  python benchmarks/int8_encoder_probe.py

step "[7] component split refresh at the B48 champion" \
  python benchmarks/components.py --batch 48

step "[8] stage-width at serving horizons: w64 vs w128, sample_len 64" \
  bash -c 'for W in 64 128; do
    BENCH_SAMPLE_LEN=64 BENCH_STAGE_WIDTH=$W python bench.py; done'

step "[9] spec kinetics at B48 (champion batch; may OOM with two cross-KVs)" \
  env SPEC_SKIP_PROBE=1 SPEC_K=4 SPEC_BATCH=48 python benchmarks/spec_bench.py

echo "=== queue r4 complete ==="
