#!/bin/bash
# Round-5 on-chip queue A: the speculative batch sweep (VERDICT.md round-4
# item 1). One sequential TPU process at a time (CLAUDE.md relay rules),
# probe-gated so a wedged relay is never hit with fresh clients.
#
# Design: spec kinetics (ms/iteration at K=4,8) + same-session flat and
# two-level baselines at every serving batch, so break-even and derived
# RTFx(alpha) come from ONE session per batch (the round-4 table mixed a
# B24 calibration into every other geometry). B48 runs WITHOUT the baseline
# decodes: the round-4 "two cross-KV pools exceed HBM" negative was
# recorded from a process that also allocated the flat+two-level baseline
# caches — spec alone may fit at the champion batch.
#
#   bash benchmarks/tpu_queue_r5.sh 2>&1 | tee /tmp/tpu_queue_r5.log
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

for B in 24 8 16 32 40; do
  step "[sweep] spec kinetics B${B} K=4,8 + same-session baselines" \
    env SPEC_SKIP_PROBE=1 SPEC_KS=4,8 SPEC_BATCH=$B \
    python benchmarks/spec_bench.py
done

step "[B48] spec-only kinetics at the champion batch (no baseline allocs)" \
  env SPEC_SKIP_PROBE=1 SPEC_NO_BASELINE=1 SPEC_KS=4 SPEC_BATCH=48 \
  python benchmarks/spec_bench.py

echo "=== queue r5 (A: spec sweep) complete ==="
