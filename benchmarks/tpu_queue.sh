#!/bin/bash
# On-chip work queue for when the axon relay recovers (run ONE at a time —
# a single sequential TPU process; CLAUDE.md relay rules). Most important
# first, in case the tunnel wedges again mid-queue; a 1-op probe gates
# EVERY step so a wedged relay is never hit with fresh clients.
#
#   bash benchmarks/tpu_queue.sh 2>&1 | tee /tmp/tpu_queue.log
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

step() {  # step <label> <cmd...>: probe-gated, abort queue on wedge
  local label="$1"; shift
  echo "=== ${label}: probe ==="
  if ! probe; then
    echo "=== ${label}: PROBE FAILED — leaving the tunnel alone (CLAUDE.md) ==="
    exit 1
  fi
  echo "=== ${label} ==="
  "$@" || echo "=== ${label}: step failed (continuing to next probe) ==="
}

step "[1] bench.py champion reconfirm (B48 w64 int8)" python bench.py

step "[2] stage-width 32 probe (B48)" \
  env BENCH_STAGE_WIDTH=32 python bench.py

step "[3a] beam two-level ON (medium B8, decode only)" \
  env BEAM_SKIP_WTS=1 BEAM_TWO_LEVEL=1 python benchmarks/beam_bench.py
step "[3b] beam two-level OFF (flat A/B)" \
  env BEAM_SKIP_WTS=1 BEAM_TWO_LEVEL=0 python benchmarks/beam_bench.py

step "[4] pre-quantized checkpoint on-chip parity (tiny)" python - <<'EOF'
import tempfile, os
import numpy as np, jax
import openai_whisper_coreml_tpu as wt
from openai_whisper_coreml_tpu.quantize import quantize_params
from openai_whisper_coreml_tpu.utils.checkpoint import save_params

m = wt.load_model("tiny", seed=3)
d = tempfile.mkdtemp()
fp, qp = os.path.join(d, "f.safetensors"), os.path.join(d, "q.safetensors")
save_params(m.params, fp, model_name="tiny")
save_params(quantize_params(m.params), qp, model_name="tiny")
m_pre = wt.load_model("tiny", checkpoint=qp, quantize="int8")
m_live = wt.load_model("tiny", checkpoint=fp, quantize="int8")
audio = np.random.default_rng(0).standard_normal(480000).astype(np.float32)*0.1
feats = m_pre.encode(m_pre.log_mel(wt.pad_or_trim(audio)))
toks = np.array([[m_pre.cfg.sot_token, 5, 9]], np.int32)
a = np.asarray(m_pre.logits(toks, feats[None]))
b = np.asarray(m_live.logits(toks, feats[None]))
assert np.array_equal(a, b), "pre-quantized != quantize-at-load ON CHIP"
print("[4] pre-quantized on-chip parity OK")
EOF

step "[5] LoRA adapter decode on chip (tiny smoke)" python - <<'EOF'
import numpy as np, jax
import openai_whisper_coreml_tpu as wt
m = wt.load_model("tiny", seed=0)
params = wt.add_lora(m.params, rank=8, seed=1)
from openai_whisper_coreml_tpu.models.whisper import WhisperModel
m2 = WhisperModel(cfg=m.cfg, params=params)
audio = np.random.default_rng(0).standard_normal(480000).astype(np.float32)*0.1
feats = m2.encode(m2.log_mel(wt.pad_or_trim(audio)))
r = wt.decode(m2, feats[None], wt.DecodingOptions(language="en", sample_len=16),
              from_features=True)[0]
base = wt.decode(m, feats[None], wt.DecodingOptions(language="en", sample_len=16),
                 from_features=True)[0]
assert r.tokens == base.tokens, "zero-init adapters changed the decode"
print("[5] LoRA on-chip identity OK:", len(r.tokens), "tokens")
EOF

step "[6] finetune holdout-eval + exact resume on chip (tiny, 2+1 steps)" \
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

echo "=== queue complete ==="
