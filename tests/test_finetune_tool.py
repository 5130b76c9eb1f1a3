"""End-to-end fine-tune driver test (subprocess, tiny corpus, few steps)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from openai_whisper_coreml_tpu.utils import audio_io

    root = tmp_path_factory.mktemp("ft_corpus")
    rng = np.random.default_rng(0)
    for i in range(4):
        t = np.arange(16000) / 16000
        x = (0.2 * np.sin(2 * np.pi * (160 + 30 * i) * t)
             + 0.01 * rng.standard_normal(t.shape)).astype(np.float32)
        audio_io.save_wav(str(root / f"u{i}.wav"), x, 16000)
        (root / f"u{i}.txt").write_text(f"utterance number {i}")
    return str(root)


@pytest.mark.slow
def test_finetune_runs_and_saves(corpus, tmp_path):
    out = str(tmp_path / "ft")
    # tiny real model is too slow for CPU CI; monkeypatch via env-config is
    # overkill — run 2 steps at batch 2 with the real 'tiny' model but the
    # shortest possible sequences
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "finetune.py"), corpus,
         "--model", "tiny", "--steps", "2", "--batch-size", "2",
         "--max-len", "12", "--log-every", "1", "--output", out],
        capture_output=True, text=True, timeout=1800,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "loss=" in proc.stdout
    assert os.path.exists(out + "-final.safetensors")
