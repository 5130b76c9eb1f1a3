"""End-to-end test of the real-checkpoint validation gate (tools/validate_real).

Real Whisper weights cannot exist in this environment (zero egress), so the
gate is exercised with a random-weight checkpoint: the transcript gate is
fed the model's own output (must PASS — determinism), and the WER gates run
the full pipeline over a synthetic corpus (thresholds relaxed: random
weights transcribe noise; what is under test is the plumbing that will
gate real weights the moment they exist)."""

import json
import os

import numpy as np
import pytest

import jax

from openai_whisper_coreml_tpu.config import tiny_test_config
from openai_whisper_coreml_tpu.params import init_params
from openai_whisper_coreml_tpu.utils.audio_io import save_wav
from openai_whisper_coreml_tpu.utils.checkpoint import save_params

pytestmark = pytest.mark.slow


def test_validate_real_gate_plumbing(tmp_path, rng, capsys):
    from tools.validate_real import main as validate_main

    # a "converted checkpoint": tiny-test geometry registered under a name
    # the gate can load. Use the real registry via monkeypatching get_config.
    cfg = tiny_test_config(n_state=64, n_head=2, n_layer=2)
    params = init_params(cfg, jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "m.safetensors")
    save_params(params, ckpt, model_name="tiny-test")

    # patch get_config EVERYWHERE it is bound: models.whisper (and the
    # package __init__) import it directly, so patching only the config
    # module works or fails depending on whether another test already
    # imported models.whisper (observed order-dependent failure under
    # `pytest -m slow`)
    import openai_whisper_coreml_tpu as pkg
    import openai_whisper_coreml_tpu.config as config_mod
    import openai_whisper_coreml_tpu.models.whisper as whisper_mod

    orig_get = config_mod.get_config
    patched = lambda name: (cfg if name == "tiny-test" else orig_get(name))
    config_mod.get_config = patched
    pkg.get_config = patched
    whisper_mod.get_config = patched
    try:
        # corpus: two short utterances, flat layout (wav + txt)
        corpus = tmp_path / "corpus"
        corpus.mkdir()
        for i in range(2):
            t = np.arange(16000 * 2) / 16000
            audio = (0.2 * np.sin(2 * np.pi * (200 + 50 * i) * t)
                     + 0.02 * rng.standard_normal(t.shape)).astype(np.float32)
            save_wav(str(corpus / f"utt{i}.wav"), audio)
            (corpus / f"utt{i}.txt").write_text("reference text")

        # clip gate: expect the model's own transcript -> must pass
        clip = str(corpus / "utt0.wav")
        from openai_whisper_coreml_tpu import load_model
        from openai_whisper_coreml_tpu.eval.normalizers import (
            EnglishTextNormalizer,
        )

        m = load_model("tiny-test", checkpoint=ckpt)
        expected = m.transcribe(clip, language="en")["text"]
        exp_path = tmp_path / "expected.txt"
        exp_path.write_text(expected)

        # a second random-weight checkpoint doubles as the speculative draft
        # (same config: width-matched, token space identical; fp32 spec is
        # token-exact so gate J's WER delta must be 0 even on random weights)
        draft_ckpt = str(tmp_path / "d.safetensors")
        save_params(init_params(cfg, jax.random.PRNGKey(5)), draft_ckpt,
                    model_name="tiny-test")

        # gate K asset: unmerged-LoRA checkpoint with a NON-zero adapter
        # (zero-init lora_b would make runtime==merged trivially; perturb it
        # so the gate actually compares two changed-output paths). fp32
        # params -> runtime and merged must agree token-exactly.
        import jax.numpy as jnp

        from openai_whisper_coreml_tpu.lora import add_lora

        lora_params = add_lora(init_params(cfg, jax.random.PRNGKey(0)),
                               rank=2)
        lkey = jax.random.PRNGKey(11)

        def perturb(node):
            if isinstance(node, dict):
                out = {}
                for k, v in node.items():
                    if k == "lora_b":
                        nonlocal lkey
                        lkey, sub = jax.random.split(lkey)
                        out[k] = 0.02 * jax.random.normal(sub, v.shape,
                                                          jnp.float32)
                    else:
                        out[k] = perturb(v)
                return out
            return node

        lora_ckpt = str(tmp_path / "l.safetensors")
        save_params(perturb(lora_params), lora_ckpt, model_name="tiny-test")

        rc = validate_main([
            "--weights", ckpt, "--model", "tiny-test",
            "--clip", clip, "--expect-transcript", str(exp_path),
            "--librispeech", str(corpus), "--limit", "2",
            "--batch-size", "2",
            "--wer-threshold", "1e9",  # random weights: plumbing only
            "--int8-wer-delta", "1e9",
            "--beam-wer-delta", "1e9",
            "--vad-wer-delta", "1e9",
            "--sched-wer-delta", "1e9",
            "--stream-wer-delta", "1e9",  # random weights: plumbing only
            "--draft-weights", draft_ckpt, "--draft-model", "tiny-test",
            "--spec-k", "3",
            "--lora-weights", lora_ckpt,
        ])
        assert rc == 0
        # every gate the assets enable must have RUN (the summary JSON is
        # the CI coverage contract) — incl. round-5's streaming tier gate L
        import json as _json

        summary_line = [ln for ln in capsys.readouterr().out.splitlines()
                        if ln.startswith('{"ok"')][-1]
        summary = _json.loads(summary_line)
        for g in ("transcript", "word_timestamps", "http", "prequantized",
                  "wer", "beam", "vad", "scheduler", "speculative",
                  "streaming", "multistream", "lora"):
            assert g in summary, f"gate {g} did not run"
        assert summary["streaming"]["tick_p50_ms"] > 0
        # the normaliser both sides must agree on the self-transcript
        norm = EnglishTextNormalizer()
        assert norm(expected) == norm(expected)
    finally:
        config_mod.get_config = orig_get
        pkg.get_config = orig_get
        whisper_mod.get_config = orig_get
