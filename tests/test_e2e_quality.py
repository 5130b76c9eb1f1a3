"""Hermetic end-to-end transcription-QUALITY gate (round-4 verdict #8,
parametrized over the serving engines in round 5 per verdict #4).

Every other test pins token parity of decode cores; this one proves the
FULL serving stack transcribes: a tiny-test model is trained on the
synthetic tone->phrase corpus (benchmarks/int8_agreement_trained.py
machinery), then held-out noisy tone variants are POSTed through the
OpenAI-compatible HTTP endpoint and scored by the eval harness's WER — a
number regressions move, computed end to end on CPU with no external
assets.

Three engine variants share one trained model (module fixture):
  * static    — the SHIPPING default (static scheduler + two-level decode),
                the path the round-4 verdict flagged as ungated;
  * continuous — the CB scheduler (demoted from default by the arrivals
                benchmark but still a supported engine);
  * speculative — static scheduler with a distilled half-depth draft
                paired to the model (the turbo recipe at test scale:
                frozen copied encoder, decoder-only training), so the
                accept/reject/correction walk itself is under the WER gate.

The corpus is 4 distinct multi-tone signatures (8 s each) mapping to 4
phrases; a 192-wide 2-layer model memorises it in a few hundred steps (a
96-wide one plateaued at fragments — WER 0.92 — so the gate uses the
smallest geometry that actually converges). Held-out variants differ only
in noise seed, so a healthy stack transcribes them near-perfectly; the
gate asserts WER <= 0.30 (observed ~0.0 at convergence, with headroom for
optimizer/dtype jitter across jax versions).
"""

import dataclasses
import io
import json
import sys
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow

PHRASES = [
    "the quick brown fox",
    "hello world again",
    "seven forty two",
    "cold and clear weather",
]


def tone(cls: int, seed: int, seconds: float = 8.0) -> np.ndarray:
    rng = np.random.default_rng(1000 * cls + seed)
    t = np.arange(int(seconds * 16000)) / 16000
    f0 = 180 + 70 * cls
    x = (0.30 * np.sin(2 * np.pi * f0 * t)
         + 0.20 * np.sin(2 * np.pi * (f0 * 1.5 + 17) * t)
         + 0.10 * np.sin(2 * np.pi * (f0 * 0.5 + 5) * t))
    x *= 1 + 0.4 * np.sin(2 * np.pi * (1.3 + 0.2 * cls) * t)
    x += 0.02 * rng.standard_normal(t.shape)
    return x.astype(np.float32)


def _wav_bytes(audio: np.ndarray) -> bytes:
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes((np.clip(audio, -1, 1) * 32767).astype("<i2")
                       .tobytes())
    return buf.getvalue()


def _train(cfg, tok, *, steps, target_loss, trainable=None,
           encoder_from=None, seed=0):
    """Fit the toy corpus; returns trained params. encoder_from +
    trainable="^decoder" reproduces the turbo distillation shape (frozen
    copied encoder, decoder-only updates)."""
    from openai_whisper_coreml_tpu.audio import (
        log_mel_spectrogram, pad_or_trim)
    from openai_whisper_coreml_tpu.params import init_params
    from openai_whisper_coreml_tpu.parallel import make_mesh
    from openai_whisper_coreml_tpu.train import (
        TrainConfig, make_batch, make_train_step)

    params = init_params(cfg, jax.random.PRNGKey(seed))
    if encoder_from is not None:
        params = dict(params)
        # COPY: the train step donates its params and would free a shared
        # encoder out from under the target model
        params["encoder"] = jax.tree.map(jnp.copy, encoder_from)
    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    init_fn, step_fn = make_train_step(
        cfg, mesh, TrainConfig(learning_rate=3e-4, remat=True,
                               trainable=trainable))
    params, opt_state = init_fn(params)

    longest = max(len(tok.encode(" " + p.strip())) for p in PHRASES)
    train_len = len(tok.sot_sequence_including_notimestamps) + longest + 1

    rng = np.random.default_rng(seed)
    loss = float("inf")
    for step in range(steps):
        cls = rng.integers(0, len(PHRASES), 4)
        audio = np.stack([pad_or_trim(tone(c, int(rng.integers(64))))
                          for c in cls])
        mel = np.asarray(log_mel_spectrogram(audio, n_mels=cfg.n_mels))
        _, tokens, mask = make_batch(cfg, tok, mel,
                                     [PHRASES[c] for c in cls],
                                     max_len=train_len)
        params, opt_state, metrics = step_fn(
            params, opt_state, jnp.asarray(mel), jnp.asarray(tokens),
            jnp.asarray(mask))
        if step % 25 == 0 or step == steps - 1:
            loss = float(metrics["loss"])
            if loss < target_loss:
                break
    del opt_state
    assert loss < 0.1, f"trainer failed to fit the toy corpus (loss={loss})"
    return params


@pytest.fixture(scope="module")
def trained():
    """One trained target + one distilled draft shared by all engines."""
    from openai_whisper_coreml_tpu.config import tiny_test_config
    from openai_whisper_coreml_tpu.models.whisper import WhisperModel
    from openai_whisper_coreml_tpu.tokenizer import get_tokenizer

    cfg = tiny_test_config(n_state=192, n_head=3, n_layer=2)
    tok = get_tokenizer(cfg, language="en")
    params = _train(cfg, tok, steps=400, target_loss=0.02)

    cfg_d = dataclasses.replace(cfg, name="tiny-test-draft", n_text_layer=1)
    params_d = _train(cfg_d, tok, steps=400, target_loss=0.05,
                      trainable="^decoder", encoder_from=params["encoder"],
                      seed=1)
    return (WhisperModel(cfg=cfg, params=params),
            WhisperModel(cfg=cfg_d, params=params_d))


def _serve_wer(model, default_options):
    from openai_whisper_coreml_tpu.eval.wer import compute_wer
    from openai_whisper_coreml_tpu.serve_http import WhisperHTTPServer

    srv = WhisperHTTPServer(model, port=0, batch_size=4, batch_window_ms=30,
                            default_options=default_options)
    srv.start()
    try:
        hyps, refs = [], []
        for i in range(4):  # held-out noise seeds, one per class
            audio = tone(i, seed=977 + i)
            body_file = _wav_bytes(audio)
            boundary = b"xxbndxx"
            body = (b"--" + boundary + b"\r\n"
                    b'Content-Disposition: form-data; name="file"; '
                    b'filename="t.wav"\r\nContent-Type: audio/wav\r\n\r\n'
                    + body_file + b"\r\n--" + boundary + b"\r\n"
                    b'Content-Disposition: form-data; name="language"'
                    b"\r\n\r\nen\r\n"
                    b"--" + boundary + b"\r\n"
                    b'Content-Disposition: form-data; name="temperature"'
                    b"\r\n\r\n0\r\n"
                    b"--" + boundary + b"--\r\n")
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}/v1/audio/transcriptions",
                data=body,
                headers={"Content-Type": "multipart/form-data; "
                                         f"boundary={boundary.decode()}"})
            with urllib.request.urlopen(req, timeout=600) as resp:
                out = json.load(io.TextIOWrapper(resp, encoding="utf-8"))
            hyps.append(out["text"])
            refs.append(PHRASES[i])
        return compute_wer(refs, hyps).wer, hyps
    finally:
        srv.stop()


# training (train.make_batch) uses the notimestamps sot sequence, so
# serving must decode without the timestamp grammar — with it, the forced
# timestamp tokens the model never saw wreck the toy transcripts
_BASE_OPTS = {
    "without_timestamps": True,
    "logprob_threshold": None,
    "compression_ratio_threshold": None,
    "no_speech_threshold": None,
}


@pytest.mark.parametrize("engine", ["static", "continuous", "speculative"])
def test_e2e_quality_http_wer(trained, engine):
    from openai_whisper_coreml_tpu import speculative

    model, draft = trained
    opts = dict(_BASE_OPTS)
    if engine == "continuous":
        opts["scheduler"] = "continuous"
    elif engine == "speculative":
        model = dataclasses.replace(model, draft=draft)
        opts["spec_k"] = 3

    before = dict(speculative.TOTALS)
    wer, hyps = _serve_wer(model, opts)
    print(f"\ne2e quality gate [{engine}]: WER={wer:.4f} hyps={hyps!r}",
          file=sys.stderr)
    assert wer <= 0.30, f"[{engine}] end-to-end WER {wer} (hyps={hyps!r})"
    if engine == "speculative":
        # the draft really ran: the accept/reject walk is what was gated
        assert speculative.TOTALS["iters"] > before["iters"]
