"""Continuous-batching scheduler tests (serve_cb)."""

import numpy as np
import pytest

import jax

from openai_whisper_coreml_tpu.config import tiny_test_config
from openai_whisper_coreml_tpu.models.whisper import WhisperModel
from openai_whisper_coreml_tpu.params import init_params
from openai_whisper_coreml_tpu.serve import ServeOptions, transcribe_batch

@pytest.fixture(scope="module")
def model():
    # full 1500-position audio context (serve windows are always 3000 mel
    # frames) but a very narrow/shallow model for CPU speed
    cfg = tiny_test_config(n_state=64, n_head=2, n_layer=2)
    return WhisperModel(cfg=cfg, params=init_params(cfg, jax.random.PRNGKey(0)))


def _audios(rng, seconds):
    sr = 16_000
    out = []
    for i, s in enumerate(seconds):
        t = np.arange(int(s * sr)) / sr
        out.append((0.2 * np.sin(2 * np.pi * (180 + 40 * i) * t)
                    + 0.02 * rng.standard_normal(t.shape)).astype(np.float32))
    return out


def test_continuous_matches_static_greedy(model, rng):
    """With one deterministic temperature the continuous scheduler must
    produce the same tokens as the static scheduler (same decode math,
    different slot scheduling)."""
    # windows are N_CTX*2 frames = 1.28 s here (tiny test geometry), so short
    # clips are single-window
    audios = _audios(rng, [0.9, 1.2])
    common = dict(batch_size=2, language="en", temperature=(0.0,),
                  sample_len=10, no_speech_threshold=None,
                  logprob_threshold=None, compression_ratio_threshold=None)
    static = transcribe_batch(model, audios,
                              ServeOptions(scheduler="static", **common))
    cont = transcribe_batch(model, audios,
                            ServeOptions(scheduler="continuous", **common))
    assert len(static) == len(cont) == 2
    for s, c in zip(static, cont):
        toks_s = [t for seg in s["segments"] for t in seg["tokens"]]
        toks_c = [t for seg in c["segments"] for t in seg["tokens"]]
        assert toks_s == toks_c
        assert s["text"] == c["text"]


def test_continuous_refill_more_windows_than_slots(model, rng):
    """5 windows through 2 slots: refill path + underfull groups."""
    audios = _audios(rng, [1.0, 1.1, 0.8, 1.3, 0.9])
    opts = ServeOptions(scheduler="continuous", batch_size=2, language="en",
                        temperature=(0.0,), sample_len=8,
                        no_speech_threshold=None, logprob_threshold=None,
                        compression_ratio_threshold=None)
    out = transcribe_batch(model, audios, opts)
    assert len(out) == 5
    for r in out:
        assert isinstance(r["text"], str)
        assert r["segments"], "every window must produce a result"
    # token parity with the static scheduler across pool/refill boundaries
    # (fp32 tests: the decode math is identical, only scheduling differs)
    static = transcribe_batch(
        model, audios, ServeOptions(scheduler="static", batch_size=2,
                                    language="en", temperature=(0.0,),
                                    sample_len=8, no_speech_threshold=None,
                                    logprob_threshold=None,
                                    compression_ratio_threshold=None))
    for s, c in zip(static, out):
        toks_s = [t for seg in s["segments"] for t in seg["tokens"]]
        toks_c = [t for seg in c["segments"] for t in seg["tokens"]]
        assert toks_s == toks_c


def test_continuous_temperature_fallback_requeues(model, rng):
    """An impossible logprob gate forces every window through the ladder;
    per-row temperatures mean retries mix with first attempts."""
    audios = _audios(rng, [1.0, 1.2, 0.8])
    opts = ServeOptions(scheduler="continuous", batch_size=2, language="en",
                        temperature=(0.0, 0.5), sample_len=6,
                        logprob_threshold=1e9,  # nothing passes
                        no_speech_threshold=None,
                        compression_ratio_threshold=None)
    out = transcribe_batch(model, audios, opts)
    assert len(out) == 3
    for r in out:
        # ladder exhausted: the last attempt (temperature 0.5) is kept
        assert r["segments"]
        assert all(seg["temperature"] == 0.5 for seg in r["segments"])


def test_continuous_language_detection(model, rng):
    """scheduler=continuous with language=None detects per refill group."""
    audios = _audios(rng, [1.0])
    opts = ServeOptions(scheduler="continuous", batch_size=2, language=None,
                        temperature=(0.0,), sample_len=6,
                        no_speech_threshold=None, logprob_threshold=None,
                        compression_ratio_threshold=None)
    out = transcribe_batch(model, audios, opts)
    assert out[0]["language"] in __import__(
        "openai_whisper_coreml_tpu.tokenizer", fromlist=["LANGUAGES"]
    ).LANGUAGES


def test_finished_row_never_overwrites_last_token(model):
    """A row frozen at pos==total_len must not clobber the token it sampled
    at total_len-1 while other rows keep decoding (code-review finding)."""
    import jax.numpy as jnp

    from openai_whisper_coreml_tpu import serve_cb
    from openai_whisper_coreml_tpu.decoding import (
        DecodingOptions, build_blank_mask, build_suppress_mask)
    from openai_whisper_coreml_tpu.tokenizer import get_tokenizer

    cfg = model.cfg
    tok = get_tokenizer(cfg, language="en")
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal(
        (2, cfg.n_audio_ctx, cfg.n_audio_state)).astype(np.float32) * 0.1)
    cross = serve_cb.encode_cross_core(model.params, cfg, feats)
    initial = jnp.tile(jnp.asarray(
        [[tok.eot, tok.sot, tok.language_token("en"), tok.transcribe]],
        jnp.int32), (2, 1))
    sample_len, prompt_len = 6, 4
    total_len = prompt_len + sample_len
    state = serve_cb.prefill_from_cross_core(
        model.params, cfg, cross, initial, jnp.zeros((2,), jnp.float32),
        jnp.int32(0), jnp.int32(0), sample_len=sample_len,
        prompt_len=prompt_len, cache_len=16, compute_dtype=jnp.float32)

    sentinel = 1234
    state = state._replace(
        finished=jnp.asarray([True, False]),
        pos=jnp.asarray([total_len, prompt_len], jnp.int32),
        tokens=state.tokens.at[0, total_len - 1].set(sentinel))

    opts = DecodingOptions(language="en")
    state, _ = serve_cb.decode_chunk_core(
        model.params, cfg, state, jax.random.PRNGKey(0),
        jnp.asarray(build_suppress_mask(tok, opts)),
        jnp.asarray(build_blank_mask(tok)), jnp.int32(-1),
        chunk=3, use_timestamps=False, prompt_len=prompt_len,
        total_len=total_len)
    assert int(np.asarray(state.tokens)[0, total_len - 1]) == sentinel


def test_continuous_initial_prompt_matches_static(model, rng):
    """initial_prompt under continuous batching (round-3 verdict: the CB
    feature-matrix gap). Per-row pads carry the conditioning only on each
    request's FIRST window; output must be token-exact vs the static
    scheduler's per-row prompt path (fp32)."""
    audios = _audios(rng, [1.0, 2.6])  # request 1 spans multiple windows
    common = dict(batch_size=2, language="en", temperature=(0.0,),
                  sample_len=8, no_speech_threshold=None,
                  logprob_threshold=None, compression_ratio_threshold=None,
                  initial_prompt="glossary: TPU, XLA, Pallas")
    static = transcribe_batch(model, audios,
                              ServeOptions(scheduler="static", **common))
    cont = transcribe_batch(model, audios,
                            ServeOptions(scheduler="continuous", **common))
    for s, c in zip(static, cont):
        toks_s = [t for seg in s["segments"] for t in seg["tokens"]]
        toks_c = [t for seg in c["segments"] for t in seg["tokens"]]
        assert toks_s == toks_c
        assert s["text"] == c["text"]
    # the prompt must actually change the decode (vs no prompt at all)
    bare = transcribe_batch(model, audios, ServeOptions(
        scheduler="continuous", **{**common, "initial_prompt": None}))
    assert any(b["text"] != c["text"] for b, c in zip(bare, cont))


def test_static_beam_initial_prompt(model, rng):
    """beam_size + initial_prompt: the prompted/unprompted window partition
    must produce results for every window (decoding.py rejects per-row
    prompts under beam; serve partitions into two uniform-prompt groups)."""
    audios = _audios(rng, [1.0, 2.6])
    opts = ServeOptions(scheduler="static", batch_size=2, language="en",
                        temperature=(0.0,), sample_len=6, beam_size=2,
                        no_speech_threshold=None, logprob_threshold=None,
                        compression_ratio_threshold=None,
                        initial_prompt="names: Kowalski")
    out = transcribe_batch(model, audios, opts)
    assert len(out) == 2
    for r in out:
        assert r["segments"]


def test_continuous_open_loop_arrivals(model, rng):
    """Open-loop path (run(arrivals=...)): windows arriving in waves across
    chunk boundaries must all complete, token-exact vs the static scheduler
    (fp32). Exercises the initial-wait, mid-flight refill-from-arrivals,
    and close-then-drain paths."""
    from openai_whisper_coreml_tpu.serve import (
        ServeOptions, _decode_windows_static, _windows_for)
    from openai_whisper_coreml_tpu.serve_cb import ContinuousBatcher

    audios = _audios(rng, [1.0, 1.1, 0.9, 1.2])
    opts = ServeOptions(batch_size=2, language="en", temperature=(0.0,),
                        sample_len=8, no_speech_threshold=None,
                        logprob_threshold=None,
                        compression_ratio_threshold=None)
    wins = [w for i, a in enumerate(audios)
            for w in _windows_for(a, model.cfg.n_mels, i)]
    waves = [wins[:1], [], wins[1:3], [], wins[3:]]
    calls = {"n": 0}

    def arrivals():
        i = calls["n"]
        calls["n"] += 1
        return waves[i] if i < len(waves) else None

    ContinuousBatcher(model, opts).run([], arrivals=arrivals)
    assert all(w.result is not None for w in wins)

    fresh = [w for i, a in enumerate(audios)
             for w in _windows_for(a, model.cfg.n_mels, i)]
    _decode_windows_static(model, fresh, opts)
    for a, b in zip(wins, fresh):
        assert a.result.tokens == b.result.tokens


def test_continuous_open_loop_empty_stream(model):
    """An arrival stream that closes without producing anything returns."""
    from openai_whisper_coreml_tpu.serve import ServeOptions
    from openai_whisper_coreml_tpu.serve_cb import ContinuousBatcher

    opts = ServeOptions(batch_size=2, language="en", temperature=(0.0,),
                        sample_len=4)
    ContinuousBatcher(model, opts).run([], arrivals=lambda: None)


def test_static_beam_patience_length_penalty_plumbed(model, rng):
    """ServeOptions.patience / length_penalty reach the beam decoder:
    static-scheduler results match sequential transcribe() with the same
    beam kwargs token-exactly (both route through decode())."""
    from openai_whisper_coreml_tpu.transcribe import transcribe

    audios = _audios(rng, [1.1])
    kw = dict(language="en", sample_len=6, no_speech_threshold=None,
              logprob_threshold=None, compression_ratio_threshold=None)
    seq = transcribe(model, audios[0], temperature=0.0, beam_size=2,
                     patience=2.0, length_penalty=0.6,
                     condition_on_previous_text=False, **kw)
    bat = transcribe_batch(
        model, audios,
        ServeOptions(scheduler="static", batch_size=1, temperature=(0.0,),
                     beam_size=2, patience=2.0, length_penalty=0.6, **kw))[0]
    assert [s["tokens"] for s in bat["segments"]] == \
        [s["tokens"] for s in seq["segments"]]
