"""WER metric, eval harness, and batched serving tests."""

import os

import numpy as np
import pytest

import jax

from openai_whisper_coreml_tpu.config import tiny_test_config
from openai_whisper_coreml_tpu.eval.harness import discover, evaluate
from openai_whisper_coreml_tpu.eval.wer import compute_wer, normalize_text, word_errors
from openai_whisper_coreml_tpu.models.whisper import WhisperModel
from openai_whisper_coreml_tpu.params import init_params


def test_normalize_text():
    assert normalize_text("Hello, World!") == "hello world"
    assert normalize_text("I can't  do [noise] that") == "i can not do that"
    assert normalize_text("they're we've I'll") == "they are we have i will"


def test_word_errors_exact():
    s, d, i, h = word_errors("a b c".split(), "a b c".split())
    assert (s, d, i, h) == (0, 0, 0, 3)


def test_word_errors_mixed():
    # ref: the cat sat | hyp: the bat sat down -> 1 sub + 1 ins
    s, d, i, h = word_errors("the cat sat".split(), "the bat sat down".split())
    assert (s, d, i) == (1, 0, 1)
    assert h == 2


def test_compute_wer_multi():
    r = compute_wer(["the cat sat", "hello world"],
                    ["the cat sat", "hello word"])
    assert r.n_ref_words == 5
    assert r.substitutions == 1
    assert abs(r.wer - 0.2) < 1e-9


def test_wer_empty_hyp():
    r = compute_wer(["three word reference"], [""])
    assert r.deletions == 3
    assert r.wer == 1.0


@pytest.fixture(scope="module")
def model():
    cfg = tiny_test_config(n_state=64, n_head=2, n_layer=2)
    return WhisperModel(cfg=cfg, params=init_params(cfg, jax.random.PRNGKey(0)))


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from openai_whisper_coreml_tpu.utils import audio_io

    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    for i in range(3):
        t = np.arange(int((2 + i) * 16000)) / 16000
        x = (0.2 * np.sin(2 * np.pi * (150 + 40 * i) * t)
             + 0.02 * rng.standard_normal(t.shape)).astype(np.float32)
        audio_io.save_wav(str(root / f"utt{i}.wav"), x, 16000)
        (root / f"utt{i}.txt").write_text(f"reference text {i}")
    return str(root)


def test_discover_flat(corpus):
    utts = discover(corpus)
    assert len(utts) == 3
    assert utts[0].reference == "reference text 0"


def test_discover_librispeech(tmp_path):
    from openai_whisper_coreml_tpu.utils import audio_io

    d = tmp_path / "19" / "198"
    d.mkdir(parents=True)
    audio_io.save_wav(str(d / "19-198-0000.wav"),
                      np.zeros(16000, np.float32), 16000)
    (d / "19-198.trans.txt").write_text("19-198-0000 HELLO WORLD\n")
    utts = discover(str(tmp_path))
    assert len(utts) == 1
    assert utts[0].reference == "HELLO WORLD"


def test_evaluate_end_to_end(model, corpus):
    report = evaluate(model, corpus, batch_size=2, language="en",
                      no_speech_threshold=None, logprob_threshold=None,
                      compression_ratio_threshold=None, sample_len=8)
    assert report["n_utterances"] == 3
    assert 0.0 <= report["wer"]  # random model: terrible WER, but computed
    assert report["audio_seconds"] > 8
    assert report["rtfx"] > 0
    assert len(report["examples"]) == 3


def test_transcribe_batch_multi_request(model):
    from openai_whisper_coreml_tpu.serve import ServeOptions, transcribe_batch

    rng = np.random.default_rng(1)
    audios = [
        (0.2 * rng.standard_normal(16000 * 3)).astype(np.float32),
        (0.2 * rng.standard_normal(16000 * 35)).astype(np.float32),  # 2 windows
    ]
    results = transcribe_batch(
        model, audios,
        ServeOptions(batch_size=2, language="en", sample_len=8,
                     no_speech_threshold=None, logprob_threshold=None,
                     compression_ratio_threshold=None, temperature=(0.0,)))
    assert len(results) == 2
    assert abs(results[0]["duration"] - 3.0) < 0.01
    assert abs(results[1]["duration"] - 35.0) < 0.01
    # the 35s request must produce segments beyond the first 30s window
    # (window offsets are seek-chain-determined since the speculative-seek
    # change; the second window starts wherever window 1's last complete
    # segment ended)
    seeks = {s["seek"] for s in results[1]["segments"]}
    assert len(seeks) >= 2 and max(seeks) > 0


def test_transcribe_batch_word_timestamps(model):
    """ServeOptions(word_timestamps=True): every non-empty segment carries
    monotone per-word timings inside its window; timings match running the
    alignment core on the same window directly (windows are re-encoded in
    batched encoder calls — the decode rounds drop features)."""
    from openai_whisper_coreml_tpu.serve import ServeOptions, transcribe_batch

    rng = np.random.default_rng(3)
    audios = [
        (0.2 * rng.standard_normal(16000 * 3)).astype(np.float32),
        (0.2 * rng.standard_normal(16000 * 33)).astype(np.float32),
    ]
    opts = dict(batch_size=2, language="en", sample_len=8,
                no_speech_threshold=None, logprob_threshold=None,
                compression_ratio_threshold=None, temperature=(0.0,))
    results = transcribe_batch(model, audios,
                               ServeOptions(word_timestamps=True, **opts))
    plain = transcribe_batch(model, audios, ServeOptions(**opts))

    n_words = 0
    for r, p in zip(results, plain):
        # decode itself is unchanged by the alignment pass
        assert [s["tokens"] for s in r["segments"]] == [
            s["tokens"] for s in p["segments"]]
        for seg in r["segments"]:
            if not seg["text"]:
                continue
            assert "words" in seg, seg
            window_start = seg["seek"] / 100.0
            for w in seg["words"]:
                n_words += 1
                assert w["end"] >= w["start"] >= window_start
        for seg in p["segments"]:
            assert "words" not in seg
    assert n_words > 0


def test_serve_options_word_timestamps_validation():
    from openai_whisper_coreml_tpu.serve import ServeOptions

    with pytest.raises(ValueError, match="word_timestamps"):
        ServeOptions(word_timestamps=True, without_timestamps=True)


def test_transcribe_batch_initial_prompt_parity(model):
    """ServeOptions(initial_prompt=...) conditions each request's FIRST
    window via per-row prompts, matching sequential
    transcribe(initial_prompt=..., condition_on_previous_text=False)
    token-exactly. CB and beam combinations are covered by
    tests/test_serve_cb.py and tests/test_serve_cb_beam.py."""
    from openai_whisper_coreml_tpu.serve import ServeOptions, transcribe_batch
    from openai_whisper_coreml_tpu.transcribe import transcribe

    rng = np.random.default_rng(7)
    audio = (0.2 * rng.standard_normal(16000 * 2)).astype(np.float32)
    kw = dict(language="en", sample_len=8, no_speech_threshold=None,
              logprob_threshold=None, compression_ratio_threshold=None)
    seq = transcribe(model, audio, initial_prompt="glossary: kappa",
                     condition_on_previous_text=False, temperature=0.0, **kw)
    bat = transcribe_batch(
        model, [audio],
        ServeOptions(batch_size=2, temperature=(0.0,),
                     initial_prompt="glossary: kappa", **kw))[0]
    assert [s["tokens"] for s in bat["segments"]] == \
        [s["tokens"] for s in seq["segments"]]


def test_static_ladder_drops_beam_on_hot_rungs(model, monkeypatch):
    """t>0 fallback rungs re-decode with sampling, not beam search (openai
    ladder semantics; a degenerate beam result repeats identically at any
    temperature, so the ladder could never escape)."""
    from openai_whisper_coreml_tpu import serve as S

    seen = []
    real_decode = S.decode

    def spy(model_, mels, opts, **kw):
        seen.append((opts.temperature, opts.beam_size))
        return real_decode(model_, mels, opts, **kw)

    monkeypatch.setattr(S, "decode", spy)
    rng = np.random.default_rng(3)
    audio = (0.2 * rng.standard_normal(16000 * 2)).astype(np.float32)
    S.transcribe_batch(
        model, [audio],
        S.ServeOptions(batch_size=2, language="en", sample_len=6,
                       beam_size=2, temperature=(0.0, 0.7),
                       logprob_threshold=10.0,  # unmeetable: full ladder
                       no_speech_threshold=None,
                       compression_ratio_threshold=None))
    assert (0.0, 2) in seen
    assert (0.7, None) in seen
    assert all(bs is None for t, bs in seen if t > 0)


def test_transcribe_batch_vad_filter(model, monkeypatch):
    """ServeOptions(vad_filter=True): windows without detected speech are
    never decoded (openai no-speech-skip behaviour), and speech-dense
    audio is unaffected (token parity with vad off)."""
    from openai_whisper_coreml_tpu import serve as S

    t = np.arange(16000 * 3) / 16000
    speech3s = (0.3 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
    rng = np.random.default_rng(9)
    sparse = np.concatenate([
        speech3s, (1e-6 * rng.standard_normal(16000 * 62)).astype(np.float32)])

    kw = dict(batch_size=2, language="en", sample_len=6, temperature=(0.0,),
              logprob_threshold=None, compression_ratio_threshold=None)

    decoded_batches = []
    real_decode = S.decode

    def spy(model_, mels, opts, **k):
        decoded_batches.append(mels.shape[0])
        return real_decode(model_, mels, opts, **k)

    monkeypatch.setattr(S, "decode", spy)

    # default no_speech_threshold: the silent window is SKIPPED (no segment)
    res = S.transcribe_batch(model, [sparse],
                             S.ServeOptions(vad_filter=True, **kw))[0]
    n_vad_decodes = len(decoded_batches)
    assert all(s["seek"] < 3000 for s in res["segments"]), \
        "the silent 30s window must contribute no decoded segments"

    decoded_batches.clear()
    S.transcribe_batch(model, [sparse], S.ServeOptions(**kw))
    assert len(decoded_batches) > n_vad_decodes, \
        "vad off must decode strictly more windows"

    # parity on speech-dense audio
    decoded_batches.clear()
    dense = speech3s
    a = S.transcribe_batch(model, [dense],
                           S.ServeOptions(vad_filter=True, **kw))[0]
    b = S.transcribe_batch(model, [dense], S.ServeOptions(**kw))[0]
    assert [s["tokens"] for s in a["segments"]] == \
        [s["tokens"] for s in b["segments"]]


def test_vad_silent_windows_cast_no_language_vote(model):
    """VAD-gated windows carry language='' and so cast NO auto-detection
    vote: fully silent audio falls back to 'en' (never decoded, never
    'detected' from silence mel), and on sparse audio only speech windows
    vote (their count does not shift the winner)."""
    from openai_whisper_coreml_tpu.serve import ServeOptions, transcribe_batch

    rng = np.random.default_rng(11)
    silent = (1e-6 * rng.standard_normal(16000 * 62)).astype(np.float32)
    kw = dict(batch_size=2, language=None, sample_len=6, temperature=(0.0,),
              logprob_threshold=None, compression_ratio_threshold=None,
              vad_filter=True)
    res = transcribe_batch(model, [silent], ServeOptions(**kw))[0]
    assert res["language"] == "en"  # vote-less fallback, not silence junk
    assert all(not s["tokens"] for s in res["segments"])


def test_compute_cer():
    from openai_whisper_coreml_tpu.eval.wer import compute_cer

    # 4 chars, 1 substitution (whitespace removed before comparison)
    r = compute_cer(["你好世界"], ["你好世昨"], language="zh")
    assert r.n_ref_words == 4 and r.substitutions == 1
    assert abs(r.wer - 0.25) < 1e-9
    # spacing differences alone are not errors
    r2 = compute_cer(["a b c"], ["abc"], language=None)
    assert r2.wer == 0.0


def test_evaluate_reports_cer_for_spaceless_language(model, corpus):
    report = evaluate(model, corpus, batch_size=2, language="zh",
                      no_speech_threshold=None, logprob_threshold=None,
                      compression_ratio_threshold=None, sample_len=8)
    assert "cer" in report and "wer" not in report
    assert "ref_chars" in report and "ref_words" not in report


def test_serve_suppress_tokens_plumbed(model):
    """ServeOptions.suppress_tokens reaches the decode rules: suppressing a
    previously-decoded token changes the output."""
    from openai_whisper_coreml_tpu.serve import ServeOptions, transcribe_batch

    rng = np.random.default_rng(13)
    audio = (0.2 * rng.standard_normal(16000 * 2)).astype(np.float32)
    kw = dict(batch_size=2, language="en", sample_len=6, temperature=(0.0,),
              no_speech_threshold=None, logprob_threshold=None,
              compression_ratio_threshold=None)
    base = transcribe_batch(model, [audio], ServeOptions(**kw))[0]
    toks = [t for s in base["segments"] for t in s["tokens"]
            if t < model.cfg.timestamp_begin and t >= 0]
    text_toks = [t for t in toks if t not in
                 (model.cfg.sot_token, model.cfg.eot_token)]
    assert text_toks, "need at least one text token to suppress"
    banned = text_toks[0]
    out = transcribe_batch(
        model, [audio],
        ServeOptions(suppress_tokens=f"-1,{banned}", **kw))[0]
    for s in out["segments"]:
        assert banned not in s["tokens"]
