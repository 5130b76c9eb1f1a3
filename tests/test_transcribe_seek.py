"""Long-form seek/segmentation logic tests with a mocked decode().

These pin the openai seek semantics (SURVEY.md §7 'Batched long-form:
timestamp-seek makes chunk boundaries data-dependent') without any model:
decode() is monkeypatched to emit crafted token streams.
"""

import numpy as np
import pytest

from openai_whisper_coreml_tpu.config import tiny_test_config
from openai_whisper_coreml_tpu.decoding import DecodingResult
from openai_whisper_coreml_tpu import transcribe as tr


class FakeModel:
    def __init__(self):
        self.cfg = tiny_test_config()

    def detect_language(self, mel):
        return ["en"], [{"en": 1.0}]

    def encode(self, mel):
        # transcribe() encodes each window once and passes features to
        # decode(); the scripted fake decode ignores them
        return mel


def _result(tokens, avg_logprob=-0.2, no_speech=0.0, compression=1.0, temp=0.0):
    return DecodingResult(
        tokens=tokens, text="", language="en", language_probs=None,
        avg_logprob=avg_logprob, no_speech_prob=no_speech,
        temperature=temp, compression_ratio=compression)


@pytest.fixture()
def cfg():
    return tiny_test_config()


def _run(monkeypatch, cfg, script, audio_seconds=60, **kwargs):
    """script: list of token lists, one per decode call (repeats last)."""
    calls = {"n": 0}

    def fake_decode(model, mel, options, from_features=False, tokenizer=None,
                    seed=0, draft=None):
        i = min(calls["n"], len(script) - 1)
        calls["n"] += 1
        return [_result(list(script[i]))]

    monkeypatch.setattr(tr, "decode", fake_decode)
    audio = np.zeros(int(audio_seconds * 16000), np.float32)
    model = FakeModel()
    result = tr.transcribe(
        model, audio, language="en",
        temperature=0.0,
        no_speech_threshold=None, logprob_threshold=None,
        compression_ratio_threshold=None, **kwargs)
    return result, calls["n"]


def test_consecutive_timestamps_advance_to_last_pair(monkeypatch, cfg):
    ts = cfg.timestamp_begin
    # window: <|0.00|> text <|5.00|><|5.00|> text <|10.00|> then more text
    # without closing -> seek advances to 10.00s (500 ts steps * 2 frames)
    script = [
        [ts, 100, ts + 250, ts + 250, 101, ts + 500, ts + 500, 102],
        [ts, 103, ts + 1500],  # closes at 30s on later windows
    ]
    result, n_calls = _run(monkeypatch, cfg, script, audio_seconds=40)
    segs = result["segments"]
    assert segs[0]["start"] == 0.0 and segs[0]["end"] == 5.0
    assert segs[1]["start"] == 5.0 and segs[1]["end"] == 10.0
    # third call starts at 10s: its first segment begins at 10.0
    assert any(abs(s["start"] - 10.0) < 1e-6 for s in segs)


def test_single_trailing_timestamp_consumes_window(monkeypatch, cfg):
    ts = cfg.timestamp_begin
    # one open segment covering the whole window; no consecutive pair
    script = [[ts, 100, 101, ts + 700]]
    result, n_calls = _run(monkeypatch, cfg, script, audio_seconds=60)
    # 60s audio = 2 windows, each consumed fully -> exactly 2 decode calls
    assert n_calls == 2
    segs = result["segments"]
    assert abs(segs[0]["end"] - 14.0) < 1e-6  # 700 * 0.02
    assert abs(segs[1]["start"] - 30.0) < 1e-6


def test_no_timestamps_at_all_consumes_window(monkeypatch, cfg):
    script = [[100, 101, 102]]
    result, n_calls = _run(monkeypatch, cfg, script, audio_seconds=31)
    assert n_calls == 2  # 31s -> windows at 0 and 30s
    assert result["segments"][0]["end"] == 30.0


def test_zero_advance_guard(monkeypatch, cfg):
    ts = cfg.timestamp_begin
    # degenerate: consecutive pair at 0.00 -> naive seek advance would be 0
    script = [[ts, ts]]
    result, n_calls = _run(monkeypatch, cfg, script, audio_seconds=35)
    # must terminate (guarded minimum advance)
    assert n_calls < 4000


def test_initial_prompt_carried(monkeypatch, cfg):
    ts = cfg.timestamp_begin
    seen_prompts = []
    script = [[ts, 123, ts + 1500]]

    def fake_decode(model, mel, options, from_features=False, tokenizer=None,
                    seed=0, draft=None):
        seen_prompts.append(options.prompt)
        return [_result(list(script[0]))]

    monkeypatch.setattr(tr, "decode", fake_decode)
    model = FakeModel()
    tr.transcribe(model, np.zeros(16000 * 60, np.float32), language="en",
                  temperature=0.0, initial_prompt="hello context",
                  no_speech_threshold=None, logprob_threshold=None,
                  compression_ratio_threshold=None)
    # first window's prompt contains the initial prompt tokens
    assert seen_prompts[0] is not None
    # second window's prompt additionally carries window-1 tokens
    assert len(seen_prompts[1]) > len(seen_prompts[0])


def test_no_speech_skip(monkeypatch, cfg):
    ts = cfg.timestamp_begin

    def fake_decode(model, mel, options, from_features=False, tokenizer=None,
                    seed=0, draft=None):
        return [_result([ts, 100, ts + 1500], no_speech=0.99,
                        avg_logprob=-5.0)]

    monkeypatch.setattr(tr, "decode", fake_decode)
    model = FakeModel()
    result = tr.transcribe(model, np.zeros(16000 * 35, np.float32),
                           language="en", temperature=0.0,
                           no_speech_threshold=0.6, logprob_threshold=-1.0,
                           compression_ratio_threshold=None)
    assert result["segments"] == []  # every window skipped as silence
