"""Tokenizer vocab-loader tests with synthetic ranks/vocab files, plus
profiling-utility tests."""

import base64
import json

import pytest

from openai_whisper_coreml_tpu.config import tiny_test_config
from openai_whisper_coreml_tpu.tokenizer import (
    Tokenizer,
    _bpe_merge,
    byte_fallback_ranks,
    load_hf_vocab,
    load_tiktoken_ranks,
)


def _mini_ranks():
    """A tiny but real BPE: bytes + a few merges, GPT-2-flavored."""
    ranks = {bytes([i]): i for i in range(256)}
    nxt = 256
    for merge in [b"he", b"ll", b"llo", b"hello", b" h", b" hello"]:
        ranks[merge] = nxt
        nxt += 1
    return ranks


def test_bpe_merge_priority():
    ranks = _mini_ranks()
    # "hello" should merge fully into one token via lowest-rank-first
    ids = _bpe_merge(b"hello", ranks)
    assert ids == [ranks[b"hello"]]
    ids = _bpe_merge(b" hello", ranks)
    assert ids == [ranks[b" hello"]]


def test_tiktoken_loader_roundtrip(tmp_path):
    ranks = _mini_ranks()
    path = tmp_path / "mini.tiktoken"
    with open(path, "wb") as f:
        for token, rank in sorted(ranks.items(), key=lambda kv: kv[1]):
            f.write(base64.b64encode(token) + b" " + str(rank).encode() + b"\n")
    loaded = load_tiktoken_ranks(str(path))
    assert loaded == ranks


def test_hf_vocab_loader(tmp_path):
    # GPT-2 byte-unicode mapping: ' ' -> 'Ġ'
    vocab = {"hello": 5, "Ġhello": 6, "<|endoftext|>": 50256, "a": 7}
    p = tmp_path / "vocab.json"
    p.write_text(json.dumps(vocab), encoding="utf-8")
    ranks = load_hf_vocab(str(p))
    assert ranks[b"hello"] == 5
    assert ranks[b" hello"] == 6
    assert ranks[b"a"] == 7
    assert b"<|endoftext|>" not in ranks  # specials derived from config


def test_tokenizer_with_custom_ranks():
    cfg = tiny_test_config()
    ranks = byte_fallback_ranks(cfg.n_base_tokens)
    # overlay the mini merges at their filler slots
    for i, merge in enumerate([b"he", b"ll", b"llo", b"hello"]):
        # evict the filler occupying rank 256+i, keep rank mapping unique
        filler_key = next(k for k, v in ranks.items() if v == 256 + i)
        del ranks[filler_key]
        ranks[merge] = 256 + i
    tok = Tokenizer(cfg=cfg, ranks=ranks)
    ids = tok.encode("hello")
    assert ids == [259]  # fully merged
    assert tok.decode(ids) == "hello"


def test_vocab_env_resolution(tmp_path, monkeypatch):
    from openai_whisper_coreml_tpu.tokenizer import get_tokenizer

    ranks = _mini_ranks()
    path = tmp_path / "env.tiktoken"
    with open(path, "wb") as f:
        for token, rank in sorted(ranks.items(), key=lambda kv: kv[1]):
            f.write(base64.b64encode(token) + b" " + str(rank).encode() + b"\n")
    monkeypatch.setenv("WHISPER_TPU_VOCAB", str(path))
    tok = get_tokenizer(tiny_test_config())
    assert tok.encode("hello") == [ranks[b"hello"]]


def test_stage_timer():
    import time

    from openai_whisper_coreml_tpu.utils.profiling import StageTimer

    timer = StageTimer()
    with timer.stage("mel", work_units=30.0):
        time.sleep(0.01)
    with timer.stage("mel", work_units=30.0):
        time.sleep(0.01)
    rep = timer.report()
    assert rep["mel"]["calls"] == 2
    assert rep["mel"]["seconds"] >= 0.02
    assert rep["mel"]["units_per_sec"] > 0
    assert "mel" in timer.dump()


def test_hf_tokenizer_json_loader(tmp_path):
    """Single-file `tokenizers` format (what HF whisper repos actually ship)."""
    from openai_whisper_coreml_tpu.tokenizer import load_hf_tokenizer_json

    data = {
        "version": "1.0",
        "added_tokens": [{"id": 50257, "content": "<|endoftext|>"}],
        "model": {
            "type": "BPE",
            "vocab": {"hello": 5, "Ġhello": 6, "a": 7,
                      "<|endoftext|>": 50257},
            "merges": ["h e", "he llo"],
        },
    }
    p = tmp_path / "tokenizer.json"
    p.write_text(json.dumps(data), encoding="utf-8")
    ranks = load_hf_tokenizer_json(str(p))
    assert ranks[b"hello"] == 5
    assert ranks[b" hello"] == 6
    assert ranks[b"a"] == 7
    assert all(not t.startswith(b"<|") for t in ranks)


def test_get_tokenizer_sniffs_tokenizer_json(tmp_path):
    """tokenizer.json content routed correctly even under another filename,
    and by its canonical basename."""
    from openai_whisper_coreml_tpu.tokenizer import get_tokenizer

    cfg = tiny_test_config()
    data = {"model": {"type": "BPE", "vocab": {"hello": 5}}}
    for name in ("tokenizer.json", "renamed.json"):
        p = tmp_path / name
        p.write_text(json.dumps(data), encoding="utf-8")
        tok = get_tokenizer(cfg, vocab_path=str(p))
        assert tok.ranks[b"hello"] == 5


def test_get_tokenizer_vocab_json_containing_model_token(tmp_path):
    """Regression (advisor, round 2): a genuine flat vocab.json that happens
    to contain the BPE token "model" (as real GPT-2/Whisper vocabs do) must
    route to the flat-vocab loader, not crash in the tokenizer.json one."""
    from openai_whisper_coreml_tpu.tokenizer import get_tokenizer

    cfg = tiny_test_config()
    vocab = {"model": 11, "hello": 5, "vo cab": 7}
    p = tmp_path / "vocab.json"
    p.write_text(json.dumps(vocab), encoding="utf-8")
    tok = get_tokenizer(cfg, vocab_path=str(p))
    assert tok.ranks[b"model"] == 11
    assert tok.ranks[b"hello"] == 5
