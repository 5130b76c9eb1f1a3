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


def test_byte_fallback_suppression_sets_do_not_collapse():
    """Regression (round 3): openai's non_speech rule takes tokens[0] of
    multi-token music-symbol encodings. Under the byte-fallback vocab that
    collapses to raw bytes — " ♪" -> byte 32 would suppress EVERY space for
    the whole decode, "♪" -> byte 226 the UTF-8 lead byte of all CJK — and
    the step-1 blank rule would block the space byte every transcript
    starts with. Both sets must drop those bytes in byte-fallback mode."""
    cfg = tiny_test_config()
    tok = Tokenizer(cfg=cfg, ranks=byte_fallback_ranks(cfg.n_base_tokens))
    assert tok.is_byte_fallback
    assert 32 not in tok.non_speech_tokens   # space byte
    assert 226 not in tok.non_speech_tokens  # UTF-8 lead byte (CJK)
    assert 35 in tok.non_speech_tokens       # '#' is a complete symbol
    assert tok.blank_tokens == ()            # space is a legal first byte
    # the decode-time mask still blocks EOT at the first sampled step
    from openai_whisper_coreml_tpu.decoding import build_blank_mask
    mask = build_blank_mask(tok)
    assert mask[cfg.eot_token] and not mask[32]


def test_real_vocab_suppression_sets_unchanged():
    """A vocab with merged symbol tokens keeps openai behaviour: the blank
    set is the encoded space, and single-token symbols are suppressed."""
    cfg = tiny_test_config()
    ranks = byte_fallback_ranks(cfg.n_base_tokens)
    # make ' ♪' and '♪' single-token merges like a real vocab (BPE needs
    # the intermediate pair b'\xe2\x99' to reach the full 3-byte merge)
    overlays = [b"\xe2\x99", "♪".encode(), " ♪".encode(), b" -"]
    for i, merge in enumerate(overlays):
        filler_key = next(k for k, v in ranks.items() if v == 256 + i)
        del ranks[filler_key]
        ranks[merge] = 256 + i
    tok = Tokenizer(cfg=cfg, ranks=ranks)
    # bytes 0..255 still map to themselves, so is_byte_fallback stays True
    # and the gated branch applies; COMPLETE single-token encodings are
    # still suppressed either way:
    assert 257 in tok.non_speech_tokens  # '♪' now a single token
    assert 258 in tok.non_speech_tokens  # ' ♪' single token
    assert 259 in tok.non_speech_tokens  # ' -' single token (explicit rule)
    assert tok.encode(" hello")[0] == 32  # space byte still legal first
