"""Word-timestamp (DTW alignment) tests."""

import numpy as np
import pytest

import jax

from openai_whisper_coreml_tpu.config import tiny_test_config
from openai_whisper_coreml_tpu.models.whisper import WhisperModel
from openai_whisper_coreml_tpu.params import init_params
from openai_whisper_coreml_tpu.timing import (
    default_alignment_heads,
    dtw_path,
    find_word_alignment,
    median_filter,
    split_tokens_on_spaces,
)
from openai_whisper_coreml_tpu.tokenizer import get_tokenizer


def test_median_filter():
    x = np.array([[1.0, 100.0, 1.0, 1.0, 1.0, 100.0, 1.0]])
    y = median_filter(x, 3)
    assert y.shape == x.shape
    assert y[0, 1] == 1.0  # spike removed


def test_dtw_identity():
    # diagonal-dominant cost must give a near-diagonal path
    n = 8
    cost = np.ones((n, n)) - np.eye(n)
    ti, fi = dtw_path(cost)
    assert ti[0] == 0 and fi[0] == 0
    assert ti[-1] == n - 1 and fi[-1] == n - 1
    # path visits every token in order
    assert sorted(set(ti)) == list(range(n))
    assert (np.diff(ti) >= 0).all() and (np.diff(fi) >= 0).all()


def test_dtw_monotonic_rectangular():
    rng = np.random.default_rng(0)
    cost = rng.random((5, 40))
    ti, fi = dtw_path(cost)
    assert (np.diff(ti) >= 0).all() and (np.diff(fi) >= 0).all()
    assert ti[-1] == 4 and fi[-1] == 39


def test_default_alignment_heads():
    cfg = tiny_test_config(n_layer=4, n_head=2)
    mask = default_alignment_heads(cfg)
    assert mask.shape == (4, 2)
    assert not mask[:2].any() and mask[2:].all()


def test_split_tokens_on_spaces():
    cfg = tiny_test_config()
    tok = get_tokenizer(cfg)
    ids = tok.encode(" hello world, again")
    words, word_tokens = split_tokens_on_spaces(tok, ids)
    joined = "".join(words)
    assert joined == " hello world, again"
    assert sum(len(w) for w in word_tokens) == len(ids)
    assert words[0].strip() == "hello"


def test_find_word_alignment_end_to_end():
    cfg = tiny_test_config(n_state=64, n_head=2, n_layer=2, n_audio_ctx=64,
                           n_text_ctx=96)
    model = WhisperModel(cfg=cfg, params=init_params(cfg, jax.random.PRNGKey(0)))
    tok = get_tokenizer(cfg, language="en")
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((1, 64, 64)).astype(np.float32)
    text_tokens = tok.encode(" alpha beta gamma")

    timings = find_word_alignment(model, tok, text_tokens, feats,
                                  num_frames=128)
    assert len(timings) == 3
    for w in timings:
        assert 0.0 <= w.start <= w.end <= 128 / 100 + 1e-6
        assert 0.0 <= w.probability <= 1.0
    # monotone word order
    starts = [w.start for w in timings]
    assert starts == sorted(starts)


def test_transcribe_word_timestamps():
    cfg = tiny_test_config(n_state=64, n_head=2, n_layer=2)
    model = WhisperModel(cfg=cfg, params=init_params(cfg, jax.random.PRNGKey(0)))
    rng = np.random.default_rng(2)
    audio = (0.1 * rng.standard_normal(16000 * 3)).astype(np.float32)
    result = model.transcribe(
        audio, language="en", temperature=0.0, sample_len=8,
        word_timestamps=True,
        no_speech_threshold=None, logprob_threshold=None,
        compression_ratio_threshold=None)
    assert result["segments"]
    for seg in result["segments"]:
        assert "words" in seg
        for w in seg["words"]:
            assert w["start"] <= w["end"]


def test_load_alignment_heads_formats():
    """All public alignment-heads representations parse to the same mask."""
    import base64
    import gzip
    import json

    from openai_whisper_coreml_tpu.config import tiny_test_config
    from openai_whisper_coreml_tpu.timing import load_alignment_heads

    cfg = tiny_test_config(n_layer=4, n_head=4)
    want = np.zeros((4, 4), dtype=bool)
    want[2, 1] = want[3, 0] = want[3, 3] = True

    # (L, H) boolean array
    assert np.array_equal(load_alignment_heads(want, cfg), want)
    # HF generation_config pairs
    pairs = [[2, 1], [3, 0], [3, 3]]
    assert np.array_equal(load_alignment_heads(pairs, cfg), want)
    # JSON string of pairs (checkpoint metadata form)
    assert np.array_equal(load_alignment_heads(json.dumps(pairs), cfg), want)
    # openai compressed blob (base85 of gzip of the raw bool bytes)
    blob = base64.b85encode(gzip.compress(want.tobytes())).decode()
    assert np.array_equal(load_alignment_heads(blob, cfg), want)


def test_alignment_heads_from_checkpoint_metadata(tmp_path):
    """convert-style metadata round-trips into WhisperModel.alignment_heads
    and is used by find_word_alignment."""
    import json

    from openai_whisper_coreml_tpu.config import tiny_test_config
    from openai_whisper_coreml_tpu.models.whisper import load_model
    from openai_whisper_coreml_tpu.params import init_params
    from openai_whisper_coreml_tpu.utils.checkpoint import (
        read_metadata,
        save_params,
    )

    cfg = tiny_test_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    path = str(tmp_path / "m.safetensors")
    pairs = [[1, 0], [1, 2]]
    save_params(params, path, model_name="tiny-test",
                extra_meta={"alignment_heads": json.dumps(pairs)})
    meta = read_metadata(path)
    assert json.loads(meta["alignment_heads"]) == pairs


def test_split_tokens_on_unicode_multibyte():
    """Multi-byte characters split across byte-level BPE tokens must not
    decode to U+FFFD pieces (code-review finding)."""
    from openai_whisper_coreml_tpu.timing import split_tokens_on_unicode

    cfg = tiny_test_config()
    tok = get_tokenizer(cfg)
    ids = tok.encode(" héllo 你好")
    pieces, groups = split_tokens_on_unicode(tok, ids)
    assert "".join(pieces) == " héllo 你好"
    assert all("�" not in p for p in pieces)
    assert [t for g in groups for t in g] == ids


def test_device_alignment_matches_host_reference():
    """The device-side alignment core (bucketed tokens, on-device
    normalise/medfilt/head-mean, boundary patch) must reproduce the
    round-2 host reference (transfer-all + NumPy post-processing) to float
    tolerance — including a short window (num_frames cut mid-filter)."""
    from openai_whisper_coreml_tpu import timing as T

    cfg = tiny_test_config(n_state=64, n_head=2, n_layer=2, n_audio_ctx=64,
                           n_text_ctx=96)
    model = WhisperModel(
        cfg=cfg, params=init_params(cfg, jax.random.PRNGKey(0)))
    tok = get_tokenizer(cfg, language="en")
    rng = np.random.default_rng(4)
    feats = rng.standard_normal((1, 64, 64)).astype(np.float32)
    text_tokens = tok.encode(" alpha beta gamma delta")
    sot_seq = list(tok.sot_sequence_including_notimestamps)
    tokens = np.asarray([*sot_seq, *text_tokens, tok.eot], np.int32)[None]
    heads = T.default_alignment_heads(cfg)
    li, hi = np.nonzero(heads)

    # full window, mid-filter cut, n_audio == medfilt_width (identity
    # shortcut boundary), and an even sub-width window (n_audio = 4)
    for num_frames in (128, 100, 14, 8):
        n_audio = max(1, num_frames // 2)
        # --- host reference (the pre-round-3 implementation) ---
        import jax.numpy as jnp
        logits, weights = T._cross_attention_weights_jit(
            model.params, cfg, jnp.asarray(tokens), jnp.asarray(feats))
        probs = np.asarray(
            jax.nn.softmax(logits[0].astype(jnp.float32), axis=-1))
        ref_probs = [float(probs[len(sot_seq) + i - 1, int(t)])
                     for i, t in enumerate(text_tokens)]
        sel = np.asarray(
            weights[li, 0, hi, :, :n_audio].astype(jnp.float32))
        mean = sel.mean(axis=-2, keepdims=True)
        std = sel.std(axis=-2, keepdims=True) + 1e-8
        sel = (sel - mean) / std
        sel = T.median_filter(sel, 7)
        ref_matrix = sel.mean(axis=0)[
            len(sot_seq):len(sot_seq) + len(text_tokens)]
        ref_ti, ref_fi = T.dtw_path(-ref_matrix)

        # --- production path ---
        timings = T.find_word_alignment(
            model, tok, text_tokens, feats, num_frames=num_frames)
        # rebuild the production matrix through the public pieces to compare
        # DTW inputs? find_word_alignment is end-to-end; instead compare the
        # word boundaries it derives against ones derived from ref matrix
        jumps = np.diff(ref_ti, prepend=-1) > 0
        starts = ref_fi[jumps]
        ends = np.append(starts[1:], ref_fi[-1] + 1)
        words, word_tokens = T.split_tokens_on_spaces(tok, text_tokens)
        cursor = 0
        expected = []
        for w, toks in zip(words, word_tokens):
            s = starts[min(cursor, len(starts) - 1)]
            e = ends[min(cursor + len(toks) - 1, len(ends) - 1)]
            expected.append((round(float(s) / T.TOKENS_PER_SECOND, 3),
                             round(float(e) / T.TOKENS_PER_SECOND, 3)))
            cursor += len(toks)
        got = [(w.start, w.end) for w in timings]
        assert got == expected, (num_frames, got, expected)
        got_probs = [w.probability for w in timings]
        cursor = 0
        for (w, toks), gp in zip(zip(words, word_tokens), got_probs):
            rp = float(np.mean(ref_probs[cursor:cursor + len(toks)]))
            np.testing.assert_allclose(gp, rp, atol=1e-5)
            cursor += len(toks)


def test_split_makes_punctuation_its_own_word():
    """openai split semantics: an ASCII punctuation piece is its own word
    at split time (attachment is merge_punctuations' job, not the
    splitter's)."""
    cfg = tiny_test_config()
    tok = get_tokenizer(cfg)
    ids = tok.encode(" hello world, again")
    words, word_tokens = split_tokens_on_spaces(tok, ids)
    assert "," in words
    assert "".join(words) == " hello world, again"
    assert sum(len(w) for w in word_tokens) == len(ids)


def test_split_to_word_tokens_unicode_languages():
    """zh/ja/th/lo/my/yue split per unicode piece, not on spaces."""
    from openai_whisper_coreml_tpu.timing import split_to_word_tokens

    cfg = tiny_test_config()
    tok = get_tokenizer(cfg)
    ids = tok.encode("你好世界")
    words_zh, _ = split_to_word_tokens(tok, ids, "zh")
    assert words_zh == ["你", "好", "世", "界"]
    words_en, _ = split_to_word_tokens(tok, ids, "en")
    assert len(words_en) == 1  # no spaces: one word under space splitting


def test_merge_punctuations():
    from openai_whisper_coreml_tpu.timing import WordTiming, merge_punctuations

    def wt(word, toks, s, e):
        return WordTiming(word=word, tokens=toks, start=s, end=e,
                          probability=0.5)

    # " \u201c" prepends to the following word; "," and "." append to the
    # previous; timings of absorbed slots are emptied but stay in place
    timings = [wt(" \u201c", [1], 0.0, 0.1), wt("Hello", [2], 0.1, 0.4),
               wt(",", [3], 0.4, 0.45), wt(" world", [4], 0.5, 0.9),
               wt(".", [5], 0.9, 1.0)]
    merge_punctuations(timings, "\"'\u201c\u00bf([{-",
                       "\"'.\u3002,\uff0c!\uff01?\uff1f:\uff1a\u201d)]}\u3001")
    assert [t.word for t in timings] == ["", " \u201cHello,", "", " world.", ""]
    assert timings[1].tokens == [1, 2, 3]
    assert timings[3].tokens == [4, 5]
    # merged words keep the original anchor word's start/end (openai)
    assert (timings[1].start, timings[1].end) == (0.1, 0.4)
    # token conservation for segment distribution bookkeeping
    assert sum(len(t.tokens) for t in timings) == 5

    # custom (restricted) sets are honoured: nothing merges
    timings2 = [wt(" (", [1], 0.0, 0.1), wt("x", [2], 0.1, 0.2)]
    merge_punctuations(timings2, "", "")
    assert [t.word for t in timings2] == [" (", "x"]


def test_word_segment_boundary_refinement(monkeypatch):
    """openai add_word_timestamps heuristics: long-word truncation at
    sentence marks, first-word-after-silence clipping, and segment
    start/end snapping to word boundaries."""
    from openai_whisper_coreml_tpu import timing as T
    from openai_whisper_coreml_tpu.transcribe import Segment

    cfg = tiny_test_config()
    tok = get_tokenizer(cfg)
    text = " aa bb. cc"
    ids = tok.encode(text)
    words, word_tokens = split_tokens_on_spaces(tok, ids)
    # words: " aa", " bb", ".", " cc" — craft timings: normal, normal,
    # sentence mark, then an implausibly stretched word after the mark
    spans = {" aa": (0.0, 0.3), " bb": (0.35, 0.65), ".": (0.65, 0.7),
             " cc": (0.7, 5.0)}
    fake = [T.WordTiming(word=w, tokens=list(tk), start=spans[w][0],
                         end=spans[w][1], probability=0.9)
            for w, tk in zip(words, word_tokens)]

    monkeypatch.setattr(T, "find_word_alignment",
                        lambda *a, **k: [T.WordTiming(t.word, list(t.tokens),
                                                      t.start, t.end,
                                                      t.probability)
                                         for t in fake])
    seg = Segment(id=0, seek=0, start=0.0, end=1.0, text=text.strip(),
                  tokens=ids + [tok.eot], temperature=0.0, avg_logprob=-0.1,
                  compression_ratio=1.0, no_speech_prob=0.0)
    T.add_word_timestamps_to_segments(
        None, tok, [seg], None, num_frames=128, time_offset=0.0)
    ws = seg.words
    assert [w["word"] for w in ws] == [" aa", " bb.", " cc"]
    # durations 0.3/0.3/(4.3): median 0.3, max 0.6 -> " cc" follows the
    # sentence mark and is truncated to its last max_duration seconds
    cc = ws[-1]
    assert cc["end"] - cc["start"] == pytest.approx(0.6, abs=1e-6)
    # segment end snaps to the (refined) last word end
    assert seg.end == cc["end"]
    # segment start snaps to the first word start
    assert seg.start == ws[0]["start"]


def test_batched_alignment_matches_single():
    """find_word_alignment_batch must be timing-exact vs the per-window
    path: full windows through the batched core (varying token counts in
    one bucket call), partial windows through the delegated single path."""
    from openai_whisper_coreml_tpu.timing import find_word_alignment_batch

    cfg = tiny_test_config(n_state=64, n_head=2, n_layer=2, n_audio_ctx=64,
                           n_text_ctx=96)
    model = WhisperModel(cfg=cfg,
                         params=init_params(cfg, jax.random.PRNGKey(0)))
    tok = get_tokenizer(cfg, language="en")
    rng = np.random.default_rng(1)

    full = cfg.n_audio_ctx * 2  # num_frames that covers the whole context
    jobs = [
        (tok.encode(" alpha beta gamma"),
         rng.standard_normal((64, 64)).astype(np.float32), full),
        (tok.encode(" one two three four five six"),
         rng.standard_normal((64, 64)).astype(np.float32), full),
        # partial window -> single-path fallback (tail correction)
        (tok.encode(" delta epsilon"),
         rng.standard_normal((64, 64)).astype(np.float32), 40),
        # empty tokens -> empty result
        ([], rng.standard_normal((64, 64)).astype(np.float32), full),
    ]
    batched = find_word_alignment_batch(model, tok, jobs, language="en")
    assert batched[3] == []
    for i, (text_tokens, feats, num_frames) in enumerate(jobs[:3]):
        single = find_word_alignment(model, tok, text_tokens, feats,
                                     num_frames=num_frames, language="en")
        assert [w.word for w in batched[i]] == [w.word for w in single]
        for bw, sw in zip(batched[i], single):
            assert bw.start == sw.start and bw.end == sw.end, (i, bw, sw)
            np.testing.assert_allclose(bw.probability, sw.probability,
                                       rtol=1e-5, atol=1e-6)
