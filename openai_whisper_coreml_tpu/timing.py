"""Word-level timestamps via cross-attention alignment (DTW).

Beyond anything in the reference (which emits no text at all): openai/whisper
aligns decoder cross-attention against the audio frames with dynamic time
warping to assign per-word start/end times. This module reimplements that:

  * a teacher-forcing decoder pass that also returns cross-attention
    probabilities for a set of alignment heads (collected inside the
    layer scan, so only selected layers' weights are kept);
  * alignment-head default: all heads of the upper half of decoder layers
    (openai's documented fallback when a model ships no alignment-head mask);
  * attention post-processing (per-token standardisation, median filter,
    head averaging) and a NumPy DTW over the negative log attention matrix;
  * word segmentation of token sequences and timestamp attachment.
"""

from __future__ import annotations

import string
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import WhisperConfig
from .models import decoder as dec_mod
from .models.layers import layer_norm, linear, matmul_precision, split_heads
from .tokenizer import Tokenizer

TOKENS_PER_SECOND = 50  # audio positions per second (1500 / 30s)

# canonical defaults live in config.py (light module importable from the CLI)
from .config import APPEND_PUNCTUATIONS, PREPEND_PUNCTUATIONS  # noqa: F401,E402

# languages written without spaces: word = minimal unicode-complete piece
_UNICODE_SPLIT_LANGUAGES = {"zh", "ja", "th", "lo", "my", "yue"}


@dataclass
class WordTiming:
    word: str
    tokens: List[int]
    start: float
    end: float
    probability: float


def default_alignment_heads(cfg: WhisperConfig) -> np.ndarray:
    """(n_text_layer, n_text_head) bool — upper half of the decoder layers
    (openai's documented fallback when a model ships no alignment-head
    mask)."""
    mask = np.zeros((cfg.n_text_layer, cfg.n_text_head), dtype=bool)
    mask[cfg.n_text_layer // 2 :] = True
    return mask


def load_alignment_heads(spec, cfg: WhisperConfig) -> np.ndarray:
    """Parse any public alignment-heads representation into an (L, H) mask.

    Accepts:
      * a boolean array / nested list of shape (n_text_layer, n_text_head);
      * a list of [layer, head] pairs (HuggingFace generation_config.json
        "alignment_heads" format — tools/convert.py carries these into the
        checkpoint metadata);
      * a JSON string of either of the above;
      * an openai-style compressed blob: base85-encoded zlib/gzip of the
        boolean mask bytes (the `_ALIGNMENT_HEADS` values in openai/whisper).
    """
    import base64
    import gzip
    import json
    import zlib

    if isinstance(spec, (bytes, str)):
        s = spec.strip() if isinstance(spec, str) else spec
        text = s if isinstance(s, str) else s.decode("latin-1")
        if text.startswith(("[", "{")):
            return load_alignment_heads(json.loads(text), cfg)
        raw = base64.b85decode(text)
        try:
            data = gzip.decompress(raw)
        except OSError:
            data = zlib.decompress(raw)
        mask = np.frombuffer(data, dtype=bool).copy()
        return mask.reshape(cfg.n_text_layer, cfg.n_text_head)

    arr = np.asarray(spec)
    if arr.ndim == 2 and arr.shape == (cfg.n_text_layer, cfg.n_text_head):
        return arr.astype(bool)
    if arr.ndim == 2 and arr.shape[1] == 2:  # [layer, head] pairs
        mask = np.zeros((cfg.n_text_layer, cfg.n_text_head), dtype=bool)
        for layer, head in arr:
            mask[int(layer), int(head)] = True
        return mask
    raise ValueError(f"unrecognised alignment-heads spec shape {arr.shape}")


def _cross_attention_weights(params, cfg: WhisperConfig, tokens, audio_features):
    """Teacher-forcing pass returning (logits, weights (L, B, H, T, S))."""
    cross_kv = dec_mod.precompute_cross_kv(params, cfg, audio_features)
    compute_dtype = params["decoder"]["token_embedding"].dtype
    x = dec_mod.embed_tokens(params, cfg, tokens, 0, compute_dtype)
    n_head = cfg.n_text_head

    def body(x, xs):
        layer_params, xk, xv = xs
        t = x.shape[1]
        mask = jnp.tril(jnp.ones((t, t), jnp.bool_))[None, None]
        h = layer_norm(x, layer_params["attn_ln"])
        p = layer_params["attn"]
        from .models.layers import attention_core, merge_heads

        q = split_heads(linear(h, p["q"]), n_head)
        k = split_heads(linear(h, p["k"]), n_head)
        v = split_heads(linear(h, p["v"]), n_head)
        x = x + linear(merge_heads(attention_core(q, k, v, mask=mask)),
                       p["out"])

        # cross attention, keeping the probability matrix
        # (xk/xv arrive in the decoder's d-major (B, H, D, S) layout)
        cp = layer_params["cross_attn"]
        h2 = layer_norm(x, layer_params["cross_attn_ln"])
        q2 = split_heads(linear(h2, cp["q"]), n_head)
        d = q2.shape[-1]
        scale = d ** -0.25
        logits2 = jnp.einsum("bqhd,bhds->bhqs", (q2 * scale).astype(q2.dtype),
                             (xk * scale).astype(xk.dtype),
                             preferred_element_type=jnp.float32,
                             precision=matmul_precision(q2.dtype))
        w = jax.nn.softmax(logits2.astype(jnp.float32), axis=-1)  # (B,H,T,S)
        out2 = jnp.einsum("bhqs,bhds->bqhd", w.astype(xv.dtype), xv,
                          preferred_element_type=jnp.float32,
                          precision=matmul_precision(xv.dtype))
        x = x + linear(merge_heads(out2.astype(x.dtype)), cp["out"])

        from .models.layers import mlp

        x = x + mlp(layer_norm(x, layer_params["mlp_ln"]), layer_params["mlp"])
        return x, w

    x, weights = jax.lax.scan(
        body, x, (params["decoder"]["blocks"], cross_kv.k, cross_kv.v))
    logits = dec_mod.final_logits(params, x)
    return logits, weights


_cross_attention_weights_jit = jax.jit(
    _cross_attention_weights, static_argnames=("cfg",))

# token-length buckets for the alignment pass: windows emit a different
# token count every time, and an unbucketed jit recompiles per length.
# Padded rows are causally masked in self-attention and excluded from the
# per-frame normalisation below, so numerics match unpadded execution.
_ALIGN_BUCKETS = (32, 64, 128, 256, 512)


def _median_filter_dev(x, width: int):
    """jnp median filter over the last axis, reflect padding — mirrors
    median_filter (np.pad mode='reflect' + sliding median) on device.

    The median is selected by an odd-even transposition network over the
    `width` shifted views (pairwise min/max passes) instead of
    jnp.median's stack+sort: sorting a stacked (..., width) axis
    materialises the full windowed tensor TWICE (values + stable-sort
    iota, each padded ~1.2x by the (8,128) tile) — measured 2x7.5 GB and
    an HBM OOM for the batched alignment core at large-v3 B8
    (benchmarks/wordts_bench.py, round 5). The comparator network is all
    elementwise min/max on shifted slices, which XLA fuses into one
    kernel, and selects the EXACT same order statistic (odd width, no
    NaNs: softmax-derived inputs)."""
    assert width % 2 == 1, "median filter width must be odd"
    pad = width // 2
    left = x[..., 1:pad + 1][..., ::-1]
    right = x[..., -pad - 1:-1][..., ::-1]
    xp = jnp.concatenate([left, x, right], axis=-1)
    parts = [xp[..., k:k + x.shape[-1]] for k in range(width)]
    # odd-even transposition sort: `width` alternating passes of pairwise
    # compare-exchange sort any width-length sequence; take the middle.
    for p in range(width):
        for i in range(p % 2, width - 1, 2):
            lo = jnp.minimum(parts[i], parts[i + 1])
            hi = jnp.maximum(parts[i], parts[i + 1])
            parts[i], parts[i + 1] = lo, hi
    return parts[width // 2]


def _alignment_core(params, tokens, audio_features, li, hi, t_valid,
                    gather_pos, gather_ids, *, cfg, medfilt_width):
    """Device side of find_word_alignment: teacher-forced forward + head
    selection + per-frame standardisation + median filter + head mean —
    transfers only a (T_bucket, S) matrix, per-position token probs, and a
    7-column boundary tail instead of the full (n_sel, T, S) stack
    (measured 35.2 s -> sub-second per 30 s window at medium on v5e; the
    host path shipped in round 2 moved ~280 MB and np.median'd it).
    """
    logits, weights = _cross_attention_weights(params, cfg, tokens,
                                               audio_features)
    probs = jax.nn.softmax(logits[0].astype(jnp.float32), axis=-1)
    text_probs = probs[gather_pos, gather_ids]  # (T_bucket,)

    sel = weights[li, 0, hi].astype(jnp.float32)  # (n_sel, T_bucket, S)
    # standardise each frame across the VALID tokens (openai find_alignment
    # std_mean over dim=-2; padded rows excluded to match unpadded numerics)
    tmask = (jnp.arange(sel.shape[1]) < t_valid)[None, :, None]
    cnt = jnp.maximum(t_valid, 1).astype(jnp.float32)
    mean = jnp.sum(jnp.where(tmask, sel, 0.0), axis=-2, keepdims=True) / cnt
    var = jnp.sum(jnp.where(tmask, (sel - mean) ** 2, 0.0),
                  axis=-2, keepdims=True) / cnt
    sel = (sel - mean) / (jnp.sqrt(var) + 1e-8)
    filt = _median_filter_dev(sel, medfilt_width)
    matrix = filt.mean(axis=0)  # (T_bucket, S)
    return text_probs, matrix, sel


_alignment_core_jit = jax.jit(
    _alignment_core, static_argnames=("cfg", "medfilt_width"))


def _alignment_core_batch(params, tokens, audio_features, head_mask, n_sel,
                          t_valid, gather_pos, gather_ids, *, cfg,
                          medfilt_width):
    """Batched _alignment_core over FULL windows (n_audio == S for every
    row, so the single-window path's reflect-at-n_audio tail correction
    never applies). tokens (B, T_bucket); head_mask (L, H) f32 alignment-
    head selection; n_sel = head_mask.sum(); t_valid/gather_* per row.
    Returns (text_probs (B, T_bucket), matrix (B, T_bucket, S)).

    Serving runs one alignment forward per window today; a 96-window
    word-timestamp workload pays 96 relay dispatches (~30 ms each,
    CLAUDE.md) plus 96 M=T matmul chains the MXU ingests one window at a
    time. Batching the full windows of each encoder chunk into ONE call
    amortises both (serve._align_words).

    Unlike the single-window core, the standardise/median-filter/head-mean
    post-processing runs INSIDE the layer scan and only a (B, T, S) f32
    accumulator is carried: stacking every layer's cross-attention weights
    as scan ys — (L, B, H, T, S) f32 — is 14.7 GB for large-v3 at B24 and
    OOM'd at B8 once the median filter doubled it (round-5
    wordts_bench run). Per-layer peak is now one (B, H, T, S) f32 plus
    fused elementwise temps. Standardisation and filtering are per-head,
    so fusing changes only the head-mean summation order (f32, ~1e-7)."""
    cross_kv = dec_mod.precompute_cross_kv(params, cfg, audio_features)
    compute_dtype = params["decoder"]["token_embedding"].dtype
    x = dec_mod.embed_tokens(params, cfg, tokens, 0, compute_dtype)
    n_head = cfg.n_text_head
    b, t_bucket = tokens.shape
    s = cross_kv.k.shape[-1]  # d-major (L, B, H, D, S)

    tmask = (jnp.arange(t_bucket)[None, :]
             < t_valid[:, None])[:, None, :, None]  # (B, 1, T, 1)
    cnt = jnp.maximum(t_valid, 1).astype(jnp.float32)[:, None, None, None]

    def body(carry, xs):
        x, acc = carry
        layer_params, xk, xv, mask_l = xs
        from .models.layers import attention_core, merge_heads

        t = x.shape[1]
        causal = jnp.tril(jnp.ones((t, t), jnp.bool_))[None, None]
        h = layer_norm(x, layer_params["attn_ln"])
        p = layer_params["attn"]
        q = split_heads(linear(h, p["q"]), n_head)
        k = split_heads(linear(h, p["k"]), n_head)
        v = split_heads(linear(h, p["v"]), n_head)
        x = x + linear(merge_heads(attention_core(q, k, v, mask=causal)),
                       p["out"])

        cp = layer_params["cross_attn"]
        h2 = layer_norm(x, layer_params["cross_attn_ln"])
        q2 = split_heads(linear(h2, cp["q"]), n_head)
        d = q2.shape[-1]
        scale = d ** -0.25
        logits2 = jnp.einsum("bqhd,bhds->bhqs", (q2 * scale).astype(q2.dtype),
                             (xk * scale).astype(xk.dtype),
                             preferred_element_type=jnp.float32,
                             precision=matmul_precision(q2.dtype))
        w = jax.nn.softmax(logits2.astype(jnp.float32), axis=-1)  # (B,H,T,S)
        out2 = jnp.einsum("bhqs,bhds->bqhd", w.astype(xv.dtype), xv,
                          preferred_element_type=jnp.float32,
                          precision=matmul_precision(xv.dtype))
        x = x + linear(merge_heads(out2.astype(x.dtype)), cp["out"])

        from .models.layers import mlp

        x = x + mlp(layer_norm(x, layer_params["mlp_ln"]), layer_params["mlp"])

        # per-frame standardisation over VALID tokens (per head, per layer
        # — independent across layers, so safe to fuse into the scan)
        mean = jnp.sum(jnp.where(tmask, w, 0.0), axis=-2, keepdims=True) / cnt
        var = jnp.sum(jnp.where(tmask, (w - mean) ** 2, 0.0),
                      axis=-2, keepdims=True) / cnt
        std = (w - mean) / (jnp.sqrt(var) + 1e-8)
        filt = _median_filter_dev(std, medfilt_width)
        # fp32 x fp32 contraction: HIGHEST, or the MXU truncates the
        # standardised weights to bf16 (CLAUDE.md numerics invariant)
        acc = acc + jnp.einsum("h,bhts->bts", mask_l, filt,
                               precision=matmul_precision(jnp.float32))
        return (x, acc), None

    acc0 = jnp.zeros((b, t_bucket, s), jnp.float32)
    (x, acc), _ = jax.lax.scan(
        body, (x, acc0),
        (params["decoder"]["blocks"], cross_kv.k, cross_kv.v, head_mask))
    logits = dec_mod.final_logits(params, x)

    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    # per-row double gather: probs[b, gather_pos[b,t], gather_ids[b,t]]
    by_pos = jnp.take_along_axis(probs, gather_pos[:, :, None], axis=1)
    text_probs = jnp.take_along_axis(by_pos, gather_ids[:, :, None],
                                     axis=2)[:, :, 0]
    matrix = acc / n_sel  # (B, T_bucket, S)
    return text_probs, matrix


_alignment_core_batch_jit = jax.jit(
    _alignment_core_batch, static_argnames=("cfg", "medfilt_width"))


def median_filter(x: np.ndarray, width: int) -> np.ndarray:
    """Median filter along the last axis (reflect padding), pure NumPy."""
    if width <= 1 or x.shape[-1] <= width:
        return x
    pad = width // 2
    padded = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    windows = np.lib.stride_tricks.sliding_window_view(padded, width, axis=-1)
    return np.median(windows, axis=-1)


def dtw_path(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Monotonic alignment path minimising total cost.

    cost: (n_tokens, n_frames). Returns (token_indices, frame_indices).

    Vectorised anti-diagonal sweep: every cell on diagonal i+j==k depends
    only on diagonals k-1 and k-2, so the O(n*m) table fills in n+m NumPy
    vector steps instead of n*m Python iterations (a 448x1500 window is
    ~670k cells — the former eval bottleneck). Tie-breaking matches the
    scalar reference exactly (diagonal, then token-advance).
    """
    n, m = cost.shape
    acc = np.full((n + 1, m + 1), np.inf)
    acc[0, 0] = 0.0
    trace = np.zeros((n + 1, m + 1), dtype=np.int8)
    for k in range(2, n + m + 1):
        i = np.arange(max(1, k - m), min(n, k - 1) + 1)
        if i.size == 0:
            continue
        j = k - i
        c0 = acc[i - 1, j - 1]  # match (diag)
        c1 = acc[i - 1, j]  # token advance
        c2 = acc[i, j - 1]  # frame advance
        best = np.where((c0 <= c1) & (c0 <= c2), 0,
                        np.where(c1 <= c2, 1, 2)).astype(np.int8)
        acc[i, j] = np.choose(best, (c0, c1, c2)) + cost[i - 1, j - 1]
        trace[i, j] = best
    i, j = n, m
    ti, fi = [], []
    while i > 0 and j > 0:
        ti.append(i - 1)
        fi.append(j - 1)
        step = trace[i, j]
        if step == 0:
            i, j = i - 1, j - 1
        elif step == 1:
            i -= 1
        else:
            j -= 1
    return np.array(ti[::-1]), np.array(fi[::-1])


def split_tokens_on_unicode(tokenizer: Tokenizer, tokens: Sequence[int]
                            ) -> Tuple[List[str], List[List[int]]]:
    """Group tokens into minimal unicode-complete pieces.

    A byte-level BPE token can end mid-UTF-8-sequence; decoding it alone
    yields U+FFFD and corrupts multi-byte (CJK/accented) words. Tokens are
    accumulated until their joint decode is clean — a piece is accepted
    with a replacement char only if the char is genuinely present at that
    offset of the full decoded text (openai's guard)."""
    text_toks = [int(t) for t in tokens if int(t) < tokenizer.eot]
    full = tokenizer.decode(text_toks)
    pieces: List[str] = []
    groups: List[List[int]] = []
    cur: List[int] = []
    offset = 0
    for tok in text_toks:
        cur.append(tok)
        piece = tokenizer.decode(cur)
        rc = piece.find("�")
        if rc == -1 or (offset + rc < len(full)
                        and full[offset + rc] == "�"):
            pieces.append(piece)
            groups.append(cur)
            offset += len(piece)
            cur = []
    if cur:  # trailing incomplete bytes: emit what decodes
        pieces.append(tokenizer.decode(cur))
        groups.append(cur)
    return pieces, groups


def split_tokens_on_spaces(tokenizer: Tokenizer, tokens: Sequence[int]
                           ) -> Tuple[List[str], List[List[int]]]:
    """Group text tokens into words, splitting on leading spaces and on
    punctuation pieces (openai semantics: a piece whose stripped text is a
    single ASCII punctuation char becomes its OWN word here; attachment to
    a neighbour happens later in merge_punctuations, driven by the
    configurable prepend/append sets)."""
    words: List[str] = []
    word_tokens: List[List[int]] = []
    for piece, toks in zip(*split_tokens_on_unicode(tokenizer, tokens)):
        is_punct = piece.strip() in string.punctuation
        if piece.startswith(" ") or is_punct or not words:
            words.append(piece)
            word_tokens.append(list(toks))
        else:
            words[-1] += piece
            word_tokens[-1].extend(toks)
    return words, word_tokens


def split_to_word_tokens(tokenizer: Tokenizer, tokens: Sequence[int],
                         language: Optional[str] = None
                         ) -> Tuple[List[str], List[List[int]]]:
    """Language-aware word split: scripts written without spaces (zh, ja,
    th, lo, my, yue) use minimal unicode-complete pieces as words; all
    other languages split on spaces/punctuation."""
    if language in _UNICODE_SPLIT_LANGUAGES:
        return split_tokens_on_unicode(tokenizer, tokens)
    return split_tokens_on_spaces(tokenizer, tokens)


def merge_punctuations(timings: List[WordTiming], prepended: str,
                       appended: str) -> None:
    """Fold punctuation-only words into their neighbours, in place.

    A word consisting of a leading space plus a char from `prepended`
    (opening quote/bracket, inverted mark) is glued onto the FOLLOWING
    word; a word from `appended` (closing quote, terminal mark) with no
    space of its own is glued onto the PREVIOUS word. Absorbed entries
    keep their slot with empty word/tokens so token-count bookkeeping
    (segment distribution) stays aligned."""
    # backward pass: " “" + "word" -> " “word"
    follow = len(timings) - 1
    for i in range(len(timings) - 2, -1, -1):
        cur = timings[i]
        if cur.word.startswith(" ") and cur.word.strip() in prepended:
            nxt = timings[follow]
            nxt.word = cur.word + nxt.word
            nxt.tokens = cur.tokens + nxt.tokens
            cur.word, cur.tokens = "", []
        else:
            follow = i
    # forward pass: "word" + "." -> "word."
    prev = 0
    for j in range(1, len(timings)):
        cur = timings[j]
        before = timings[prev]
        if not before.word.endswith(" ") and cur.word in appended:
            before.word = before.word + cur.word
            before.tokens = before.tokens + cur.tokens
            cur.word, cur.tokens = "", []
        else:
            prev = j


def find_word_alignment(
    model,
    tokenizer: Tokenizer,
    text_tokens: Sequence[int],
    audio_features,  # (1, S, n_state) or (S, n_state)
    num_frames: int,  # mel frames of real (unpadded) audio in this window
    *,
    medfilt_width: int = 7,
    alignment_heads: Optional[np.ndarray] = None,
    language: Optional[str] = None,
) -> List[WordTiming]:
    """Align one window's text tokens to time; returns per-word timings."""
    cfg = model.cfg
    feats = jnp.asarray(audio_features)
    if feats.ndim == 2:
        feats = feats[None]

    sot_seq = list(tokenizer.sot_sequence_including_notimestamps)
    tokens = np.asarray(
        [*sot_seq, *[int(t) for t in text_tokens], tokenizer.eot],
        np.int32)[None]

    text_start = len(sot_seq)
    if alignment_heads is None:
        # checkpoint-carried heads (tools/convert.py stores the HF
        # generation_config pairs in the safetensors metadata) beat the
        # upper-half-layers heuristic
        alignment_heads = getattr(model, "alignment_heads", None)
    if alignment_heads is None:
        alignment_heads = default_alignment_heads(cfg)
    alignment_heads = np.asarray(alignment_heads, dtype=bool)
    li, hi = np.nonzero(alignment_heads)

    n_audio = max(1, num_frames // 2)
    pad_w = medfilt_width // 2

    # pad tokens to a length bucket (recompile per bucket, not per window);
    # padded rows are causally masked and excluded from normalisation
    t_real = tokens.shape[1]
    bucket = next((b for b in _ALIGN_BUCKETS if b >= t_real), t_real)
    toks_b = np.full((1, bucket), tokenizer.eot, np.int32)
    toks_b[0, :t_real] = tokens[0]
    n_text = len(text_tokens)
    gather_pos = np.clip(text_start - 1 + np.arange(bucket), 0, bucket - 1)
    gather_ids = np.zeros((bucket,), np.int32)
    gather_ids[:n_text] = np.asarray(text_tokens, np.int32)

    probs_d, matrix_d, sel_d = _alignment_core_jit(
        model.params, jnp.asarray(toks_b), feats,
        jnp.asarray(li, jnp.int32), jnp.asarray(hi, jnp.int32),
        jnp.int32(t_real), jnp.asarray(gather_pos), jnp.asarray(gather_ids),
        cfg=cfg, medfilt_width=medfilt_width)
    text_probs = [float(p) for p in np.asarray(probs_d[:n_text])]
    matrix = np.array(matrix_d[:t_real, :n_audio])  # writable host copy

    s_full = int(matrix_d.shape[-1])
    if n_audio <= medfilt_width:
        # degenerate <=0.15 s window: the host reference's median_filter
        # passes slices no wider than the filter through UNfiltered (the
        # x.shape[-1] <= width identity shortcut above), so the matrix is
        # just the head-mean of the standardised selection — the device
        # matrix_d (filtered over the full S buffer) must not be used here
        matrix = np.asarray(sel_d[:, :, :n_audio]).mean(axis=0)[:t_real]
    elif n_audio < s_full:
        # the device median filter reflect-pads at S, but the window ends at
        # n_audio: recompute the last pad_w columns per head with reflection
        # at n_audio (host, on a 2*width-column tail) so numerics match the
        # slice-then-filter host reference exactly
        lo = n_audio - min(2 * medfilt_width, n_audio)
        tail = np.asarray(sel_d[:, :, lo:n_audio])  # (n_sel, T, <=14)
        tail_f = median_filter(tail, medfilt_width).mean(axis=0)
        matrix[:, n_audio - pad_w:n_audio] = tail_f[:t_real, -pad_w:]

    # align only the text region (drop sot prompt and final eot row)
    matrix = matrix[text_start : text_start + n_text]
    return _timings_from_matrix(tokenizer, text_tokens, text_probs, matrix,
                                language)


def _timings_from_matrix(tokenizer: Tokenizer, text_tokens: Sequence[int],
                         text_probs: Sequence[float], matrix: np.ndarray,
                         language: Optional[str]) -> List[WordTiming]:
    """Host tail shared by the single and batched alignment paths: DTW over
    the text-region attention matrix, token boundaries, word segmentation."""
    if matrix.size == 0:
        return []

    ti, fi = dtw_path(-matrix)

    # token boundaries: first frame where each token appears in the path
    jumps = np.diff(ti, prepend=-1) > 0
    token_start_frames = fi[jumps]
    token_end_frames = np.append(token_start_frames[1:], fi[-1] + 1)

    words, word_tokens = split_to_word_tokens(tokenizer, text_tokens,
                                              language)
    timings: List[WordTiming] = []
    cursor = 0
    for word, toks in zip(words, word_tokens):
        n_tok = len(toks)
        start_f = token_start_frames[min(cursor, len(token_start_frames) - 1)]
        end_f = token_end_frames[
            min(cursor + n_tok - 1, len(token_end_frames) - 1)]
        tok_probs = text_probs[cursor : cursor + n_tok]
        timings.append(WordTiming(
            word=word,
            tokens=toks,
            start=round(float(start_f) / TOKENS_PER_SECOND, 3),
            end=round(float(end_f) / TOKENS_PER_SECOND, 3),
            probability=float(np.mean(tok_probs)) if tok_probs else 0.0,
        ))
        cursor += n_tok
    return timings


def find_word_alignment_batch(
    model,
    tokenizer: Tokenizer,
    jobs: Sequence[Tuple[Sequence[int], "jnp.ndarray", int]],
    *,
    medfilt_width: int = 7,
    alignment_heads: Optional[np.ndarray] = None,
    language: Optional[str] = None,
) -> List[List[WordTiming]]:
    """Align many windows at once; jobs = (text_tokens, features (S, n_state),
    num_frames) per window. Returns one WordTiming list per job.

    FULL windows (num_frames covering the whole 30 s context — the common
    serving case) share ONE batched device call per token-length bucket;
    partial/degenerate windows fall back to find_word_alignment (they need
    the reflect-at-n_audio median-filter tail correction, which is a
    host-side per-row fix). Timing-exact vs the single-window path
    (tests/test_timing.py::test_batched_alignment_matches_single)."""
    cfg = model.cfg
    s_full = cfg.n_audio_ctx
    results: List[Optional[List[WordTiming]]] = [None] * len(jobs)

    sot_seq = list(tokenizer.sot_sequence_including_notimestamps)
    text_start = len(sot_seq)

    if alignment_heads is None:
        alignment_heads = getattr(model, "alignment_heads", None)
    if alignment_heads is None:
        alignment_heads = default_alignment_heads(cfg)
    li, hi = np.nonzero(np.asarray(alignment_heads, dtype=bool))

    by_bucket: dict = {}
    for idx, (text_tokens, feats, num_frames) in enumerate(jobs):
        n_audio = max(1, num_frames // 2)
        if not text_tokens:
            results[idx] = []
        elif n_audio < s_full or n_audio <= medfilt_width:
            results[idx] = find_word_alignment(
                model, tokenizer, text_tokens, feats, num_frames,
                medfilt_width=medfilt_width,
                alignment_heads=alignment_heads, language=language)
        else:
            t_real = text_start + len(text_tokens) + 1
            bucket = next((b for b in _ALIGN_BUCKETS if b >= t_real), t_real)
            by_bucket.setdefault(bucket, []).append(idx)

    for bucket, idxs in by_bucket.items():
        b = len(idxs)
        toks_b = np.full((b, bucket), tokenizer.eot, np.int32)
        t_valid = np.zeros((b,), np.int32)
        gather_pos = np.zeros((b, bucket), np.int32)
        gather_ids = np.zeros((b, bucket), np.int32)
        feat_rows = []
        for r, idx in enumerate(idxs):
            text_tokens, feats, _ = jobs[idx]
            row = [*sot_seq, *[int(t) for t in text_tokens], tokenizer.eot]
            toks_b[r, : len(row)] = row
            t_valid[r] = len(row)
            gather_pos[r] = np.clip(text_start - 1 + np.arange(bucket), 0,
                                    bucket - 1)
            gather_ids[r, : len(text_tokens)] = np.asarray(text_tokens,
                                                           np.int32)
            f = jnp.asarray(feats)
            feat_rows.append(f[None] if f.ndim == 2 else f)
        feats_b = jnp.concatenate(feat_rows, axis=0)

        probs_d, matrix_d = _alignment_core_batch_jit(
            model.params, jnp.asarray(toks_b), feats_b,
            jnp.asarray(alignment_heads, jnp.float32),
            jnp.float32(max(1, li.size)),
            jnp.asarray(t_valid), jnp.asarray(gather_pos),
            jnp.asarray(gather_ids), cfg=cfg, medfilt_width=medfilt_width)
        probs_h = np.asarray(probs_d)
        matrix_h = np.asarray(matrix_d)  # one bulk transfer for the bucket

        for r, idx in enumerate(idxs):
            text_tokens = jobs[idx][0]
            n_text = len(text_tokens)
            matrix = matrix_h[r, text_start : text_start + n_text, :s_full]
            results[idx] = _timings_from_matrix(
                tokenizer, text_tokens,
                [float(p) for p in probs_h[r, :n_text]], matrix, language)

    return results  # type: ignore[return-value]


_SENTENCE_END_MARKS = ".。!！?？"


def add_word_timestamps_to_segments(
    model,
    tokenizer: Tokenizer,
    segments: List,  # transcribe.Segment for ONE window
    audio_features,
    num_frames: int,
    time_offset: float,
    *,
    language: Optional[str] = None,
    prepend_punctuations: str = PREPEND_PUNCTUATIONS,
    append_punctuations: str = APPEND_PUNCTUATIONS,
    last_speech_timestamp: float = 0.0,
    timings: Optional[List[WordTiming]] = None,
) -> None:
    """Attach .words to each segment of a window (in place), then refine
    both word and segment boundaries with openai's heuristics:

      * words longer than 2x the (0.7 s-capped) median word duration are
        truncated at sentence boundaries;
      * punctuation from the configurable prepend/append sets is folded
        into neighbouring words (merge_punctuations);
      * an overlong first word following >4 medians of silence is clipped;
      * segment start/end snap to the first/last word unless the word
        itself is implausibly stretched past the segment boundary, in
        which case the word snaps to the segment instead.

    `last_speech_timestamp` is the absolute end time of the previous
    window's speech (threads the silence-gap heuristic across windows).

    `timings`: precomputed alignment for this window (the batched serving
    path aligns many windows in one device call via
    find_word_alignment_batch, then applies these heuristics — which
    thread state across windows — sequentially). The heuristics MUTATE the
    list entries; pass a fresh alignment per call."""
    text_tokens = [t for seg in segments for t in seg.tokens
                   if t < tokenizer.eot]
    if not text_tokens:
        return
    if timings is None:
        timings = find_word_alignment(model, tokenizer, text_tokens,
                                      audio_features, num_frames,
                                      language=language)

    durations = [t.end - t.start for t in timings if t.end > t.start]
    median_duration = (min(0.7, float(np.median(durations)))
                       if durations else 0.0)
    max_duration = 2.0 * median_duration
    if durations:
        # truncate implausibly long words that sit at a sentence boundary
        for prev_t, cur_t in zip(timings, timings[1:]):
            if cur_t.end - cur_t.start > max_duration:
                if cur_t.word in _SENTENCE_END_MARKS:
                    cur_t.end = cur_t.start + max_duration
                elif prev_t.word in _SENTENCE_END_MARKS:
                    cur_t.start = cur_t.end - max_duration

    merge_punctuations(timings, prepend_punctuations, append_punctuations)

    idx = 0
    for seg in segments:
        seg_n = sum(1 for t in seg.tokens if t < tokenizer.eot)
        words = []
        consumed = 0
        while idx < len(timings) and consumed < seg_n:
            wt = timings[idx]
            if wt.word:  # punctuation absorbed by merge keeps empty slots
                words.append({
                    "word": wt.word,
                    "start": round(time_offset + wt.start, 3),
                    "end": round(time_offset + wt.end, 3),
                    "probability": wt.probability,
                })
            consumed += len(wt.tokens)
            idx += 1
        if words:
            w0, w1 = words[0], words[1] if len(words) > 1 else None
            # an overlong first word right after a long silence gap is an
            # alignment artifact: clip it to max_duration
            if (w0["end"] - last_speech_timestamp > median_duration * 4
                    and (w0["end"] - w0["start"] > max_duration
                         or (w1 is not None
                             and w1["end"] - w0["start"] > max_duration * 2))):
                if w1 is not None and w1["end"] - w1["start"] > max_duration:
                    boundary = round(
                        max(w1["end"] / 2, w1["end"] - max_duration), 3)
                    w0["end"] = w1["start"] = boundary
                w0["start"] = round(max(0.0, w0["end"] - max_duration), 3)
            # segment start wins over a stretched first word; otherwise the
            # word's aligned start becomes the segment's
            if seg.start < w0["end"] and seg.start - 0.5 > w0["start"]:
                w0["start"] = round(
                    max(0.0, min(w0["end"] - median_duration, seg.start)), 3)
            else:
                seg.start = w0["start"]
            wl = words[-1]
            if seg.end > wl["start"] and seg.end + 0.5 < wl["end"]:
                wl["end"] = round(
                    max(wl["start"] + median_duration, seg.end), 3)
            else:
                seg.end = wl["end"]
            last_speech_timestamp = seg.end
        seg.words = words
