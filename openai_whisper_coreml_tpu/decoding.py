"""Autoregressive decoding: language ID, greedy sampling, logit rules.

The reference's entire decode story is ONE cache-less decoder call seeded with
SOT followed by an argmax over the 99 language logits
(/root/reference/Whisper/Whisper/Whisper.swift:33-40; decoder traced at fixed
(1,1) tokens, /root/reference/whisper_to_cml.py:28-32). This module keeps that
capability (`detect_language`) and completes it into full Whisper decoding:

  * a jitted `lax.while_loop` greedy/sampling decoder over a preallocated
    fixed-shape KV cache, with per-batch early stopping;
  * in-graph logit filters: token suppression, blank suppression at the first
    step, and the full openai timestamp rule set (pairing, monotonicity,
    max-initial, timestamp-vs-text probability mass);
  * temperature as a traced scalar (0 -> argmax) so one compiled graph serves
    the whole temperature-fallback ladder without recompiling.

Everything data-dependent lives in the carry; shapes are static — the shape
discipline TPU/XLA requires (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

import dataclasses
import functools
import zlib
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .config import WhisperConfig
from .models import decoder as dec_mod
from .parallel.sharding import KV_PSPEC, constrain
from .tokenizer import LANGUAGES, Tokenizer, get_tokenizer

Array = jax.Array


# ---------------------------------------------------------------------------
# Options / results
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DecodingOptions:
    task: str = "transcribe"
    language: Optional[str] = None
    temperature: float = 0.0
    sample_len: Optional[int] = None  # default: n_text_ctx // 2
    best_of: Optional[int] = None  # sampling candidates (temperature > 0)
    beam_size: Optional[int] = None
    patience: Optional[float] = None
    length_penalty: Optional[float] = None
    # previous-context prompt: one shared prompt (str or flat token list), or
    # a PER-SAMPLE list (one str/token-list/None per batch row — rows share
    # one bucketed graph via per-row left-pads; greedy/sampled only)
    prompt: Optional[Union[str, List[int], List[Union[str, List[int], None]]]] = None
    prefix: Optional[Union[str, List[int]]] = None  # prefix for this window
    suppress_tokens: Optional[Union[str, Sequence[int]]] = "-1"
    suppress_blank: bool = True
    without_timestamps: bool = False
    max_initial_timestamp: Optional[float] = 1.0
    # "int8": quantised cross-KV, dequantised inline on read (XLA fuses the
    # convert+scale into the attention reads; halves the dominant HBM stream)
    kv_dtype: str = "bf16"
    # "int8": quantised SELF-attention KV cache, same inline-dequant scheme
    # (orthogonal to kv_dtype; self-KV is the smaller stream — see
    # docs/benchmarks.md "int8 options")
    cache_dtype: str = "bf16"
    # phased frozen-prefix decode (greedy AND beam; token-exact vs the flat
    # loop — docs/benchmarks.md round 3). Off only for A/B or debugging.
    two_level: bool = True
    # staging-block columns. 64 measured fastest at BOTH long and short
    # horizons (B48 large-v3: 288.4 vs 276.7 RTFx at 224 tokens, 590 vs 568
    # at 64 tokens — round-4 sweep), retiring round-3's extrapolated
    # "short horizons want wider blocks" default of 128. 32 compile-OOMs
    # at B48; 192 exceeds the relay graph limit.
    stage_width: int = 64
    # speculative decoding: draft-proposal block size K (used when a draft
    # model is passed to decode(); greedy verifies by argmax agreement,
    # temperature > 0 by rejection sampling — see speculative.py)
    spec_k: int = 4

    def __post_init__(self):
        # the task switch compares against "transcribe" with a translate
        # fallback — a typo must not silently translate everything
        if self.task not in ("transcribe", "translate"):
            raise ValueError(
                f"task must be 'transcribe' or 'translate', got "
                f"{self.task!r}")
        # the dtype switches compare against "int8" with a bf16 fallback —
        # a typo must not silently serve the unquantised path
        for field in ("kv_dtype", "cache_dtype"):
            v = getattr(self, field)
            if v not in ("bf16", "int8"):
                raise ValueError(
                    f"{field} must be 'bf16' or 'int8', got {v!r}")
        if self.stage_width < 8 or self.stage_width % 8:
            raise ValueError(
                f"stage_width must be a positive multiple of 8, got "
                f"{self.stage_width}")
        if not 1 <= self.spec_k <= 16:
            raise ValueError(f"spec_k must be in [1, 16], got {self.spec_k}")


@dataclasses.dataclass
class DecodingResult:
    tokens: List[int]
    text: str
    language: str
    language_probs: Optional[Dict[str, float]]
    avg_logprob: float
    no_speech_prob: float
    temperature: float
    compression_ratio: float


def compression_ratio(text: str) -> float:
    data = text.encode("utf-8")
    if not data:
        return 0.0
    return len(data) / len(zlib.compress(data))


# ---------------------------------------------------------------------------
# Suppress-mask construction (host side; passed into jit as a constant array)
# ---------------------------------------------------------------------------

def build_suppress_mask(tokenizer: Tokenizer, options: DecodingOptions) -> np.ndarray:
    """Boolean (vocab,) — True where the token must never be sampled.

    Mirrors openai's SuppressTokens filter list: user-specified ids ("-1"
    meaning the non-speech set), plus sot/sot_prev/sot_lm/no_speech, plus all
    language+task specials, plus no_timestamps.
    """
    cfg = tokenizer.cfg
    mask = np.zeros(cfg.n_vocab, dtype=bool)

    sup = options.suppress_tokens
    ids: List[int] = []
    if isinstance(sup, str):
        ids = [int(s) for s in sup.split(",") if s] if sup else []
    elif sup is not None:
        ids = list(sup)
    if -1 in ids:
        ids = [i for i in ids if i != -1]
        ids.extend(tokenizer.non_speech_tokens)

    ids.extend([tokenizer.transcribe, tokenizer.translate, tokenizer.sot,
                tokenizer.sot_prev, tokenizer.sot_lm])
    if tokenizer.no_speech is not None:
        ids.append(tokenizer.no_speech)
    # language tokens are only valid at the dedicated position
    ids.extend(range(cfg.lang_token_start, cfg.lang_token_start + cfg.n_langs))
    mask[np.asarray(sorted(set(ids)), dtype=np.int64)] = True
    mask[tokenizer.no_timestamps] = True
    return mask


def build_blank_mask(tokenizer: Tokenizer) -> np.ndarray:
    """True for ' ' encodings and EOT — suppressed at the first sampled step."""
    mask = np.zeros(tokenizer.cfg.n_vocab, dtype=bool)
    for t in tokenizer.blank_tokens:
        mask[t] = True
    mask[tokenizer.eot] = True
    return mask


# ---------------------------------------------------------------------------
# In-graph logit filters
# ---------------------------------------------------------------------------

NEG_INF = jnp.float32(-1e30)


def _apply_logit_rules(
    logits: Array,  # (B, V) fp32
    tokens: Array,  # (B, L) buffer
    pos: Array,  # scalar OR (B,) int32: index being sampled now (per row)
    cfg: WhisperConfig,
    prompt_len: int,
    suppress_mask: Array,  # (V,) bool
    blank_mask: Array,  # (V,) bool
    use_timestamps: bool,
    ts_max: Array,  # (B,) int32 — max timestamp token sampled so far
    max_initial_ts_index: Array,  # scalar int32, -1 disables
) -> Array:
    v = logits.shape[-1]
    b = tokens.shape[0]
    vocab_ids = jnp.arange(v, dtype=jnp.int32)[None, :]  # (1, V)
    ts_begin = cfg.timestamp_begin
    eot = cfg.eot_token
    # per-row position column: lockstep decode passes a scalar, the
    # continuous-batching engine a (B,) vector of independent positions
    pos_b = jnp.broadcast_to(jnp.asarray(pos, jnp.int32), (b,))[:, None]

    logits = jnp.where(suppress_mask[None, :], NEG_INF, logits)

    is_first = pos_b == prompt_len  # (B, 1)
    logits = jnp.where(is_first & blank_mask[None, :], NEG_INF, logits)

    if not use_timestamps:
        # without_timestamps: suppress every timestamp token
        return jnp.where(vocab_ids >= ts_begin, NEG_INF, logits)

    # ---- openai ApplyTimestampRules, vectorised ---------------------------
    last = jnp.take_along_axis(tokens, jnp.maximum(pos_b - 1, 0), axis=1)
    penult = jnp.take_along_axis(tokens, jnp.maximum(pos_b - 2, 0), axis=1)
    last_is_ts = (pos_b - 1 >= prompt_len) & (last >= ts_begin)  # (B,1)
    # openai semantics: with fewer than two sampled tokens the "penultimate"
    # slot counts as a timestamp, so the opening timestamp is followed by text
    penult_is_ts = (pos_b - 2 < prompt_len) | (penult >= ts_begin)

    # a) two timestamps in a row -> next must be text (no third timestamp)
    rule_a = last_is_ts & penult_is_ts & (vocab_ids >= ts_begin)
    # b) lone timestamp -> must pair: suppress text (ids < eot); eot allowed
    rule_b = last_is_ts & ~penult_is_ts & (vocab_ids < eot)
    # c) timestamps are non-decreasing: suppress [ts_begin, ts_last).
    # openai semantics: after a LONE timestamp the pairing one may be EQUAL
    # (ts_last = last sampled timestamp); otherwise the next timestamp must be
    # STRICTLY greater (ts_last = last + 1, "to prevent infinite looping" —
    # zero-length segments would stall the seek loop). ts_max is initialised
    # to ts_begin - 1, so before any timestamp is sampled this suppresses
    # nothing (matching openai's `if timestamps.numel() > 0` guard).
    lone_ts = last_is_ts[:, 0] & ~penult_is_ts[:, 0]
    ts_last = jnp.where(lone_ts, ts_max, ts_max + 1)[:, None]
    rule_c = (vocab_ids >= ts_begin) & (vocab_ids < ts_last)
    logits = jnp.where(rule_a | rule_b | rule_c, NEG_INF, logits)

    # d) first sampled token must be a timestamp, bounded by max_initial
    force_first = is_first & (vocab_ids < ts_begin)
    over_initial = (is_first & (max_initial_ts_index >= 0)
                    & (vocab_ids > ts_begin + max_initial_ts_index))
    logits = jnp.where(force_first | over_initial, NEG_INF, logits)

    # e) if total timestamp probability outweighs the best text token,
    #    sample a timestamp
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    ts_logprob = jax.nn.logsumexp(
        jnp.where(vocab_ids >= ts_begin, logprobs, NEG_INF), axis=-1, keepdims=True)
    max_text = jnp.max(
        jnp.where(vocab_ids < ts_begin, logprobs, NEG_INF), axis=-1, keepdims=True)
    rule_e = (ts_logprob > max_text) & (vocab_ids < ts_begin)
    return jnp.where(rule_e, NEG_INF, logits)


# ---------------------------------------------------------------------------
# Jitted greedy/sampling decode loop
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("cfg", "sample_len", "use_timestamps", "prompt_len",
                     "kv_dtype", "cache_dtype", "two_level", "stage_width"),
)
def greedy_decode_core(
    params,
    cfg: WhisperConfig,
    audio_features: Array,  # (B, S, n_state)
    initial_tokens: Array,  # (B, P) int32, left-padded to the P bucket
    suppress_mask: Array,  # (V,) bool
    blank_mask: Array,  # (V,) bool
    temperature: Array,  # scalar fp32; 0 -> argmax
    key: Array,  # PRNG key (used when temperature > 0)
    max_initial_ts_index: Array,  # scalar int32; -1 disables
    pad_len: Array,  # int32 scalar or (B,): slots [0, pad_len) are padding
    sot_index: Array,  # int32 scalar or (B,): slot holding the SOT token
    *,
    sample_len: int,
    use_timestamps: bool,
    prompt_len: int,
    kv_dtype: str = "bf16",
    cache_dtype: str = "bf16",
    two_level: bool = True,
    stage_width: int = 64,
):
    """Returns (tokens (B, P+sample_len), sum_logprobs, n_sampled,
    no_speech_prob) — all device arrays.

    prompt_len is a BUCKET size (static); the true prompt occupies slots
    [pad_len, prompt_len). Bucketing keeps the number of compiled graphs
    bounded while long-form conditioning grows the prompt every window.

    two_level: decode in phases over `stage_width`-column blocks of the
    self-KV cache. Within a phase only the staging block is loop-carried
    and written; completed blocks join a read-only frozen prefix between
    phases. This pins the per-step whole-buffer layout-conversion cost
    (linear in live capacity — docs/benchmarks.md round 3) at the
    staging-width figure regardless of context length. Token-identical to
    the flat path up to fp32 summation order in the split attention.
    stage_width 128 is the measured sweet spot on v5e (docs/benchmarks.md
    round-3 staging-width sweep); 64/256 are sweepable via BENCH_STAGE_WIDTH.
    """
    b = audio_features.shape[0]
    eot = cfg.eot_token
    total_len = prompt_len + sample_len

    if kv_dtype == "int8":
        cross_kv = dec_mod.precompute_cross_kv_int8(params, cfg,
                                                    audio_features)
    else:
        cross_kv = dec_mod.precompute_cross_kv(params, cfg, audio_features)
    cache_len = min(-(-total_len // 128) * 128, cfg.n_text_ctx)
    two_level = two_level and cache_dtype != "int8"
    if two_level:
        # absolute column ranges the staging block sweeps over, phase by
        # phase; the prefill cache only spans the first block
        col_blocks = []
        lo = stage_width * (prompt_len // stage_width)
        while lo < cache_len:
            col_blocks.append((lo, min(lo + stage_width, cache_len)))
            lo = col_blocks[-1][1]
        prefill_ctx = col_blocks[0][1]
    else:
        prefill_ctx = cache_len
    if cache_dtype == "int8":
        cache = dec_mod.init_kv_cache_int8(cfg, b, ctx=prefill_ctx)
    else:
        cache = dec_mod.init_kv_cache(cfg, b, dtype=audio_features.dtype,
                                      ctx=prefill_ctx)

    tokens = jnp.full((b, total_len), eot, jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, initial_tokens, (0, 0))

    prefill_logits, cache = dec_mod.decode_step(
        params, cfg, initial_tokens, cross_kv, cache, 0, valid_from=pad_len)
    # no-speech probability read at the SOT position of the prompt
    # (openai semantics; generalises the reference's SOT-step probe);
    # sot_index may be per-row when prompts differ across the batch
    si = jnp.broadcast_to(jnp.asarray(sot_index, jnp.int32), (b,))
    sot_logits = jnp.take_along_axis(prefill_logits, si[:, None, None],
                                     axis=1)[:, 0]
    no_speech_prob = jax.nn.softmax(
        sot_logits.astype(jnp.float32), axis=-1)[:, cfg.no_speech_token]

    rows_b = jnp.arange(b)

    def sample(logits, pos):
        """temperature > 0: COUNTER-BASED per-(row, absolute position) keys
        — fold_in(fold_in(key, pos), row) — so a sampled token is a pure
        function of (seed, row, position). That property is what makes the
        sampled speculative path (speculative.py, whose rows sit at
        DIFFERENT positions after per-row acceptance) seed-exact against
        this lockstep loop when the draft equals the target."""
        def argmax(_):
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)

        def sample_t(_):
            ks = jax.vmap(
                lambda r: jax.random.fold_in(jax.random.fold_in(key, pos), r)
            )(rows_b)
            return jax.vmap(jax.random.categorical)(
                ks, logits / jnp.maximum(temperature, 1e-6)
            ).astype(jnp.int32)

        return jax.lax.cond(temperature > 0, sample_t, argmax, 0)

    def make_step(frozen):
        def step(carry):
            (pos, tokens, cache, logits, finished, sum_lp, n_sampled, ts_max,
             key) = carry

            filtered = _apply_logit_rules(
                logits, tokens, pos, cfg, prompt_len, suppress_mask,
                blank_mask, use_timestamps, ts_max, max_initial_ts_index)

            tok = sample(filtered, pos)
            logprobs = jax.nn.log_softmax(filtered, axis=-1)
            tok_lp = jnp.take_along_axis(logprobs, tok[:, None], axis=1)[:, 0]

            tok = jnp.where(finished, eot, tok)
            sum_lp = sum_lp + jnp.where(finished, 0.0, tok_lp)
            n_sampled = n_sampled + jnp.where(finished, 0, 1)
            ts_max = jnp.where(
                (tok >= cfg.timestamp_begin) & ~finished, tok, ts_max)
            finished = finished | (tok == eot)

            tokens = jax.lax.dynamic_update_slice(
                tokens, tok[:, None], (0, pos))

            next_logits, cache = dec_mod.decode_step(
                params, cfg, tok[:, None], cross_kv, cache, pos,
                valid_from=pad_len, frozen=frozen)
            return (pos + 1, tokens, cache,
                    next_logits[:, 0].astype(jnp.float32),
                    finished, sum_lp, n_sampled, ts_max, key)
        return step

    def make_cond(hi):
        def cond(carry):
            pos, _, _, _, finished, *_ = carry
            return (pos < hi) & ~jnp.all(finished)
        return cond

    init = (
        jnp.int32(prompt_len),
        tokens,
        cache,
        prefill_logits[:, -1].astype(jnp.float32),
        jnp.zeros((b,), jnp.bool_),
        jnp.zeros((b,), jnp.float32),
        jnp.zeros((b,), jnp.int32),
        # ts_max sentinel: ts_begin - 1 == "no timestamp sampled yet"
        jnp.full((b,), cfg.timestamp_begin - 1, jnp.int32),
        key,
    )
    if not two_level:
        (pos, tokens, cache, _, finished, sum_lp, n_sampled, ts_max, _) = (
            jax.lax.while_loop(make_cond(total_len), make_step(None), init))
        return tokens, sum_lp, n_sampled, no_speech_prob

    # two-level phases: one while_loop per 128-column staging block; the
    # frozen prefix grows between phases (Python level, inside this jit)
    carry = init
    frozen = None
    for bi, (lo, hi) in enumerate(col_blocks):
        if bi == 0:
            if lo > 0:
                frozen = dec_mod.KVCache(cache.k[..., :lo], cache.v[..., :lo])
                staging = dec_mod.KVCache(cache.k[..., lo:], cache.v[..., lo:])
                carry = carry[:2] + (staging,) + carry[3:]
        else:
            done = carry[2]  # the completed staging block
            if frozen is None:
                frozen = done
            else:
                frozen = dec_mod.KVCache(
                    constrain(jnp.concatenate([frozen.k, done.k], -1),
                              KV_PSPEC),
                    constrain(jnp.concatenate([frozen.v, done.v], -1),
                              KV_PSPEC))
            # the last block may be narrower (cache_len is 128-rounded,
            # not stage_width-rounded)
            staging = dec_mod.init_kv_cache(
                cfg, b, dtype=audio_features.dtype, ctx=hi - lo)
            carry = carry[:2] + (staging,) + carry[3:]
        carry = jax.lax.while_loop(
            make_cond(min(hi, total_len)), make_step(frozen), carry)
    (pos, tokens, cache, _, finished, sum_lp, n_sampled, ts_max, _) = carry
    return tokens, sum_lp, n_sampled, no_speech_prob


# ---------------------------------------------------------------------------
# Mesh helpers (DP x TP serving: decode under the model's mesh)
# ---------------------------------------------------------------------------

def _model_mesh_ctx(model):
    """model.mesh_context() when available, else a no-op (mock models)."""
    import contextlib

    ctx = getattr(model, "mesh_context", None)
    return ctx() if ctx is not None else contextlib.nullcontext()


def _pad_batch_to_mesh(x: Array, mesh) -> Array:
    """Pad the batch (repeat the last row) to a multiple of the data axis so
    data-sharded placement and the in-graph cache constraints divide evenly."""
    from .parallel.mesh import AXIS_DATA

    pad = (-x.shape[0]) % mesh.shape[AXIS_DATA]
    if pad:
        x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)
    return x


# ---------------------------------------------------------------------------
# Language identification
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg",))
def _detect_language_core(params, cfg: WhisperConfig, audio_features: Array):
    b = audio_features.shape[0]
    cross_kv = dec_mod.precompute_cross_kv(params, cfg, audio_features)
    cache = dec_mod.init_kv_cache(cfg, b, dtype=audio_features.dtype)
    sot = jnp.full((b, 1), cfg.sot_token, jnp.int32)
    logits, _ = dec_mod.decode_step(params, cfg, sot, cross_kv, cache, 0)
    logits = logits[:, 0].astype(jnp.float32)  # (B, V)

    # mask to the language tokens only — the reference's slice
    # logits[50259...50357] (Whisper.swift:37), generalised via config
    vocab_ids = jnp.arange(cfg.n_vocab)[None, :]
    in_lang = ((vocab_ids >= cfg.lang_token_start)
               & (vocab_ids < cfg.lang_token_start + cfg.n_langs))
    masked = jnp.where(in_lang, logits, NEG_INF)
    probs = jax.nn.softmax(masked, axis=-1)
    lang_probs = jax.lax.dynamic_slice(
        probs, (0, cfg.lang_token_start), (b, cfg.n_langs))
    return jnp.argmax(lang_probs, axis=-1), lang_probs


def detect_language(model, mel_or_features, *, from_features: bool = False):
    """Language-ID: returns (codes: List[str], probs: List[Dict[str,float]]).

    Batched equivalent of the reference's decode()
    (/root/reference/Whisper/Whisper/Whisper.swift:33-40). Runs under the
    model's mesh (DP x TP) when one is attached.
    """
    cfg = model.cfg
    if not cfg.multilingual:
        raise ValueError("language detection requires a multilingual model")
    x = jnp.asarray(mel_or_features)
    x = x if x.ndim == 3 else x[None]
    b_in = x.shape[0]
    mesh = getattr(model, "mesh", None)
    if mesh is not None:
        x = model.shard_batch(_pad_batch_to_mesh(x, mesh))
    with _model_mesh_ctx(model):
        if from_features:
            feats = x
        else:
            feats = model._encode_jit(model.params, mel=x)
        idx, probs = _detect_language_core(model.params, cfg, feats)
    idx, probs = idx[:b_in], probs[:b_in]
    idx = np.asarray(idx)
    probs = np.asarray(probs)
    codes = [LANGUAGES[i] for i in idx]
    prob_dicts = [
        {LANGUAGES[j]: float(p[j]) for j in range(cfg.n_langs)} for p in probs
    ]
    return codes, prob_dicts


# ---------------------------------------------------------------------------
# Host-side decoding task (builds prompts/masks, runs the jitted core)
# ---------------------------------------------------------------------------

# Few, coarse buckets: each bucket is one compiled decode graph (~minutes of
# XLA time for large models), and prefill overshoot is cheap next to the
# sequential decode steps. 4 covers bare sot-sequences, 32 short prefixes,
# 224 the conditioned long-form windows.
_PROMPT_BUCKETS = (4, 32, 224)


def _prompt_bucket(n: int, n_ctx: int) -> int:
    for b in _PROMPT_BUCKETS:
        if n <= b:
            # small-context models (tests) must not bucket past their own
            # context; n itself is pre-clamped to n_ctx - 2 by the caller
            return min(b, n_ctx - 2)
    return min(n, n_ctx - 2)


def _as_token_list(tokenizer: Tokenizer, x: Union[str, List[int], None],
                   prepend_space: bool = True) -> List[int]:
    if x is None:
        return []
    if isinstance(x, str):
        text = (" " + x.strip()) if prepend_space else x
        return tokenizer.encode(text)
    return list(x)


def decode(
    model,
    mel_or_features: Array,
    options: DecodingOptions = DecodingOptions(),
    *,
    from_features: bool = False,
    tokenizer: Optional[Tokenizer] = None,
    seed: int = 0,
    draft=None,
) -> List[DecodingResult]:
    """Decode a batch of 30 s segments; returns one DecodingResult each.

    With a mesh attached to the model this runs the full KV-cache decode loop
    under DP x TP GSPMD: the batch is padded to the data axis, inputs are
    placed data-sharded, and the cache/cross-KV constraints in models.decoder
    keep heads on the model axis.

    draft: a smaller WhisperModel sharing the tokenizer — enables greedy
    speculative decoding (speculative.py; options.spec_k proposals per
    verify step). Ignored for beam/sampled/best_of decodes, which fall back
    to the standard loop.
    """
    mesh = getattr(model, "mesh", None)
    if mesh is None:
        return _decode_impl(model, mel_or_features, options,
                            from_features=from_features, tokenizer=tokenizer,
                            seed=seed, draft=draft)
    x = jnp.asarray(mel_or_features)
    x = x if x.ndim == 3 else x[None]
    b_in = x.shape[0]
    x = model.shard_batch(_pad_batch_to_mesh(x, mesh))
    if (x.shape[0] != b_in and isinstance(options.prompt, (list, tuple))
            and len(options.prompt) == b_in and options.prompt
            and not isinstance(options.prompt[0], (int, np.integer))):
        # batch was padded to the data axis: pad the per-sample prompt list
        # alongside (padded rows repeat the last prompt and are trimmed)
        extra = x.shape[0] - b_in
        options = dataclasses.replace(
            options, prompt=list(options.prompt)
            + [options.prompt[-1]] * extra)
    with _model_mesh_ctx(model):
        results = _decode_impl(model, x, options, from_features=from_features,
                               tokenizer=tokenizer, seed=seed, draft=draft)
    return results[:b_in]


def _decode_impl(
    model,
    mel_or_features: Array,
    options: DecodingOptions,
    *,
    from_features: bool,
    tokenizer: Optional[Tokenizer],
    seed: int,
    draft=None,
) -> List[DecodingResult]:
    cfg = model.cfg
    x = jnp.asarray(mel_or_features)
    if from_features:
        feats = x if x.ndim == 3 else x[None]
    else:
        mel = x if x.ndim == 3 else x[None]
        feats = model._encode_jit(model.params, mel=mel)
    b = feats.shape[0]

    # -- language ----------------------------------------------------------
    language = options.language
    language_probs: List[Optional[Dict[str, float]]] = [None] * b
    if cfg.multilingual and language is None:
        codes, prob_dicts = detect_language(model, feats, from_features=True)
        language_probs = prob_dicts
        langs = codes
    else:
        langs = [language or "en"] * b

    # one jitted call per distinct language in the batch would recompile;
    # instead build per-sample prompts of identical length
    if tokenizer is None:
        tokenizer = get_tokenizer(cfg, language=langs[0] if cfg.multilingual
                                  else None, task=options.task)

    sot_seqs = []
    for lang in langs:
        if cfg.multilingual:
            task_tok = (tokenizer.transcribe if options.task == "transcribe"
                        else tokenizer.translate)
            seq = [tokenizer.sot, tokenizer.language_token(lang), task_tok]
        else:
            seq = [tokenizer.sot]
        if options.without_timestamps:
            seq.append(tokenizer.no_timestamps)
        sot_seqs.append(seq)

    prompt_in = options.prompt
    # per-sample prompts: a list/tuple whose entries are themselves
    # prompts (str / token list / None) — one per batch row. A flat list of
    # ints remains a single shared prompt.
    per_sample_prompt = (isinstance(prompt_in, (list, tuple))
                         and len(prompt_in) > 0
                         and not isinstance(prompt_in[0], (int, np.integer)))
    if per_sample_prompt:
        if len(prompt_in) != b:
            raise ValueError(f"per-sample prompt list has {len(prompt_in)} "
                             f"entries for batch {b}")
        prompt_rows = [_as_token_list(tokenizer, p) for p in prompt_in]
    else:
        prompt_rows = [_as_token_list(tokenizer, prompt_in)] * b
    prefix_tokens = _as_token_list(tokenizer, options.prefix)

    sample_len = options.sample_len or cfg.n_text_ctx // 2
    # keep at most the trailing half-context of previous text; openai trims
    # the prefix to the available context too (a long prefix would otherwise
    # overflow the decode buffer with a negative pad)
    max_prompt = cfg.n_text_ctx // 2 - 1
    prompt_rows = [p[-max_prompt:] if p else [] for p in prompt_rows]
    if prefix_tokens:
        prefix_tokens = prefix_tokens[-max_prompt:]

    initial = []
    max_len = cfg.n_text_ctx - 2  # leave room for >=1 sampled token + EOT
    for seq, ptoks in zip(sot_seqs, prompt_rows):
        toks = ([tokenizer.sot_prev] + ptoks if ptoks else [])
        toks = toks + seq + prefix_tokens
        if len(toks) > max_len:
            # prompt + prefix together can still exceed the context: drop the
            # OLDEST conditioning (front) — the sot sequence sits after it
            toks = toks[len(toks) - max_len:]
        initial.append(toks)

    # Bucket the prompt length so the jitted core compiles once per bucket,
    # not once per window of a long-form run (conditioning grows the prompt).
    # Rows with shorter prompts are left-padded further; the per-row pad/sot
    # vectors keep the SAME graph (shapes don't depend on the values).
    prompt_len = _prompt_bucket(max(len(t) for t in initial), cfg.n_text_ctx)
    pads = [prompt_len - len(t) for t in initial]
    sots = [p + t.index(tokenizer.sot) for p, t in zip(pads, initial)]
    initial = [[tokenizer.eot] * p + t for p, t in zip(pads, initial)]
    sample_len = min(sample_len, cfg.n_text_ctx - prompt_len)
    if per_sample_prompt:
        pad = np.asarray(pads, np.int32)  # (B,) per-row left-pads
        sot_index = np.asarray(sots, np.int32)
    else:
        assert all(p == pads[0] for p in pads)
        pad, sot_index = pads[0], sots[0]

    suppress_mask = jnp.asarray(build_suppress_mask(tokenizer, options))
    blank_mask = jnp.asarray(build_blank_mask(tokenizer)
                             if options.suppress_blank
                             else np.zeros(cfg.n_vocab, bool))

    max_init_idx = -1
    if options.max_initial_timestamp is not None and not options.without_timestamps:
        max_init_idx = round(options.max_initial_timestamp / 0.02)

    # governor kinetics: wall the decode core (speculative.LAST_TIMING).
    # The window starts after the encoder/host prompt work and closes at the
    # host readback below — it includes the in-graph setup (cross-KV
    # precompute + prefill), a documented conservative bias (SpecGovernor).
    import time as _time

    _timing_path = None
    _t_core0 = _time.perf_counter()

    use_beam = options.beam_size is not None and options.temperature == 0.0
    if use_beam and per_sample_prompt:
        raise ValueError(
            "per-sample prompts are supported for greedy/sampled decoding "
            "only (beam search assumes one shared pad/sot layout)")
    if use_beam:
        from .beam import beam_decode_core, rank_sequences

        k = options.beam_size
        max_candidates = max(k, round(k * (options.patience or 1.0)))
        all_tokens, all_scores, all_lens, no_speech_prob = beam_decode_core(
            model.params,
            cfg,
            feats,
            jnp.asarray(np.asarray(initial, np.int32)),
            suppress_mask,
            blank_mask,
            jnp.int32(max_init_idx),
            jnp.int32(pad),
            jnp.int32(sot_index),
            sample_len=sample_len,
            use_timestamps=not options.without_timestamps,
            prompt_len=prompt_len,
            beam_size=k,
            max_candidates=max_candidates,
            kv_dtype=options.kv_dtype,
            cache_dtype=options.cache_dtype,
            two_level=options.two_level,
            stage_width=options.stage_width,
        )
        ranked = rank_sequences(all_scores, all_lens, options.length_penalty)
        best = jnp.argmax(ranked, axis=1)
        tokens = np.asarray(jnp.take_along_axis(
            all_tokens, best[:, None, None], axis=1)[:, 0])
        sum_lp = np.asarray(jnp.take_along_axis(
            all_scores, best[:, None], axis=1)[:, 0])
        n_sampled = np.asarray(jnp.take_along_axis(
            all_lens, best[:, None], axis=1)[:, 0])
    elif (draft is not None
          and not (options.best_of and options.best_of > 1
                   and options.temperature > 0)
          and options.cache_dtype != "int8"):
        # speculative decoding: greedy rungs verify by argmax agreement;
        # sampled rungs (t > 0, round-5) use rejection sampling, which
        # preserves the plain sampled distribution exactly. best_of fan-out
        # keeps the plain path (candidate geometry); int8 self-cache
        # unsupported.
        from .speculative import check_pair, draft_features, spec_decode_core

        check_pair(cfg, draft.cfg)
        feats_d = draft_features(model, draft,
                                 None if from_features else mel, feats)
        # candidate writes overshoot by up to K columns; keep them in-context
        sample_len = min(sample_len,
                         cfg.n_text_ctx - prompt_len - options.spec_k - 1)
        sampled = options.temperature > 0
        tokens, sum_lp, n_sampled, no_speech_prob, n_iters, n_drafted = (
            spec_decode_core(
                model.params,
                draft.params,
                cfg,
                draft.cfg,
                feats,
                feats_d,
                jnp.asarray(np.asarray(initial, np.int32)),
                suppress_mask,
                blank_mask,
                jnp.int32(max_init_idx),
                jnp.asarray(pad, jnp.int32),
                jnp.asarray(sot_index, jnp.int32),
                jnp.float32(options.temperature) if sampled else None,
                jax.random.PRNGKey(seed) if sampled else None,
                sample_len=sample_len,
                use_timestamps=not options.without_timestamps,
                prompt_len=prompt_len,
                spec_k=options.spec_k,
                kv_dtype=options.kv_dtype,
                sampled=sampled,
            ))
        from . import speculative as _spec_mod
        from .speculative import spec_stats

        _spec_mod.LAST_STATS = spec_stats(np.asarray(n_sampled),
                                          np.asarray(n_iters),
                                          np.asarray(n_drafted))
        _spec_mod.accumulate_stats(_spec_mod.LAST_STATS)
        _timing_path = ("spec", int(np.max(np.asarray(n_iters))))
    else:
        # best_of: independent sampling candidates, ranked by avg logprob
        # (openai semantics; only meaningful at temperature > 0)
        n_cand = (options.best_of
                  if options.best_of and options.temperature > 0 else 1)
        feats_in = (jnp.repeat(feats, n_cand, axis=0) if n_cand > 1 else feats)
        init_arr = np.asarray(initial, np.int32)
        pad_arr, sot_arr = pad, sot_index
        if n_cand > 1:
            init_arr = np.repeat(init_arr, n_cand, axis=0)
            if per_sample_prompt:
                pad_arr = np.repeat(pad_arr, n_cand, axis=0)
                sot_arr = np.repeat(sot_arr, n_cand, axis=0)
        tokens, sum_lp, n_sampled, no_speech_prob = greedy_decode_core(
            model.params,
            cfg,
            feats_in,
            jnp.asarray(init_arr),
            suppress_mask,
            blank_mask,
            jnp.float32(options.temperature),
            jax.random.PRNGKey(seed),
            jnp.int32(max_init_idx),
            jnp.asarray(pad_arr, jnp.int32),
            jnp.asarray(sot_arr, jnp.int32),
            sample_len=sample_len,
            use_timestamps=not options.without_timestamps,
            prompt_len=prompt_len,
            kv_dtype=options.kv_dtype,
            cache_dtype=options.cache_dtype,
            two_level=options.two_level,
            stage_width=options.stage_width,
        )
        if n_cand > 1:
            tokens = np.asarray(tokens).reshape(b, n_cand, -1)
            sum_lp = np.asarray(sum_lp).reshape(b, n_cand)
            n_sampled = np.asarray(n_sampled).reshape(b, n_cand)
            no_speech_prob = np.asarray(no_speech_prob).reshape(b, n_cand)[:, 0]
            avg = sum_lp / np.maximum(n_sampled, 1)
            best = np.argmax(avg, axis=1)
            rows = np.arange(b)
            tokens = tokens[rows, best]
            sum_lp = sum_lp[rows, best]
            n_sampled = n_sampled[rows, best]

    tokens = np.asarray(tokens)
    sum_lp = np.asarray(sum_lp)
    n_sampled = np.asarray(n_sampled)
    no_speech_prob = np.asarray(no_speech_prob)

    # publish the decode-core wall for governor calibration. "plain" = the
    # single-candidate lockstep loop (greedy OR sampled — identical step
    # kinetics); beam/best_of geometries publish None. The np.asarray
    # readbacks above are the fence.
    from . import speculative as _spec_mod

    if _timing_path is None and not use_beam and not (
            options.best_of and options.best_of > 1
            and options.temperature > 0):
        _timing_path = ("plain", int(np.max(n_sampled)))
    if _timing_path is not None:
        path, units = _timing_path
        _spec_mod.LAST_TIMING = {
            "path": path,
            "wall_s": _time.perf_counter() - _t_core0,
            "units": units,
            "batch": b,
            "k": options.spec_k if path == "spec" else None,
            "temperature": float(options.temperature),
        }
    else:
        _spec_mod.LAST_TIMING = None

    results = []
    for i in range(b):
        sampled = tokens[i, prompt_len:]
        eot_pos = np.nonzero(sampled == tokenizer.eot)[0]
        cut = int(eot_pos[0]) if len(eot_pos) else len(sampled)
        toks = sampled[:cut].tolist()
        text = tokenizer.decode(toks).strip()
        avg_lp = float(sum_lp[i] / max(int(n_sampled[i]), 1))
        results.append(DecodingResult(
            tokens=toks,
            text=text,
            language=langs[i],
            language_probs=language_probs[i],
            avg_logprob=avg_lp,
            no_speech_prob=float(no_speech_prob[i]),
            temperature=float(options.temperature),
            compression_ratio=compression_ratio(text),
        ))
    return results
