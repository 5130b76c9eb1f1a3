"""Top-level Whisper model: config + params + jitted entry points.

This is the TPU-native analogue of the reference's `struct Whisper`
(/root/reference/Whisper/Whisper/Whisper.swift:11-41): where the reference
loads two compiled CoreML graphs, we hold a param pytree and jit-compile pure
functions over it (compilation is XLA's job, at first call, cached).
"""

from __future__ import annotations

import contextlib
import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import audio as audio_mod
from ..config import WhisperConfig, get_config
from ..params import Params, count_params, init_params
from . import decoder as dec_mod
from . import encoder as enc_mod


@dataclasses.dataclass
class WhisperModel:
    cfg: WhisperConfig
    params: Params
    flash: bool = False  # use Pallas flash-attention kernels where applicable
    # (data, model) mesh for DP x TP serving; params are sharded onto it by
    # load_model and every jitted entry runs under its context so the
    # decode-state sharding constraints (parallel/sharding.py) take effect
    mesh: Optional[Mesh] = None
    # (n_text_layer, n_text_head) bool mask for word-timestamp alignment;
    # carried from checkpoint metadata (tools/convert.py), else timing.py
    # falls back to the upper-half-layers heuristic
    alignment_heads: Optional[np.ndarray] = None
    # optional paired draft model (e.g. large-v3-turbo for large-v3): a
    # deployment property — serving paths pick it up for greedy rungs and
    # run speculative decoding (speculative.py) instead of the flat loop.
    # Must share the tokenizer (speculative.check_pair).
    draft: Optional["WhisperModel"] = None

    def mesh_context(self):
        """jax.set_mesh(self.mesh), or a no-op for single-chip models."""
        if self.mesh is None:
            return contextlib.nullcontext()
        return jax.set_mesh(self.mesh)

    def shard_batch(self, x: jax.Array) -> jax.Array:
        """Place a batch-major array data-sharded on the mesh (no-op without
        a mesh or when the batch does not divide the data axis)."""
        if self.mesh is None:
            return x
        from ..parallel.mesh import AXIS_DATA

        if x.shape[0] % self.mesh.shape[AXIS_DATA] != 0:
            return x
        spec = P(AXIS_DATA, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(self.mesh, spec))

    # -- forward passes -----------------------------------------------------

    @functools.cached_property
    def _encode_jit(self):
        return jax.jit(functools.partial(
            enc_mod.encode, cfg=self.cfg, flash=self.flash))

    @functools.cached_property
    def _logits_jit(self):
        return jax.jit(functools.partial(dec_mod.decoder_forward, cfg=self.cfg))

    def encode(self, mel: jax.Array) -> jax.Array:
        """(B, n_mels, 3000) or (n_mels, 3000) -> (B, 1500, n_state).

        Counterpart of Whisper.encode (Whisper.swift:23-31) minus the
        per-element MLMultiArray marshalling — input stays a device array.
        """
        mel = jnp.asarray(mel)
        squeeze = mel.ndim == 2
        if squeeze:
            mel = mel[None]
        with self.mesh_context():
            feats = self._encode_jit(self.params, mel=self.shard_batch(mel))
        return feats[0] if squeeze else feats

    def logits(self, tokens: jax.Array, audio_features: jax.Array) -> jax.Array:
        """Teacher-forcing logits (B, T, vocab), fp32."""
        with self.mesh_context():
            return self._logits_jit(self.params, tokens=jnp.asarray(tokens),
                                    audio_features=audio_features)

    # -- capability parity with the reference -------------------------------

    def detect_language(self, mel_or_features: jax.Array, *,
                        from_features: bool = False):
        """Language ID from the SOT-step logits.

        Replicates Whisper.decode (Whisper.swift:33-40): one decoder step
        seeded with SOT, argmax restricted to the language tokens — but
        batched and jitted, returning (codes, probability dict list).
        """
        from ..decoding import detect_language as _detect

        return _detect(self, mel_or_features, from_features=from_features)

    def transcribe(self, audio, **kwargs):
        from ..transcribe import transcribe as _transcribe

        return _transcribe(self, audio, **kwargs)

    def decode(self, mel, options=None, **kwargs):
        """openai `model.decode(mel, options)` parity: decode one batch of
        30 s windows (mel or encoded features; see decoding.decode).
        Returns a DecodingResult per batch row (a bare result for an
        unbatched mel, matching openai)."""
        from ..decoding import DecodingOptions, decode as _decode

        if options is None:
            options = DecodingOptions(**kwargs)
        elif kwargs:  # openai: kwargs override fields of a given options
            options = dataclasses.replace(options, **kwargs)
        mel = jnp.asarray(mel)
        unbatched = mel.ndim == 2
        results = _decode(self, mel[None] if unbatched else mel, options)
        return results[0] if unbatched else results

    # -- utilities ----------------------------------------------------------

    def log_mel(self, audio_wave) -> jax.Array:
        return audio_mod.log_mel_spectrogram(audio_wave, n_mels=self.cfg.n_mels)

    @property
    def num_params(self) -> int:
        return count_params(self.params)

    @property
    def is_multilingual(self) -> bool:
        return self.cfg.multilingual


def load_model(
    name: str,
    *,
    dtype=None,
    checkpoint: Optional[str] = None,
    seed: int = 0,
    flash: Optional[bool] = None,
    quantize: Optional[str] = None,
    mesh: Optional[Mesh] = None,
) -> WhisperModel:
    """Build a WhisperModel.

    checkpoint: path to a converted checkpoint (see utils.checkpoint /
    tools/convert.py) — .safetensors or orbax dir. Without one, params are
    randomly initialised (tests, benchmarks, training-from-scratch).
    quantize: "int8" for weights-only int8 serving (see quantize.py).
    mesh: a (data, model) jax.sharding.Mesh (parallel.make_mesh) — params are
    TP-sharded onto it and every forward/decode entry runs under it.
    """
    cfg = get_config(name)
    on_cpu = jax.default_backend() == "cpu"
    if dtype is None:
        dtype = jnp.float32 if on_cpu else jnp.bfloat16
    if flash is None:
        # Pallas flash attention beats XLA attention ~1.6x at encoder
        # geometry on v5e; interpret mode on CPU is only for tests. Under a
        # mesh the kernel runs through a shard_map wrapper (batch on "data",
        # heads on "model" — ops/flash_attention.flash_attention_auto), with
        # an automatic jnp fallback for shapes the mesh cannot divide.
        flash = not on_cpu
    alignment_heads = None
    if checkpoint is not None:
        import os

        from ..utils.checkpoint import load_params, read_metadata

        if os.path.isdir(checkpoint):
            # orbax training-state dir (tools/finetune.py output): restore
            # the params leaf against a freshly-initialised template
            import orbax.checkpoint as ocp

            restored = ocp.StandardCheckpointer().restore(
                os.path.abspath(checkpoint))  # saved structure, any leaves
            params = jax.tree.map(lambda a: jnp.asarray(a, dtype),
                                  restored["params"])
        else:
            params = load_params(checkpoint, cfg=cfg, dtype=dtype)
        prequantized = None
        if checkpoint.endswith(".safetensors"):
            meta = read_metadata(checkpoint)
            prequantized = meta.get("quantized")
            if meta.get("alignment_heads"):
                from ..timing import load_alignment_heads

                alignment_heads = load_alignment_heads(
                    meta["alignment_heads"], cfg)
        if prequantized:
            # int8 serving checkpoint (tools/convert --quantize int8 or
            # checkpoint.save_params on a quantized tree): already in w_q/
            # scale form — requesting quantize="int8" is satisfied, and
            # re-quantizing must be skipped
            if quantize not in (None, prequantized):
                raise ValueError(
                    f"checkpoint is pre-quantized ({prequantized}); "
                    f"quantize={quantize!r} cannot apply")
            if mesh is not None:
                raise ValueError(
                    "pre-quantized checkpoints cannot be TP-sharded (param "
                    "shardings are defined on the float tree; load the "
                    "float checkpoint with quantize='int8' instead — "
                    "shard-then-quantize keeps w_q/scale sharded)")
            quantize = None
    else:
        params = init_params(cfg, jax.random.PRNGKey(seed), dtype=dtype)
    if mesh is not None:
        from ..parallel.mesh import AXIS_MODEL
        from ..parallel.sharding import shard_params

        n_model = mesh.shape[AXIS_MODEL]
        if cfg.n_text_head % n_model or cfg.n_audio_head % n_model:
            raise ValueError(
                f"model axis ({n_model}) must divide attention heads "
                f"({cfg.n_audio_head} audio / {cfg.n_text_head} text)")
        params = shard_params(params, cfg, mesh)
    if quantize is not None:
        if quantize != "int8":
            raise ValueError(f"unsupported quantization {quantize!r}")
        from ..quantize import quantize_params  # type: ignore[import]

        # after shard_params: quantization follows the weight shardings
        # (computation-follows-data), so w_q/scale land sharded too
        params = quantize_params(params)
    return WhisperModel(cfg=cfg, params=params, flash=flash, mesh=mesh,
                        alignment_heads=alignment_heads)
