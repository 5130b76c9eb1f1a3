"""Top-level Whisper model: config + params + jitted entry points.

This is the TPU-native analogue of the reference's `struct Whisper`
(/root/reference/Whisper/Whisper/Whisper.swift:11-41): where the reference
loads two compiled CoreML graphs, we hold a param pytree and jit-compile pure
functions over it (compilation is XLA's job, at first call, cached).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

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
        feats = self._encode_jit(self.params, mel=mel)
        return feats[0] if squeeze else feats

    def logits(self, tokens: jax.Array, audio_features: jax.Array) -> jax.Array:
        """Teacher-forcing logits (B, T, vocab), fp32."""
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
) -> WhisperModel:
    """Build a WhisperModel.

    checkpoint: path to a converted checkpoint (see utils.checkpoint /
    tools/convert.py) — .safetensors or orbax dir. Without one, params are
    randomly initialised (tests, benchmarks, training-from-scratch).
    quantize: "int8" for weights-only int8 serving (see quantize.py).
    """
    cfg = get_config(name)
    on_cpu = jax.default_backend() == "cpu"
    if dtype is None:
        dtype = jnp.float32 if on_cpu else jnp.bfloat16
    if flash is None:
        # Pallas flash attention beats XLA attention ~1.6x at encoder
        # geometry on v5e; interpret mode on CPU is only for tests
        flash = not on_cpu
    if checkpoint is not None:
        from ..utils.checkpoint import load_params

        params = load_params(checkpoint, cfg=cfg, dtype=dtype)
    else:
        params = init_params(cfg, jax.random.PRNGKey(seed), dtype=dtype)
    if quantize is not None:
        if quantize != "int8":
            raise ValueError(f"unsupported quantization {quantize!r}")
        from ..quantize import quantize_params  # type: ignore[import]

        params = quantize_params(params)
    return WhisperModel(cfg=cfg, params=params, flash=flash)
