"""TPU-native Whisper framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
tanmayb123/OpenAI-Whisper-CoreML (reference at /root/reference): audio ->
log-mel frontend -> encoder -> autoregressive decoder, with language
detection, transcription/translation, timestamps, batching, and GSPMD
sharding for pod-scale serving.
"""

__version__ = "0.1.0"

from .config import CONFIGS, WhisperConfig, get_config  # noqa: F401
from .audio import load_audio, log_mel_spectrogram, pad_or_trim  # noqa: F401


def load_model(name: str, *, dtype=None, checkpoint=None, seed: int = 0):
    """Build a Whisper model of the given size; see models.whisper."""
    from .models.whisper import load_model as _load

    return _load(name, dtype=dtype, checkpoint=checkpoint, seed=seed)
