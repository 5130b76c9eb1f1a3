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


def available_models():
    """Names accepted by load_model (openai whisper.available_models parity)."""
    return sorted(CONFIGS)


def __getattr__(name):
    # lazy heavyweight imports so `import openai_whisper_coreml_tpu` stays fast
    if name == "DecodingOptions":
        from .decoding import DecodingOptions

        return DecodingOptions
    if name == "DecodingResult":
        from .decoding import DecodingResult

        return DecodingResult
    if name == "decode":
        from .decoding import decode

        return decode
    if name == "detect_language":
        from .decoding import detect_language

        return detect_language
    if name == "transcribe":
        from .transcribe import transcribe

        return transcribe
    if name == "get_tokenizer":
        from .tokenizer import get_tokenizer

        return get_tokenizer
    if name == "StreamingTranscriber":
        from .stream import StreamingTranscriber

        return StreamingTranscriber
    if name == "MultiStreamTranscriber":
        from .stream import MultiStreamTranscriber

        return MultiStreamTranscriber
    if name == "transcribe_batch":
        from .serve import transcribe_batch

        return transcribe_batch
    if name == "ServeOptions":
        from .serve import ServeOptions

        return ServeOptions
    if name == "detect_speech":
        from .vad import detect_speech

        return detect_speech
    if name in ("add_lora", "merge_lora"):
        from . import lora

        return getattr(lora, name)
    if name in ("spec_decode_core", "spec_stats", "check_pair"):
        from . import speculative

        return getattr(speculative, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def load_model(name: str, *, dtype=None, checkpoint=None, seed: int = 0,
               flash=None, quantize=None, mesh=None):
    """Build a Whisper model of the given size; see models.whisper."""
    from .models.whisper import load_model as _load

    return _load(name, dtype=dtype, checkpoint=checkpoint, seed=seed,
                 flash=flash, quantize=quantize, mesh=mesh)
