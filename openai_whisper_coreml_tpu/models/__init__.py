from . import decoder, encoder, layers  # noqa: F401
from .whisper import WhisperModel, load_model  # noqa: F401
