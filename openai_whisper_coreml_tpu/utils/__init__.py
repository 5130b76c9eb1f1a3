from . import audio_io  # noqa: F401
