from .wer import WERResult, compute_wer, normalize_text  # noqa: F401
