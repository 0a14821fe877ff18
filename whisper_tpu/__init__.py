"""whisper_tpu: a TPU-native (JAX/XLA/Pallas) speech recognition framework
with the capabilities of openai/whisper.

Public API parity target: reference ``whisper/__init__.py`` —
load_model / available_models / load_audio / log_mel_spectrogram /
pad_or_trim / transcribe / decode / detect_language / DecodingOptions /
DecodingResult / ModelDimensions / Whisper.
"""

from .audio import load_audio, log_mel_spectrogram, pad_or_trim
from .version import __version__

__all__ = [
    "load_audio",
    "log_mel_spectrogram",
    "pad_or_trim",
    "__version__",
]
