"""Model definitions: the Whisper encoder-decoder family as functional JAX."""

from .dims import ModelDimensions
from .whisper import Whisper

__all__ = ["ModelDimensions", "Whisper"]
