"""Entry point for ``python -m whisper_tpu``."""

from .transcribe import cli

if __name__ == "__main__":
    cli()
