"""WER/CER evaluation utilities.

The reference keeps evaluation outside the library (normalizers + jiwer in
notebooks/LibriSpeech.ipynb); here it is first-class: edit-distance WER/CER
with the English normalizer, plus a batched dataset evaluation driver that
feeds fixed-shape device batches (the BASELINE.json config #5 harness).
"""

from dataclasses import dataclass
from typing import Callable, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from .normalizers import EnglishTextNormalizer


def edit_distance(ref: Sequence, hyp: Sequence) -> int:
    """Levenshtein distance over token sequences (two-row DP)."""
    if len(ref) < len(hyp):
        ref, hyp = hyp, ref
    previous = list(range(len(hyp) + 1))
    for i, r in enumerate(ref, start=1):
        current = [i] + [0] * len(hyp)
        for j, h in enumerate(hyp, start=1):
            current[j] = min(
                previous[j] + 1,  # deletion
                current[j - 1] + 1,  # insertion
                previous[j - 1] + (r != h),  # substitution
            )
        previous = current
    return previous[-1]


@dataclass
class ErrorRate:
    errors: int = 0
    total: int = 0

    def update(self, ref: Sequence, hyp: Sequence):
        self.errors += edit_distance(ref, hyp)
        self.total += len(ref)

    @property
    def rate(self) -> float:
        return self.errors / max(self.total, 1)


def word_error_rate(
    references: Iterable[str],
    hypotheses: Iterable[str],
    normalizer: Optional[Callable[[str], str]] = None,
) -> float:
    """Corpus-level WER with (by default) the English text normalizer,
    matching the reference's LibriSpeech evaluation protocol."""
    normalizer = normalizer or EnglishTextNormalizer()
    wer = ErrorRate()
    for ref, hyp in zip(references, hypotheses):
        wer.update(normalizer(ref).split(), normalizer(hyp).split())
    return wer.rate


def char_error_rate(
    references: Iterable[str],
    hypotheses: Iterable[str],
    normalizer: Optional[Callable[[str], str]] = None,
) -> float:
    normalizer = normalizer or EnglishTextNormalizer()
    cer = ErrorRate()
    for ref, hyp in zip(references, hypotheses):
        cer.update(list(normalizer(ref)), list(normalizer(hyp)))
    return cer.rate


def evaluate_batched(
    model,
    items: List[Tuple[np.ndarray, str]],  # (16 kHz mono waveform, reference text)
    batch_size: int = 16,
    language: str = "en",
    without_timestamps: bool = True,
    **decode_options,
) -> dict:
    """Greedy-decode ≤30 s utterances in fixed-shape device batches.

    This is the batched-decode path the reference's LibriSpeech notebook uses
    (batch of padded mels through ``decode``), returning WER plus timing.
    The final partial batch is padded to keep one compiled engine variant.
    """
    import time

    import jax.numpy as jnp

    from . import DecodingOptions, pad_or_trim
    from .audio import N_FRAMES, log_mel_spectrogram
    from .decoding import DecodingTask

    options = DecodingOptions(
        language=language, without_timestamps=without_timestamps, **decode_options
    )
    task = DecodingTask(model, options)

    hyps: List[str] = []
    refs: List[str] = []
    audio_seconds = 0.0
    decode_seconds = 0.0

    for start in range(0, len(items), batch_size):
        chunk = items[start : start + batch_size]
        mels = np.stack(
            [
                pad_or_trim(
                    np.asarray(log_mel_spectrogram(audio, model.dims.n_mels)),
                    N_FRAMES,
                )
                for audio, _ in chunk
            ]
        )
        audio_seconds += sum(len(a) / 16000.0 for a, _ in chunk)
        if len(chunk) < batch_size:  # pad to the compiled batch shape
            pad = np.zeros((batch_size - len(chunk),) + mels.shape[1:], mels.dtype)
            mels = np.concatenate([mels, pad])
        t0 = time.perf_counter()
        results = task.run(jnp.asarray(mels))
        decode_seconds += time.perf_counter() - t0
        hyps.extend(r.text for r in results[: len(chunk)])
        refs.extend(text for _, text in chunk)

    return {
        "wer": word_error_rate(refs, hyps),
        "cer": char_error_rate(refs, hyps),
        "n_utterances": len(refs),
        "audio_seconds": audio_seconds,
        "decode_seconds": decode_seconds,
        "rtf": audio_seconds / max(decode_seconds, 1e-9),
        "hypotheses": hyps,
    }
