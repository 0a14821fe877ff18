"""WER/CER evaluation utilities.

The reference keeps evaluation outside the library (normalizers + jiwer in
notebooks/LibriSpeech.ipynb); here it is first-class: edit-distance WER/CER
with the English normalizer, plus a batched dataset evaluation driver that
feeds fixed-shape device batches (the BASELINE.json config #5 harness).
"""

from dataclasses import dataclass, replace
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


# ---------------------------------------------------------------------------
# int8 acceptance gate.
#
# The serving default for beam-5 configurations is int8 weights + int8
# cross-KV (docs/BENCHMARKS.md): bf16 beam-5 was formally ruled unable to
# reach the >=8x A100 bar on one v5e chip, int8 reaches it.  That default is
# only justified if int8 is WER-neutral — the reference's quality bar is
# measured WER (BASELINE.md: 4.26% base.en LibriSpeech test-clean, greedy).
# `int8_wer_gate` is the acceptance criterion scripts/validate_real.py runs
# the moment real checkpoints are available; `int8_divergence_proxy` is the
# offline evidence measurable today on random weights (token agreement +
# teacher-forced logit divergence).
# ---------------------------------------------------------------------------

# Maximum absolute corpus-WER increase int8 may cost before the beam-5
# serving default reverts to bf16.  0.3 percentage points on a 4.26%
# baseline (~7% relative) is well inside the run-to-run spread the reference
# itself shows across hardware/torch versions, and far below the ~0.9 pp
# gap between adjacent model sizes — i.e. int8 must stay quality-equivalent
# to the same model, not merely better than the next smaller one.
INT8_WER_GATE_MAX_DELTA = 0.003


def int8_wer_gate(
    bf16_model,
    int8_model,
    items: List[Tuple[np.ndarray, str]],
    batch_size: int = 16,
    max_delta: float = INT8_WER_GATE_MAX_DELTA,
    bf16_report: Optional[dict] = None,
    **decode_options,
) -> dict:
    """WER-delta acceptance gate: int8 vs bf16 on the same utterances.

    Returns the two corpus WERs, the delta, and ``passed`` (int8 WER may
    not exceed bf16 WER by more than ``max_delta`` absolute).  Decode
    options default to the reference's LibriSpeech protocol (greedy,
    without_timestamps) via ``evaluate_batched``.  ``bf16_report`` accepts
    a precomputed ``evaluate_batched`` report over the SAME items (the
    caller usually just measured corpus WER with the bf16 model) so the
    expensive bf16 corpus decode is not repeated.
    """
    bf16 = bf16_report or evaluate_batched(
        bf16_model, items, batch_size=batch_size, **decode_options
    )
    int8 = evaluate_batched(int8_model, items, batch_size=batch_size, **decode_options)
    delta = int8["wer"] - bf16["wer"]
    return {
        "bf16_wer": bf16["wer"],
        "int8_wer": int8["wer"],
        "delta": delta,
        "max_delta": max_delta,
        "passed": delta <= max_delta,
        "n_utterances": bf16["n_utterances"],
    }


def int8_divergence_proxy(
    bf16_model,
    int8_model,
    mels: np.ndarray,  # (N, n_mels, 3000) — batched 30 s windows
    sample_len: int = 32,
    language: str = "en",
    batch_size: int = 8,
    int8_decode_options: Optional[dict] = None,
    **decode_options,
) -> dict:
    """Offline int8-vs-bf16 divergence evidence, runnable without real
    checkpoints: greedy token-agreement rate plus teacher-forced logit
    divergence along the bf16 model's own greedy trajectory.

    Reported per BENCH round next to the int8 beam-5 serving default it
    backs (VERDICT r4 #4); the WER gate above supersedes it once real
    weights arrive.  Logit stats are computed on the bf16 trajectory so
    both models score the same prefixes (no compounding divergence).

    ``int8_decode_options`` are extra options applied ONLY to the int8
    model's decodes — e.g. ``{"kv_cache_dtype": "int8"}`` to measure the
    full serving-default configuration against a clean bf16 baseline.
    """
    import jax.numpy as jnp

    from . import DecodingOptions
    from .decoding import DecodingTask

    options = DecodingOptions(
        language=language, without_timestamps=True, sample_len=sample_len,
        **decode_options,
    )
    int8_options = (
        replace(options, **int8_decode_options) if int8_decode_options
        else options
    )
    mels = np.asarray(mels)
    agree_rates: List[float] = []
    logit_maxdiff: List[float] = []
    logit_meandiff: List[float] = []
    top1_match: List[float] = []

    for start in range(0, len(mels), batch_size):
        chunk = jnp.asarray(mels[start : start + batch_size])
        full = DecodingTask(bf16_model, options).run(chunk)
        quant = DecodingTask(int8_model, int8_options).run(chunk)
        for f, q in zip(full, quant):
            n = max(len(f.tokens), len(q.tokens), 1)
            agree_rates.append(
                sum(a == b for a, b in zip(f.tokens, q.tokens)) / n
            )

        # teacher-forced logits on the bf16 greedy trajectory
        sot_seq = DecodingTask(bf16_model, options).initial_tokens
        for i, f in enumerate(full):
            tokens = np.asarray(
                list(sot_seq) + list(f.tokens), np.int32
            )[None, :]
            feats_b = bf16_model.embed_audio(chunk[i : i + 1])
            feats_q = int8_model.embed_audio(chunk[i : i + 1])
            lb = np.asarray(
                bf16_model.logits(jnp.asarray(tokens), feats_b), np.float32
            )[0]
            lq = np.asarray(
                int8_model.logits(jnp.asarray(tokens), feats_q), np.float32
            )[0]
            diff = np.abs(lb - lq)
            logit_maxdiff.append(float(diff.max()))
            logit_meandiff.append(float(diff.mean()))
            top1_match.append(
                float(np.mean(lb.argmax(-1) == lq.argmax(-1)))
            )

    return {
        "token_agreement": float(np.mean(agree_rates)),
        "token_agreement_min": float(np.min(agree_rates)),
        "logit_absdiff_max": float(np.max(logit_maxdiff)),
        "logit_absdiff_mean": float(np.mean(logit_meandiff)),
        "top1_match": float(np.mean(top1_match)),
        "n_windows": len(agree_rates),
    }
