"""Forced alignment: word timestamps for a KNOWN transcript.

Not in the reference (its word timings only attach to text the model just
decoded, transcribe.py:401-416 + timing.py:163-242).  The same
cross-attention DTW machinery aligns ANY provided text to the audio —
the "re-align an edited transcript" / subtitle-retiming workflow that
whisperX popularized, here without a separate phoneme model: the decoder
is teacher-forced over the given tokens and the alignment heads' QK
matrices are DTW'd exactly as in ``whisper_tpu.timing``.

Two entry points on one function:

- ``align(model, audio, text=...)`` — one clip of at most 30 s;
- ``align(model, audio, segments=[{"start","end","text"}, ...])`` — a long
  file whose coarse segment times are already known (e.g. from
  ``transcribe`` output whose text was then edited); every segment's
  window is sliced on device and ALL segments align in one batched
  program (``timing.find_alignment_batch``).
"""

from typing import List, Optional, Union

import numpy as np

import jax

from .audio import (
    FRAMES_PER_SECOND,
    N_FRAMES,
    N_SAMPLES,
    SAMPLE_RATE,
    load_audio,
    log_mel_spectrogram,
)
from .timing import find_alignment_batch, merge_punctuations
from .tokenizer import get_tokenizer

__all__ = ["align"]


def align(
    model,
    audio: Union[str, np.ndarray],
    text: Optional[str] = None,
    *,
    segments: Optional[List[dict]] = None,
    language: str = "en",
    prepend_punctuations: str = "\"'“¿([{-",
    append_punctuations: str = "\"'.。,，!！?？:：”)]}、",
    medfilt_width: int = 7,
) -> dict:
    """Word-align known text to audio; returns {"segments", "language"}.

    Each returned segment carries the input text and
    ``words=[{"word", "start", "end", "probability"}, ...]`` with absolute
    times.  Exactly one of ``text`` (clip <= 30 s) or ``segments`` (list of
    ``{"start", "end", "text"}`` with segment spans <= 30 s each) must be
    given.
    """
    if (text is None) == (segments is None):
        raise ValueError("pass exactly one of text= or segments=")

    from .batch import _slice_windows_dev

    wave = load_audio(audio) if isinstance(audio, str) else np.asarray(audio)
    if wave.ndim != 1:
        wave = wave.reshape(-1)
    duration = wave.shape[0] / SAMPLE_RATE

    if text is not None:
        if duration > N_SAMPLES / SAMPLE_RATE + 1e-6:
            raise ValueError(
                f"audio is {duration:.1f} s; align(text=...) handles one "
                "<=30 s clip — pass segments=[{'start','end','text'}, ...] "
                "with the coarse segment times instead"
            )
        segments = [dict(start=0.0, end=min(duration, 30.0), text=text)]

    starts = [float(s["start"]) for s in segments]
    ends = [float(s["end"]) for s in segments]
    for st, en in zip(starts, ends):
        if not 0.0 <= st <= en <= duration + 1e-6:
            raise ValueError(f"segment [{st}, {en}] outside the {duration:.1f} s audio")
        if en - st > 30.0 + 1e-6:
            raise ValueError(f"segment [{st}, {en}] exceeds the 30 s window")

    tokenizer = get_tokenizer(
        model.is_multilingual,
        num_languages=model.num_languages,
        language=language,
        task="transcribe",
    )
    tokens_batch = [
        [t for t in tokenizer.encode(str(s["text"])) if t < tokenizer.eot]
        for s in segments
    ]

    # device-resident mel for the whole file; one window per segment
    mel_store = log_mel_spectrogram(wave, model.dims.n_mels, padding=N_SAMPLES)[None]
    n = len(segments)
    seeks = np.array([int(round(st * FRAMES_PER_SECOND)) for st in starts], np.int32)
    sizes = np.array(
        [
            min(int(round((en - st) * FRAMES_PER_SECOND)), N_FRAMES)
            for st, en in zip(starts, ends)
        ],
        np.int32,
    )
    mels = _slice_windows_dev(
        mel_store, *jax.device_put((np.zeros(n, np.int32), seeks, sizes))
    )

    alignments = find_alignment_batch(
        model, tokenizer, tokens_batch, mels, [int(s) for s in sizes],
        medfilt_width=medfilt_width,
    )

    out_segments = []
    for seg, alignment in zip(segments, alignments):
        merge_punctuations(alignment, prepend_punctuations, append_punctuations)
        off = float(seg["start"])
        words = [
            dict(
                word=w.word,
                start=round(float(off + w.start), 2),
                end=round(float(off + w.end), 2),
                probability=float(w.probability),
            )
            for w in alignment
            if w.word
        ]
        out_segments.append(
            dict(start=float(seg["start"]), end=float(seg["end"]),
                 text=str(seg["text"]), words=words)
        )
    return dict(segments=out_segments, language=language)
