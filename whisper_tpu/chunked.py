"""Chunked parallel transcription of ONE long file.

Not in the reference: its ``transcribe`` walks a file sequentially because
every 30 s window's seek depends on the previous decode's timestamps
(reference transcribe.py:229-238,339-399), so a one-hour file decodes at
batch-1 throughput no matter how much hardware is available.  On TPU the
decode engine is weight-bandwidth bound and extra batch rows are nearly
free, so ``transcribe_chunked`` trades the seek-dependent windowing for
FIXED overlapping chunks that all decode together through
``transcribe_batch`` (whose per-file semantics are transcribe-exact), then
stitches the per-chunk segments at the overlap midpoints — the same
fixed-chunk strategy popularized by Hugging Face's chunked long-form
pipeline.

The trade: output can differ from sequential ``transcribe`` near chunk
boundaries (a sentence straddling a cut is attributed to whichever side
owns the overlap midpoint, and cross-window prompt conditioning is off by
construction).  Exact sequential semantics remain the default
``transcribe``; this is the throughput mode for long files.
"""

from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

from .audio import CHUNK_LENGTH, FRAMES_PER_SECOND, SAMPLE_RATE, load_audio
from .utils import format_timestamp, make_safe

__all__ = ["transcribe_chunked", "chunk_offsets", "merge_chunk_segments"]


def chunk_offsets(
    n_samples: int, overlap: float = 5.0, sample_rate: int = SAMPLE_RATE
) -> List[int]:
    """Start offsets (in samples) of fixed 30 s chunks covering a waveform.

    Chunks advance by ``CHUNK_LENGTH - overlap`` seconds; the final chunk is
    the first one whose 30 s span reaches the end of the audio (it may be
    shorter than 30 s of content but never starts past the end).
    """
    if not 0.0 <= overlap < CHUNK_LENGTH:
        raise ValueError(f"overlap must be in [0, {CHUNK_LENGTH}), got {overlap}")
    chunk_samples = CHUNK_LENGTH * sample_rate
    stride = int(round((CHUNK_LENGTH - overlap) * sample_rate))
    offsets = [0]
    while offsets[-1] + chunk_samples < n_samples:
        offsets.append(offsets[-1] + stride)
    return offsets


def merge_chunk_segments(
    chunk_segments: Sequence[Sequence[dict]],
    offsets_sec: Sequence[float],
    chunk_length: float = float(CHUNK_LENGTH),
) -> List[dict]:
    """Stitch per-chunk segment lists into one absolute-time list.

    Each chunk owns the time region up to the MIDPOINT of its overlap with
    the next chunk; a segment belongs to the chunk that owns the segment's
    own midpoint.  Segment/word times and seeks are rebased by the chunk
    offset; ids are renumbered globally.  Pure function (unit-tested
    directly); inputs are not mutated.
    """
    if len(chunk_segments) != len(offsets_sec):
        raise ValueError("one offset per chunk required")
    # ownership boundary between chunk i and i+1: midpoint of their overlap
    # [offsets[i+1], offsets[i] + chunk_length]
    bounds = [
        (offsets_sec[i + 1] + offsets_sec[i] + chunk_length) / 2.0
        for i in range(len(offsets_sec) - 1)
    ]
    merged: List[dict] = []
    for i, segments in enumerate(chunk_segments):
        lo = bounds[i - 1] if i > 0 else -np.inf
        hi = bounds[i] if i < len(bounds) else np.inf
        off = offsets_sec[i]
        for seg in segments:
            mid = off + (seg["start"] + seg["end"]) / 2.0
            if not (lo <= mid < hi):
                continue
            out = dict(
                seg,
                id=len(merged),
                seek=seg["seek"] + int(round(off * FRAMES_PER_SECOND)),
                start=seg["start"] + off,
                end=seg["end"] + off,
            )
            if seg.get("words"):
                out["words"] = [
                    dict(w, start=w["start"] + off, end=w["end"] + off)
                    for w in seg["words"]
                ]
            merged.append(out)
    return merged


def transcribe_chunked(
    model,
    audio: Union[str, np.ndarray],
    *,
    chunk_overlap: float = 5.0,
    batch_size: int = 16,
    verbose: Optional[bool] = None,
    **options,
) -> dict:
    """Transcribe one (long) file by decoding fixed overlapping 30 s chunks
    in parallel; returns the same {"text", "segments", "language"} dict as
    ``transcribe``.

    ``chunk_overlap`` seconds of audio are shared between consecutive chunks
    so that speech cut by a chunk edge is seen whole by one of its two
    chunks; segments are stitched at the overlap midpoints
    (``merge_chunk_segments``).  All ``transcribe_batch`` options are
    accepted except the ones that contradict fixed chunking:
    ``condition_on_previous_text`` (forced False — chunks are independent)
    and ``clip_timestamps`` (use sequential ``transcribe`` for clips).
    """
    from .batch import transcribe_batch
    from .tokenizer import LANGUAGES

    if options.pop("condition_on_previous_text", False):
        raise ValueError(
            "transcribe_chunked decodes chunks independently; "
            "condition_on_previous_text=True requires sequential transcribe()"
        )
    if str(options.pop("clip_timestamps", "0")) != "0":
        raise ValueError("clip_timestamps is not supported in chunked mode; "
                         "use transcribe()")

    wave = load_audio(audio) if isinstance(audio, str) else np.asarray(audio)
    if wave.ndim != 1:
        wave = wave.reshape(-1)
    offsets = chunk_offsets(wave.shape[0], chunk_overlap)

    # one language for the whole file: detect on the first chunk (the
    # reference detects on the first 30 s, transcribe.py:334-345); per-chunk
    # detection could disagree across chunks of one recording
    if options.get("language") is None:
        if not model.is_multilingual:
            options["language"] = "en"
        else:
            from .audio import log_mel_spectrogram, pad_or_trim, N_SAMPLES

            mel = log_mel_spectrogram(
                pad_or_trim(wave[: N_SAMPLES].astype(np.float32)
                            if wave.dtype != np.int16
                            else wave[:N_SAMPLES].astype(np.float32) / 32768.0),
                model.dims.n_mels,
            )
            _, probs = model.detect_language(mel)
            options["language"] = max(probs, key=probs.get)
            if verbose is not None:
                print(f"Detected language: {LANGUAGES[options['language']].title()}")

    chunk_samples = CHUNK_LENGTH * SAMPLE_RATE
    chunks = [wave[o : o + chunk_samples] for o in offsets]
    results = transcribe_batch(
        model,
        chunks,
        batch_size=batch_size,
        condition_on_previous_text=False,
        **options,
    )

    language = results[0]["language"]
    if len(results) == 1:
        merged = results[0]["segments"]
    else:
        merged = merge_chunk_segments(
            [r["segments"] for r in results],
            [o / SAMPLE_RATE for o in offsets],
        )
    if verbose:
        for seg in merged:
            line = (f"[{format_timestamp(seg['start'])} --> "
                    f"{format_timestamp(seg['end'])}] {seg['text']}")
            print(make_safe(line))
    return dict(
        text="".join(s["text"] for s in merged),
        segments=merged,
        language=language,
    )
