"""Word-level timestamps via cross-attention DTW alignment.

Behavioral parity target: reference ``whisper/timing.py`` — find_alignment
(163-242), merge_punctuations (245-276), add_word_timestamps (279-388) with
its duration-median boundary heuristics.

TPU-first design: the teacher-forced forward returns the alignment heads'
cross-attention scores directly from the jitted decoder (no hooks, no SDPA
toggling — contrast reference timing.py:185-201), and the softmax → z-norm →
median-filter → DTW-wavefront pipeline runs in the same XLA program with
fixed shapes: token length is bucketed, and the dynamic frame count is
handled by masking plus an on-device reflect remap so results match the
reference's sliced computation exactly.  Only the O(N+M) backtrace runs on
the host (C++, whisper_tpu/native/dtw.cpp).
"""

from dataclasses import dataclass
from functools import partial
from typing import TYPE_CHECKING, List

import jax
import jax.numpy as jnp
import numpy as np

from .audio import HOP_LENGTH, SAMPLE_RATE, TOKENS_PER_SECOND
from .models.whisper import decoder_forward, encoder_apply
from .ops.dtw import _unskew_trace, backtrace, dtw_trace
from .ops.median import median_filter
from .tokenizer import Tokenizer

if TYPE_CHECKING:
    from .models.whisper import Whisper

__all__ = ["WordTiming", "find_alignment", "merge_punctuations", "add_word_timestamps",
           "median_filter", "dtw"]

from .ops.dtw import dtw  # re-exported for API parity with reference timing.py

_TOKEN_BUCKETS = (32, 64, 128, 256, 448)


def _token_bucket(n: int) -> int:
    for b in _TOKEN_BUCKETS:
        if n <= b:
            return b
    return _TOKEN_BUCKETS[-1]


@dataclass
class WordTiming:
    word: str
    tokens: List[int]
    start: float
    end: float
    probability: float


@partial(
    jax.jit,
    static_argnames=("dims", "heads", "sot_len", "eot", "medfilt_width", "n_rows"),
)
def _alignment_device(
    params,
    dims,
    heads,  # static tuple of (layer, head) pairs
    sot_len: int,
    eot: int,
    medfilt_width: int,
    n_rows: int,  # static: token bucket minus sot_len (DTW row count)
    mel: jax.Array,  # (1, n_mels, 3000)
    tokens: jax.Array,  # (1, Tb) — sot_seq + no_timestamps + text + eot, padded
    t_real: jax.Array,  # scalar: true token count
    nf2: jax.Array,  # scalar: num_frames // 2 (true audio columns)
    qk_scale: jax.Array,
):
    """Teacher-forced pass + attention pipeline + DTW trace, one XLA program."""
    feats = encoder_apply(params, dims, mel)
    logits, qk = decoder_forward(
        params, dims, tokens, feats, alignment_heads=np.asarray(heads)
    )

    # per-token probabilities of the sampled text (reference timing.py:198-201)
    sampled_logits = logits[0, sot_len:, :eot]  # (Tb - sot_len, eot)
    probs = jax.nn.softmax(sampled_logits.astype(jnp.float32), axis=-1)
    next_tokens = jnp.roll(tokens[0], -1)[sot_len:]  # token predicted at row i
    token_probs = jnp.take_along_axis(
        probs, jnp.clip(next_tokens, 0, eot - 1)[:, None], axis=1
    )[:, 0]

    # attention weights: (K, Tb, Ta) — mask frames beyond the audio content,
    # softmax, z-normalize across real token rows (timing.py:207-211)
    w = qk[:, 0, :, :] * qk_scale
    ta = w.shape[-1]
    frame_idx = jnp.arange(ta)
    w = jnp.where(frame_idx[None, None, :] < nf2, w, -jnp.inf)
    w = jax.nn.softmax(w, axis=-1)

    row_valid = (jnp.arange(w.shape[1]) < t_real)[None, :, None]
    denom = t_real.astype(jnp.float32)
    mean = jnp.sum(jnp.where(row_valid, w, 0.0), axis=1, keepdims=True) / denom
    var = (
        jnp.sum(jnp.where(row_valid, (w - mean) ** 2, 0.0), axis=1, keepdims=True)
        / denom
    )
    w = (w - mean) / jnp.sqrt(var)

    # emulate the reference's reflect padding at the dynamic frame boundary so
    # the median filter sees the same neighborhood (timing.py:35)
    src = jnp.where(
        frame_idx < nf2, frame_idx, jnp.clip(2 * (nf2 - 1) - frame_idx, 0, ta - 1)
    )
    w = w[:, :, src]
    w = median_filter(w, medfilt_width)

    matrix = w.mean(axis=0)  # (Tb, Ta)
    text_rows = jax.lax.slice_in_dim(matrix, sot_len, sot_len + n_rows, axis=0)
    trace_diags = dtw_trace(-text_rows, n_rows, ta)
    return token_probs, trace_diags


def find_alignment(
    model: "Whisper",
    tokenizer: Tokenizer,
    text_tokens: List[int],
    mel,
    num_frames: int,
    *,
    medfilt_width: int = 7,
    qk_scale: float = 1.0,
) -> List[WordTiming]:
    """Align text tokens to audio frames; parity with timing.py:163-242."""
    if len(text_tokens) == 0:
        return []

    sot_len = len(tokenizer.sot_sequence)
    full = [
        *tokenizer.sot_sequence,
        tokenizer.no_timestamps,
        *text_tokens,
        tokenizer.eot,
    ]
    t_real = len(full)
    tb = _token_bucket(t_real)
    padded = np.full((1, tb), tokenizer.eot, np.int32)
    padded[0, :t_real] = full[:tb]

    mel = jnp.asarray(mel)
    if mel.ndim == 2:
        mel = mel[None]

    heads = tuple(map(tuple, model.alignment_heads.tolist()))
    token_probs, trace_diags = _alignment_device(
        model.params,
        model.dims,
        heads,
        sot_len,
        tokenizer.eot,
        medfilt_width,
        tb - sot_len,
        mel,
        jnp.asarray(padded),
        jnp.int32(t_real),
        jnp.int32(num_frames // 2),
        jnp.float32(qk_scale),
    )

    text_token_probs = np.asarray(token_probs)[: len(text_tokens)].tolist()

    # rows: no_timestamps + text tokens (the reference's [len(sot):-1] slice)
    n_real = t_real - sot_len - 1
    m_real = num_frames // 2
    trace = _unskew_trace(np.asarray(trace_diags), tb - sot_len, 1500)
    trace = trace[: n_real + 1, : m_real + 1]
    text_indices, time_indices = backtrace(trace)

    words, word_tokens = tokenizer.split_to_word_tokens(text_tokens + [tokenizer.eot])
    if len(word_tokens) <= 1:
        # a lone EOT has no word boundaries to time
        return []
    word_boundaries = np.pad(np.cumsum([len(t) for t in word_tokens[:-1]]), (1, 0))

    jumps = np.pad(np.diff(text_indices), (1, 0), constant_values=1).astype(bool)
    jump_times = time_indices[jumps] / TOKENS_PER_SECOND
    start_times = jump_times[word_boundaries[:-1]]
    end_times = jump_times[word_boundaries[1:]]
    word_probabilities = [
        np.mean(text_token_probs[i:j])
        for i, j in zip(word_boundaries[:-1], word_boundaries[1:])
    ]

    return [
        WordTiming(word, tokens, start, end, probability)
        for word, tokens, start, end, probability in zip(
            words, word_tokens, start_times, end_times, word_probabilities
        )
    ]


def merge_punctuations(alignment: List[WordTiming], prepended: str, appended: str):
    """Fold punctuation-only timings into neighbors (timing.py:245-276)."""
    # prepended punctuation attaches to the following word
    i = len(alignment) - 2
    j = len(alignment) - 1
    while i >= 0:
        previous = alignment[i]
        following = alignment[j]
        if previous.word.startswith(" ") and previous.word.strip() in prepended:
            following.word = previous.word + following.word
            following.tokens = previous.tokens + following.tokens
            previous.word = ""
            previous.tokens = []
        else:
            j = i
        i -= 1

    # appended punctuation attaches to the preceding word
    i = 0
    j = 1
    while j < len(alignment):
        previous = alignment[i]
        following = alignment[j]
        if not previous.word.endswith(" ") and following.word in appended:
            previous.word = previous.word + following.word
            previous.tokens = previous.tokens + following.tokens
            following.word = ""
            following.tokens = []
        else:
            i = j
        j += 1


def add_word_timestamps(
    *,
    segments: List[dict],
    model: "Whisper",
    tokenizer: Tokenizer,
    mel,
    num_frames: int,
    prepend_punctuations: str = "\"'“¿([{-",
    append_punctuations: str = "\"'.。,，!！?？:：”)]}、",
    last_speech_timestamp: float,
    **kwargs,
):
    """Attach per-word timings to segments; parity with timing.py:279-388."""
    if len(segments) == 0:
        return

    text_tokens_per_segment = [
        [token for token in segment["tokens"] if token < tokenizer.eot]
        for segment in segments
    ]

    text_tokens = [t for seg in text_tokens_per_segment for t in seg]
    alignment = find_alignment(model, tokenizer, text_tokens, mel, num_frames, **kwargs)
    word_durations = np.array([t.end - t.start for t in alignment])
    word_durations = word_durations[word_durations.nonzero()]
    median_duration = np.median(word_durations) if len(word_durations) > 0 else 0.0
    median_duration = min(0.7, float(median_duration))
    max_duration = median_duration * 2

    # truncate overlong words at sentence boundaries (timing.py:307-317)
    if len(word_durations) > 0:
        sentence_end_marks = ".。!！?？"
        for i in range(1, len(alignment)):
            if alignment[i].end - alignment[i].start > max_duration:
                if alignment[i].word in sentence_end_marks:
                    alignment[i].end = alignment[i].start + max_duration
                elif alignment[i - 1].word in sentence_end_marks:
                    alignment[i].start = alignment[i].end - max_duration

    merge_punctuations(alignment, prepend_punctuations, append_punctuations)

    time_offset = segments[0]["seek"] * HOP_LENGTH / SAMPLE_RATE
    word_index = 0

    for segment, seg_text_tokens in zip(segments, text_tokens_per_segment):
        saved_tokens = 0
        words = []

        while word_index < len(alignment) and saved_tokens < len(seg_text_tokens):
            timing = alignment[word_index]

            if timing.word:
                words.append(
                    dict(
                        word=timing.word,
                        start=round(time_offset + timing.start, 2),
                        end=round(time_offset + timing.end, 2),
                        probability=timing.probability,
                    )
                )

            saved_tokens += len(timing.tokens)
            word_index += 1

        # boundary fixes at pauses and segment edges (timing.py:344-386)
        if len(words) > 0:
            if words[0]["end"] - last_speech_timestamp > median_duration * 4 and (
                words[0]["end"] - words[0]["start"] > max_duration
                or (
                    len(words) > 1
                    and words[1]["end"] - words[0]["start"] > max_duration * 2
                )
            ):
                if (
                    len(words) > 1
                    and words[1]["end"] - words[1]["start"] > max_duration
                ):
                    boundary = max(words[1]["end"] / 2, words[1]["end"] - max_duration)
                    words[0]["end"] = words[1]["start"] = boundary
                words[0]["start"] = max(0, words[0]["end"] - max_duration)

            if (
                segment["start"] < words[0]["end"]
                and segment["start"] - 0.5 > words[0]["start"]
            ):
                words[0]["start"] = max(
                    0, min(words[0]["end"] - median_duration, segment["start"])
                )
            else:
                segment["start"] = words[0]["start"]

            if (
                segment["end"] > words[-1]["start"]
                and segment["end"] + 0.5 < words[-1]["end"]
            ):
                words[-1]["end"] = max(
                    words[-1]["start"] + median_duration, segment["end"]
                )
            else:
                segment["end"] = words[-1]["end"]

            last_speech_timestamp = segment["end"]

        segment["words"] = words
