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
from typing import TYPE_CHECKING, List, Optional

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
    static_argnames=(
        "dims", "heads", "sot_len", "eot", "medfilt_width", "n_rows",
        "features_given",
    ),
)
def _alignment_device(
    params,
    dims,
    heads,  # static tuple of (layer, head) pairs
    sot_len: int,
    eot: int,
    medfilt_width: int,
    n_rows: int,  # static: token bucket minus sot_len (DTW row count)
    mel: jax.Array,  # (B, n_mels, 3000) or, features_given, (B, Ta, C)
    tokens: jax.Array,  # (B, Tb) — sot_seq + no_timestamps + text + eot, padded
    t_real: jax.Array,  # (B,): true token counts
    nf2: jax.Array,  # (B,): num_frames // 2 (true audio columns)
    qk_scale: jax.Array,
    features_given: bool = False,
):
    """Teacher-forced pass + attention pipeline + DTW trace, one XLA program.

    Batched over segments: each row has its own true token length and frame
    count, handled by masking and a per-row reflect remap.  When the caller
    already holds the windows' encoder features (the decode engine returns
    them), pass those instead of mel with ``features_given=True`` — the
    encoder pass is skipped entirely.
    """
    feats = mel if features_given else encoder_apply(params, dims, mel)
    logits, qk = decoder_forward(
        params, dims, tokens, feats, alignment_heads=np.asarray(heads)
    )

    # per-token probabilities of the sampled text (reference timing.py:198-201)
    sampled_logits = logits[:, sot_len:, :eot]  # (B, Tb - sot_len, eot)
    probs = jax.nn.softmax(sampled_logits.astype(jnp.float32), axis=-1)
    next_tokens = jnp.roll(tokens, -1, axis=1)[:, sot_len:]  # predicted at row i
    token_probs = jnp.take_along_axis(
        probs, jnp.clip(next_tokens, 0, eot - 1)[:, :, None], axis=2
    )[:, :, 0]

    # attention weights: (K, B, Tb, Ta) — mask frames beyond each row's audio,
    # softmax, z-normalize across that row's real token rows (timing.py:207-211)
    w = qk * qk_scale
    ta = w.shape[-1]
    frame_idx = jnp.arange(ta)
    frame_ok = frame_idx[None, None, None, :] < nf2[None, :, None, None]
    w = jnp.where(frame_ok, w, -jnp.inf)
    w = jax.nn.softmax(w, axis=-1)

    row_valid = (
        jnp.arange(w.shape[2])[None, None, :, None] < t_real[None, :, None, None]
    )
    denom = t_real.astype(jnp.float32)[None, :, None, None]
    mean = jnp.sum(jnp.where(row_valid, w, 0.0), axis=2, keepdims=True) / denom
    var = (
        jnp.sum(jnp.where(row_valid, (w - mean) ** 2, 0.0), axis=2, keepdims=True)
        / denom
    )
    w = (w - mean) / jnp.sqrt(var)

    # emulate the reference's reflect padding at each row's dynamic frame
    # boundary so the median filter sees the same neighborhood (timing.py:35)
    src = jnp.where(
        frame_idx[None, :] < nf2[:, None],
        frame_idx[None, :],
        jnp.clip(2 * (nf2[:, None] - 1) - frame_idx[None, :], 0, ta - 1),
    )  # (B, Ta)
    w = jax.vmap(lambda wb, sb: wb[:, :, sb], in_axes=(1, 0), out_axes=1)(w, src)
    w = median_filter(w, medfilt_width)

    matrix = w.mean(axis=0)  # (B, Tb, Ta)
    text_rows = jax.lax.slice_in_dim(matrix, sot_len, sot_len + n_rows, axis=1)
    trace_diags = dtw_trace(-text_rows, n_rows, ta)
    return token_probs, trace_diags


def find_alignment_batch(
    model: "Whisper",
    tokenizer: Tokenizer,
    text_tokens_batch: List[List[int]],
    mels,  # (B, n_mels, 3000); ignored when ``features`` is given
    num_frames_batch: List[int],
    *,
    features=None,  # (B, Ta, C) encoder features from the decode engine
    medfilt_width: int = 7,
    qk_scale: float = 1.0,
) -> List[List[WordTiming]]:
    """Align a batch of segments in one device program.

    Per-segment results are identical to :func:`find_alignment`; all segments
    share one (bucketed) token length, with per-row masking for the true
    lengths and frame counts.  Pass ``features`` (the encoder output the
    decode engine already computed for these windows) to skip re-encoding —
    at large-v3 the encoder is the most expensive piece of the alignment
    program.
    """
    if not text_tokens_batch:
        return []
    sot_len = len(tokenizer.sot_sequence)

    fulls = [
        [*tokenizer.sot_sequence, tokenizer.no_timestamps, *text, tokenizer.eot]
        for text in text_tokens_batch
    ]
    t_reals = [len(f) for f in fulls]
    tb = _token_bucket(max(t_reals))
    padded = np.full((len(fulls), tb), tokenizer.eot, np.int32)
    for i, f in enumerate(fulls):
        padded[i, : min(len(f), tb)] = f[:tb]

    if features is not None:
        mel_or_feats = jnp.asarray(features)
        if mel_or_feats.ndim == 2:
            mel_or_feats = mel_or_feats[None]
    else:
        mel_or_feats = jnp.asarray(mels)
        if mel_or_feats.ndim == 2:
            mel_or_feats = mel_or_feats[None]

    heads = tuple(map(tuple, model.alignment_heads.tolist()))
    token_probs, trace_diags = _alignment_device(
        model.params,
        model.dims,
        heads,
        sot_len,
        tokenizer.eot,
        medfilt_width,
        tb - sot_len,
        mel_or_feats,
        *jax.device_put(  # one round-trip for the per-call host inputs
            (
                padded,
                np.asarray(t_reals, np.int32),
                np.asarray([nf // 2 for nf in num_frames_batch], np.int32),
                np.float32(qk_scale),
            )
        ),
        features_given=features is not None,
    )
    # one round-trip for the outputs as well
    token_probs, trace_diags = jax.device_get((token_probs, trace_diags))

    out: List[List[WordTiming]] = []
    for i, text_tokens in enumerate(text_tokens_batch):
        if len(text_tokens) == 0:
            out.append([])
            continue
        out.append(
            _timings_from_alignment(
                tokenizer,
                text_tokens,
                token_probs[i],
                trace_diags[i],
                sot_len=sot_len,
                t_real=t_reals[i],
                tb=tb,
                m_real=num_frames_batch[i] // 2,
            )
        )
    return out


def _timings_from_alignment(
    tokenizer, text_tokens, token_probs, trace_diags, *, sot_len, t_real, tb, m_real
) -> List[WordTiming]:
    """Host post-processing: backtrace, word splitting, jump-time extraction."""
    text_token_probs = token_probs[: len(text_tokens)].tolist()

    # rows: no_timestamps + text tokens (the reference's [len(sot):-1] slice)
    n_real = t_real - sot_len - 1
    trace = _unskew_trace(trace_diags, tb - sot_len, trace_diags.shape[0] - (tb - sot_len) - 1)
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


def find_alignment(
    model: "Whisper",
    tokenizer: Tokenizer,
    text_tokens: List[int],
    mel,
    num_frames: int,
    *,
    features=None,  # (Ta, C) encoder features; skips the encoder pass
    medfilt_width: int = 7,
    qk_scale: float = 1.0,
) -> List[WordTiming]:
    """Align text tokens to audio frames; parity with timing.py:163-242."""
    if len(text_tokens) == 0:
        return []
    if features is None:
        mel = jnp.asarray(mel)
        if mel.ndim == 2:
            mel = mel[None]
    return find_alignment_batch(
        model, tokenizer, [text_tokens], mel if features is None else None,
        [num_frames],
        features=features, medfilt_width=medfilt_width, qk_scale=qk_scale,
    )[0]


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
    alignment: Optional[List[WordTiming]] = None,
    features=None,
    **kwargs,
):
    """Attach per-word timings to segments; parity with timing.py:279-388.

    ``alignment`` may be precomputed (e.g. by :func:`find_alignment_batch`
    across many windows); otherwise it is computed here — from ``features``
    (the window's encoder output, skipping the encoder pass) when given.
    """
    if len(segments) == 0:
        return

    text_tokens_per_segment = [
        [token for token in segment["tokens"] if token < tokenizer.eot]
        for segment in segments
    ]

    text_tokens = [t for seg in text_tokens_per_segment for t in seg]
    if alignment is None:
        alignment = find_alignment(
            model, tokenizer, text_tokens, mel, num_frames,
            features=features, **kwargs
        )
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
