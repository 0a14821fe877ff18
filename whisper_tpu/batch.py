"""Batched multi-file transcription for serving throughput.

Not in the reference (its ``transcribe`` handles one file at a time, and its
``decode`` crashes on batched beam search).  On TPU the decode loop is
bandwidth-bound on weights, so decoding windows from many files in lockstep
batches multiplies throughput at near-zero cost per extra stream.

Semantics: identical to ``transcribe(..., condition_on_previous_text=False)``
per file — windows are prompt-free, which is what makes cross-file batching
exact (all rows share one initial-token shape).  Language is either pinned or
detected once per file on its first window (batched), with files grouped by
detected language.  The per-file seek/segmentation logic is shared with
``transcribe`` (see transcribe.segment_window).

Not supported here (use ``transcribe`` per file): condition_on_previous_text,
initial_prompt, clip_timestamps, word_timestamps.
"""

from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

import jax.numpy as jnp

from .audio import HOP_LENGTH, N_FRAMES, N_SAMPLES, SAMPLE_RATE, log_mel_spectrogram, pad_or_trim
from .decoding import DecodingOptions, DecodingTask
from .tokenizer import get_tokenizer
from .transcribe import needs_fallback, segment_window
from .utils import exact_div


class _FileState:
    def __init__(self, mel: np.ndarray):
        self.mel = mel
        self.content_frames = mel.shape[-1] - N_FRAMES
        self.seek = 0
        self.segments: List[dict] = []
        self.tokens: List[int] = []
        self.language: Optional[str] = None

    @property
    def done(self) -> bool:
        return self.seek >= self.content_frames

    def window(self) -> Tuple[np.ndarray, int]:
        segment_size = min(N_FRAMES, self.content_frames - self.seek)
        mel_segment = self.mel[:, self.seek : self.seek + segment_size]
        return pad_or_trim(mel_segment, N_FRAMES), segment_size


def transcribe_batch(
    model,
    audios: Sequence[Union[str, np.ndarray]],
    *,
    batch_size: int = 16,
    temperature: Union[float, Tuple[float, ...]] = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
    compression_ratio_threshold: Optional[float] = 2.4,
    logprob_threshold: Optional[float] = -1.0,
    no_speech_threshold: Optional[float] = 0.6,
    **decode_options,
) -> List[dict]:
    """Transcribe many files concurrently; returns one result dict per file."""
    for unsupported in (
        "condition_on_previous_text",
        "initial_prompt",
        "clip_timestamps",
        "word_timestamps",
        "prompt",
    ):
        if decode_options.pop(unsupported, None):
            raise NotImplementedError(
                f"transcribe_batch does not support {unsupported}; "
                "use transcribe() per file"
            )

    temperatures = (
        [temperature] if isinstance(temperature, (int, float)) else list(temperature)
    )

    states = [
        _FileState(
            np.asarray(log_mel_spectrogram(audio, model.dims.n_mels, padding=N_SAMPLES))
        )
        for audio in audios
    ]

    # language: pinned, or batched detection on each file's first window
    language = decode_options.get("language")
    if language is None:
        if not model.is_multilingual:
            language = "en"
    if language is not None:
        for st in states:
            st.language = language
    else:
        from .decoding import detect_language

        first = np.stack([st.window()[0] for st in states])
        _, probs = detect_language(model, jnp.asarray(first))
        for st, p in zip(states, probs):
            st.language = max(p, key=p.get)

    input_stride = exact_div(N_FRAMES, model.dims.n_audio_ctx)
    time_precision = input_stride * HOP_LENGTH / SAMPLE_RATE

    # group by language so each batch shares one engine/tokenizer config
    by_language = {}
    for idx, st in enumerate(states):
        by_language.setdefault(st.language, []).append(idx)

    for lang, indices in by_language.items():
        tokenizer = get_tokenizer(
            model.is_multilingual,
            num_languages=model.num_languages,
            language=lang,
            task=decode_options.get("task", "transcribe"),
        )
        tasks = {}  # temperature -> DecodingTask (compiled engine variants)

        def get_task(t: float) -> DecodingTask:
            if t not in tasks:
                kwargs = {k: v for k, v in decode_options.items() if k != "language"}
                if t > 0:
                    kwargs.pop("beam_size", None)
                    kwargs.pop("patience", None)
                else:
                    kwargs.pop("best_of", None)
                tasks[t] = DecodingTask(
                    model, DecodingOptions(**kwargs, language=lang, temperature=t)
                )
            return tasks[t]

        active = [i for i in indices if not states[i].done]
        while active:
            rows = active[:batch_size]
            windows = [states[i].window() for i in rows]
            mels = np.stack([w for w, _ in windows])
            if len(rows) < batch_size:
                mels = np.concatenate(
                    [mels, np.zeros((batch_size - len(rows),) + mels.shape[1:],
                                    mels.dtype)]
                )

            # temperature-fallback ladder over the whole batch; rows that have
            # already passed the gates keep their earlier result
            results = [None] * len(rows)
            for t in temperatures:
                batch_results = get_task(t).run(jnp.asarray(mels))
                pending = False
                for j in range(len(rows)):
                    if results[j] is not None:
                        continue
                    r = batch_results[j]
                    if not needs_fallback(
                        r,
                        compression_ratio_threshold,
                        logprob_threshold,
                        no_speech_threshold,
                    ) or t == temperatures[-1]:
                        results[j] = r
                    else:
                        pending = True
                if not pending:
                    break

            for j, i in enumerate(rows):
                st = states[i]
                result = results[j]
                _, segment_size = windows[j]
                time_offset = float(st.seek * HOP_LENGTH / SAMPLE_RATE)
                segment_duration = segment_size * HOP_LENGTH / SAMPLE_RATE

                if no_speech_threshold is not None:
                    should_skip = result.no_speech_prob > no_speech_threshold
                    if (
                        logprob_threshold is not None
                        and result.avg_logprob > logprob_threshold
                    ):
                        should_skip = False
                    if should_skip:
                        st.seek += segment_size
                        continue

                current_segments, st.seek, _ = segment_window(
                    result=result,
                    tokenizer=tokenizer,
                    seek=st.seek,
                    segment_size=segment_size,
                    time_offset=time_offset,
                    segment_duration=segment_duration,
                    input_stride=input_stride,
                    time_precision=time_precision,
                )
                for segment in current_segments:
                    if segment["start"] == segment["end"] or not segment["text"].strip():
                        segment["text"] = ""
                        segment["tokens"] = []
                        segment["words"] = []
                st.segments.extend(
                    {"id": k, **segment}
                    for k, segment in enumerate(current_segments, start=len(st.segments))
                )
                st.tokens.extend(
                    tok for segment in current_segments for tok in segment["tokens"]
                )

            active = [i for i in indices if not states[i].done]

        for i in indices:
            states[i].tokenizer = tokenizer

    return [
        dict(
            text=get_tokenizer(
                model.is_multilingual,
                num_languages=model.num_languages,
                language=st.language,
                task=decode_options.get("task", "transcribe"),
            ).decode(st.tokens),
            segments=st.segments,
            language=st.language,
        )
        for st in states
    ]
