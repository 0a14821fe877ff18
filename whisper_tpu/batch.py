"""Batched multi-file transcription for serving throughput.

Not in the reference (its ``transcribe`` handles one file at a time, and its
``decode`` crashes on batched beam search).  On TPU the decode loop is
bandwidth-bound on weights, so decoding windows from many files in lockstep
batches multiplies throughput at near-zero cost per extra stream.

Semantics: identical per file to ``transcribe`` — including the default
``condition_on_previous_text=True`` prompt conditioning, because the decode
engine supports per-row positions (each file's window carries its own prompt
length; see decoding.DecodingTask.run_with_prompts).  Language is either
pinned or detected once per file on its first window (batched), with files
grouped by detected language.  The per-file seek/segmentation logic is shared
with ``transcribe`` (see transcribe.segment_window).

Word timestamps are supported: the alignment forward passes of all files in a
round run as one batched device program (timing.find_alignment_batch).

Every ``transcribe`` option is supported (initial_prompt,
carry_initial_prompt, clip_timestamps, word_timestamps, the fallback
thresholds); only a decode-level fixed ``prompt`` is rejected since prompts
are managed per file here.
"""

from functools import partial
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

from .audio import (
    FRAMES_PER_SECOND,
    HOP_LENGTH,
    N_FRAMES,
    N_SAMPLES,
    SAMPLE_RATE,
    as_transfer_array,
    load_audio,
    log_mel_spectrogram,
)
from .decoding import DecodingOptions, DecodingTask
from .tokenizer import get_tokenizer
from .transcribe import (
    _refine_seek_with_word_timings,
    needs_fallback,
    segment_window,
)
from .utils import exact_div, get_end


@partial(jax.jit, static_argnames=("n_frames",))
def _slice_windows_dev(
    mels: jax.Array,  # (n_files, n_mels, F) device-resident log-mel store
    rows: jax.Array,  # (B,) i32 file indices
    seeks: jax.Array,  # (B,) i32 per-row window start frames
    sizes: jax.Array,  # (B,) i32 per-row valid frame counts
    n_frames: int = N_FRAMES,
) -> jax.Array:
    """Slice per-file decode windows out of the device mel store.

    Mirrors the reference's host-side ``pad_or_trim(mel[:, seek:seek+3000])``
    (transcribe.py:284-286) without ever moving mel to the host: frames past
    a row's ``size`` are zeroed, exactly like pad_or_trim's zero padding.
    Keeping mels device-resident avoids the dominant transfer costs of
    batched transcription over a remote TPU attachment (the per-file mel
    download and the per-round window re-uploads).
    """
    sel = mels[rows]
    win = jax.vmap(
        lambda m, s: jax.lax.dynamic_slice_in_dim(m, s, n_frames, axis=-1)
    )(sel, seeks)
    mask = jnp.arange(n_frames)[None, None, :] < sizes[:, None, None]
    return jnp.where(mask, win, 0.0)


class _FileState:
    def __init__(self, content_frames: int, clip_timestamps: Union[str, List[float]] = "0"):
        self.content_frames = content_frames
        self.segments: List[dict] = []
        self.tokens: List[int] = []
        self.language: Optional[str] = None
        self.last_speech_timestamp = 0.0
        self.prompt_reset_since = 0
        self.initial_prompt_len = 0

        # clip windows, as in transcribe (reference transcribe.py:168-177)
        if isinstance(clip_timestamps, str):
            clip_timestamps = [
                float(ts)
                for ts in (clip_timestamps.split(",") if clip_timestamps else [])
            ]
        seek_points = [round(ts * FRAMES_PER_SECOND) for ts in clip_timestamps]
        if len(seek_points) == 0:
            seek_points.append(0)
        if len(seek_points) % 2 == 1:
            seek_points.append(self.content_frames)
        self.seek_clips = list(zip(seek_points[::2], seek_points[1::2]))
        self.clip_idx = 0
        self.seek = self.seek_clips[0][0]

    @property
    def done(self) -> bool:
        """Advance across clip boundaries; True when no window remains."""
        while self.clip_idx < len(self.seek_clips):
            clip_start, clip_end = self.seek_clips[self.clip_idx]
            if self.seek < clip_start:
                self.seek = clip_start
            if self.seek >= min(clip_end, self.content_frames):
                self.clip_idx += 1
                if self.clip_idx < len(self.seek_clips):
                    self.seek = self.seek_clips[self.clip_idx][0]
                continue
            return False
        return True

    def window_size(self) -> int:
        clip_end = self.seek_clips[self.clip_idx][1]
        return min(
            N_FRAMES, self.content_frames - self.seek, clip_end - self.seek
        )


def _bucket_samples(width: int) -> int:
    """Waveform-width bucket for the packed upload buffer.

    The mel program and the window-slice program compile per buffer SHAPE;
    without bucketing, every distinct longest-file length in a batch is a
    fresh multi-second XLA compile — fatal for serving, where batch
    compositions vary per dispatch.  Buckets: one 30 s class for short
    requests (the dominant serving shape), then 120 s steps, bounding the
    wasted mel compute at <120 s per row and the program count at one per
    2-minute size class.
    """
    if width <= N_SAMPLES:
        return N_SAMPLES
    step = 4 * N_SAMPLES  # 120 s
    return ((width + step - 1) // step) * step


def _prepare_mels(model, audios, _st, _sync, pad_rows_to=None):
    """Host-decode ``audios``, upload as one packed buffer, dispatch the mel
    program; returns the device-resident mel store and per-file lengths.

    One device-resident mel store for the group: stack the waveforms (padded
    to the longest, bucketed — see _bucket_samples), compute every log-mel in
    ONE device program, and never fetch mel to the host.  Numerically
    identical to per-file log_mel_spectrogram: the dynamic-range floor is
    already per-row, and a row's extra tail (beyond its own length + the 30 s
    zero padding) is pure silence that never raises its max — while every
    decode window only ever reads frames inside the row's true region.

    ``pad_rows_to``: allocate this many buffer rows (zero-padded) so that
    differently sized groups share one compiled mel program; extra rows
    carry no file state and cost only their (silent) mel compute.
    """
    with _st("audio_host"):
        arrs = [
            load_audio(a)
            if isinstance(a, str)
            else (
                np.asarray(a).reshape(-1)
                if np.asarray(a).dtype == np.int16
                else np.asarray(a, np.float32).reshape(-1)
            )
            for a in audios
        ]
        lens = [a.shape[0] for a in arrs]
        # ship the batch as int16 when every row is exactly 16-bit PCM — the
        # waveform upload dominates the mel stage on remote attachments and
        # the device-side reconstruction is bit-exact (audio.as_transfer_array)
        arrs = [as_transfer_array(a) for a in arrs]
        dt = np.int16 if all(a.dtype == np.int16 for a in arrs) else np.float32
        n_rows = max(pad_rows_to or 0, len(arrs))
        width = _bucket_samples(max(lens)) if lens else 0
        buf = np.zeros((n_rows, width), dt)
        for i, a in enumerate(arrs):
            buf[i, : a.shape[0]] = a if dt == np.int16 else (
                a.astype(np.float32) / 32768.0 if a.dtype == np.int16 else a
            )
    with _st("mel"):
        mels_dev = _sync(log_mel_spectrogram(
            jax.device_put(buf), model.dims.n_mels, padding=N_SAMPLES
        ))
    return mels_dev, lens


def transcribe_batch(
    model,
    audios: Sequence[Union[str, np.ndarray]],
    *,
    batch_size: int = 16,
    temperature: Union[float, Tuple[float, ...]] = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
    compression_ratio_threshold: Optional[float] = 2.4,
    logprob_threshold: Optional[float] = -1.0,
    no_speech_threshold: Optional[float] = 0.6,
    condition_on_previous_text: bool = True,
    initial_prompt: Optional[str] = None,
    carry_initial_prompt: bool = False,
    word_timestamps: bool = False,
    prepend_punctuations: str = "\"'“¿([{-",
    append_punctuations: str = "\"'.。,，!！?？:：”)]}、",
    clip_timestamps: Union[str, List[float]] = "0",
    hallucination_silence_threshold: Optional[float] = None,
    word_seek_refinement: bool = True,
    stage_timer=None,
    **decode_options,
) -> List[dict]:
    """Transcribe many files concurrently; returns one result dict per file.

    ``stage_timer``: optional :class:`whisper_tpu.profiling.StageTimer`; when
    given, wall time is attributed to audio_host / mel / window_slice /
    engine / segment / alignment stages (device work is synced at stage
    boundaries, which slightly reduces pipelining — profiling only).

    ``word_seek_refinement`` (not in the reference, default True = reference
    semantics): with ``word_timestamps=True`` the reference rewinds each
    window's seek to the last aligned word's end and re-decodes the tail
    (reference transcribe.py:413-416).  ``False`` keeps the decode's own
    window advance — the right semantics when windows are FIXED by
    construction (``transcribe_chunked``: an overlapping neighbor chunk
    already re-decodes every boundary).  Mutually exclusive with
    ``hallucination_silence_threshold`` (whose silence-skipping heuristics
    steer seek and assume refinement).
    """
    if (
        not word_seek_refinement
        and hallucination_silence_threshold is not None
        and word_timestamps
    ):
        # scope to word_timestamps=True: with timestamps off the threshold is
        # inert in both this implementation and the reference (only consulted
        # inside the word-timestamps block, reference transcribe.py:401-508)
        raise ValueError(
            "word_seek_refinement=False is incompatible with "
            "hallucination_silence_threshold (its silence-skip heuristics "
            "steer the seek that refinement controls)"
        )
    if decode_options.pop("prompt", None):
        raise NotImplementedError(
            "transcribe_batch manages prompts per file; use transcribe() for a "
            "fixed decode-level prompt"
        )

    import contextlib

    def _st(name):
        return stage_timer.stage(name) if stage_timer is not None else (
            contextlib.nullcontext()
        )

    def _sync(x):
        if stage_timer is not None:
            jax.block_until_ready(x)
        return x

    temperatures = (
        [temperature] if isinstance(temperature, (int, float)) else list(temperature)
    )

    group_kw = dict(
        batch_size=batch_size,
        temperatures=temperatures,
        compression_ratio_threshold=compression_ratio_threshold,
        logprob_threshold=logprob_threshold,
        no_speech_threshold=no_speech_threshold,
        condition_on_previous_text=condition_on_previous_text,
        initial_prompt=initial_prompt,
        carry_initial_prompt=carry_initial_prompt,
        word_timestamps=word_timestamps,
        prepend_punctuations=prepend_punctuations,
        append_punctuations=append_punctuations,
        clip_timestamps=clip_timestamps,
        hallucination_silence_threshold=hallucination_silence_threshold,
        word_seek_refinement=word_seek_refinement,
        decode_options=decode_options,
    )

    # Streams longer than one engine batch process as groups of
    # ``batch_size`` files.  Per-file semantics are unchanged (every file's
    # windows, prompts, and fallback ladder live entirely inside its group);
    # only the batch composition differs from the pre-group behavior when
    # files of very different lengths are mixed (a group drains its own
    # stragglers instead of pulling in files beyond the group).
    groups = [
        list(audios[i : i + batch_size])
        for i in range(0, len(audios), batch_size)
    ] or [[]]

    if len(groups) == 1 or stage_timer is not None:
        # stage_timer forces the serial path: attribution needs stage
        # boundaries to be real sync points, which pipelining removes
        pad = batch_size if len(groups) > 1 else None
        results = []
        for g in groups:
            mels_dev, lens = _prepare_mels(model, g, _st, _sync, pad_rows_to=pad)
            results.extend(
                _transcribe_group(
                    model, mels_dev, lens, _st=_st, _sync=_sync, **group_kw
                )
            )
        return results

    # Pipelined streaming: a prefetch thread prepares group k+1's mel store —
    # host audio decode, int16 packing, the (async) device upload, and the
    # (async) mel program dispatch — while group k's engine rounds occupy the
    # device.  The queue holds at most 2 prepared groups (a group's mel store
    # is ~50 MB at large-v3 shapes) and the thread dies with the consumer on
    # error.  On the remote-tunnel deployment the overlapped stages are ~17%
    # of wall (docs/BENCHMARKS.md stage table), so steady-state throughput
    # approaches the bare-engine rate.
    from queue import Queue
    from threading import Thread

    q: "Queue" = Queue(maxsize=2)

    def _producer():
        for g in groups:
            try:
                q.put(
                    _prepare_mels(model, g, _st, _sync, pad_rows_to=batch_size)
                )
            except BaseException as e:  # surfaced in the consumer
                q.put(e)
                return

    th = Thread(target=_producer, daemon=True)
    th.start()
    results = []
    for _ in groups:
        item = q.get()
        if isinstance(item, BaseException):
            th.join()
            raise item
        mels_dev, lens = item
        results.extend(
            _transcribe_group(
                model, mels_dev, lens, _st=_st, _sync=_sync, **group_kw
            )
        )
    th.join()
    return results


def _transcribe_group(
    model,
    mels_dev,
    lens,
    *,
    batch_size,
    temperatures,
    compression_ratio_threshold,
    logprob_threshold,
    no_speech_threshold,
    condition_on_previous_text,
    initial_prompt,
    carry_initial_prompt,
    word_timestamps,
    prepend_punctuations,
    append_punctuations,
    clip_timestamps,
    hallucination_silence_threshold,
    word_seek_refinement,
    decode_options,
    _st,
    _sync,
):
    """Decode one group of files out of its device-resident mel store.

    All per-file logic of :func:`transcribe_batch` lives here; the wrapper
    handles grouping and mel-store prefetch.
    """
    states = [
        _FileState(
            content_frames=(n + N_SAMPLES) // HOP_LENGTH - N_FRAMES,
            clip_timestamps=clip_timestamps,
        )
        for n in lens
    ]

    def slice_windows(row_indices: List[int], pad_to: int) -> jax.Array:
        """Device windows for the given files at their current seeks."""
        n = len(row_indices)
        rows = np.zeros(pad_to, np.int32)
        seeks = np.zeros(pad_to, np.int32)
        sizes = np.zeros(pad_to, np.int32)
        for j, i in enumerate(row_indices):
            st = states[i]
            rows[j] = i
            if st.done:  # exhausted/empty file: zero window
                continue
            seeks[j] = st.seek
            sizes[j] = st.window_size()
        return _slice_windows_dev(mels_dev, *jax.device_put((rows, seeks, sizes)))

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

        # done (empty) files keep a zero window, as before — their detected
        # language is irrelevant but keeps row alignment and batch shape
        first = slice_windows(
            [i for i in range(len(states))], len(states)
        )
        _, probs = detect_language(model, first)
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
        remaining_prompt_length = model.dims.n_text_ctx // 2 - 1
        if initial_prompt is not None:
            prompt_tokens = tokenizer.encode(" " + initial_prompt.strip())
            remaining_prompt_length -= len(prompt_tokens)
            for idx in indices:
                states[idx].tokens = list(prompt_tokens)
                states[idx].initial_prompt_len = len(prompt_tokens)

        def prompt_for(st: _FileState) -> List[int]:
            """Per-window prompt; parity with transcribe.py's assembly."""
            if carry_initial_prompt:
                nignored = max(st.initial_prompt_len, st.prompt_reset_since)
                remaining = st.tokens[nignored:][-remaining_prompt_length:]
                return st.tokens[: st.initial_prompt_len] + remaining
            return st.tokens[st.prompt_reset_since :]

        tasks = {}  # temperature -> DecodingTask (compiled engine variants)

        def get_task(t: float) -> DecodingTask:
            if t not in tasks:
                kwargs = {
                    k: v
                    for k, v in decode_options.items()
                    if k not in ("language", "draft_model")
                }
                if t > 0:
                    kwargs.pop("beam_size", None)
                    kwargs.pop("patience", None)
                else:
                    kwargs.pop("best_of", None)
                tasks[t] = DecodingTask(
                    model,
                    DecodingOptions(**kwargs, language=lang, temperature=t),
                    draft_model=decode_options.get("draft_model"),
                )
            return tasks[t]

        active = [i for i in indices if not states[i].done]
        while active:
            rows = active[:batch_size]
            sizes = [states[i].window_size() for i in rows]
            with _st("window_slice"):
                wins_dev = _sync(slice_windows(rows, batch_size))

            # per-file prompt: everything accepted since the last reset
            # (transcribe's condition_on_previous_text semantics)
            prompts = [prompt_for(states[i]) for i in rows]
            prompts += [[]] * (batch_size - len(rows))

            # temperature-fallback ladder over the whole batch; rows that have
            # already passed the gates keep their earlier result
            results = [None] * len(rows)
            for t in temperatures:
                with _st("engine"):
                    batch_results = get_task(t).run_with_prompts(wins_dev, prompts)
                any_pending = False
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
                        any_pending = True
                if not any_pending:
                    break

            # phase 1: per-file segmentation and seek advance
            seg_ctx = _st("segment")
            seg_ctx.__enter__()
            pending = []  # rows that produced segments this round
            for j, i in enumerate(rows):
                st = states[i]
                result = results[j]
                segment_size = sizes[j]
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

                previous_seek = st.seek
                current_segments, st.seek, single_ts_ending = segment_window(
                    result=result,
                    tokenizer=tokenizer,
                    seek=previous_seek,
                    segment_size=segment_size,
                    time_offset=time_offset,
                    segment_duration=segment_duration,
                    input_stride=input_stride,
                    time_precision=time_precision,
                )
                pending.append(
                    dict(
                        state=st, row=j, segments=current_segments,
                        result=result,
                        previous_seek=previous_seek, segment_size=segment_size,
                        time_offset=time_offset,
                        segment_duration=segment_duration,
                        single_ts_ending=single_ts_ending,
                    )
                )

            seg_ctx.__exit__(None, None, None)

            # phase 2 (word timestamps): one batched alignment program for all
            # files that produced text this round
            if word_timestamps and pending:
                align_ctx = _st("alignment")
                align_ctx.__enter__()
                from .timing import add_word_timestamps, find_alignment_batch

                text_tokens = [
                    [
                        tok
                        for segment in p["segments"]
                        for tok in segment["tokens"]
                        if tok < tokenizer.eot
                    ]
                    for p in pending
                ]
                aligned_rows = [
                    k for k, toks in enumerate(text_tokens) if len(toks) > 0
                ]
                # reuse the encoder features the decode engine already
                # computed for these windows (skips a full encoder pass in
                # the alignment program); fall back to the mel windows if an
                # engine variant didn't return them
                feats = [pending[k]["result"].audio_features for k in aligned_rows]
                have_feats = feats and all(f is not None for f in feats)
                alignments = find_alignment_batch(
                    model,
                    tokenizer,
                    [text_tokens[k] for k in aligned_rows],
                    None
                    if have_feats
                    else wins_dev[
                        np.asarray([pending[k]["row"] for k in aligned_rows])
                    ],  # device gather — no host round-trip
                    [pending[k]["segment_size"] for k in aligned_rows],
                    features=jnp.stack(feats) if have_feats else None,
                ) if aligned_rows else []
                # rows with no text tokens still run add_word_timestamps (with
                # an empty alignment) and the seek refinement, exactly as
                # transcribe() does — refinement can rewind seek even then
                per_row = {k: a for k, a in zip(aligned_rows, alignments)}

                for k in range(len(pending)):
                    alignment = per_row.get(k, [])
                    p = pending[k]
                    st = p["state"]
                    add_word_timestamps(
                        segments=p["segments"],
                        model=model,
                        tokenizer=tokenizer,
                        mel=None,  # unused: alignment is always precomputed here
                        num_frames=p["segment_size"],
                        prepend_punctuations=prepend_punctuations,
                        append_punctuations=append_punctuations,
                        last_speech_timestamp=st.last_speech_timestamp,
                        alignment=alignment,
                    )
                    if not word_seek_refinement:
                        last_word_end = get_end(p["segments"])
                        if last_word_end is not None:
                            st.last_speech_timestamp = last_word_end
                        continue
                    window_end_time = float(
                        (p["previous_seek"] + N_FRAMES) * HOP_LENGTH / SAMPLE_RATE
                    )
                    st.seek, restart = _refine_seek_with_word_timings(
                        p["segments"],
                        seek=st.seek,
                        previous_seek=p["previous_seek"],
                        segment_size=p["segment_size"],
                        single_timestamp_ending=p["single_ts_ending"],
                        time_offset=p["time_offset"],
                        window_end_time=window_end_time,
                        segment_duration=p["segment_duration"],
                        content_frames=st.content_frames,
                        content_duration=float(
                            st.content_frames * HOP_LENGTH / SAMPLE_RATE
                        ),
                        last_speech_timestamp=st.last_speech_timestamp,
                        threshold=hallucination_silence_threshold,
                    )
                    if restart:
                        # transcribe()'s `continue`: nothing from this window
                        # commits — no segments, no tokens, no prompt reset —
                        # and the window re-decodes from the refined seek
                        # (here: on the next round, with identical state)
                        p["segments"].clear()
                        p["restart"] = True
                        continue
                    last_word_end = get_end(p["segments"])
                    if last_word_end is not None:
                        st.last_speech_timestamp = last_word_end
                align_ctx.__exit__(None, None, None)

            # phase 3: commit segments and tokens per file
            for p in pending:
                if p.get("restart"):
                    continue
                st = p["state"]
                for segment in p["segments"]:
                    if segment["start"] == segment["end"] or not segment["text"].strip():
                        segment["text"] = ""
                        segment["tokens"] = []
                        segment["words"] = []
                st.segments.extend(
                    {"id": k, **segment}
                    for k, segment in enumerate(p["segments"], start=len(st.segments))
                )
                st.tokens.extend(
                    tok for segment in p["segments"] for tok in segment["tokens"]
                )
                if not condition_on_previous_text or p["result"].temperature > 0.5:
                    # don't condition on text produced at high temperature
                    st.prompt_reset_since = len(st.tokens)

            active = [i for i in indices if not states[i].done]

    return [
        dict(
            text=get_tokenizer(
                model.is_multilingual,
                num_languages=model.num_languages,
                language=st.language,
                task=decode_options.get("task", "transcribe"),
            ).decode(st.tokens[st.initial_prompt_len :]),
            segments=st.segments,
            language=st.language,
        )
        for st in states
    ]
