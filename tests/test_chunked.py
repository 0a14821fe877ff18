"""transcribe_chunked: offset/merge unit behavior + end-to-end consistency.

The merge helpers are pure and tested exactly; the end-to-end run uses the
converted reference tiny model (random weights) so text content is
arbitrary — the assertions are structural (coverage, monotonicity,
rebasing) plus exact single-chunk parity with transcribe().
"""

import numpy as np
import pytest

import whisper_tpu
from whisper_tpu.audio import CHUNK_LENGTH, SAMPLE_RATE
from whisper_tpu.chunked import (
    chunk_offsets,
    detect_file_language,
    merge_chunk_segments,
    owned_segments,
    transcribe_chunked,
)
from whisper_tpu.models.whisper import Whisper

from conftest import JFK


def test_chunk_offsets_cover_audio():
    for seconds in (1, 29.9, 30, 30.1, 45, 60, 61, 300):
        n = int(seconds * SAMPLE_RATE)
        offsets = chunk_offsets(n, overlap=5.0)
        assert offsets[0] == 0
        # every sample is inside some chunk
        assert offsets[-1] + CHUNK_LENGTH * SAMPLE_RATE >= n
        # consecutive chunks overlap by exactly 5 s
        for a, b in zip(offsets, offsets[1:]):
            assert b - a == (CHUNK_LENGTH - 5) * SAMPLE_RATE
        # no useless trailing chunk (its predecessor already reaches the end)
        if len(offsets) > 1:
            assert offsets[-2] + CHUNK_LENGTH * SAMPLE_RATE < n


def test_chunk_offsets_rejects_bad_overlap():
    with pytest.raises(ValueError):
        chunk_offsets(SAMPLE_RATE, overlap=30.0)
    with pytest.raises(ValueError):
        chunk_offsets(SAMPLE_RATE, overlap=-1.0)


def _seg(start, end, text, words=None, seek=0):
    s = dict(id=0, seek=seek, start=start, end=end, text=text, tokens=[1],
             temperature=0.0, avg_logprob=-0.1, compression_ratio=1.0,
             no_speech_prob=0.0)
    if words is not None:
        s["words"] = words
    return s


def test_merge_midpoint_ownership():
    # chunks at 0 and 25 s; overlap [25, 30], ownership boundary 27.5 s
    chunk0 = [_seg(0.0, 10.0, " a"), _seg(24.0, 30.0, " dup")]  # mid 27 < 27.5
    chunk1 = [_seg(0.0, 4.0, " dup"), _seg(4.0, 10.0, " b")]  # abs mid 27 < 27.5
    merged = merge_chunk_segments([chunk0, chunk1], [0.0, 25.0])
    # chunk0's copy of the straddler is kept (mid 27 < 27.5); chunk1's copy
    # (abs mid 27) is dropped for the same boundary; " b" (abs mid 32) stays
    assert [s["text"] for s in merged] == [" a", " dup", " b"]
    assert [s["id"] for s in merged] == [0, 1, 2]
    assert merged[1]["start"] == 24.0 and merged[1]["end"] == 30.0
    assert merged[2]["start"] == 29.0 and merged[2]["end"] == 35.0
    assert merged[2]["seek"] == 2500  # 25 s rebased into frames


def test_merge_rebases_words_and_does_not_mutate():
    words = [dict(word=" w", start=3.0, end=4.0, probability=0.5)]
    chunk1 = [_seg(3.0, 5.0, " w", words=words)]  # abs mid 29 >= boundary 27.5
    merged = merge_chunk_segments([[], chunk1], [0.0, 25.0])
    assert merged[0]["words"][0]["start"] == 28.0
    assert merged[0]["words"][0]["end"] == 29.0
    assert words[0]["start"] == 3.0  # input untouched
    assert chunk1[0]["start"] == 3.0


def test_owned_segments_stream_equals_merge():
    """Per-chunk ownership is decided by the offsets alone: emitting each
    chunk's owned_segments as its result lands (streaming) reproduces the
    merged list exactly, modulo global id renumbering."""
    chunk0 = [_seg(0.0, 10.0, " a"), _seg(24.0, 30.0, " dup")]
    chunk1 = [_seg(0.0, 4.0, " dup"), _seg(4.0, 10.0, " b"),
              _seg(27.0, 30.0, " c")]
    chunk2 = [_seg(4.0, 8.0, " c"), _seg(8.0, 12.0, " d")]
    offsets = [0.0, 25.0, 50.0]
    merged = merge_chunk_segments([chunk0, chunk1, chunk2], offsets)
    streamed = []
    for i, segs in enumerate([chunk0, chunk1, chunk2]):
        for seg in owned_segments(segs, i, offsets):
            streamed.append(dict(seg, id=len(streamed)))
    assert streamed == merged
    # inputs untouched
    assert chunk1[0]["start"] == 0.0 and chunk2[0]["start"] == 4.0


def test_detect_file_language_english_only():
    """English-only models skip detection entirely (reference
    transcribe.py:334-345 does the same via tokenizer coercion)."""

    class _Fake:
        is_multilingual = False

        def detect_language(self, mel):  # pragma: no cover - must not run
            raise AssertionError("detection must be skipped for .en models")

    wave = np.zeros(SAMPLE_RATE, np.float32)
    assert detect_file_language(_Fake(), wave) == "en"


def test_merge_requires_matching_lengths():
    with pytest.raises(ValueError):
        merge_chunk_segments([[]], [0.0, 25.0])


@pytest.mark.reference
class TestEndToEnd:
    @pytest.fixture(scope="class")
    def model(self):
        from _reference import TINY_DIMS, convert_to_jax, make_reference_model

        params, dims = convert_to_jax(make_reference_model(TINY_DIMS, seed=0))
        return Whisper(dims, params)

    KW = dict(language="en", temperature=0.0,
              compression_ratio_threshold=None, logprob_threshold=None)

    def test_single_chunk_equals_transcribe(self, model):
        audio = whisper_tpu.load_audio(JFK)  # 11 s -> one chunk
        chunked = transcribe_chunked(model, audio, **self.KW)
        single = model.transcribe(
            audio, condition_on_previous_text=False, verbose=None, **self.KW
        )
        assert chunked["text"] == single["text"]
        assert len(chunked["segments"]) == len(single["segments"])
        for cs, ss in zip(chunked["segments"], single["segments"]):
            assert cs["tokens"] == ss["tokens"]
            assert cs["start"] == ss["start"] and cs["end"] == ss["end"]

    def test_long_file_structure(self, model):
        audio = np.tile(whisper_tpu.load_audio(JFK), 5)  # ~55 s -> 2+ chunks
        duration = audio.shape[0] / SAMPLE_RATE
        result = transcribe_chunked(model, audio, **self.KW)
        assert result["language"] == "en"
        segs = result["segments"]
        assert segs, "no segments produced"
        assert [s["id"] for s in segs] == list(range(len(segs)))
        # absolute, in-bounds, non-decreasing times across the stitch
        for s in segs:
            assert -1e-6 <= s["start"] <= s["end"] <= duration + CHUNK_LENGTH
        starts = [s["start"] for s in segs]
        assert starts == sorted(starts)
        # every chunk's owned region contributed at most once per time point:
        # segments from different chunks may touch but their midpoints are
        # strictly ordered by the ownership boundaries
        mids = [(s["start"] + s["end"]) / 2 for s in segs]
        assert mids == sorted(mids)
        assert result["text"] == "".join(s["text"] for s in segs)

    def test_rejects_conditioning_and_clips(self, model):
        audio = np.zeros(SAMPLE_RATE, np.float32)
        with pytest.raises(ValueError):
            transcribe_chunked(model, audio,
                               condition_on_previous_text=True, **self.KW)
        with pytest.raises(ValueError):
            transcribe_chunked(model, audio, clip_timestamps="0,5", **self.KW)

    def test_word_timestamps_chunked(self, model):
        audio = np.tile(whisper_tpu.load_audio(JFK), 5)  # ~55 s -> 2+ chunks
        duration = audio.shape[0] / SAMPLE_RATE
        result = transcribe_chunked(
            model, audio, word_timestamps=True, **self.KW
        )
        segs = result["segments"]
        assert segs, "no segments produced"
        words = [w for s in segs for w in s.get("words", [])]
        assert words, "no word timings produced"
        for s in segs:
            ws = s.get("words", [])
            for w in ws:
                # absolute file time, within the file (+ last chunk slack)
                assert -1e-6 <= w["start"] <= w["end"] <= duration + CHUNK_LENGTH
            assert [w["start"] for w in ws] == sorted(w["start"] for w in ws)
        # later chunks' words were actually rebased past the first chunk
        assert any(w["start"] > CHUNK_LENGTH for w in words)

    def test_rejects_hallucination_threshold(self, model):
        audio = np.zeros(SAMPLE_RATE, np.float32)
        with pytest.raises(ValueError):
            transcribe_chunked(model, audio, word_timestamps=True,
                               hallucination_silence_threshold=2.0, **self.KW)
