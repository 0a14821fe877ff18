"""StreamingTranscriber must match one-shot transcribe() chunk-for-chunk.

Equality holds whenever each window's mel peak is within the dynamic-range
floor of the file's global peak (see streaming.py notes); the fixtures below
are constructed so that is true (every window contains jfk speech).
"""

import numpy as np
import pytest

import whisper_tpu
from whisper_tpu.models.whisper import Whisper
from whisper_tpu.streaming import StreamingTranscriber

from conftest import JFK

pytestmark = pytest.mark.reference


@pytest.fixture(scope="module")
def model():
    from _reference import TINY_DIMS, convert_to_jax, make_reference_model

    params, dims = convert_to_jax(make_reference_model(TINY_DIMS, seed=0))
    return Whisper(dims, params)


def _assert_same(streamed: dict, single: dict):
    assert streamed["text"] == single["text"]
    assert streamed["language"] == single["language"]
    assert len(streamed["segments"]) == len(single["segments"])
    for asg, bsg in zip(streamed["segments"], single["segments"]):
        assert asg["tokens"] == bsg["tokens"]
        assert asg["seek"] == bsg["seek"]
        assert abs(asg["start"] - bsg["start"]) < 1e-9
        assert abs(asg["end"] - bsg["end"]) < 1e-9


KW = dict(
    language="en", temperature=0.0,
    compression_ratio_threshold=None, logprob_threshold=None,
    condition_on_previous_text=True,
)


@pytest.mark.parametrize("chunk_seconds", [0.37, 2.0, 31.0])
def test_streaming_matches_transcribe(model, chunk_seconds):
    audio = whisper_tpu.load_audio(JFK)
    audio = np.tile(audio, 4)  # ~44 s: crosses window boundaries

    single = model.transcribe(audio, verbose=None, **KW)

    st = StreamingTranscriber(model, **KW)
    emitted = []
    step = int(chunk_seconds * 16000)
    for off in range(0, len(audio), step):
        emitted.extend(st.push(audio[off : off + step]))
    emitted.extend(st.flush())

    _assert_same(st.result, single)
    assert emitted == st.result["segments"]


def test_streaming_single_short_window(model):
    audio = whisper_tpu.load_audio(JFK)  # 11 s: flush-path only
    single = model.transcribe(audio, verbose=None, **KW)
    st = StreamingTranscriber(model, **KW)
    assert st.push(audio) == []  # no full window yet
    st.flush()
    _assert_same(st.result, single)


def test_streaming_word_timestamps(model):
    audio = np.tile(whisper_tpu.load_audio(JFK), 3)
    kw = dict(KW, word_timestamps=True)
    single = model.transcribe(audio, verbose=None, **kw)
    st = StreamingTranscriber(model, **kw)
    st.push(audio)
    st.flush()
    _assert_same(st.result, single)
    sw = [w for s in single["segments"] for w in s.get("words", [])]
    bw = [w for s in st.result["segments"] for w in s.get("words", [])]
    assert len(sw) == len(bw)
    for a, b in zip(sw, bw):
        assert a["word"] == b["word"]
        assert a["start"] == b["start"] and a["end"] == b["end"]


def test_streaming_initial_prompt_and_flush_semantics(model):
    audio = np.tile(whisper_tpu.load_audio(JFK), 3)
    kw = dict(KW, initial_prompt="JFK inaugural address")
    single = model.transcribe(audio, verbose=None, **kw)
    st = StreamingTranscriber(model, **kw)
    st.push(audio)
    st.flush()
    _assert_same(st.result, single)
    with pytest.raises(RuntimeError):
        st.push(np.zeros(160, np.float32))
    assert st.flush() == []  # idempotent


def test_streaming_mel_window_matches_full_mel(model):
    """The incremental window mel must equal slicing the whole-file mel."""
    audio = np.tile(whisper_tpu.load_audio(JFK), 3)
    full = np.asarray(
        whisper_tpu.log_mel_spectrogram(audio, 80, padding=16000 * 30)
    )
    st = StreamingTranscriber(model, **KW)
    # install PCM without processing windows (push would advance seek and
    # drop consumed samples)
    st._pcm = np.asarray(audio, np.float32)
    st._total_samples = len(audio)
    content = st._content_frames()
    for seek in (0, 1, 700, 3000, content - 100):
        size = min(3000, content - seek)
        got = st._window_mel(seek, size)
        want = whisper_tpu.pad_or_trim(full[:, seek : seek + size], 3000)
        # identical frames up to the per-window dynamic-range floor: compare
        # where neither is floored
        g, w = np.asarray(got[:, :size]), np.asarray(want[:, :size])
        floor_g = g.min() + 1e-6
        floor_w = w.min() + 1e-6
        mask = (g > floor_g) & (w > floor_w)
        assert mask.mean() > 0.5
        np.testing.assert_allclose(g[mask], w[mask], atol=2e-4)
