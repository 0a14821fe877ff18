"""align(): forced alignment of known text (word timestamps without decode).

Random weights make the *positions* arbitrary, but the DTW path is monotone
and the word splitting is deterministic — assertions are structural plus
consistency with the parity-tested find_alignment machinery.
"""

import numpy as np
import pytest

import whisper_tpu
from whisper_tpu.align import align
from whisper_tpu.models.whisper import Whisper

from conftest import JFK

pytestmark = pytest.mark.reference


@pytest.fixture(scope="module")
def model():
    from _reference import TINY_DIMS, convert_to_jax, make_reference_model

    params, dims = convert_to_jax(make_reference_model(TINY_DIMS, seed=0))
    return Whisper(dims, params)


TEXT = "Ask not what your country can do for you."


def test_align_clip(model):
    audio = whisper_tpu.load_audio(JFK)
    duration = audio.shape[0] / 16000
    result = align(model, audio, TEXT)
    assert result["language"] == "en"
    (seg,) = result["segments"]
    assert seg["text"] == TEXT
    words = seg["words"]
    assert "".join(w["word"] for w in words).strip() == TEXT
    for w in words:
        assert 0.0 <= w["start"] <= w["end"] <= 30.0
        assert 0.0 <= w["probability"] <= 1.0
    starts = [w["start"] for w in words]
    assert starts == sorted(starts)  # DTW path is monotone
    assert duration <= 30.0  # precondition of the clip mode


def test_align_segments_batched(model):
    audio = np.tile(whisper_tpu.load_audio(JFK), 4)  # ~44 s
    segs = [
        dict(start=0.0, end=11.0, text="Ask not what your country"),
        dict(start=22.0, end=33.0, text="can do for you."),
    ]
    result = align(model, audio, segments=segs)
    a, b = result["segments"]
    assert a["text"] == segs[0]["text"] and b["text"] == segs[1]["text"]
    for seg in (a, b):
        for w in seg["words"]:
            assert seg["start"] - 1e-6 <= w["start"] <= w["end"] <= seg["end"] + 1e-6
    # batched call matches aligning each segment alone (same device program
    # family as the parity-tested find_alignment)
    solo = align(model, audio, segments=[segs[1]])["segments"][0]
    assert [w["word"] for w in solo["words"]] == [w["word"] for w in b["words"]]
    assert [w["start"] for w in solo["words"]] == [w["start"] for w in b["words"]]


def test_align_argument_errors(model):
    audio = np.zeros(16000, np.float32)
    with pytest.raises(ValueError):
        align(model, audio)  # neither
    with pytest.raises(ValueError):
        align(model, audio, TEXT, segments=[dict(start=0, end=1, text="x")])
    with pytest.raises(ValueError):
        align(model, np.zeros(16000 * 40, np.float32), TEXT)  # >30 s clip
    with pytest.raises(ValueError):
        align(model, audio, segments=[dict(start=0.0, end=5.0, text="x")])  # beyond EOF
    with pytest.raises(ValueError):
        align(
            model,
            np.zeros(16000 * 40, np.float32),
            segments=[dict(start=0.0, end=35.0, text="x")],  # >30 s span
        )


def test_align_empty_text(model):
    audio = whisper_tpu.load_audio(JFK)
    result = align(model, audio, "")
    assert result["segments"][0]["words"] == []
