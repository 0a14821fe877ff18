import pytest

import whisper_tpu
from whisper_tpu.models.whisper import Whisper

from conftest import JFK

pytestmark = pytest.mark.reference


@pytest.fixture(scope="module")
def pair():
    from _reference import TINY_DIMS, convert_to_jax, make_reference_model

    ref_model = make_reference_model(TINY_DIMS, seed=0)
    params, dims = convert_to_jax(ref_model)
    return ref_model, Whisper(dims, params)


BASE_KW = dict(
    language="en", temperature=0.0, verbose=None, fp16=False,
    compression_ratio_threshold=None, logprob_threshold=None,
)


def _compare(ref_result, result):
    assert result["language"] == ref_result["language"]
    assert result["text"] == ref_result["text"]
    assert len(result["segments"]) == len(ref_result["segments"])
    for rs, s in zip(ref_result["segments"], result["segments"]):
        assert rs["tokens"] == s["tokens"]
        assert rs["seek"] == s["seek"]
        assert abs(rs["start"] - s["start"]) < 1e-6
        assert abs(rs["end"] - s["end"]) < 1e-6


@pytest.mark.parametrize(
    "extra",
    [
        dict(),
        dict(initial_prompt="JFK inaugural address"),
        dict(initial_prompt="JFK speech", carry_initial_prompt=True),
        dict(clip_timestamps="2,8"),
        dict(condition_on_previous_text=False),
    ],
    ids=["plain", "initial_prompt", "carry_prompt", "clips", "no_condition"],
)
def test_transcribe_parity(pair, extra):
    ref_model, model = pair
    audio = whisper_tpu.load_audio(JFK)
    _compare(
        ref_model.transcribe(audio.copy(), **BASE_KW, **extra),
        model.transcribe(audio, **BASE_KW, **extra),
    )


def test_writers_roundtrip(tmp_path, pair):
    _, model = pair
    audio = whisper_tpu.load_audio(JFK)
    result = model.transcribe(audio, **BASE_KW)
    from whisper_tpu.utils.writers import get_writer

    get_writer("all", str(tmp_path))(result, JFK)
    for ext in ("txt", "vtt", "srt", "tsv", "json"):
        path = tmp_path / f"jfk.{ext}"
        assert path.exists() and path.stat().st_size > 0
    assert (tmp_path / "jfk.vtt").read_text().startswith("WEBVTT")
    assert (tmp_path / "jfk.tsv").read_text().startswith("start\tend\ttext")
