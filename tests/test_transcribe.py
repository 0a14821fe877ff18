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


def _count_decodes(model):
    """Wrap model.decode (instance attribute shadows the class method) to
    count ladder rungs; both implementations call model.decode once per
    attempted temperature."""
    counts = {"n": 0}
    orig = model.decode

    def wrapped(*args, **kwargs):
        counts["n"] += 1
        return orig(*args, **kwargs)

    model.decode = wrapped
    return counts


def test_temperature_ladder_parity(pair):
    """Segment-exact parity THROUGH the fallback ladder (reference
    transcribe.py:184-224 vs whisper_tpu/transcribe.py decode_with_fallback).

    logprob_threshold=10.0 is unsatisfiable (avg_logprob <= 0), so every
    window fails its first decode and walks the ladder; temperature
    (0.0, 0.0) keeps the retry deterministic, so the ladder semantics
    (exhausted -> return the LAST result) must produce identical segments.
    Decode-call counters on both sides prove >= 2 temperatures ran.
    """
    ref_model, model = pair
    audio = whisper_tpu.load_audio(JFK)
    kw = dict(
        language="en", temperature=(0.0, 0.0), verbose=None, fp16=False,
        logprob_threshold=10.0, compression_ratio_threshold=None,
        no_speech_threshold=None, condition_on_previous_text=False,
    )
    ref_counts = _count_decodes(ref_model)
    jx_counts = _count_decodes(model)
    try:
        ref_result = ref_model.transcribe(audio.copy(), **kw)
        result = model.transcribe(audio, **kw)
    finally:
        del ref_model.decode, model.decode  # unwrap the instance shadows
    n_windows = len({s["seek"] for s in ref_result["segments"]}) or 1
    assert ref_counts["n"] >= 2 * n_windows  # the reference walked the ladder
    assert jx_counts["n"] >= 2 * n_windows  # and so did we
    _compare(ref_result, result)


def test_temperature_ladder_decision_parity_sampled(pair):
    """At a sampled retry temperature tokens can't match across RNGs, but
    the ladder DECISION must: with an unsatisfiable compression-ratio gate
    (any ratio > 0.0 fails) and ladder (0.0, 0.5), both implementations
    must land every segment on temperature 0.5."""
    ref_model, model = pair
    audio = whisper_tpu.load_audio(JFK)
    kw = dict(
        language="en", temperature=(0.0, 0.5), verbose=None, fp16=False,
        compression_ratio_threshold=0.0, logprob_threshold=None,
        no_speech_threshold=None, condition_on_previous_text=False,
    )
    ref_result = ref_model.transcribe(audio.copy(), **kw)
    result = model.transcribe(audio, **kw)
    assert ref_result["segments"] and result["segments"]
    assert all(s["temperature"] == 0.5 for s in ref_result["segments"])
    assert all(s["temperature"] == 0.5 for s in result["segments"])
