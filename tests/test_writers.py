"""Writer-output parity: identical result dicts must serialize identically."""

import pytest

from whisper_tpu.utils.writers import get_writer

RESULT = {
    "text": " Hello world. This is a test of subtitles.",
    "language": "en",
    "segments": [
        {
            "id": 0, "seek": 0, "start": 0.0, "end": 2.5,
            "text": " Hello world.",
            "tokens": [], "temperature": 0.0, "avg_logprob": -0.2,
            "compression_ratio": 1.0, "no_speech_prob": 0.01,
            "words": [
                {"word": " Hello", "start": 0.0, "end": 0.8, "probability": 0.9},
                {"word": " world.", "start": 0.9, "end": 1.4, "probability": 0.85},
            ],
        },
        {
            "id": 1, "seek": 0, "start": 2.5, "end": 7.1,
            "text": " This is a test of subtitles.",
            "tokens": [], "temperature": 0.0, "avg_logprob": -0.3,
            "compression_ratio": 1.1, "no_speech_prob": 0.02,
            "words": [
                {"word": " This", "start": 2.5, "end": 2.9, "probability": 0.95},
                {"word": " is", "start": 3.0, "end": 3.1, "probability": 0.9},
                {"word": " a", "start": 3.2, "end": 3.25, "probability": 0.9},
                {"word": " test", "start": 3.3, "end": 3.9, "probability": 0.92},
                {"word": " of", "start": 4.0, "end": 4.2, "probability": 0.9},
                {"word": " subtitles.", "start": 6.5, "end": 7.1, "probability": 0.88},
            ],
        },
    ],
}

WRITER_KWARGS = [
    {},
    {"highlight_words": True},
    {"max_line_width": 12, "max_line_count": 2},
    {"max_words_per_line": 2},
    {"max_line_width": 10, "max_line_count": 1, "highlight_words": True},
]


@pytest.mark.reference
@pytest.mark.parametrize("fmt", ["srt", "vtt", "txt", "tsv", "json"])
@pytest.mark.parametrize("kwargs", WRITER_KWARGS, ids=[str(k) for k in WRITER_KWARGS])
def test_writer_parity(tmp_path, fmt, kwargs):
    import copy
    import sys

    sys.path.insert(0, "/root/reference")
    from _reference import import_reference

    import_reference()
    from whisper.utils import get_writer as ref_get_writer

    ours_dir = tmp_path / "ours"
    ref_dir = tmp_path / "ref"
    ours_dir.mkdir()
    ref_dir.mkdir()

    get_writer(fmt, str(ours_dir))(copy.deepcopy(RESULT), "audio.wav", **kwargs)
    ref_get_writer(fmt, str(ref_dir))(copy.deepcopy(RESULT), "audio.wav", **kwargs)

    ours = (ours_dir / f"audio.{fmt}").read_text()
    ref = (ref_dir / f"audio.{fmt}").read_text()
    assert ours == ref


def test_writer_without_words(tmp_path):
    result = {
        "text": "plain", "language": "en",
        "segments": [
            {"id": 0, "seek": 0, "start": 0.0, "end": 1.0, "text": " plain",
             "tokens": [], "temperature": 0.0, "avg_logprob": -0.2,
             "compression_ratio": 1.0, "no_speech_prob": 0.01},
        ],
    }
    get_writer("srt", str(tmp_path))(result, "x.wav")
    assert "plain" in (tmp_path / "x.srt").read_text()
