import numpy as np
import pytest
import scipy.ndimage

from whisper_tpu.ops.dtw import dtw, dtw_numpy
from whisper_tpu.ops.median import median_filter


@pytest.mark.parametrize("N, M", [(10, 20), (32, 16), (30, 30), (60, 200)])
def test_dtw(N: int, M: int):
    # mirrors reference tests/test_timing.py:23-52: a random monotone path
    # carved into the cost matrix must be recovered exactly
    rng = np.random.RandomState(42)
    steps = np.concatenate([np.zeros(N - 1), np.ones(M - 1)])
    rng.shuffle(steps)
    x = rng.random((N, M)).astype(np.float32)

    i, j, k = 0, 0, 0
    interpolated_path = [(i, j)]
    for step in steps:
        x[i, j] -= 1
        if step == 0:
            i += 1
        else:
            j += 1
        interpolated_path.append((i, j))
    x[N - 1, M - 1] -= 1

    trace = dtw(x)
    path = list(zip(*trace.tolist()))
    assert path == interpolated_path


@pytest.mark.parametrize("N, M", [(10, 20), (32, 16), (60, 200)])
def test_dtw_device_matches_numpy(N: int, M: int):
    rng = np.random.RandomState(0)
    x = rng.randn(N, M).astype(np.float32)
    np.testing.assert_array_equal(dtw(x), dtw_numpy(x))


@pytest.mark.parametrize("shape", [(10,), (1, 15), (4, 5, 345), (6, 12, 240)])
@pytest.mark.parametrize("width", [3, 5, 7, 13])
def test_median_filter(shape, width):
    # mirrors reference tests/test_timing.py:66-84: equivalence with scipy on
    # reflect-padded input
    rng = np.random.RandomState(42)
    x = rng.randn(*shape).astype(np.float32)

    result = np.asarray(median_filter(x, width))

    pad_width = width // 2
    if x.shape[-1] <= pad_width:
        assert np.array_equal(result, x)
        return
    padded = np.pad(
        x, [(0, 0)] * (x.ndim - 1) + [(pad_width, pad_width)], mode="reflect"
    )
    size = [1] * (x.ndim - 1) + [width]
    expected = scipy.ndimage.median_filter(padded, size=size, mode="constant")
    expected = expected[..., pad_width:-pad_width]
    np.testing.assert_allclose(result, expected, atol=1e-6)


@pytest.mark.reference
def test_word_timestamps_parity():
    """End-to-end word timing must match the reference exactly."""
    import whisper_tpu
    from whisper_tpu.models.whisper import Whisper

    from _reference import TINY_DIMS, convert_to_jax, make_reference_model
    from conftest import JFK

    ref_model = make_reference_model(TINY_DIMS, seed=0)
    params, dims = convert_to_jax(ref_model)
    model = Whisper(dims, params)

    audio = whisper_tpu.load_audio(JFK)
    kw = dict(
        language="en", temperature=0.0, verbose=None, fp16=False,
        compression_ratio_threshold=None, logprob_threshold=None,
        word_timestamps=True,
    )
    ref_result = ref_model.transcribe(audio.copy(), **kw)
    result = model.transcribe(audio, **kw)

    assert result["text"] == ref_result["text"]
    ref_words = [w for s in ref_result["segments"] for w in s["words"]]
    our_words = [w for s in result["segments"] for w in s["words"]]
    assert len(ref_words) == len(our_words)
    for a, b in zip(ref_words, our_words):
        assert a["word"] == b["word"]
        assert a["start"] == b["start"]
        assert a["end"] == b["end"]
        assert abs(a["probability"] - b["probability"]) < 1e-6
