"""Edge cases: short/empty audio, tiny sample_len, orbax checkpoints."""

import os
import tempfile

import numpy as np
import pytest

import jax

import whisper_tpu
from whisper_tpu.models.dims import ModelDimensions
from whisper_tpu.models.load import load_orbax, save_orbax
from whisper_tpu.models.whisper import Whisper, init_params

DIMS = ModelDimensions(
    n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=2,
    n_audio_layer=2, n_vocab=51865, n_text_ctx=448, n_text_state=64,
    n_text_head=2, n_text_layer=2,
)


@pytest.fixture(scope="module")
def model():
    return Whisper(DIMS, init_params(DIMS, jax.random.PRNGKey(0)))


def test_transcribe_short_audio(model):
    # 0.5 s of audio: a single partial window
    result = model.transcribe(
        np.zeros(8000, np.float32), language="en", temperature=0.0,
        sample_len=8, verbose=None,
    )
    assert result["language"] == "en"
    assert isinstance(result["text"], str)


def test_transcribe_empty_audio(model):
    result = model.transcribe(
        np.zeros(0, np.float32), language="en", temperature=0.0,
        sample_len=4, verbose=None,
    )
    assert result["segments"] == []
    assert result["text"] == ""


def test_decode_sample_len_one(model):
    mel = np.zeros((80, 3000), np.float32)
    r = model.decode(
        mel, whisper_tpu.DecodingOptions(language="en", temperature=0.0, sample_len=1)
    )
    assert len(r.tokens) <= 1


def test_decode_accepts_precomputed_features(model):
    mel = np.random.RandomState(0).randn(80, 3000).astype(np.float32)
    feats = model.embed_audio(mel[None])
    r1 = model.decode(
        mel, whisper_tpu.DecodingOptions(language="en", temperature=0.0, sample_len=8)
    )
    r2 = model.decode(
        np.asarray(feats)[0],
        whisper_tpu.DecodingOptions(language="en", temperature=0.0, sample_len=8),
    )
    assert r1.tokens == r2.tokens


def test_orbax_roundtrip(model):
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt")
        save_orbax(path, model.params, model.dims)
        params2, dims2 = load_orbax(path)
        assert dims2 == model.dims
        for a, b in zip(jax.tree.leaves(model.params), jax.tree.leaves(params2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
