import subprocess
import sys

import numpy as np
import pytest

import whisper_tpu
from whisper_tpu.models.dims import ModelDimensions
from whisper_tpu.models.load import load_npz, save_npz
from whisper_tpu.models.whisper import Whisper, init_params

DIMS = ModelDimensions(
    n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=2,
    n_audio_layer=2, n_vocab=51865, n_text_ctx=448, n_text_state=64,
    n_text_head=2, n_text_layer=2,
)


def test_available_models():
    names = whisper_tpu.available_models()
    assert "tiny.en" in names and "large-v3" in names and "turbo" in names
    assert len(names) == 14


def test_npz_roundtrip(tmp_path):
    import jax

    params = init_params(DIMS, jax.random.PRNGKey(0))
    path = str(tmp_path / "model.npz")
    save_npz(path, params, DIMS)
    params2, dims2 = load_npz(path)
    assert dims2 == DIMS
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_model_from_npz_path(tmp_path):
    import jax

    params = init_params(DIMS, jax.random.PRNGKey(0))
    path = str(tmp_path / "model.npz")
    save_npz(path, params, DIMS)
    model = whisper_tpu.load_model(path, device="cpu")
    assert isinstance(model, Whisper)
    assert model.dims == DIMS
    result = model.transcribe(
        np.zeros(16000, np.float32), language="en", temperature=0.0,
        sample_len=4, verbose=None,
    )
    assert set(result) == {"text", "segments", "language"}


@pytest.mark.reference
def test_load_model_from_torch_pt(tmp_path):
    """Official .pt checkpoint format loads and converts."""
    import torch

    from _reference import make_reference_model, TINY_DIMS

    ref_model = make_reference_model(TINY_DIMS)
    path = str(tmp_path / "tiny_random.pt")
    torch.save(
        {"dims": dict(TINY_DIMS), "model_state_dict": ref_model.state_dict()}, path
    )
    model = whisper_tpu.load_model(path, device="cpu")
    assert model.dims.n_vocab == TINY_DIMS["n_vocab"]
    assert model.is_multilingual


def test_unknown_model_name():
    with pytest.raises(RuntimeError, match="not found"):
        whisper_tpu.load_model("nonexistent-model-name")


def test_cli_help():
    out = subprocess.run(
        [sys.executable, "-m", "whisper_tpu", "--help"],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0
    assert "--word_timestamps" in out.stdout
    assert "--beam_size" in out.stdout
