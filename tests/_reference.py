"""Helpers for comparing against the reference implementation at /root/reference.

The reference needs ``numba`` (absent in this image) only for its DTW kernels,
so a no-op stub is installed before import.  Tests that use these helpers are
skipped automatically when the reference checkout is unavailable.
"""

import sys
import types

REFERENCE_PATH = "/root/reference"


def import_reference():
    """Import the reference `whisper` package, stubbing numba. Returns module."""
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")
        numba.jit = lambda *a, **k: (lambda f: f)
        sys.modules["numba"] = numba
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import whisper as ref_whisper

    return ref_whisper


def make_reference_model(kw: dict, seed: int = 0):
    """Random reference torch model with properly initialized buffers."""
    import torch

    ref_whisper = import_reference()
    torch.manual_seed(seed)
    model = ref_whisper.model.Whisper(ref_whisper.model.ModelDimensions(**kw)).eval()
    with torch.no_grad():
        # reference leaves the decoder positional embedding uninitialized
        # (torch.empty, model.py:214); fill it for deterministic tests
        model.decoder.positional_embedding.normal_(0, 0.05)
    return model


TINY_DIMS = dict(
    n_mels=80,
    n_audio_ctx=1500,
    n_audio_state=64,
    n_audio_head=2,
    n_audio_layer=2,
    n_vocab=51865,
    n_text_ctx=448,
    n_text_state=64,
    n_text_head=2,
    n_text_layer=2,
)


def convert_to_jax(ref_model, dtype=None):
    """Reference torch model -> (params, dims) for whisper_tpu."""
    import jax.numpy as jnp

    from whisper_tpu.models import ModelDimensions
    from whisper_tpu.models.load import convert_torch_state_dict

    dims = ModelDimensions(**ref_model.dims.__dict__)
    params = convert_torch_state_dict(
        ref_model.state_dict(), dims, dtype or jnp.float32
    )
    return params, dims
