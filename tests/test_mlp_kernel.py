"""Fused decoder-MLP kernel vs the XLA path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_tpu.models.whisper import _gelu, _linear, layer_norm
from whisper_tpu.ops.kernels.mlp_pallas import mlp_fused_pallas
from whisper_tpu.quantize import quantize_weight


def _xla_mlp(x, g, b, w1, b1, w2, b2):
    h = layer_norm(x, g, b)
    h = _gelu(_linear(h, w1, b1))
    return x + _linear(h, w2, b2)


@pytest.mark.parametrize("B", [1, 8])
@pytest.mark.parametrize("quantized", [False, True])
def test_mlp_fused_matches_xla(B, quantized):
    C = 256
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, C) * 0.5, jnp.float32)
    g = jnp.asarray(1 + rng.randn(C) * 0.1, jnp.float32)
    bb = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.randn(C, 4 * C) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.randn(4 * C) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.randn(4 * C, C) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)

    if quantized:
        w1 = quantize_weight(w1)
        w2 = quantize_weight(w2)

    ref = _xla_mlp(x, g, bb, w1, b1, w2, b2)
    out = mlp_fused_pallas(x, g, bb, w1, b1, w2, b2, bk=256, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_mlp_fused_bk_must_divide():
    x = jnp.zeros((1, 64))
    with pytest.raises(AssertionError):
        mlp_fused_pallas(
            x, jnp.ones(64), jnp.zeros(64),
            jnp.zeros((64, 256)), jnp.zeros(256),
            jnp.zeros((256, 64)), jnp.zeros(64),
            bk=96, interpret=True,
        )
