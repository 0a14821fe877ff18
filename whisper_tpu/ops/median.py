"""Median filtering along the trailing axis.

Parity target: reference ``whisper/timing.py:19-54`` (reflect padding, width
3/5/7/13) and the Triton bubblesort kernel (``triton_ops.py:43-117``).  The
XLA form below — reflect-pad, strided window gather, ``jnp.sort``, middle
element — fuses cleanly; a Pallas sorting-network kernel is provided in
:mod:`whisper_tpu.ops.kernels.median_pallas` for the TPU hot path.
"""

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("filter_width",))
def _median_filter_xla(x: jax.Array, filter_width: int) -> jax.Array:
    pad = filter_width // 2
    padded = jnp.pad(
        x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect"
    )
    # windows: (..., T, filter_width)
    idx = jnp.arange(x.shape[-1])[:, None] + jnp.arange(filter_width)[None, :]
    windows = padded[..., idx]
    return jnp.sort(windows, axis=-1)[..., pad]


def median_filter(x, filter_width: int):
    """Apply a median filter of odd width along the last dimension of x."""
    x = jnp.asarray(x)
    if x.shape[-1] <= filter_width // 2:
        return x
    assert (
        filter_width > 0 and filter_width % 2 == 1
    ), "`filter_width` should be an odd number"
    from .attention import ambient_mesh
    from .kernels.attention_pallas import pallas_available

    # Pallas kernels can't be auto-partitioned: under a mesh, use the XLA
    # path (GSPMD shards it freely); this op is far off the hot path
    if pallas_available() and filter_width <= 13 and ambient_mesh() is None:
        from .kernels.median_pallas import median_filter_pallas

        return median_filter_pallas(x, filter_width)
    return _median_filter_xla(x, filter_width)
