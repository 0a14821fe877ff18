"""Pallas TPU kernel: median filter via a fixed-width sorting network.

Replaces the reference's source-templated Triton bubblesort kernel
(triton_ops.py:43-117).  For the widths the timing pipeline uses
(3/5/7/13) an odd-even transposition network over w shifted copies of the
row computes the median entirely in registers/VMEM, one pass over memory.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_BLOCK = 8


def _median_kernel(x_ref, o_ref, *, width: int, t: int):
    """x_ref: (ROW_BLOCK, t + width - 1) reflect-padded rows."""
    pad = width // 2
    x = x_ref[...]
    # w shifted views of each row -> the sliding windows, then an odd-even
    # transposition sort across the window dimension (exact for any input)
    lanes = [x[:, k : k + t] for k in range(width)]
    for rnd in range(width):
        start = rnd % 2
        for i in range(start, width - 1, 2):
            lo = jnp.minimum(lanes[i], lanes[i + 1])
            hi = jnp.maximum(lanes[i], lanes[i + 1])
            lanes[i], lanes[i + 1] = lo, hi
    o_ref[...] = lanes[pad]


@functools.partial(jax.jit, static_argnames=("width",))
def median_filter_pallas(x: jax.Array, width: int) -> jax.Array:
    """Median along the last axis with reflect padding; x: (..., T)."""
    pad = width // 2
    orig_shape = x.shape
    t = orig_shape[-1]
    rows = 1
    for s in orig_shape[:-1]:
        rows *= s
    xf = x.reshape(rows, t)
    xf = jnp.pad(xf, [(0, 0), (pad, pad)], mode="reflect")

    def round_up(a, m):
        return (a + m - 1) // m * m

    rows_pad = round_up(max(rows, 1), ROW_BLOCK)
    if rows_pad != rows:
        xf = jnp.pad(xf, [(0, rows_pad - rows), (0, 0)])

    out = pl.pallas_call(
        functools.partial(_median_kernel, width=width, t=t),
        out_shape=jax.ShapeDtypeStruct((rows_pad, t), x.dtype),
        grid=(rows_pad // ROW_BLOCK,),
        in_specs=[
            pl.BlockSpec((ROW_BLOCK, t + 2 * pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((ROW_BLOCK, t), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(xf)
    return out[:rows].reshape(orig_shape)
