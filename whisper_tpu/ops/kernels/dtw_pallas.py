"""Pallas TPU kernel: DTW cost/trace by anti-diagonal wavefront.

Single-program port of the algorithm in the reference Triton kernel
(triton_ops.py:13-40): like the Triton version, the cost matrix is first
skewed into diagonal layout (row d holds x[i-1, d-i-1]) so every wavefront
step reads one contiguous VMEM row; the kernel then iterates the N+M
anti-diagonals with full-vector min/select ops, keeping the running cost
diagonals in VMEM scratch and writing the trace in the same diagonal layout.

Output is identical to whisper_tpu.ops.dtw._dtw_trace_device (0=diag, 1=up,
2=left, ties to 2 — reference timing.py:95-100) but without lax.scan's
per-iteration XLA overhead.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 3.0e38  # +inf stand-in that survives addition (python float: kernels
# must not capture traced constants)


def _skew(x: jax.Array, n: int, m: int, n1: int) -> jax.Array:
    """(..., n, m) -> (..., n+m+1, n1) diagonals: skew[d, i] = x[i-1, d-i-1]."""
    d = jnp.arange(n + m + 1)[:, None]
    i = jnp.arange(n1)[None, :]
    row = i - 1
    col = d - i - 1
    valid = (row >= 0) & (row < n) & (col >= 0) & (col < m)
    flat = jnp.clip(row * m + col, 0, n * m - 1)
    gathered = x.reshape(*x.shape[:-2], -1)[..., flat]
    return jnp.where(valid, gathered, BIG).astype(jnp.float32)


def _dtw_kernel(xs_ref, trace_ref, prev2_ref, prev_ref, *, n: int, m: int):
    """Refs are (1, n+m+1, n1) blocks — one batch row per grid program."""
    n1 = trace_ref.shape[2]
    # all values kept (1, n1)-shaped: TPU vector ops want >=2-D lanes layout
    i_idx = jax.lax.broadcasted_iota(jnp.int32, (1, n1), 1)

    prev2_ref[...] = jnp.where(i_idx == 0, 0.0, BIG)  # diagonal d=0
    prev_ref[...] = jnp.full((1, n1), BIG)  # diagonal d=1
    zeros_row = jnp.zeros((1, n1), jnp.int32)
    trace_ref[0, pl.ds(0, 1), :] = zeros_row
    trace_ref[0, pl.ds(1, 1), :] = zeros_row

    def step(d, carry):
        prev2 = prev2_ref[...]
        prev = prev_ref[...]
        j = d - i_idx
        valid = (i_idx >= 1) & (j >= 1) & (j <= m)

        # rolled wrap lands at i=0 which is always invalid
        c0 = pltpu.roll(prev2, 1, 1)  # cost[i-1, j-1]
        c1 = pltpu.roll(prev, 1, 1)  # cost[i-1, j]
        c2 = prev  # cost[i, j-1]

        t = jnp.where(
            (c0 < c1) & (c0 < c2),
            0,
            jnp.where((c1 < c0) & (c1 < c2), 1, 2),
        ).astype(jnp.int32)
        # propagate the chosen branch's cost (reference timing.py:95-100
        # takes c2 in the else branch even when c0==c1<c2)
        c = jnp.where(t == 0, c0, jnp.where(t == 1, c1, c2))
        new = jnp.where(valid, xs_ref[0, pl.ds(d, 1), :] + c, BIG)

        prev2_ref[...] = prev
        prev_ref[...] = new
        trace_ref[0, pl.ds(d, 1), :] = t
        return carry

    jax.lax.fori_loop(2, n + m + 1, step, 0)


@functools.partial(jax.jit, static_argnames=("n", "m"))
def dtw_trace_pallas(x: jax.Array, n: int, m: int) -> jax.Array:
    """Trace diagonals for cost matrix x.

    x: (n, m) -> (n+m+1, n+1) int32, or batched (B, n, m) -> (B, n+m+1, n+1)
    with one grid program per batch row.
    """

    def round_up(a, k):
        return (a + k - 1) // k * k

    n1 = round_up(n + 1, 128)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    b = x.shape[0]
    xs = _skew(x, n, m, n1)  # (B, n+m+1, n1)
    d1 = n + m + 1
    out = pl.pallas_call(
        functools.partial(_dtw_kernel, n=n, m=m),
        out_shape=jax.ShapeDtypeStruct((b, d1, n1), jnp.int32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, d1, n1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, d1, n1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((1, n1), jnp.float32),
            pltpu.VMEM((1, n1), jnp.float32),
        ],
    )(xs)
    out = out[:, :, : n + 1]
    return out[0] if squeeze else out
