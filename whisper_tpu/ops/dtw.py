"""Dynamic time warping for word-level alignment.

Algorithm parity: reference ``whisper/timing.py:82-105`` (dtw_cpu) and the
Triton anti-diagonal wavefront (``triton_ops.py:13-40``).  The TPU-native
form runs the wavefront as a ``lax.scan`` over anti-diagonals — the cost
recurrence is a length-N vector min per diagonal, which XLA vectorizes on the
VPU — and returns the trace matrix.  The inherently sequential backtrace
(reference ``timing.py:57-79``, numba) runs on the host in C++
(whisper_tpu/native/dtw.cpp) with a NumPy fallback.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..native import load_native

INF = jnp.float32(jnp.inf)


@partial(jax.jit, static_argnames=("n", "m"))
def _dtw_trace_device(x: jax.Array, n: int, m: int) -> jax.Array:
    """Compute the DTW trace matrix by anti-diagonal wavefront.

    x: (n, m) cost matrix.  Returns trace diagonals (n+m+1, n+1) int8 where
    diagonal d, slot i corresponds to trace[i, d-i]; 0=diag, 1=up, 2=left
    with the reference's exact tie-breaking (ties fall to 2/"left",
    timing.py:95-100).
    """
    x = x.astype(jnp.float32)
    i_idx = jnp.arange(n + 1)

    # diagonals of cost: index by row i, j = d - i
    diag0 = jnp.full((n + 1,), INF).at[0].set(0.0)  # d = 0: cost[0,0] = 0
    diag1 = jnp.full((n + 1,), INF)  # d = 1: cost[0,1] = cost[1,0] = inf

    x_flat = x.reshape(-1)

    def body(carry, d):
        prev2, prev = carry
        j = d - i_idx
        valid = (i_idx >= 1) & (j >= 1) & (j <= m)

        c0 = jnp.concatenate([jnp.full((1,), INF), prev2[:-1]])  # cost[i-1, j-1]
        c1 = jnp.concatenate([jnp.full((1,), INF), prev[:-1]])  # cost[i-1, j]
        c2 = prev  # cost[i, j-1]

        t = jnp.where(
            (c0 < c1) & (c0 < c2),
            0,
            jnp.where((c1 < c0) & (c1 < c2), 1, 2),
        ).astype(jnp.int8)
        # propagate the cost of the *chosen* branch, not min(c0,c1,c2): the
        # reference's else-branch takes c2 even when c0==c1<c2
        # (timing.py:95-100), and downstream costs must see that same value
        c = jnp.where(t == 0, c0, jnp.where(t == 1, c1, c2))

        flat = jnp.clip((i_idx - 1) * m + (j - 1), 0, n * m - 1)
        xval = x_flat[flat]
        new = jnp.where(valid, xval + c, INF)
        return (prev, new), t

    ds = jnp.arange(2, n + m + 1)
    _, traces = jax.lax.scan(body, (diag0, diag1), ds)
    # prepend two dummy diagonals so traces[d] corresponds to diagonal d
    return jnp.concatenate([jnp.zeros((2, n + 1), jnp.int8), traces], axis=0)


def dtw_trace(x: jax.Array, n: int, m: int) -> jax.Array:
    """Trace diagonals for cost matrix x ((n, m) or batched (B, n, m)):
    Pallas wavefront kernel on TPU, lax.scan elsewhere (identical output).
    Under a device mesh the lax.scan path is used (Pallas kernels can't be
    auto-partitioned; identical output either way)."""
    from .attention import ambient_mesh
    from .kernels.attention_pallas import pallas_available

    if pallas_available() and ambient_mesh() is None:
        from .kernels.dtw_pallas import dtw_trace_pallas

        return dtw_trace_pallas(x, n, m)
    if x.ndim == 3:
        return jax.vmap(lambda xr: _dtw_trace_device(xr, n, m))(x)
    return _dtw_trace_device(x, n, m)


def _unskew_trace(diags: np.ndarray, n: int, m: int) -> np.ndarray:
    """(n+m+1, n+1) diagonal layout -> (n+1, m+1) trace matrix."""
    i = np.arange(n + 1)[:, None]
    j = np.arange(m + 1)[None, :]
    return diags[(i + j).clip(0, n + m), np.broadcast_to(i, (n + 1, m + 1))]


def backtrace(trace: np.ndarray) -> np.ndarray:
    """Walk the trace matrix back from (N, M); parity with timing.py:57-79."""
    trace = np.ascontiguousarray(trace, dtype=np.int32)
    n1, m1 = trace.shape
    lib = load_native()
    if lib is not None:
        import ctypes

        out_i = np.empty(n1 + m1, dtype=np.int32)
        out_j = np.empty(n1 + m1, dtype=np.int32)
        count = lib.dtw_backtrace(
            trace.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n1,
            m1,
            out_i.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_j.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if count >= 0:
            return np.stack([out_i[:count], out_j[:count]])

    # NumPy fallback (same walk)
    i, j = n1 - 1, m1 - 1
    trace[0, :] = 2
    trace[:, 0] = 1
    result = []
    while i > 0 or j > 0:
        result.append((i - 1, j - 1))
        t = trace[i, j]
        if t == 0:
            i -= 1
            j -= 1
        elif t == 1:
            i -= 1
        elif t == 2:
            j -= 1
        else:
            raise ValueError("Unexpected trace[i, j]")
    return np.array(result)[::-1, :].T


def dtw(x) -> np.ndarray:
    """Minimum-cost monotone alignment path through cost matrix x (N, M).

    Returns (2, path_len) int arrays of (text_indices, time_indices), exactly
    as reference ``timing.py:141-151``.
    """
    x = jnp.asarray(x)
    n, m = x.shape
    diags = np.asarray(dtw_trace(x, n, m))
    trace = _unskew_trace(diags, n, m)
    return backtrace(trace)


def dtw_numpy(x: np.ndarray) -> np.ndarray:
    """Pure NumPy row-scan DTW (test oracle; mirrors dtw_cpu timing.py:82-105)."""
    N, M = x.shape
    cost = np.full((N + 1, M + 1), np.inf, dtype=np.float64)
    trace = -np.ones((N + 1, M + 1), dtype=np.int32)
    cost[0, 0] = 0
    x = x.astype(np.float64)
    for i in range(1, N + 1):
        c0 = cost[i - 1, :-1]  # cost[i-1, j-1]
        c1 = cost[i - 1, 1:]  # cost[i-1, j]
        # cost[i, j-1] depends on this row; sequential over j
        row = cost[i]
        trow = trace[i]
        for j in range(1, M + 1):
            a, b, c = c0[j - 1], c1[j - 1], row[j - 1]
            if a < b and a < c:
                v, t = a, 0
            elif b < a and b < c:
                v, t = b, 1
            else:
                v, t = c, 2
            row[j] = x[i - 1, j - 1] + v
            trow[j] = t
    return backtrace(trace)
