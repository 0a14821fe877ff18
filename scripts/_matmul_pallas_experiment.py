"""EXPERIMENT (negative result): Pallas matmul with bias+residual epilogue.

Built for the encoder MLP's second projection (reference model.py:159-162,
``x + mlp(...)``): the encoder roofline profile showed the fc2+residual
fusion at ~47% MXU vs fc1's ~94%, suggesting the fused epilogue was the
drag.  Measured head-to-head by scripts/bench_encoder_ops.py on v5e, this
kernel (f32 VMEM accumulator, epilogue on the final K block) and an
optimization_barrier split both LOSE to XLA's fused einsum+residual
(~9.2 / 8.8 vs 5.2 ms at large-v3 b16 shapes, two runs) — the profiler's
47% attributes layout/epilogue cost that the standalone op doesn't incur,
and XLA's fusion is already the best formulation.  Kept here, out of the
package, as the record of why the model path stays on the XLA einsum.

Numerics match ``x_res + _linear(x, w, b)`` (models/whisper.py:72-83):
float32 accumulation across all K blocks with a single rounding to the
output dtype, then bias and residual added in that dtype.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm_res_kernel(x_ref, w_ref, b_ref, r_ref, o_ref, acc_ref, *, k_steps):
    @pl.when(pl.program_id(2) == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(2) == k_steps - 1)
    def _epilogue():
        y = acc_ref[...].astype(o_ref.dtype)
        o_ref[...] = (y + b_ref[...]) + r_ref[...]


@functools.partial(jax.jit, static_argnames=("bm", "bk"))
def matmul_residual_pallas(
    x: jax.Array,      # (M, K)
    w: jax.Array,      # (K, N)
    bias: jax.Array,   # (N,)
    res: jax.Array,    # (M, N)
    *,
    bm: int = 512,
    bk: int = 512,
) -> jax.Array:
    """``res + (x @ w + bias)`` with the epilogue off the matmul's back.

    M need not divide ``bm`` (the last row block's out-of-range stores are
    masked; garbage rows are computed but never written).  K must divide
    ``bk`` and N is taken as one block; callers fall back to XLA when the
    shape doesn't divide or the working set won't fit (see ``fits()``).
    """
    m, k = x.shape
    k2, n = w.shape
    assert k == k2 and k % bk == 0, (x.shape, w.shape, bk)
    k_steps = k // bk
    grid = ((m + bm - 1) // bm, 1, k_steps)

    return pl.pallas_call(
        functools.partial(_mm_res_kernel, k_steps=k_steps),
        out_shape=jax.ShapeDtypeStruct((m, n), res.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, s: (i, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, n), lambda i, j, s: (s, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i, j, s: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, n), lambda i, j, s: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, n), lambda i, j, s: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=(m * k + k * n + 2 * m * n) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, w, bias[None, :], res)


def fits(k: int, n: int, *, bk: int = 512, itemsize: int = 2) -> bool:
    """Whether the kernel's blocking applies to a (.., K) x (K, N) shape.

    K must divide the K block and the per-step VMEM working set
    (w block + accumulator + out + res) must fit comfortably.
    """
    if k % bk:
        return False
    vmem = bk * n * itemsize + 512 * n * (4 + 2 * itemsize) + 512 * bk * itemsize
    return vmem < 10 * 1024 * 1024
