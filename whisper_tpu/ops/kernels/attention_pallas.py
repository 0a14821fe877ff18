"""Pallas TPU kernel for encoder self-attention.

Replaces torch SDPA (reference whisper/model.py:16-22,123-127) on the
encoder's 1500-token context.  Whisper's head dim is 64 and the context is
fixed, so the whole K/V for one (batch, head) plus a 128-row query block and
its f32 score block fit comfortably in VMEM (~2 MB); the kernel therefore
blocks over queries only and computes an exact (not online) softmax per
block — fewer passes than flash attention with the same memory profile.

Numerics match whisper_tpu.ops.attention.qkv_attention to bf16 rounding:
q and k are each scaled by d^-0.25, scores / max / partition sum are
float32; the exp weights round to the compute dtype before the PV matmul
(as in the XLA path) and normalization is deferred past PV (see
_attn_kernel).  A two-heads-packed 128-lane score matmul was considered
and rejected analytically: block-diagonal K/V packing reclaims the MXU's
64-deep contraction waste but spends it again multiplying the zero
blocks — ceil(K/128) charges one full pass either way, so the packed
matmul costs exactly the same MXU cycles as two 64-deep ones.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Q_BLOCK = 128


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, t_valid: int):
    q = q_ref[0].astype(jnp.float32) * scale  # (Q_BLOCK, D)
    k = k_ref[0].astype(jnp.float32) * scale  # (T, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Q_BLOCK, T)

    if t_valid < k.shape[0]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < t_valid, s, -jnp.inf)

    # deferred-normalization softmax: the unnormalized exp weights go
    # straight to the PV matmul in the compute dtype and the division by
    # the partition sum happens on the (q_block, D) output instead of the
    # (q_block, T) score block — T/D ≈ 23× fewer divides, measured −6% on
    # the kernel at large-v3 b16 shapes.  The denominator is summed in f32
    # from the SAME rounded weights that feed PV, so normalization is
    # consistent; only the rounding point moves (exp rounds to bf16 before
    # the divide instead of after), which stays within bf16 tolerance.
    v = v_ref[0]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m).astype(v.dtype)
    denom = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("q_block",))
def attention_pallas(
    q: jax.Array, k: jax.Array, v: jax.Array, *, q_block: int = Q_BLOCK
) -> jax.Array:
    """Non-causal multi-head attention: (B, H, T, D) -> (B, H, T, D).

    T need not divide q_block: the grid's last query block is partially
    out-of-range and Pallas masks its stores (no HBM pad/slice round-trip —
    at 1500-token encoder context the pad+slice copies cost ~1.8 ms/layer
    at batch 16, measured).  Out-of-range *query* rows produce garbage that
    is never stored; out-of-range key columns don't exist (K/V blocks carry
    the exact T).
    """
    b, h, t, d = q.shape
    scale = float(d) ** -0.25
    bh = b * h
    qf = q.reshape(bh, t, d)
    kf = k.reshape(bh, t, d)
    vf = v.reshape(bh, t, d)

    grid = (bh, (t + q_block - 1) // q_block)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, t_valid=t),
        out_shape=jax.ShapeDtypeStruct((bh, t, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_block, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_block, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * t * t * d,
            bytes_accessed=bh * t * d * 4 * q.dtype.itemsize,
            transcendentals=bh * t * t,
        ),
    )(qf, kf, vf)

    return out.reshape(b, h, t, d)


def pallas_available() -> bool:
    """True when running on a real TPU backend (kernels need Mosaic)."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False
