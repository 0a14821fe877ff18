"""Pallas TPU kernel: fused decoder-MLP matvec for the autoregressive step.

At decode batch sizes (B <= ~32, one token per row) the MLP is two matvecs
whose cost is streaming the weights: fc1 (C x 4C) and fc2 (4C x C), ~26 MB
bf16 / ~13 MB int8 per layer at large-v3 — over half the per-layer weight
bytes of a decode step.  Under XLA this runs as separate LN / fc1+gelu /
fc2+residual fusions with per-op launch gaps between them (profiled ~9 us
of gap per layer-scan iteration at b1, scripts/profile_engine.py); this
kernel computes

    out = x + fc2(gelu(fc1(layer_norm(x))))

in ONE kernel that streams each weight matrix exactly once: the grid walks
4C in blocks, computing h_j = gelu(ln_x @ W1[:, j]) and accumulating
h_j @ W2[j, :] into a float32 VMEM accumulator, with bias/residual applied
when the last block retires.  Weights may be int8 with per-output-channel
scales (whisper_tpu.quantize) — dequantized on the fly in VMEM, so the HBM
stream stays int8.

STATUS — measured, not yet a win (scripts/bench_mlp_step.py, large-v3 b1
decode shapes, v5e): 55.0-55.2 us/layer bf16 / 38.1-39.2 int8 vs XLA's
48.2-49.2 / 31.2-31.4 (bk 512 and 1024).  XLA pipelines weight prefetch
across the layer-*scan* while this kernel only double-buffers within one
call, and that wins despite the launch gaps.  The engine therefore keeps
the XLA MLP; the kernel + its equivalence tests stay as the starting point
for whole-layer fusion (where the cross-call pipelining argument flips).

Numerics: LayerNorm in f32 (models/whisper.layer_norm), matmul accumulation
in f32 with one rounding to the compute dtype per matmul (matching XLA's
einsum), exact-form GELU in f32 with a 1.5e-7-accurate erf (see _erf).
Equivalence is asserted against the XLA path in tests/test_mlp_kernel.py;
the decode engine keeps the XLA path on CPU and whenever the kernel's
blocking doesn't fit.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """float32 erf via Abramowitz & Stegun 7.1.26 (|abs error| <= 1.5e-7).

    Pallas TPU has no lowering for the erf/erfc primitives that exact GELU
    needs (only exp/tanh); this rational-polynomial form uses exp only.
    The 1.5e-7 absolute error is ~4 decimal orders below bf16 resolution,
    so after the kernel's bf16 rounding the result is bit-identical to
    XLA's erf except for values within 1e-7 of a rounding boundary.
    """
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.where(x >= 0, 1.0, -1.0).astype(x.dtype)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_erf(x):
    """Exact-form GELU x/2*(1+erf(x/sqrt2)) on float32 (see _erf)."""
    return x * 0.5 * (1.0 + _erf(x * 0.7071067811865476))


def _mlp_kernel(
    x_ref,      # (B, C) input activations (VMEM, whole)
    g_ref,      # (1, C) LN gain
    b_ref,      # (1, C) LN bias
    w1_ref,     # (C, bk) fc1 weight block (bf16 or int8)
    s1_ref,     # (1, bk) fc1 scales (f32; ones when not quantized)
    b1_ref,     # (1, bk) fc1 bias
    w2_ref,     # (bk, C) fc2 weight block
    s2_ref,     # (1, C) fc2 scales
    b2_ref,     # (1, C) fc2 bias
    o_ref,      # (B, C) output
    ln_ref,     # scratch (B, C) f32 — layer-normed x, computed on block 0
    acc_ref,    # scratch (B, C) f32 — fc2 accumulator
    *,
    k_steps: int,
    quantized: bool,
):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _prologue():
        x = x_ref[...].astype(jnp.float32)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
        ln = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        ln_ref[...] = ln * g_ref[...].astype(jnp.float32) + b_ref[...].astype(
            jnp.float32
        )
        acc_ref[...] = jnp.zeros_like(acc_ref)

    dtype = x_ref.dtype
    ln = ln_ref[...].astype(dtype)
    w1 = w1_ref[...]
    if quantized:
        w1 = w1.astype(dtype)
    h = jax.lax.dot_general(
        ln, w1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (B, bk) f32
    if quantized:
        h = h * s1_ref[...]
    # one rounding to the compute dtype per matmul, like XLA's einsum
    h = h.astype(dtype) + b1_ref[...]
    h = _gelu_erf(h.astype(jnp.float32)).astype(dtype)

    w2 = w2_ref[...]
    if quantized:
        w2 = w2.astype(dtype)
    acc_ref[...] += jax.lax.dot_general(
        h, w2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(j == k_steps - 1)
    def _epilogue():
        y = acc_ref[...]
        if quantized:
            y = y * s2_ref[...]
        y = y.astype(dtype) + b2_ref[...]
        o_ref[...] = x_ref[...] + y


@functools.partial(jax.jit, static_argnames=("bk", "interpret"))
def mlp_fused_pallas(
    x: jax.Array,          # (B, C)
    ln_g: jax.Array,       # (C,)
    ln_b: jax.Array,       # (C,)
    w1, b1, w2, b2,        # weights: arrays or {"q","s"} int8 dicts
    *,
    bk: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """``x + fc2(gelu(fc1(layer_norm(x))))`` in one weight-streaming pass."""
    B, C = x.shape
    quantized = isinstance(w1, dict)
    if quantized:
        w1_q, s1 = w1["q"], w1["s"].reshape(1, -1)
        w2_q, s2 = w2["q"], w2["s"].reshape(1, -1)
    else:
        w1_q, s1 = w1, jnp.ones((1, w1.shape[1]), jnp.float32)
        w2_q, s2 = w2, jnp.ones((1, w2.shape[1]), jnp.float32)
    F = w1_q.shape[1]  # 4C
    assert F % bk == 0, (F, bk)
    k_steps = F // bk

    return pl.pallas_call(
        functools.partial(_mlp_kernel, k_steps=k_steps, quantized=quantized),
        out_shape=jax.ShapeDtypeStruct((B, C), x.dtype),
        grid=(k_steps,),
        in_specs=[
            pl.BlockSpec((B, C), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, bk), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, C), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, C), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((B, C), jnp.float32),
            pltpu.VMEM((B, C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * C * F,
            bytes_accessed=(w1_q.size + w2_q.size) * w1_q.dtype.itemsize
            + 2 * B * C * x.dtype.itemsize,
            transcendentals=B * F,
        ),
        interpret=interpret,
    )(
        x,
        ln_g.reshape(1, -1),
        ln_b.reshape(1, -1),
        w1_q,
        s1.astype(jnp.float32),
        (b1.reshape(1, -1).astype(x.dtype)
         if b1 is not None else jnp.zeros((1, F), x.dtype)),
        w2_q,
        s2.astype(jnp.float32),
        (b2.reshape(1, -1).astype(x.dtype)
         if b2 is not None else jnp.zeros((1, C), x.dtype)),
    )
