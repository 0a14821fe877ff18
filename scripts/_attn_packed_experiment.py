#!/usr/bin/env python
"""Measured test of the two-heads-packed encoder-attention layout.

The encoder attention kernel's docstring (ops/kernels/attention_pallas.py)
rejects two-heads-per-128-lane packing analytically: the MXU charges one
full 128-deep pass per output tile whether the contraction is 64 useful
lanes (unpacked head_dim=64) or 128 lanes of which half multiply
structural zeros (block-diagonal packing).  VERDICT r2 (weak #3) asks for
a *measured* attempt.  This script measures exactly the MXU claim, with
packing-construction costs excluded (most favorable case for packing):

- variant A (unpacked): per rep, TWO head-sized score+PV matmul pairs
  (Q=128, T=1536, D=64) from VMEM-resident operands;
- variant B (packed):   per rep, ONE packed pair (Q=128, 2T=3072, D=128)
  over block-diagonal K/V built once on the host.

Equal useful work per rep.  If B is not measurably faster than A, packing
cannot win even before paying for building the block-diagonal operands
(an extra 2x K/V-sized HBM stream), settling the question.  Measured
result recorded in docs/BENCHMARKS.md.
"""

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=64, help="matmul pairs per program")
    ap.add_argument("--grid", type=int, default=320,
                    help="programs (large-v3 b16 has 320 head-pairs)")
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    Q, T, D = 128, 1536, 64

    def kernel_unpacked(q_ref, k1_ref, v1_ref, k2_ref, v2_ref, o_ref, *, reps):
        q = q_ref[0]          # (Q, 2D): two heads' queries side by side
        k1, v1, k2, v2 = k1_ref[0], v1_ref[0], k2_ref[0], v2_ref[0]
        q1, q2 = q[:, :D], q[:, D:]

        def body(_, acc):
            # acc feedback keeps the loop body live (no hoisting)
            qq1 = q1 + acc[:, :D].astype(q.dtype) * 1e-9
            qq2 = q2 + acc[:, D:].astype(q.dtype) * 1e-9
            s1 = jax.lax.dot_general(qq1, k1, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            o1 = jax.lax.dot_general(s1.astype(q.dtype), v1,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            s2 = jax.lax.dot_general(qq2, k2, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            o2 = jax.lax.dot_general(s2.astype(q.dtype), v2,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            return acc + jnp.concatenate([o1, o2], axis=-1) * 1e-9

        acc = jax.lax.fori_loop(0, reps, body, jnp.zeros((Q, 2 * D), jnp.float32))
        o_ref[0] = acc.astype(o_ref.dtype)

    def kernel_packed(q_ref, k_ref, v_ref, o_ref, *, reps):
        q = q_ref[0]          # (Q, 2D)
        k, v = k_ref[0], v_ref[0]  # (2T, 2D) block-diagonal

        def body(_, acc):
            qq = q + acc.astype(q.dtype) * 1e-9
            s = jax.lax.dot_general(qq, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            o = jax.lax.dot_general(s.astype(q.dtype), v,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return acc + o * 1e-9

        acc = jax.lax.fori_loop(0, reps, body, jnp.zeros((Q, 2 * D), jnp.float32))
        o_ref[0] = acc.astype(o_ref.dtype)

    rng = np.random.RandomState(0)
    g = args.grid
    q2 = jnp.asarray(rng.randn(g, Q, 2 * D) * 0.1, jnp.bfloat16)
    k1 = jnp.asarray(rng.randn(g, T, D) * 0.1, jnp.bfloat16)
    v1 = jnp.asarray(rng.randn(g, T, D) * 0.1, jnp.bfloat16)
    k2 = jnp.asarray(rng.randn(g, T, D) * 0.1, jnp.bfloat16)
    v2 = jnp.asarray(rng.randn(g, T, D) * 0.1, jnp.bfloat16)
    # block-diagonal packed operands (built outside the timed region — the
    # construction stream is packing's *additional* cost, excluded here)
    zero = jnp.zeros((g, T, D), jnp.bfloat16)
    kp = jnp.concatenate([
        jnp.concatenate([k1, zero], axis=-1),
        jnp.concatenate([zero, k2], axis=-1),
    ], axis=1)  # (g, 2T, 2D)
    vp = jnp.concatenate([
        jnp.concatenate([v1, zero], axis=-1),
        jnp.concatenate([zero, v2], axis=-1),
    ], axis=1)

    bs = lambda shape: pl.BlockSpec((1,) + shape, lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)
    f_unpacked = jax.jit(lambda *a: pl.pallas_call(
        functools.partial(kernel_unpacked, reps=args.reps),
        out_shape=jax.ShapeDtypeStruct((g, Q, 2 * D), jnp.bfloat16),
        grid=(g,),
        in_specs=[bs((Q, 2 * D)), bs((T, D)), bs((T, D)), bs((T, D)), bs((T, D))],
        out_specs=bs((Q, 2 * D)),
    )(*a))
    f_packed = jax.jit(lambda *a: pl.pallas_call(
        functools.partial(kernel_packed, reps=args.reps),
        out_shape=jax.ShapeDtypeStruct((g, Q, 2 * D), jnp.bfloat16),
        grid=(g,),
        in_specs=[bs((Q, 2 * D)), bs((2 * T, 2 * D)), bs((2 * T, 2 * D))],
        out_specs=bs((Q, 2 * D)),
    )(*a))

    def timeit(f, *a):
        jax.device_get(f(*a)[0, 0, 0])  # compile + sync
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            out = f(*a)
            jax.device_get(out[0, 0, 0])
            best = min(best, time.perf_counter() - t0)
        return best

    t_u = timeit(f_unpacked, q2, k1, v1, k2, v2)
    t_p = timeit(f_packed, q2, kp, vp)
    print(f"reps={args.reps} grid={g} Q={Q} T={T} D={D}")
    print(f"unpacked 2x({Q},{T},{D}) score+PV pairs: {t_u * 1e3:8.2f} ms")
    print(f"packed   1x({Q},{2 * T},{2 * D}) pair:      {t_p * 1e3:8.2f} ms")
    print(f"packed/unpacked: {t_p / t_u:.3f}  "
          f"({'packing could win' if t_p < 0.9 * t_u else 'packing cannot win (MXU pass-count model confirmed)'})")


if __name__ == "__main__":
    main()
