#!/usr/bin/env python
"""Logits-projection layout experiment at b16 (large-v3 shapes).

bench_b16_step_ops measured the tied-embedding logits matmul at b16 at
~185 GB/s (0.72 ms for a 133 MB read) — 3.8x off the ~700 GB/s the other
streams get.  Candidates timed here (each scanned --inner times inside one
dispatch with a float carry dependency, to defeat tunnel dispatch cost and
loop-invariant hoisting):

  A. einsum "bc,vc->bv" on the (V, C) embedding (the shipped formulation)
  B. einsum "bc,cv->bv" on a pre-transposed (C, V) copy
  C. A with bf16 output (skip f32 logits materialization)
  D. Pallas kernel: grid over V chunks, (Vc, C) block streamed, B x Vc out
  E. D on the (C, V) transposed copy (lane-major vocab)

Usage: python scripts/_logits_experiment.py [--batch 16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--inner", type=int, default=50)
    parser.add_argument("--outer", type=int, default=3)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

    B = args.batch
    V, C = 51866, 1280
    dt = jnp.bfloat16
    V_pad = -(-V // 128) * 128  # 51968
    INNER = args.inner

    mk = jax.jit(
        lambda key, shape: (jax.random.normal(jax.random.PRNGKey(key), shape) * 0.02).astype(dt),
        static_argnums=(1,),
    )

    def sync(x):
        float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32).ravel()[0:1]))

    gb = V * C * 2 / 1e9

    def bench(name, fn, fargs):
        @jax.jit
        def scanned(*a):
            def body(carry, _):
                out = fn(*a, carry)
                return out, None
            out, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=INNER)
            return out

        r = scanned(*fargs)
        sync(r)
        best = float("inf")
        for _ in range(args.outer):
            t0 = time.perf_counter()
            r = scanned(*fargs)
            sync(r)
            best = min(best, (time.perf_counter() - t0) / INNER)
        print(f"{name:42s}: {best*1e3:8.3f} ms   {gb/best:6.0f} GB/s", flush=True)
        return best

    x = mk(1, (B, C))
    emb = mk(2, (V, C))
    emb_t = jax.jit(lambda e: e.T.copy())(emb)  # (C, V) materialized copy
    emb_pad = jnp.pad(emb, ((0, V_pad - V), (0, 0)))
    emb_t_pad = jnp.pad(emb_t, ((0, 0), (0, V_pad - V)))

    # A: shipped formulation
    def f_a(x, emb, carry):
        xx = x + carry.astype(dt) * 0
        lg = jnp.einsum("bc,vc->bv", xx, emb, preferred_element_type=jnp.float32)
        return jnp.max(lg)  # real dependency, no *0

    bench("A einsum bc,vc->bv f32 out", f_a, (x, emb))

    # B: pre-transposed
    def f_b(x, emb_t, carry):
        xx = x + carry.astype(dt) * 0
        lg = jnp.einsum("bc,cv->bv", xx, emb_t, preferred_element_type=jnp.float32)
        return jnp.max(lg)

    bench("B einsum bc,cv->bv (C,V) copy f32 out", f_b, (x, emb_t))

    # C: bf16 out
    def f_c(x, emb, carry):
        xx = x + carry.astype(dt) * 0
        lg = jnp.einsum("bc,vc->bv", xx, emb).astype(dt)
        return jnp.max(lg.astype(jnp.float32))

    bench("C einsum bc,vc->bv bf16 out", f_c, (x, emb))

    # D/E: Pallas kernels
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def make_pallas_vc(vc_chunk):
        nv = V_pad // vc_chunk

        def kernel(x_ref, e_ref, o_ref):
            o_ref[:] = jax.lax.dot_general(
                x_ref[:], e_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        call = pl.pallas_call(
            kernel,
            grid=(nv,),
            in_specs=[
                pl.BlockSpec((B, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((vc_chunk, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (B, vc_chunk), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((B, V_pad), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )

        def f(x, emb_pad, carry):
            xx = x + carry.astype(dt) * 0
            lg = call(xx, emb_pad)
            return jnp.max(lg[:, :V])

        return f

    for chunk in (512, 1024, 2048, 4096):
        bench(f"D pallas (V,C) chunk {chunk}", make_pallas_vc(chunk), (x, emb_pad))

    def make_pallas_cv(vc_chunk):
        nv = V_pad // vc_chunk

        def kernel(x_ref, e_ref, o_ref):
            o_ref[:] = jnp.dot(
                x_ref[:], e_ref[:], preferred_element_type=jnp.float32
            )

        call = pl.pallas_call(
            kernel,
            grid=(nv,),
            in_specs=[
                pl.BlockSpec((B, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((C, vc_chunk), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (B, vc_chunk), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((B, V_pad), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )

        def f(x, emb_t_pad, carry):
            xx = x + carry.astype(dt) * 0
            lg = call(xx, emb_t_pad)
            return jnp.max(lg[:, :V])

        return f

    for chunk in (512, 2048, 4096):
        bench(f"E pallas (C,V) chunk {chunk}", make_pallas_cv(chunk), (x, emb_t_pad))

    # F: reference for what the same bytes cost as a pure stream
    def f_raw(emb, carry):
        s = jnp.sum(emb.astype(jnp.float32)) + carry  # carried: not hoistable
        return s * 1e-30

    bench("F raw embedding reduce (carried)", f_raw, (emb,))


if __name__ == "__main__":
    main()
