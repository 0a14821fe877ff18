#!/usr/bin/env python
"""Micro-benchmark: fused decoder-MLP kernel vs XLA at decode-step shapes.

Times N back-to-back MLP applications inside a fori_loop (the layer-scan
pattern): XLA's ln/fc1+gelu/fc2+residual fusions vs the single Pallas
weight-streaming kernel (ops/kernels/mlp_pallas.py), bf16 and int8 weights.

Run on TPU:  python scripts/bench_mlp_step.py [--batch 1] [--layers 32]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--c", type=int, default=1280)
    parser.add_argument("--layers", type=int, default=32)
    parser.add_argument("--steps", type=int, default=110)
    parser.add_argument("--bk", type=int, default=512)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

    from whisper_tpu.models.whisper import _gelu, _linear, layer_norm
    from whisper_tpu.ops.kernels.mlp_pallas import mlp_fused_pallas
    from whisper_tpu.quantize import quantize_weight

    B, C, L = args.batch, args.c, args.layers
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    x0 = jnp.asarray(rng.randn(B, C) * 0.5, dt)
    g = jnp.asarray(1 + rng.randn(L, C) * 0.1, dt)
    bb = jnp.asarray(rng.randn(L, C) * 0.1, dt)
    w1 = jnp.asarray(rng.randn(L, C, 4 * C) * 0.02, dt)
    b1 = jnp.asarray(rng.randn(L, 4 * C) * 0.1, dt)
    w2 = jnp.asarray(rng.randn(L, 4 * C, C) * 0.02, dt)
    b2 = jnp.asarray(rng.randn(L, C) * 0.1, dt)
    q1 = jax.vmap(quantize_weight)(w1)
    q2 = jax.vmap(quantize_weight)(w2)

    def xla_mlp(x, g, b, w1, b1, w2, b2):
        h = layer_norm(x, g, b)
        h = _gelu(_linear(h, w1, b1))
        return x + _linear(h, w2, b2)

    def make(kind):
        quant = kind.endswith("int8")

        def layer(x, xs):
            if quant:
                gl, bl, w1l, s1l, b1l, w2l, s2l, b2l = xs
                w1d = {"q": w1l, "s": s1l}
                w2d = {"q": w2l, "s": s2l}
            else:
                gl, bl, w1d, b1l, w2d, b2l = xs
            if kind.startswith("pallas"):
                return mlp_fused_pallas(x, gl, bl, w1d, b1l, w2d, b2l, bk=args.bk), None
            return xla_mlp(x, gl, bl, w1d, b1l, w2d, b2l), None

        if quant:
            xs = (g, bb, q1["q"], q1["s"], b1, q2["q"], q2["s"], b2)
        else:
            xs = (g, bb, w1, b1, w2, b2)

        # weights travel as jit arguments, NOT closed-over constants — XLA
        # would otherwise spend minutes embedding/folding the 840 MB of
        # weight arrays (same pitfall as __graft_entry__.entry)
        @jax.jit
        def run(x, xs):
            def step(i, x):
                y, _ = jax.lax.scan(layer, x, xs)
                return y

            return jax.lax.fori_loop(0, args.steps, step, x)

        return lambda x: run(x, xs)

    nbytes = {True: (q1["q"].size + q2["q"].size),
              False: (w1.size + w2.size) * 2}
    for kind in ["xla", "pallas", "xla_int8", "pallas_int8"]:
        run = make(kind)
        out = run(x0)
        jax.device_get(out[0, 0])
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(x0)
            jax.device_get(out[0, 0])
            times.append(time.perf_counter() - t0)
        dtm = min(times) / args.steps
        per_layer = dtm / L * 1e6
        gbs = nbytes[kind.endswith("int8")] / dtm / 1e9
        print(f"{kind:12s} {dtm * 1e3:7.3f} ms/step  {per_layer:6.1f} us/layer  "
              f"{gbs:6.0f} GB/s weight stream")


if __name__ == "__main__":
    main()
