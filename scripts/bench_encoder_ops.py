#!/usr/bin/env python
"""Micro-benchmarks for the encoder's hot ops on TPU.

Times (a) the Pallas encoder-attention kernel across query-block sizes and
vs the XLA attention path, and (b) the MLP fc2 matmul formulations —
the two largest encoder items in the op profile (scripts/profile_engine.py
--encoder-only).  Shapes default to the large-v3 / turbo encoder at batch 16.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, repeats=5, inner=8):
    """min-of-repeats wall time; completion forced by a scalar fetch
    (block_until_ready returns early on the remote-attachment platform),
    with `inner` chained invocations per timing to amortize the fetch
    round-trip (~10 ms) out of the measurement."""
    import numpy as np

    import jax

    def sync(x):
        return jax.device_get(x.reshape(-1)[0])

    out = fn(*args)
    sync(out)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        sync(out)
        times.append((time.perf_counter() - t0) / inner)
    return min(times)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--heads", type=int, default=20)
    parser.add_argument("--t", type=int, default=1500)
    parser.add_argument("--d", type=int, default=64)
    parser.add_argument("--c", type=int, default=1280)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from whisper_tpu.ops.attention import qkv_attention
    from whisper_tpu.ops.kernels.attention_pallas import attention_pallas

    b, h, t, d, c = args.batch, args.heads, args.t, args.d, args.c
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, h, t, d) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, h, t, d) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, h, t, d) * 0.3, jnp.bfloat16)

    flops = 4 * b * h * t * t * d
    for qb in (128, 256, 512, 768):
        dt = timeit(lambda q, k, v: attention_pallas(q, k, v, q_block=qb), q, k, v)
        print(f"attention_pallas q_block={qb}: {dt * 1e3:7.2f} ms  "
              f"{flops / dt / 1e12:5.1f} TF/s")
    xla_attn = jax.jit(lambda *a: qkv_attention(*a)[0])
    dt = timeit(xla_attn, q, k, v)
    print(f"XLA qkv_attention:          {dt * 1e3:7.2f} ms  {flops / dt / 1e12:5.1f} TF/s")

    # fc2: (B*T, 4C) x (4C, C) + residual add — the add_add_fusion in profiles
    x = jnp.asarray(rng.randn(b, t, 4 * c) * 0.3, jnp.bfloat16)
    res = jnp.asarray(rng.randn(b, t, c) * 0.3, jnp.bfloat16)
    w = jnp.asarray(rng.randn(4 * c, c) * 0.02, jnp.bfloat16)
    bias = jnp.zeros((c,), jnp.bfloat16)
    fl2 = 2 * b * t * 4 * c * c

    def fc2_plain(x, w, bias, res):
        return res + (jnp.einsum("btf,fc->btc", x, w) + bias)

    def fc2_pref(x, w, bias, res):
        y = jnp.einsum("btf,fc->btc", x, w, preferred_element_type=jnp.float32)
        return res + (y.astype(x.dtype) + bias)

    def fc2_flat(x, w, bias, res):
        y = jax.lax.dot_general(
            x.reshape(-1, 4 * c), w, (((1,), (0,)), ((), ())),
        )
        return res + (y.reshape(b, t, c) + bias)

    def fc2_barrier(x, w, bias, res):
        # block XLA from fusing the residual add into the matmul epilogue:
        # run the matmul clean, then a separate bandwidth-bound add pass
        y = jax.lax.dot_general(
            x.reshape(-1, 4 * c), w, (((1,), (0,)), ((), ())),
        )
        y = jax.lax.optimization_barrier(y)
        return res + (y.reshape(b, t, c) + bias)

    from _matmul_pallas_experiment import matmul_residual_pallas

    def fc2_pallas(x, w, bias, res):
        return matmul_residual_pallas(x.reshape(-1, 4 * c), w, bias,
                                      res.reshape(-1, c)).reshape(b, t, c)

    for name, fn in [("einsum+res", fc2_plain), ("einsum f32 pref", fc2_pref),
                     ("flat dot", fc2_flat), ("opt-barrier", fc2_barrier),
                     ("pallas epilogue", fc2_pallas)]:
        dt = timeit(jax.jit(fn), x, w, bias, res)
        print(f"fc2 {name:16s}: {dt * 1e3:7.2f} ms  {fl2 / dt / 1e12:5.1f} TF/s")

    # gelu(fc1) in isolation, for reference
    w1 = jnp.asarray(rng.randn(c, 4 * c) * 0.02, jnp.bfloat16)
    x1 = jnp.asarray(rng.randn(b, t, c) * 0.3, jnp.bfloat16)

    def fc1(x, w):
        return jax.nn.gelu(jnp.einsum("btc,cf->btf", x, w), approximate=False)

    dt = timeit(jax.jit(fc1), x1, w1)
    print(f"fc1+gelu            : {dt * 1e3:7.2f} ms  {fl2 / dt / 1e12:5.1f} TF/s")


if __name__ == "__main__":
    main()
