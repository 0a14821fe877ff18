#!/usr/bin/env python
"""Micro-benchmark: per-step KV-cache write formulations inside a while_loop.

The decode engine writes one time-column of the (L, B, H, D, T) self cache
every step.  Measures, per step, at large-v3 b16 shapes:

  dus     — dynamic_update_slice at scalar t (current engine path)
  where   — full-cache jnp.where(iota == t, new, old) rewrite
  scatter — per-row advanced-indexing scatter (transcribe_batch path)
  none    — loop body without the write (baseline: loop + attention read)

Run on TPU:  python scripts/bench_kv_write.py [--layers 32 --batch 16]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--layers", type=int, default=32)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--heads", type=int, default=20)
    parser.add_argument("--dim", type=int, default=64)
    parser.add_argument("--ctx", type=int, default=128)
    parser.add_argument("--steps", type=int, default=110)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

    L, B, H, D, T = args.layers, args.batch, args.heads, args.dim, args.ctx
    steps = args.steps
    key = jax.random.PRNGKey(0)
    cache0 = jax.random.normal(key, (L, B, H, D, T), jnp.bfloat16)
    newv = jax.random.normal(key, (L, B, H, D), jnp.bfloat16)

    def attention_read(cache, t):
        # stand-in for the per-step attention read over the cache
        q = newv[:, :, :, :]  # (L,B,H,D)
        s = jnp.einsum("lbhd,lbhdt->lbht", q, cache,
                       preferred_element_type=jnp.float32)
        return s.sum(dtype=jnp.float32)

    def attention_read_scan(cache, t):
        # engine-realistic: lax.scan over layers consuming the cache as xs
        def body(carry, xs):
            cache_l = xs  # (B,H,D,T)
            s = jnp.einsum("bhd,bhdt->bht", newv[0], cache_l,
                           preferred_element_type=jnp.float32)
            w = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
            o = jnp.einsum("bht,bhdt->bhd", w, cache_l,
                           preferred_element_type=jnp.float32)
            return carry + o.sum(dtype=jnp.float32), o.astype(jnp.bfloat16)

        acc, k_new = jax.lax.scan(body, jnp.float32(0), cache)
        return acc, k_new  # k_new: (L,B,H,D)

    def make(kind):
        scan_kinds = kind.startswith("scan_")

        def body(i, carry):
            cache, acc = carry
            if scan_kinds:
                a, produced = attention_read_scan(cache, i)
                acc = acc + a
                col = produced[..., None]
            else:
                acc = acc + attention_read(cache, i)
                col = (newv + acc.astype(jnp.bfloat16) * 0)[..., None]
            if kind.endswith("dus"):
                cache = jax.lax.dynamic_update_slice_in_dim(cache, col, i, axis=4)
            elif kind.endswith("dus2d"):
                flat = cache.reshape(-1, T)
                flat = jax.lax.dynamic_update_slice(
                    flat, col.reshape(-1, 1), (0, i)
                )
                cache = flat.reshape(L, B, H, D, T)
            elif kind.endswith("where"):
                iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, T), 4)
                cache = jnp.where(iota == i, col, cache)
            elif kind.endswith("scatter"):
                t_vec = jnp.full((B,), i, jnp.int32)
                vals = (col[..., 0]).transpose(1, 0, 2, 3)
                cache = cache.at[:, jnp.arange(B), :, :, t_vec].set(vals, mode="drop")
            return cache, acc

        if kind.startswith("merge_"):
            # deferred merge: write the PREVIOUS step's column before the scan
            # reads, so the pre-merge cache has no later uses (in-place DUS)
            def body(i, carry):  # noqa: F811
                cache, pending, acc = carry
                col = pending[..., None]
                if kind == "merge_dus":
                    cache = jax.lax.dynamic_update_slice_in_dim(
                        cache, col, i - 1, axis=4
                    )
                elif kind == "merge_where":
                    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, T), 4)
                    cache = jnp.where(iota == i - 1, col, cache)
                a, produced = attention_read_scan(cache, i)
                return cache, produced, acc + a

            @jax.jit
            def run(cache):
                return jax.lax.fori_loop(
                    0, steps, body, (cache, newv, jnp.float32(0))
                )

            return run

        if kind.startswith("block"):
            # deferred W-block: inner scan of W steps writes a small pending
            # buffer; one full-cache where-flush per outer iteration (the
            # engine analog restructures the while_loop into W-step bodies)
            W = 8

            def inner(carry, w):
                cache, pending, acc = carry
                a, produced = attention_read_scan(cache, w)
                # extra attention term over the pending block (w cols valid)
                sp = jnp.einsum("lbhd,lbhdw->lbhw", produced, pending,
                                preferred_element_type=jnp.float32)
                acc = acc + a + sp.sum(dtype=jnp.float32)
                wiota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, W), 4)
                pending = jnp.where(wiota == w, produced[..., None], pending)
                return (cache, pending, acc), None

            def outer(o, carry):
                cache, acc = carry
                pending = jnp.zeros((L, B, H, D, W), jnp.bfloat16)
                (cache, pending, acc), _ = jax.lax.scan(
                    inner, (cache, pending, acc), jnp.arange(W)
                )
                s0 = o * W
                iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, T), 4)
                onehot = (
                    jnp.arange(W)[:, None] + s0 == jnp.arange(T)[None, :]
                ).astype(jnp.bfloat16)  # (W, T)
                spread = jnp.einsum("lbhdw,wt->lbhdt", pending, onehot)
                mask = (iota >= s0) & (iota < s0 + W)
                cache = jnp.where(mask, spread, cache)
                return cache, acc

            @jax.jit
            def run(cache):
                return jax.lax.fori_loop(
                    0, steps // 8, outer, (cache, jnp.float32(0))
                )

            return run

        @jax.jit
        def run(cache):
            return jax.lax.fori_loop(0, steps, body, (cache, jnp.float32(0)))

        return run

    for kind in ["none", "dus", "where", "scatter",
                 "scan_none", "scan_dus", "scan_dus2d", "scan_where",
                 "scan_scatter", "merge_dus", "merge_where", "block_where"]:
        run = make(kind)
        out = run(cache0)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = run(cache0)
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 3
        print(f"{kind:8s} {dt * 1000:8.1f} ms total  {dt / steps * 1e3:6.3f} ms/step")


if __name__ == "__main__":
    main()
