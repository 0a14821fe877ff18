#!/usr/bin/env python
"""Wall-clock decomposition of the b16 decode step at large-v3 shapes.

The round-4 suite puts the b16 bf16 engine at ~13.9 ms/step against a
~7.9 ms HBM byte floor (weights 1.47 GB + cross-KV 3.93 GB + self-KV
~0.7 GB at the ~700 GB/s the chip sustains).  The profiler over the axon
tunnel reports cost-model estimates (docs/BENCHMARKS.md "Profiler caveat"),
so this script times each component with `time.perf_counter` around a
scalar fetch.  Two tunnel hazards engineered around: data is generated ON
DEVICE (host->device uploads run at ~30 MB/s here), and every op repeats
`--inner` times inside ONE jitted lax.scan (a bare dispatch costs ~2.5 ms
over the tunnel, swamping sub-millisecond ops).

Usage: python scripts/bench_b16_step_ops.py [--batch 16] [--ctx 256]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--ctx", type=int, default=256, help="self-KV bucket")
    parser.add_argument("--inner", type=int, default=50,
                        help="scan iterations inside one dispatch")
    parser.add_argument("--outer", type=int, default=3)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

    from whisper_tpu.models.dims import KNOWN_MODELS
    from whisper_tpu.models.whisper import (
        NEG_INF, _cross_step_attention, split_heads,
    )

    B, T = args.batch, args.ctx
    dims = KNOWN_MODELS["large-v3"]
    H, D, C, Ta = 20, 64, 1280, 1500
    L = dims.n_text_layer
    V = 51866
    dt = jnp.bfloat16
    INNER = args.inner

    def dev_normal(key, shape, scale=0.02):
        return (jax.random.normal(jax.random.PRNGKey(key), shape) * scale).astype(dt)

    mk = jax.jit(dev_normal, static_argnums=(1,))

    def sync(x):
        float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32).ravel()[0:1]))

    def bench(name, build, gb=None):
        """build() -> (fn, args); fn scanned INNER times in one dispatch."""
        fn, fargs = build()

        @jax.jit
        def scanned(*a):
            def body(carry, _):
                out = fn(*a, carry)
                return out, None
            out, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                  None, length=INNER)
            return out

        r = scanned(*fargs)
        sync(r)
        best = float("inf")
        for _ in range(args.outer):
            t0 = time.perf_counter()
            r = scanned(*fargs)
            sync(r)
            best = min(best, (time.perf_counter() - t0) / INNER)
        msg = f"{name:30s}: {best*1e3:8.3f} ms"
        if gb:
            msg += f"   {gb*1e3:8.1f} MB   {gb/best:6.0f} GB/s"
        print(msg, flush=True)
        return best

    results = {}

    # Measurement hazards (both observed here): (1) an int-typed value
    # multiplied by 0 gets algebraically folded (ints cannot be NaN), which
    # DCEs the whole computation feeding it — float sums survive `* 0`; and
    # (2) any computation whose inputs don't depend on the scan carry is
    # loop-invariant and XLA hoists it out of the while loop, so a "raw
    # read" reference row measures one read per DISPATCH, not per
    # iteration.  Every row below threads the f32 carry into its inputs.
    xk_all = mk(1, (L, B, H, D, Ta))
    xv_all = mk(2, (L, B, H, D, Ta))
    gb_cross = 2 * L * B * H * D * Ta * 2 / 1e9

    # --- the full 32-layer cross-attention stream as one scan ----------------
    q0 = mk(3, (B, H, 1, D))

    def build_cross():
        def f(q, xk, xv, carry):
            qq = q + carry.astype(dt) * 0

            def body(c, kv):
                xk_l, xv_l = kv
                out = _cross_step_attention(c, xk_l, xv_l, H, 1)
                return c + out.astype(c.dtype) * 0.01, None

            out, _ = jax.lax.scan(body, qq, (xk, xv))
            return jnp.sum(out.astype(jnp.float32)) * 1e-30 + carry + 1
        return f, (q0, xk_all, xv_all)

    results["cross_scan_32"] = bench(
        "cross-attn 32-layer scan", build_cross, gb=gb_cross)

    # --- self-attention over the cache (pos-mask formulation), 32 layers -----
    ck_all = mk(4, (L, B, H, D, T))
    cv_all = mk(5, (L, B, H, D, T))
    kn = mk(6, (B, H, 1, D))
    vn = mk(7, (B, H, 1, D))
    tpos = jnp.full((B,), T // 2, jnp.int32)
    gb_self = 2 * L * B * H * D * T * 2 / 1e9

    def build_self():
        def f(q, ck, cv, kn, vn, tpos, carry):
            pos_mask = jnp.where(
                jnp.arange(T)[None, None, None, :] < tpos[:, None, None, None],
                0.0, NEG_INF).astype(jnp.float32)
            qq = q + carry.astype(dt) * 0

            def body(c, kv):
                ck_l, cv_l = kv
                scale = D ** -0.25
                s_old = jnp.einsum("bhqd,bhdk->bhqk", c * scale, ck_l * scale,
                                   preferred_element_type=jnp.float32) + pos_mask
                s_new = jnp.einsum("bhqd,bhkd->bhqk", c * scale, kn * scale,
                                   preferred_element_type=jnp.float32)
                s = jnp.concatenate([s_old, s_new], -1)
                w = jax.nn.softmax(s, axis=-1).astype(c.dtype)
                attn = jnp.einsum("bhqk,bhdk->bhqd", w[..., :T], cv_l,
                                  preferred_element_type=jnp.float32) \
                    + w[..., T:] * vn.astype(jnp.float32)
                return c + attn.astype(c.dtype) * 0.01, None

            out, _ = jax.lax.scan(body, qq, (ck, cv))
            return jnp.sum(out.astype(jnp.float32)) * 1e-30 + carry + 1
        return f, (q0, ck_all, cv_all, kn, vn, tpos)

    results["self_scan_32"] = bench(
        f"self-attn 32-layer scan (T={T})", build_self, gb=gb_self)

    # --- weight matmul stream: all layers' matmuls back-to-back --------------
    # one scan over layers, q/k/v/o + fc1/fc2 per layer, B x 1 activations
    wq = mk(8, (L, C, C)); wk = mk(9, (L, C, C))
    wv = mk(10, (L, C, C)); wo = mk(11, (L, C, C))
    wf1 = mk(12, (L, C, 4 * C)); wf2 = mk(13, (L, 4 * C, C))
    gb_w = (4 * C * C + 8 * C * C) * L * 2 / 1e9

    x0 = mk(14, (B, C))

    def build_matmuls():
        def f(x, wq, wk, wv, wo, wf1, wf2, carry):
            xx = x + carry.astype(dt) * 0

            def body(c, ws):
                a, b_, v_, o_, f1, f2 = ws
                q = jnp.einsum("bc,cd->bd", c, a, preferred_element_type=jnp.float32)
                k = jnp.einsum("bc,cd->bd", c, b_, preferred_element_type=jnp.float32)
                v2 = jnp.einsum("bc,cd->bd", c, v_, preferred_element_type=jnp.float32)
                o = jnp.einsum("bc,cd->bd", (q + k + v2).astype(dt), o_,
                               preferred_element_type=jnp.float32)
                h = jnp.einsum("bc,cf->bf", o.astype(dt), f1,
                               preferred_element_type=jnp.float32)
                out = jnp.einsum("bf,fc->bc", jax.nn.gelu(h).astype(dt), f2,
                                 preferred_element_type=jnp.float32)
                return c + out.astype(dt) * 0.01, None

            out, _ = jax.lax.scan(body, xx, (wq, wk, wv, wo, wf1, wf2))
            return jnp.sum(out.astype(jnp.float32)) * 1e-30 + carry + 1
        return f, (x0, wq, wk, wv, wo, wf1, wf2)

    results["weights_scan_32"] = bench(
        f"weight matmuls 32-layer scan ({gb_w:.2f} GB)", build_matmuls, gb=gb_w)

    # --- logits projection ----------------------------------------------------
    emb = mk(15, (V, C))
    gb_l = V * C * 2 / 1e9

    def build_logits():
        def f(x, emb, carry):
            xx = x + carry.astype(dt) * 0
            lg = jnp.einsum("bc,vc->bv", xx, emb, preferred_element_type=jnp.float32)
            return jnp.sum(lg) * 1e-30 + carry + 1
        return f, (x0, emb)

    results["logits_proj"] = bench("logits projection", build_logits, gb=gb_l)

    # --- KV write (per-step where rewrite), 32 layers -------------------------
    def build_kvwrite():
        def f(ck, kn, tpos, carry):
            # positions vary with the (unknown-to-XLA) f32 carry, keeping
            # the onehot — and hence the whole rewrite — inside the loop
            jitter = (carry - jnp.floor(carry / 2.0) * 2.0).astype(jnp.int32)
            onehot = (jnp.arange(T)[None, :] ==
                      (tpos[:, None] + jitter)).astype(dt)

            def body(c, ck_l):
                upd = ck_l * (1 - onehot[:, None, None, :]) \
                    + kn.transpose(0, 1, 3, 2) * onehot[:, None, None, :]
                return c + jnp.sum(upd.astype(jnp.float32)) * 1e-30, None

            out, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), ck)
            return out * 1e-30 + carry + 1
        return f, (ck_all, kn, tpos)

    results["kv_write_32"] = bench(
        "kv where-write 32 layers (read+write)", build_kvwrite, gb=gb_self)

    # --- full decoder_step ------------------------------------------------------
    from whisper_tpu.models.whisper import (
        compute_cross_kv, decoder_step, init_kv_cache, init_params,
    )

    params = init_params(dims, jax.random.PRNGKey(0), dt)
    feats = mk(16, (B, Ta, C))
    xk_c, xv_c = compute_cross_kv(params, dims, feats)
    cache = init_kv_cache(dims, B, xk_c, xv_c, dt, ctx=T)
    tok0 = jnp.full((B,), 123, jnp.int32)

    def build_step():
        def f(params, cache, tok, carry):
            def body(c, _):
                cc, tk = c
                h, cc = decoder_step(params, dims, tk, jnp.int32(T // 2), cc)
                tk = jnp.argmax(h[:, : V // 1000], axis=-1).astype(jnp.int32)
                return (cc, tk), None
            (cc, tk), _ = jax.lax.scan(body, (cache, tok), None, length=8)
            # real (float-typed, non-foldable) dependency on the result
            return jnp.sum(tk.astype(jnp.float32)) * 1e-6 + carry + 1
        return f, (params, cache, tok0)

    # note INNER is inside bench; here each inner iter is 8 steps
    saved_inner = None
    # temporarily reduce INNER for the full step (8 steps each)
    # (reuse bench with adjusted accounting)
    t8 = bench("decoder_step x8 (per 8 steps)", build_step)
    print(f"{'decoder_step per step':30s}: {t8/8*1e3:8.3f} ms", flush=True)

    comp = (results["cross_scan_32"] + results["self_scan_32"]
            + results["weights_scan_32"] + results["logits_proj"]
            + results["kv_write_32"])
    print(f"{'sum of component scans':30s}: {comp*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
