"""Microbenchmark: whole-step fused Pallas kernel vs the XLA layer scan.

One decode step at large-v3 decoder shapes, B=1 (the single-stream path the
kernel exists for).  Run on the TPU (the tunnel must be free):

    PYTHONUNBUFFERED=1 python scripts/bench_fused_step.py [--quantize]
        [--kv-int8] [--ctx 256] [--iters 50]

Prints ms/step for both paths.  Weights are random; only timing matters.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np

from whisper_tpu.models.dims import ModelDimensions
from whisper_tpu.models.whisper import (
    compute_cross_kv,
    decoder_step,
    decoder_step_fused,
    init_kv_cache,
    init_params,
)
from whisper_tpu.ops.kernels.fused_step_pallas import (
    pack_fused_weights,
    pad_cross_kv,
)

LARGE_V3 = ModelDimensions(
    n_mels=128, n_audio_ctx=1500, n_audio_state=1280, n_audio_head=20,
    n_audio_layer=32, n_vocab=51866, n_text_ctx=448, n_text_state=1280,
    n_text_head=20, n_text_layer=32,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quantize", action="store_true")
    ap.add_argument("--kv-int8", action="store_true")
    ap.add_argument("--ctx", type=int, default=256)
    ap.add_argument("--rows", type=int, default=1,
                    help="query rows B (beam/best-of group of ONE audio)")
    ap.add_argument("--audios", type=int, default=0,
                    help="multi-audio greedy batch: A audios, one row each "
                         "(overrides --rows; HBM is tight at A=16 — prefer "
                         "--skip-xla and a separate XLA-only run)")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--pending", action="store_true",
                    help="bench the deferred-KV (write-block) step variants "
                         "— the engine's greedy wide-model configuration")
    ap.add_argument("--skip-xla", action="store_true")
    ap.add_argument("--skip-fused", action="store_true",
                    help="XLA-only run (skips the fused pack/pads/cache — "
                         "needed to fit an A=16 XLA bench in HBM)")
    ap.add_argument("--check", action="store_true",
                    help="verify kernel output vs the XLA scan on this device")
    args = ap.parse_args()

    dims = LARGE_V3
    print("platform:", jax.devices()[0].platform, flush=True)
    params = init_params(dims, jax.random.PRNGKey(0), jnp.bfloat16)
    # the encoder is not benched; drop it to save HBM
    params = {"encoder": {}, "decoder": params["decoder"]}
    if args.quantize:
        from whisper_tpu.quantize import quantize_params

        params = quantize_params(params, scopes=("decoder",))

    A = args.audios or 1
    if args.audios:
        args.rows = args.audios  # one row per audio (n_group == 1)
    n_group = 1 if args.audios else args.rows

    key = jax.random.PRNGKey(1)
    feats = (jax.random.normal(key, (A, 1500, 1280)) * 0.3).astype(jnp.bfloat16)
    xk, xv = compute_cross_kv(params, dims, feats)
    if args.kv_int8:
        from whisper_tpu.quantize import quantize_kv

        xk_c, xv_c = quantize_kv(xk), quantize_kv(xv)
        # free the bf16 originals NOW — at A=16 they are 3.9 GB that
        # otherwise coexist with their int8 copies + pads until the del
        # below, overflowing HBM
        jax.block_until_ready((xk_c["q"], xv_c["q"]))
        xk = xv = None
    else:
        xk_c, xv_c = xk, xv
    T = args.ctx
    B = args.rows
    # the XLA bench donates its cache (deleting the cross leaves); give it
    # private copies so the fused inputs survive.  Skip the copy entirely
    # when the XLA path won't run — at A=16 the extra cross-KV copy
    # (3.9 GB) pushes the bench over the chip's HBM
    if args.skip_xla and not args.check:
        cache = None
    else:
        cache = init_kv_cache(
            dims, B, jax.tree.map(jnp.copy, xk_c), jax.tree.map(jnp.copy, xv_c),
            jnp.bfloat16, ctx=T,
        )
    tokens = jnp.asarray([42] * B, jnp.int32)
    t = jnp.int32(16)

    # jax.block_until_ready is a NO-OP on the axon remote backend; the only
    # true sync is fetching a value to the host
    fetch = jax.jit(lambda h: jnp.sum(h.astype(jnp.float32)))

    def bench(fn, weights, cache, label):
        # weights/cache as jit ARGUMENTS: a closed-over params pytree makes
        # XLA embed GBs of constants and the compile appears to hang
        f = jax.jit(fn, donate_argnums=(1,))
        t0 = time.perf_counter()
        h, c = f(weights, cache)
        float(fetch(h))
        print(f"{label}: compile+1 {time.perf_counter() - t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            h, c = f(weights, c)
        float(fetch(h))
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{label}: {dt:.3f} ms/step", flush=True)
        return dt

    def hbm():
        stats = jax.devices()[0].memory_stats() or {}
        used = stats.get("bytes_in_use", 0) / 1e9
        print(f"hbm in use: {used:.2f} GB", flush=True)

    # prepare the fused inputs BEFORE the XLA bench donates the cache (the
    # donated cache shares the cross-KV buffers, which donation deletes)
    if args.skip_fused:
        pack = xkp = xvp = xks = xvs = cache_fused = None
        del xk, xv, xk_c, xv_c, feats
    else:
        pack = pack_fused_weights(params, dims)
        xkp, xvp, xks, xvs = pad_cross_kv(xk_c, xv_c)
        # the fused bench donates its cache too; pad_cross_kv copies k/v
        # (pad) but returns the int8 SCALES by reference, so the cache must
        # not share them — donating a buffer that is also a live kernel
        # input fails at runtime with an opaque InvalidArgument
        cache_fused = init_kv_cache(
            dims, B, jax.tree.map(jnp.copy, xk_c), jax.tree.map(jnp.copy, xv_c),
            jnp.bfloat16, ctx=T,
        )
        del xk, xv, xk_c, xv_c, feats
        jax.block_until_ready((pack.w, xkp))
    hbm()

    if args.check:
        # one-step output agreement, kernel vs XLA scan, ON the TPU (the
        # CPU tests exercise the interpreter, not the Mosaic lowering)
        h_ref, _ = jax.jit(
            lambda p, c: decoder_step(p, dims, tokens, t, c, n_group=n_group)
        )(params, cache)
        h_fus, _ = jax.jit(
            lambda p, w, c: decoder_step_fused(
                p, w[0], dims, tokens, t, c, *w[1:]
            )
        )(params, (pack, xkp, xvp, xks, xvs), cache_fused)
        d = float(jnp.max(jnp.abs(h_fus.astype(jnp.float32) - h_ref.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(h_ref.astype(jnp.float32))))
        print(f"TPU output check: maxdiff {d:.4g} (scale {scale:.3g})", flush=True)

    if args.pending:
        # the engine's greedy wide-model config: deferred W-step KV write
        # blocks (no full-cache rewrite inside the timed step; the engine
        # flushes once per W steps).  Time column w=W-1 — every pending
        # column participates in attention, the steady-state shape.
        from whisper_tpu.models.whisper import (
            decoder_step_fused_pending,
            decoder_step_pending,
        )

        W = 8
        L_, H_ = dims.n_text_layer, dims.n_text_head
        D_ = dims.n_text_state // H_
        pk0 = (jax.random.normal(jax.random.PRNGKey(2), (L_, B, H_, D_, W))
               * 0.05).astype(jnp.bfloat16)
        pv0 = (jax.random.normal(jax.random.PRNGKey(3), (L_, B, H_, D_, W))
               * 0.05).astype(jnp.bfloat16)
        bs = jnp.int32(8)
        w_col = jnp.int32(W - 1)

        if not args.skip_xla:

            def xla_pend(p, state):
                c, pk, pv = state
                h, pk, pv = decoder_step_pending(
                    p, dims, tokens, t, bs, w_col, pk, pv, c,
                    n_group=n_group,
                )
                return h, (c, pk, pv)

            bench(xla_pend, params, (cache, pk0, pv0), "xla  pending   ")
            hbm()

        def fused_pend(wts, state):
            c, pk, pv = state
            h, pk, pv = decoder_step_fused_pending(
                wts[0], wts[1], dims, tokens, t, bs, w_col, pk, pv, c,
                *wts[2:],
            )
            return h, (c, pk, pv)

        if not args.skip_fused:
            bench(
                fused_pend, (params, pack, xkp, xvp, xks, xvs),
                (cache_fused, jnp.copy(pk0), jnp.copy(pv0)), "fused pending  ",
            )
            hbm()
        return

    if not args.skip_xla:
        bench(
            lambda p, c: decoder_step(p, dims, tokens, t, c, n_group=n_group),
            params, cache, "xla  layer-scan",
        )
        hbm()

    if not args.skip_fused:
        bench(
            lambda w, c: decoder_step_fused(
                w[0], w[1], dims, tokens, t, c, *w[2:]
            ),
            (params, pack, xkp, xvp, xks, xvs), cache_fused, "fused pallas   ",
        )
        hbm()


if __name__ == "__main__":
    main()
