#!/usr/bin/env python
"""Wall time of the full jitted encoder forward on TPU.

Completion is forced by a scalar fetch (block_until_ready returns early over
the remote attachment) and several invocations are chained per timing to
amortize the fetch round-trip.  Compare Pallas-attention tunings via
WHISPER_TPU_ATTN_QBLOCK=... or the XLA path via WHISPER_TPU_NO_PALLAS=1.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="large-v3")
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--repeats", type=int, default=5)
    parser.add_argument("--inner", type=int, default=4)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from whisper_tpu.models.dims import KNOWN_MODELS
    from whisper_tpu.models.whisper import encoder_apply, init_params

    dims = KNOWN_MODELS[args.model]
    params = init_params(dims, jax.random.PRNGKey(0), jnp.bfloat16)
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(args.batch, dims.n_mels, 3000) * 0.3, jnp.float32)

    fn = jax.jit(lambda p, m: encoder_apply(p, dims, m))
    jax.device_get(fn(params, mel)[0, 0, 0])

    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        out = None
        for _ in range(args.inner):
            out = fn(params, mel)
        jax.device_get(out[0, 0, 0])
        times.append((time.perf_counter() - t0) / args.inner)
    best = min(times)
    print(
        f"encoder {args.model} b{args.batch}: {best * 1e3:.1f} ms  "
        f"(qblock={os.environ.get('WHISPER_TPU_ATTN_QBLOCK', 'default')}, "
        f"pallas={'off' if os.environ.get('WHISPER_TPU_NO_PALLAS') == '1' else 'on'})"
    )


if __name__ == "__main__":
    main()
