#!/usr/bin/env python
"""Offline int8-vs-bf16 divergence proxy (evaluation.int8_divergence_proxy).

Produces the random-weights evidence recorded in docs/BENCHMARKS.md next to
the int8 beam-5 serving default: greedy token-agreement rate and
teacher-forced logit divergence along the bf16 model's own greedy
trajectory.  The LibriSpeech WER gate (evaluation.int8_wer_gate, run by
scripts/validate_real.py) supersedes this the moment real checkpoints are
available.

Usage:
    python scripts/int8_proxy.py [--model large-v3] [--windows 8]
        [--sample-len 32] [--kv-int8]
"""

import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None)
    ap.add_argument("--windows", type=int, default=8)
    ap.add_argument("--sample-len", type=int, default=32)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--kv-int8", action="store_true",
                    help="also quantize the cross-KV cache on the int8 side "
                         "(the full serving-default configuration)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    import jax.numpy as jnp
    import numpy as np

    from whisper_tpu.evaluation import int8_divergence_proxy
    from whisper_tpu.models.dims import KNOWN_MODELS
    from whisper_tpu.models.whisper import Whisper, init_params
    from whisper_tpu.quantize import quantize_params

    platform = jax.devices()[0].platform
    model_name = args.model or ("large-v3" if platform == "tpu" else "tiny")
    dims = KNOWN_MODELS[model_name]
    dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
    params = init_params(dims, jax.random.PRNGKey(0), dtype)
    model = Whisper(dims, params)
    qmodel = Whisper(dims, quantize_params(params))

    rng = np.random.RandomState(0)
    mels = (rng.randn(args.windows, dims.n_mels, 3000) * 0.3).astype(np.float32)

    kw = {}
    if args.kv_int8:
        kw["int8_decode_options"] = {"kv_cache_dtype": "int8"}
    out = int8_divergence_proxy(
        model, qmodel, mels, sample_len=args.sample_len,
        batch_size=args.batch_size, **kw,
    )
    out.update(model=model_name, platform=platform, kv_int8=args.kv_int8,
               sample_len=args.sample_len)
    print(json.dumps({k: out[k] for k in sorted(out)}))


if __name__ == "__main__":
    main()
