#!/usr/bin/env python
"""Benchmark: chunked-parallel vs sequential transcription of ONE long file.

The reference's long-form loop is inherently sequential (each window's seek
depends on the previous decode), so a long file runs at batch-1 throughput.
transcribe_chunked decodes fixed overlapping chunks as a batch.  Synthetic
noise audio, random weights: text is meaningless, but the decode work per
window (sample_len pinned, thresholds off) is the product configuration.

    PYTHONUNBUFFERED=1 python scripts/bench_chunked.py [--minutes 5]
        [--model large-v3] [--quantize] [--kv-int8] [--skip-sequential]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=5.0)
    ap.add_argument("--model", default=None)
    ap.add_argument("--quantize", action="store_true")
    ap.add_argument("--kv-int8", action="store_true")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--tokens", type=int, default=110)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--skip-sequential", action="store_true")
    ap.add_argument(
        "--without-timestamps", action="store_true",
        help="disable timestamp decoding so every window advances its full "
        "30 s (random weights otherwise emit mid-window timestamps that "
        "force extra pinned-length decode rounds, hitting the chunked arm "
        "hardest: each chunk re-decodes its tail)")
    ap.add_argument(
        "--forced-ts", action="store_true",
        help="keep timestamp decoding ON but pin every window's committed "
        "tokens to a production-shaped sequence (leading timestamp, text, "
        "final full-window timestamp, EOT) via the benchmark-only "
        "DecodingTask._forced_tokens hook: per-step compute is unchanged, "
        "and BOTH arms advance one full window per round like a real "
        "checkpoint — the honest with-timestamps comparison")
    args = ap.parse_args()
    if args.forced_ts and args.without_timestamps:
        ap.error("--forced-ts and --without-timestamps are alternatives")

    import whisper_tpu  # noqa: F401  (attaches methods)
    from whisper_tpu.chunked import transcribe_chunked
    from whisper_tpu.models.dims import KNOWN_MODELS
    from whisper_tpu.models.whisper import Whisper, init_params

    platform = jax.devices()[0].platform
    print("platform:", platform, flush=True)
    model_name = args.model or ("large-v3" if platform == "tpu" else "tiny")
    dims = KNOWN_MODELS[model_name]
    dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
    params = init_params(dims, jax.random.PRNGKey(0), dtype)
    if args.quantize:
        from whisper_tpu.quantize import quantize_params

        params = quantize_params(params, ("encoder", "decoder"))
    model = Whisper(dims, params, dtype=dtype)

    seconds = args.minutes * 60.0
    rng = np.random.RandomState(0)
    audio = (rng.randn(int(16000 * seconds)) * 0.1 * 32768.0).astype(np.int16)

    kw = dict(
        language="en", temperature=0.0, sample_len=args.tokens,
        compression_ratio_threshold=None, logprob_threshold=None,
        no_speech_threshold=None,
        kv_cache_dtype="int8" if args.kv_int8 else None,
        without_timestamps=args.without_timestamps,
    )

    if args.forced_ts:
        from whisper_tpu.decoding import DecodingTask
        from whisper_tpu.tokenizer import get_tokenizer

        tok = get_tokenizer(
            model.is_multilingual, num_languages=model.num_languages,
            language="en", task="transcribe",
        )
        text = rng.randint(1000, 20000, size=max(args.tokens - 3, 1))
        DecodingTask._forced_tokens = np.asarray(
            [tok.timestamp_begin, *text, tok.timestamp_begin + 1500, tok.eot],
            np.int32,
        )

    def timed(label, fn):
        fn()  # warmup/compile
        best = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            fn()
            best.append(time.perf_counter() - t0)
        rtfs = sorted(seconds / t for t in best)
        med = rtfs[len(rtfs) // 2]
        print(f"{label:18s}: median {med:7.1f} RTF  (runs: "
              + ", ".join(f"{r:.1f}" for r in rtfs) + ")", flush=True)
        return med

    chunked = timed(
        "chunked b%d" % args.batch_size,
        lambda: transcribe_chunked(
            model, audio, batch_size=args.batch_size, **kw
        ),
    )
    if not args.skip_sequential:
        seq = timed(
            "sequential",
            lambda: model.transcribe(
                audio, condition_on_previous_text=False, verbose=None, **kw
            ),
        )
        print(f"speedup: {chunked / seq:.2f}x", flush=True)


if __name__ == "__main__":
    main()
