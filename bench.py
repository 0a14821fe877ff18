#!/usr/bin/env python
"""Benchmark: real-time factor of greedy segment decoding on one chip.

Measures the full serving path — log-mel front-end is excluded (negligible),
the measured jit program is encoder + prompt prefill + N autoregressive
decoder steps with logit filters, i.e. exactly what one 30-second window
costs during `transcribe`.

Metric: audio seconds transcribed per wall second per chip (RTF), batch of
independent 30-second windows, large-v3 shapes, bfloat16, a fixed 110-token
generation per window (a representative speech density; random weights don't
emit EOT, so the token count is pinned for comparability).

Baseline: the reference's README (README.md:62-71) publishes only *relative*
speeds on A100; community measurements of openai/whisper large-v3 greedy on
A100 cluster around 10x real-time single-stream.  vs_baseline is therefore
our RTF / 10.0 — the north star in BASELINE.json (>=8x A100) corresponds to
vs_baseline >= 8.
"""

import argparse
import json
import time

import numpy as np

A100_LARGE_V3_RTF = 10.0


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default=None, help="model name (default: by platform)")
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--tokens", type=int, default=110)
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument(
        "--quantize", default=None, choices=[None, "int8", "int8+logits"]
    )
    parser.add_argument(
        "--quantize-scope", default="all", choices=["all", "decoder"],
        help="decoder: leave encoder weights bf16.  Measured NO better than "
        "all-int8 at b16 (278-281 vs 280-297 RTF) despite the int8 encoder "
        "matmuls profiling slower per-op — kept for experiments",
    )
    parser.add_argument("--beam", type=int, default=0, help="beam size (0 = greedy)")
    parser.add_argument(
        "--kv-int8", action="store_true",
        help="int8 cross-KV cache (DecodingOptions.kv_cache_dtype)",
    )
    parser.add_argument(
        "--e2e", action="store_true",
        help="measure transcribe_batch end-to-end (mel + decode + segmentation) "
        "on synthetic 30s audio instead of the bare engine",
    )
    parser.add_argument(
        "--word-timestamps", action="store_true",
        help="with --e2e: include the word-timing alignment pass "
        "(teacher-forced QK forward + median filter + DTW + word splitting)",
    )
    parser.add_argument(
        "--draft", default=None, choices=[None, "self", "turbo"],
        help="speculative decoding draft: 'turbo' = large-v3-turbo-shaped "
        "draft (random weights -> ~zero acceptance: the overhead floor), "
        "'self' = target drafts for itself (acceptance sanity, not a perf "
        "ceiling — the draft costs as much as the target)",
    )
    parser.add_argument("--draft-len", type=int, default=4)
    parser.add_argument(
        "--force-accept", action="store_true",
        help="benchmark-only: pretend every draft token matched, measuring "
        "the all-accept wall-clock ceiling (outputs are meaningless)",
    )
    args = parser.parse_args()
    if args.word_timestamps and not args.e2e:
        parser.error("--word-timestamps only measures anything with --e2e")

    import jax
    import jax.numpy as jnp

    # persistent compilation cache: first-compile of the large engines takes
    # minutes over the TPU tunnel; cached recompiles are seconds
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    import whisper_tpu  # noqa: F401  (attaches methods)
    from whisper_tpu.decoding import DecodingOptions, DecodingTask
    from whisper_tpu.models.dims import KNOWN_MODELS
    from whisper_tpu.models.whisper import Whisper, init_params

    platform = jax.devices()[0].platform
    model_name = args.model or ("large-v3" if platform == "tpu" else "tiny")
    dims = KNOWN_MODELS[model_name]
    dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32

    params = init_params(dims, jax.random.PRNGKey(0), dtype)
    if args.quantize:
        from whisper_tpu.quantize import quantize_params

        scopes = ("encoder", "decoder") if args.quantize_scope == "all" else ("decoder",)
        params = quantize_params(
            params, scopes, logits=args.quantize == "int8+logits"
        )
    model = Whisper(dims, params, dtype=dtype)

    draft_model = None
    if args.draft == "self":
        draft_model = model
    elif args.draft == "turbo":
        ddims = KNOWN_MODELS["large-v3-turbo"]
        draft_model = Whisper(
            ddims, init_params(ddims, jax.random.PRNGKey(1), dtype), dtype=dtype
        )

    rng = np.random.RandomState(0)
    mel = rng.randn(args.batch, dims.n_mels, 3000).astype(np.float32) * 0.3

    metric = (
        f"rtf_{model_name.replace('-', '_')}_"
        + (f"beam{args.beam}" if args.beam else "greedy")
        + f"_b{args.batch}"
        + ("_int8" if args.quantize == "int8" else "")
        + ("_int8lg" if args.quantize == "int8+logits" else "")
        + ("_dec" if args.quantize and args.quantize_scope == "decoder" else "")
        + ("_kvint8" if args.kv_int8 else "")
        + (f"_draft_{args.draft}{args.draft_len}" if args.draft else "")
        + ("_forceacc" if args.force_accept else "")
        + ("_e2e" if args.e2e else "")
        + ("_words" if args.word_timestamps else "")
    )
    kv_dtype = "int8" if args.kv_int8 else None

    if args.e2e:
        # the product path: transcribe_batch on `batch` synthetic 30 s files —
        # includes device mel, encoder, engine, host segmentation.  sample_len
        # pinned as in the engine bench (random weights never emit EOT).
        from whisper_tpu.batch import transcribe_batch

        audios = [
            (rng.randn(16000 * 30) * 0.1).astype(np.float32)
            for _ in range(args.batch)
        ]
        kw = dict(
            batch_size=args.batch, language="en", temperature=0.0,
            sample_len=args.tokens, beam_size=args.beam or None,
            kv_cache_dtype=kv_dtype, condition_on_previous_text=False,
            compression_ratio_threshold=None, logprob_threshold=None,
            no_speech_threshold=None,
            word_timestamps=args.word_timestamps,
        )
        # (word timing uses Whisper's default alignment heads — the upper
        # half of decoder layers — since random weights carry no dump)
        if draft_model is not None:
            kw["draft_model"] = draft_model
        transcribe_batch(model, audios, **kw)  # warmup/compile
        times = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            results = transcribe_batch(model, audios, **kw)
            times.append(time.perf_counter() - t0)
        best = min(times)
        audio_seconds = args.batch * 30.0
    else:
        options = DecodingOptions(
            language="en", task="transcribe", temperature=0.0,
            sample_len=args.tokens, beam_size=args.beam or None,
            kv_cache_dtype=kv_dtype, draft_len=args.draft_len,
        )
        task = DecodingTask(model, options, draft_model=draft_model)
        if args.force_accept:
            task._force_accept = True

        # warmup/compile
        task.run(jnp.asarray(mel))

        times = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            results = task.run(jnp.asarray(mel))
            times.append(time.perf_counter() - t0)
        best = min(times)
        audio_seconds = args.batch * 30.0

    rtf = audio_seconds / best
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(rtf, 2),
                "unit": "audio_sec_per_sec_per_chip",
                "vs_baseline": round(rtf / A100_LARGE_V3_RTF, 3),
            }
        )
    )
    return results


if __name__ == "__main__":
    main()
