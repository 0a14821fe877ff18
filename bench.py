#!/usr/bin/env python
"""Benchmark: real-time factor of greedy segment decoding on one chip.

Measures the full serving path — log-mel front-end is excluded (negligible),
the measured jit program is encoder + prompt prefill + N autoregressive
decoder steps with logit filters, i.e. exactly what one 30-second window
costs during `transcribe` (`--e2e` measures transcribe_batch instead).

Metric: audio seconds transcribed per wall second per chip (RTF), batch of
independent 30-second windows, large-v3 shapes, bfloat16, a fixed 110-token
generation per window (a representative speech density; random weights don't
emit EOT, so the token count is pinned for comparability).

Default (no flags): a SUITE of the configurations the judged verdict tracks
— b1 bf16 (fused-step kernel), b1 int8+kv-int8, b16 bf16, b16
int8+kv-int8, beam-5 b1/b8, turbo/tiny b16, e2e b16 (single group and a
64-file prefetch-pipelined stream), words mode, and one chunked 6.75-minute
file (with and without timestamps) — each timed ``--repeats`` times with
median/min/max reported.  Contention handling: every row is bracketed by an
HBM-bandwidth probe; a row whose probe (a PHYSICAL measurement, never the
row's own RTF) drops below 85% of the session's best re-runs up to twice,
and rows that stayed contended are flagged "contended" in the output.  The
single JSON line keeps the driver contract (metric/value/unit/vs_baseline =
the b16 bf16 headline) and carries the full rows under "rows".

Baseline: the reference's README (README.md:62-71) publishes only *relative*
speeds on A100; community measurements of openai/whisper large-v3 greedy on
A100 cluster around 10x real-time single-stream.  vs_baseline is therefore
our RTF / 10.0 — the north star in BASELINE.json (>=8x A100) corresponds to
vs_baseline >= 8.
"""

import argparse
import contextlib
import gc
import json
import statistics
import sys
import time
import traceback

import numpy as np

A100_LARGE_V3_RTF = 10.0

SUITE = [
    # (row name, config)  — large-v3 unless model says otherwise
    ("b1_bf16", dict(batch=1)),
    ("b1_int8_kvint8", dict(batch=1, quantize="int8", kv_int8=True)),
    ("b16_bf16", dict(batch=16)),
    ("b16_int8_kvint8", dict(batch=16, quantize="int8", kv_int8=True)),
    # the reference CLI's default config: beam_size=5, one file
    ("beam5_b1", dict(batch=1, beam=5)),
    ("beam5_b1_int8_kvint8", dict(batch=1, beam=5, quantize="int8", kv_int8=True)),
    ("beam5_b8", dict(batch=8, beam=5)),
    # the reference's published model-speed table spans tiny..turbo
    # (reference README.md:66-71); cover its recommended model and the
    # smallest one alongside the large-v3 rows
    ("turbo_b16", dict(batch=16, model_name="large-v3-turbo")),
    ("tiny_b16", dict(batch=16, model_name="tiny")),
    # end-to-end transcribe_batch rows decode FORCED production-shaped token
    # sequences (leading timestamp, text, final window timestamp, EOT) with
    # timestamp rules ACTIVE: every per-step computation still runs — only
    # the committed token is pinned (engine._greedy_update) — so segmentation
    # advances a full window per round exactly as real checkpoints do.
    # Random weights otherwise emit mid-window timestamps whose partial seek
    # advances re-decode each window's tail, an artifact real checkpoints
    # don't have (docs/BENCHMARKS.md).
    ("e2e_b16", dict(batch=16, e2e=True, forced="ts")),
    # a 64-file stream at the same batch: groups prefetch-pipelined
    # (transcribe_batch overlaps group k+1's audio decode + upload + mel
    # with group k's engine rounds) — the steady-state serving shape
    ("e2e_b16_stream64", dict(batch=16, e2e=True, n_files=64, forced="ts")),
    # words mode (reference --word_timestamps, config #4): forced tokens +
    # word_seek_refinement=False pin round count (random-weight alignments
    # put word ends anywhere in the window, so refinement's rewind — whose
    # cost on real checkpoints is near zero — would dominate); measures the
    # alignment pipeline (teacher-forced QK forward, median, DTW, words)
    ("words_b16", dict(batch=16, e2e=True, word_timestamps=True, forced="ts")),
    # ONE long file, chunked-parallel (transcribe_chunked) — the sequential
    # reference loop runs this at b1 throughput; chunking batches it.
    # 405 s -> exactly 16 chunks at the default 5 s overlap: the one-round
    # case with no padding rows.  Two rows: the legacy without_timestamps
    # pin (round-3 comparable) and the production default — timestamps ON,
    # round count pinned by the forced final-window timestamp instead.
    ("e2e_chunked_405s", dict(chunked_minutes=6.75, without_timestamps=True)),
    ("e2e_chunked_405s_ts", dict(chunked_minutes=6.75, forced="ts")),
    # HTTP serving path: loopback load test (scripts/bench_serve.py core) —
    # 16 concurrent clients, 48 short (11 s) + 1 long chunked (405 s)
    # requests against a live server.  One measurement (a load test is its
    # own aggregate); extras carry req/s and latency percentiles.
    ("serve_loopback", dict(serve=True)),
]
HEADLINE_ROW = "b16_bf16"


def _memory_probe_gbps():
    """Rough HBM bandwidth probe: a large bf16 stream, best of 3."""
    import jax
    import jax.numpy as jnp

    # random data (constant inputs constant-fold into bogus-fast DMA) and
    # sync via a scalar fetch: block_until_ready is a NO-OP on the remote
    # axon attachment, so only materializing a value on the host waits.
    n = 4096
    reps = 8
    x = jnp.asarray(np.random.RandomState(0).randn(n, n), jnp.bfloat16)
    f = jax.jit(lambda a: a * 1.0009 + 0.1)
    sync = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))
    float(sync(f(x)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        y = x
        for _ in range(reps):
            y = f(y)
        float(sync(y))
        best = min(best, time.perf_counter() - t0)
    return round(reps * 2 * x.size * 2 / best / 1e9, 1)


def run_config(
    model_name=None,
    batch=16,
    tokens=110,
    repeats=3,
    quantize=None,
    quantize_scope="all",
    beam=0,
    kv_int8=False,
    e2e=False,
    word_timestamps=False,
    draft=None,
    draft_len=4,
    force_accept=False,
    chunked_minutes=None,
    without_timestamps=False,
    n_files=None,
    forced=None,
    serve=False,
):
    """Build the model, compile, time `repeats` runs; returns (metric, [s]).

    ``forced="ts"``: pin every greedy decode to a production-shaped token
    sequence — ``<|0.00|>``, ``tokens-3`` text tokens, a final
    full-window timestamp, EOT — via the benchmark-only
    ``DecodingTask._forced_tokens`` hook.  All per-step compute still runs;
    only the committed token is pinned, so random weights decode with the
    seek/segmentation behavior of a real checkpoint (one round per window,
    timestamp rules active).

    ``n_files`` (e2e only): number of 30 s files in the stream; defaults to
    ``batch`` (one engine group).  More files than ``batch`` exercises
    transcribe_batch's prefetch-pipelined grouping.
    """
    import jax
    import jax.numpy as jnp

    import whisper_tpu  # noqa: F401  (attaches methods)
    from whisper_tpu.decoding import DecodingOptions, DecodingTask
    from whisper_tpu.models.dims import KNOWN_MODELS
    from whisper_tpu.models.whisper import Whisper, init_params

    if serve:
        # loopback HTTP load test (the serving path's official row); one
        # measurement — the load test is already an aggregate over requests
        import os as _os
        import sys as _sys

        _sys.path.insert(
            0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "scripts")
        )
        from bench_serve import run_loadtest

        out = run_loadtest(
            model_name=model_name, clients=16, short_requests=48,
            long_requests=1, long_seconds=405.0, batch_size=batch,
            tokens=tokens, quiet=True,
        )
        if out["errors"]:
            # failed requests deflate the serving RTF silently (total audio
            # counts successes, wall time counts everything) — that is a
            # FAILED row under the per-row fault-isolation contract, not a
            # measurement
            raise RuntimeError(
                f"serve_loopback: {out['errors']} of "
                f"{out['errors'] + out['n_requests']} requests failed: "
                f"{out['error_tails'][:3]}"
            )
        extras = {
            k: out[k]
            for k in (
                "req_per_s", "p50_short_s", "p99_short_s", "p50_long_s",
                "occupancy", "errors",
            )
        }
        return out["metric"], [out["value"]], extras

    platform = jax.devices()[0].platform
    model_name = model_name or ("large-v3" if platform == "tpu" else "tiny")
    dims = KNOWN_MODELS[model_name]
    dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32

    params = init_params(dims, jax.random.PRNGKey(0), dtype)
    if quantize:
        from whisper_tpu.quantize import quantize_params

        scopes = ("encoder", "decoder") if quantize_scope == "all" else ("decoder",)
        params = quantize_params(params, scopes, logits=quantize == "int8+logits")
    model = Whisper(dims, params, dtype=dtype)

    draft_model = None
    if draft == "self":
        draft_model = model
    elif draft == "turbo":
        ddims = KNOWN_MODELS["large-v3-turbo"]
        draft_model = Whisper(
            ddims, init_params(ddims, jax.random.PRNGKey(1), dtype), dtype=dtype
        )

    rng = np.random.RandomState(0)

    metric = (
        f"rtf_{model_name.replace('-', '_')}_"
        + (f"beam{beam}" if beam else "greedy")
        + f"_b{batch}"
        + ("_int8" if quantize == "int8" else "")
        + ("_int8lg" if quantize == "int8+logits" else "")
        + ("_dec" if quantize and quantize_scope == "decoder" else "")
        + ("_kvint8" if kv_int8 else "")
        + (f"_draft_{draft}{draft_len}" if draft else "")
        + ("_forceacc" if force_accept else "")
        + ("_e2e" if e2e else "")
        + (f"_n{n_files}" if n_files else "")
        + ("_words" if word_timestamps else "")
        + ("_forcedts" if forced else "")
    )
    kv_dtype = "int8" if kv_int8 else None

    if forced not in (None, "ts"):
        raise ValueError(f"unknown forced mode: {forced!r}")
    # scope the benchmark-only class-level pin to this configuration: an
    # exception mid-row must not leak forced tokens into the next row
    # (DecodingTask._forced_tokens is action-at-a-distance by design — the
    # context manager is what contains it)
    with contextlib.ExitStack() as _stack:
        _stack.callback(setattr, DecodingTask, "_forced_tokens", None)
        if forced == "ts":
            from whisper_tpu.tokenizer import get_tokenizer

            tok = get_tokenizer(
                model.is_multilingual, num_languages=model.num_languages,
                language="en", task="transcribe",
            )
            text = rng.randint(1000, 20000, size=max(tokens - 3, 1))
            DecodingTask._forced_tokens = np.asarray(
                [tok.timestamp_begin, *text, tok.timestamp_begin + 1500, tok.eot],
                np.int32,
            )
        else:
            # clear any pin a previous (crashed) process state installed
            DecodingTask._forced_tokens = None
        return _run_timed(
            model, model_name, dims, batch, tokens, repeats, beam, kv_dtype,
            e2e, word_timestamps, draft_model, draft_len, force_accept,
            chunked_minutes, without_timestamps, n_files, forced, rng, metric,
        )


def _run_timed(
    model, model_name, dims, batch, tokens, repeats, beam, kv_dtype, e2e,
    word_timestamps, draft_model, draft_len, force_accept, chunked_minutes,
    without_timestamps, n_files, forced, rng, metric,
):
    import jax
    import jax.numpy as jnp

    from whisper_tpu.decoding import DecodingOptions, DecodingTask

    if chunked_minutes:
        # ONE long file through transcribe_chunked: fixed overlapping 30 s
        # chunks decoded as a batch, segments stitched at overlap midpoints
        from whisper_tpu.chunked import transcribe_chunked

        seconds = chunked_minutes * 60.0
        metric = (
            f"rtf_{model_name.replace('-', '_')}_chunked{chunked_minutes:g}m"
            + ("_nots" if without_timestamps else "")
            + ("_forcedts" if forced else "")
        )
        audio = (rng.randn(int(16000 * seconds)) * 0.1 * 32768.0).astype(np.int16)
        kw = dict(
            batch_size=batch, language="en", temperature=0.0,
            sample_len=tokens, kv_cache_dtype=kv_dtype,
            compression_ratio_threshold=None, logprob_threshold=None,
            no_speech_threshold=None, without_timestamps=without_timestamps,
        )
        transcribe_chunked(model, audio, **kw)  # warmup/compile
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            transcribe_chunked(model, audio, **kw)
            times.append(time.perf_counter() - t0)
        return metric, [seconds / t for t in times]

    if e2e:
        # the product path: transcribe_batch on `batch` synthetic 30 s files —
        # includes device mel, encoder, engine, host segmentation.  sample_len
        # pinned as in the engine bench (random weights never emit EOT).
        from whisper_tpu.batch import transcribe_batch

        # 16-bit-quantized waveforms, like every real audio input (ffmpeg
        # decodes to s16le; WAV/FLAC sources are 16-bit) — exercises the
        # int16 transfer path the product uses
        audios = [
            (rng.randn(16000 * 30) * 0.1 * 32768.0).astype(np.int16)
            for _ in range(n_files or batch)
        ]
        kw = dict(
            batch_size=batch, language="en", temperature=0.0,
            sample_len=tokens, beam_size=beam or None,
            kv_cache_dtype=kv_dtype, condition_on_previous_text=False,
            compression_ratio_threshold=None, logprob_threshold=None,
            no_speech_threshold=None,
            word_timestamps=word_timestamps,
        )
        if word_timestamps and forced:
            # pin round count: random-weight alignments put word ends
            # anywhere in the window, so the reference's seek-to-last-word
            # rewind (near-free on real checkpoints) would re-decode most of
            # every window; the alignment pipeline itself is what this
            # configuration measures
            kw["word_seek_refinement"] = False
        if word_timestamps:
            # real checkpoints always carry an alignment-head dump (e.g.
            # large-v3 selects 10 of 640 heads); random weights would fall
            # back to the upper-half default (320 heads at large-v3), making
            # the QK pipeline 32x the product configuration.  Bench what a
            # real model runs.
            from whisper_tpu import _ALIGNMENT_HEADS

            if model_name in _ALIGNMENT_HEADS:
                model.set_alignment_heads(_ALIGNMENT_HEADS[model_name])
        if draft_model is not None:
            kw["draft_model"] = draft_model
        transcribe_batch(model, audios, **kw)  # warmup/compile
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            transcribe_batch(model, audios, **kw)
            times.append(time.perf_counter() - t0)
    else:
        mel = rng.randn(batch, dims.n_mels, 3000).astype(np.float32) * 0.3
        options = DecodingOptions(
            language="en", task="transcribe", temperature=0.0,
            sample_len=tokens, beam_size=beam or None,
            kv_cache_dtype=kv_dtype, draft_len=draft_len,
        )
        task = DecodingTask(model, options, draft_model=draft_model)
        if force_accept:
            task._force_accept = True

        # stage the mel on device ONCE: this row measures the ENGINE
        # (encoder + prefill + token loop), as documented above — re-sending
        # the f32 mel every run would bill ~0.8 s of remote-tunnel transfer
        # (24 MB at ~30 MB/s, b16) to the engine.  The e2e rows measure the
        # real input path (int16 audio upload + on-device mel) instead.
        mel_dev = jax.device_put(jnp.asarray(mel))
        task.run(mel_dev)  # warmup/compile
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            task.run(mel_dev)
            times.append(time.perf_counter() - t0)

    audio_seconds = (n_files or batch) * 30.0 if e2e else batch * 30.0
    return metric, [audio_seconds / t for t in times]


def _row_entry(metric, rtfs):
    med = statistics.median(rtfs)
    return {
        "metric": metric,
        "median": round(med, 2),
        "min": round(min(rtfs), 2),
        "max": round(max(rtfs), 2),
        "runs": len(rtfs),
        "vs_baseline": round(med / A100_LARGE_V3_RTF, 3),
    }


def run_suite(repeats):
    # Contention handling: the chip is shared (multi-tenant) and reached over
    # a remote tunnel; a noisy neighbor can halve every number for minutes at
    # a time.  The criterion for re-running a row is PHYSICAL — the HBM
    # bandwidth probe before/after the row — never the row's own RTF value,
    # so a slow engine can't be laundered into a fast number by retrying.
    probe_before = _memory_probe_gbps()
    best = {"gbps": max(probe_before, _memory_probe_gbps())}
    CONTENDED = 0.85  # probe below this fraction of the session's best

    def probed_row(name, cfg):
        attempts = []
        for attempt in range(3):
            p0 = _memory_probe_gbps()
            res = run_config(repeats=repeats, **cfg)
            metric, rtfs = res[0], res[1]
            extras = res[2] if len(res) > 2 else None
            if len(rtfs) > 1 and max(rtfs) > 1.25 * min(rtfs):
                rtfs = rtfs + run_config(repeats=2, **cfg)[1]
            p1 = _memory_probe_gbps()
            best["gbps"] = max(best["gbps"], p0, p1)
            contended = min(p0, p1) < CONTENDED * best["gbps"]
            attempts.append((metric, rtfs, extras, p0, p1, contended))
            if not contended:
                break
            time.sleep(5.0)
        # prefer the first probe-clean attempt; if every attempt was
        # contended, report the best-probed one and say so
        clean = [a for a in attempts if not a[5]]
        metric, rtfs, extras, p0, p1, contended = (
            clean[0] if clean else max(attempts, key=lambda a: min(a[3], a[4]))
        )
        row = {"row": name, **_row_entry(metric, rtfs)}
        if extras:
            row.update(extras)
        row["probe_gbps"] = [p0, p1]
        if contended:
            row["contended"] = True
        return row

    # Per-row fault isolation: one row's failure (a kernel that stops
    # compiling on a new toolchain, an OOM, a serving port clash) must not
    # discard the rows already measured — BENCH_r04 lost a full round's
    # numbers to exactly that.  Failed rows carry an "error" tail; the
    # headline comes from the designated row if it survived, else the best
    # surviving row; the process exits 0 if ANYTHING was measured.
    rows = []
    headline = None
    for i, (name, cfg) in enumerate(SUITE):
        # Per-row heartbeat on stderr: if the PROCESS dies hard mid-suite
        # (driver timeout, host OOM kill) the per-row try/except below never
        # gets to report, but the driver's captured output tail still shows
        # every finished row and which row was in flight.
        print(f"[suite {i + 1}/{len(SUITE)}] {name} ...",
              file=sys.stderr, flush=True)
        try:
            row = probed_row(name, cfg)
        except Exception:
            tail = traceback.format_exc().strip().splitlines()
            row = {"row": name, "error": " | ".join(tail[-4:])[:800]}
            # a crashed row can leave poisoned jit caches on the live
            # backend; the next row compiles fresh programs anyway
        print(f"[suite {i + 1}/{len(SUITE)}] {json.dumps(row)}",
              file=sys.stderr, flush=True)
        rows.append(row)
        if name == HEADLINE_ROW and "error" not in row:
            headline = row
        gc.collect()
    probe_after = _memory_probe_gbps()

    measured = [r for r in rows if "error" not in r]
    if headline is None and measured:
        # the fallback headline must stay COMPARABLE to the designated row:
        # vs_baseline is "x the A100 large-v3 reference", so a tiny/turbo
        # row surviving a large-v3 crash must not publish a ~400x headline
        # a driver would read against the >=8x north star.  Prefer
        # surviving large-v3 rows in suite order; only if NONE survived
        # fall back to the best remaining row (and say so).
        comparable = [
            r for r in measured
            if "large_v3" in r["metric"] and "turbo" not in r["metric"]
        ]
        headline = (
            comparable[0] if comparable
            else max(measured, key=lambda r: r["vs_baseline"])
        )
    out = {
        "rows": rows,
        "errors": len(rows) - len(measured),
        "probe_gbps": {"before": probe_before, "after": probe_after},
    }
    if headline is not None:
        out = {
            "metric": headline["metric"],
            "value": headline["median"],
            "unit": "audio_sec_per_sec_per_chip",
            "vs_baseline": headline["vs_baseline"],
            **out,
        }
        if "error" in rows[[r["row"] for r in rows].index(HEADLINE_ROW)]:
            out["headline_note"] = (
                f"{HEADLINE_ROW} failed; headline is the best surviving row"
            )
    print(json.dumps(out))
    return 0 if measured else 1


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--single", action="store_true",
        help="run ONE configuration from the flags below instead of the suite",
    )
    parser.add_argument("--model", default=None, help="model name (default: by platform)")
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--tokens", type=int, default=110)
    parser.add_argument("--repeats", type=int, default=None,
                        help="timed runs (default: 5 suite, 3 single)")
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
    parser.add_argument(
        "--n-files", type=int, default=None,
        help="with --e2e: stream length in 30 s files (default: --batch); "
        "more files than --batch exercises the prefetch-pipelined grouping",
    )
    parser.add_argument(
        "--forced", default=None, choices=[None, "ts"],
        help="pin greedy decodes to a production-shaped token sequence "
        "(leading timestamp, text, final window timestamp, EOT) via the "
        "benchmark-only DecodingTask._forced_tokens hook — every per-step "
        "computation still runs, but segmentation/seek behaves as with a "
        "real checkpoint (one round per window, timestamp rules active)",
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
    # any config flag implies --single: silently benchmarking the whole
    # suite while ignoring the flags the user typed is a foot-gun
    defaults = dict(
        model=None, batch=16, tokens=110, quantize=None, beam=0,
        kv_int8=False, e2e=False, word_timestamps=False, draft=None,
        draft_len=4, force_accept=False, n_files=None, forced=None,
    )
    if any(getattr(args, k) != v for k, v in defaults.items()):
        args.single = True

    import jax

    # persistent compilation cache: first-compile of the large engines takes
    # minutes over the TPU tunnel; cached recompiles are seconds
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    if not args.single:
        sys.exit(run_suite(repeats=args.repeats or 5))

    metric, rtfs = run_config(
        model_name=args.model,
        batch=args.batch,
        tokens=args.tokens,
        repeats=args.repeats or 3,
        quantize=args.quantize,
        quantize_scope=args.quantize_scope,
        beam=args.beam,
        kv_int8=args.kv_int8,
        e2e=args.e2e,
        word_timestamps=args.word_timestamps,
        draft=args.draft,
        draft_len=args.draft_len,
        force_accept=args.force_accept,
        n_files=args.n_files,
        forced=args.forced,
    )
    best = max(rtfs)
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(best, 2),
                "unit": "audio_sec_per_sec_per_chip",
                "vs_baseline": round(best / A100_LARGE_V3_RTF, 3),
                **_row_entry(metric, rtfs),
            }
        )
    )


if __name__ == "__main__":
    main()
