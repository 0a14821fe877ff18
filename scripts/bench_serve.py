#!/usr/bin/env python
"""Loopback load test of the HTTP serving path (serve.make_server).

N concurrent clients POST WAV bodies at a live loopback server: mostly short
(11 s) requests plus a few long (405 s) requests sent as chunked-parallel
(``?chunked=1``), the production mix a transcription service sees.  Reports
requests/s, audio-seconds/s (the serving RTF), p50/p99 latency per request
class, and batch occupancy (submitted items per dispatched device batch).

Random weights; decodes are pinned to production-shaped token sequences via
the benchmark-only forced-token hook (leading timestamp, text, final window
timestamp, EOT) so every window costs one full decode round with timestamp
rules active, exactly like a real checkpoint.  There is no reference analog
for any of this (openai/whisper has no serving daemon): the numbers quantify
this framework's beyond-reference serving claim on one chip.

    PYTHONUNBUFFERED=1 python scripts/bench_serve.py [--clients 24]
        [--short-requests 64] [--long-requests 2] [--batch-size 16]

``run_loadtest`` is the reusable core — bench.py's ``serve_loopback`` suite
row calls it so the loopback numbers land in the official driver artifact.
"""

import argparse
import json
import statistics  # noqa: F401  (kept for interactive use)
import struct
import sys
import threading
import time
import urllib.request

sys.path.insert(0, ".")


def wav_bytes(pcm16, rate: int = 16000) -> bytes:
    """Minimal PCM-s16le WAV container around ``pcm16``."""
    data = pcm16.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
    hdr += struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
    hdr += b"data" + struct.pack("<I", len(data))
    return hdr + data


def _pct(xs, q):
    if not xs:
        return float("nan")
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(round(q * (len(xs) - 1))))]


def run_loadtest(
    model_name=None,
    clients=24,
    short_requests=64,
    long_requests=2,
    long_seconds=405.0,
    batch_size=16,
    max_wait_s=0.25,
    tokens=110,
    quiet=False,
):
    """Stand up a loopback server on random weights, drive the client mix,
    return the result dict (serving RTF + latency percentiles).  The
    forced-token pin is scoped: cleared on every exit path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from whisper_tpu.decoding import DecodingTask
    from whisper_tpu.models.dims import KNOWN_MODELS
    from whisper_tpu.models.whisper import Whisper, init_params
    from whisper_tpu.serve import make_server
    from whisper_tpu.tokenizer import get_tokenizer

    def say(*a):
        if not quiet:
            print(*a, flush=True)

    platform = jax.devices()[0].platform
    say("platform:", platform)
    model_name = model_name or ("large-v3" if platform == "tpu" else "tiny")
    dims = KNOWN_MODELS[model_name]
    dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
    model = Whisper(
        dims, init_params(dims, jax.random.PRNGKey(0), dtype), dtype=dtype
    )

    tok = get_tokenizer(
        model.is_multilingual, num_languages=model.num_languages,
        language="en", task="transcribe",
    )
    rng = np.random.RandomState(0)
    text = rng.randint(1000, 20000, size=max(tokens - 3, 1))
    DecodingTask._forced_tokens = np.asarray(
        [tok.timestamp_begin, *text, tok.timestamp_begin + 1500, tok.eot],
        np.int32,
    )
    server = None
    try:
        server = make_server(
            model, host="127.0.0.1", port=0,
            batch_size=batch_size, max_wait_s=max_wait_s,
            language="en", temperature=0.0, sample_len=tokens,
            condition_on_previous_text=False,
            compression_ratio_threshold=None, logprob_threshold=None,
            no_speech_threshold=None,
        )
        batcher = server.batcher
        port = server.server_address[1]
        th = threading.Thread(target=server.serve_forever, daemon=True)
        th.start()
        base = f"http://127.0.0.1:{port}"

        short_body = wav_bytes(
            (rng.randn(16000 * 11) * 0.1 * 32768.0).astype(np.int16)
        )
        long_body = wav_bytes(
            (rng.randn(int(16000 * long_seconds)) * 0.1 * 32768.0).astype(
                np.int16
            )
        ) if long_requests else b""

        def post(path: str, body: bytes) -> dict:
            req = urllib.request.Request(
                base + path, data=body,
                headers={"Content-Type": "application/octet-stream"},
            )
            with urllib.request.urlopen(req, timeout=600) as resp:
                return json.loads(resp.read())

        # warmup: compile the engine program(s) before any clock starts
        say("warmup (compiles the serving engine variants)...")
        post("/transcribe", short_body)
        if long_requests:
            post("/transcribe?chunked=1", long_body)
        base_stats = dict(batcher.stats)

        lock = threading.Lock()
        lat = {"short": [], "long": []}
        errors = []

        # work queue: every client thread pulls the next request, so the
        # load is continuous (no lockstep waves) and the mix interleaves
        work = ["short"] * short_requests + ["long"] * long_requests
        rng.shuffle(work)
        qi = [0]

        def client():
            while True:
                with lock:
                    if qi[0] >= len(work):
                        return
                    kind = work[qi[0]]
                    qi[0] += 1
                t0 = time.perf_counter()
                try:
                    if kind == "short":
                        post("/transcribe", short_body)
                    else:
                        post("/transcribe?chunked=1", long_body)
                except Exception as exc:  # noqa: BLE001 — record and continue
                    with lock:
                        errors.append(f"{kind}: {type(exc).__name__}: {exc}")
                    continue
                dt = time.perf_counter() - t0
                with lock:
                    lat[kind].append(dt)

        threads = [threading.Thread(target=client) for _ in range(clients)]
        t_start = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t_start
        server.shutdown()
        batcher.close(drain=False)
        server = None
    finally:
        DecodingTask._forced_tokens = None
        if server is not None:
            server.shutdown()
            server.batcher.close(drain=False)

    n_short, n_long = len(lat["short"]), len(lat["long"])
    total_audio = n_short * 11.0 + n_long * long_seconds
    submitted = batcher.stats["requests"] - base_stats["requests"]
    batches = batcher.stats["batches"] - base_stats["batches"]

    say(f"clients {clients}, wall {wall:.2f} s, errors {len(errors)}")
    for e in errors[:5]:
        say("  error:", e)
    say(
        f"short ({n_short}x 11 s):  p50 {_pct(lat['short'], 0.5):.2f} s  "
        f"p99 {_pct(lat['short'], 0.99):.2f} s"
    )
    if n_long:
        say(
            f"long  ({n_long}x {long_seconds:.0f} s, chunked):  "
            f"p50 {_pct(lat['long'], 0.5):.2f} s  "
            f"p99 {_pct(lat['long'], 0.99):.2f} s"
        )
    say(
        f"throughput: {(n_short + n_long) / wall:.2f} req/s,  "
        f"{total_audio / wall:.1f} audio-s/s (serving RTF)"
    )
    if batches:
        say(
            f"batch occupancy: {submitted / batches:.1f} items/batch "
            f"({submitted} submissions over {batches} device batches, "
            f"batch_size {batch_size})"
        )
    return {
        "metric": "serve_loopback_rtf",
        "value": round(total_audio / wall, 1),
        "unit": "audio_sec_per_sec_per_chip",
        "req_per_s": round((n_short + n_long) / wall, 2),
        "p50_short_s": round(_pct(lat["short"], 0.5), 3),
        "p99_short_s": round(_pct(lat["short"], 0.99), 3),
        "p50_long_s": round(_pct(lat["long"], 0.5), 3) if n_long else None,
        "occupancy": round(submitted / batches, 2) if batches else None,
        "errors": len(errors),
        "error_tails": errors[:5],
        "n_requests": n_short + n_long,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None)
    ap.add_argument("--clients", type=int, default=24)
    ap.add_argument("--short-requests", type=int, default=64)
    ap.add_argument("--long-requests", type=int, default=2)
    ap.add_argument("--long-seconds", type=float, default=405.0)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--max-wait-s", type=float, default=0.25)
    ap.add_argument("--tokens", type=int, default=110)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    out = run_loadtest(
        model_name=args.model,
        clients=args.clients,
        short_requests=args.short_requests,
        long_requests=args.long_requests,
        long_seconds=args.long_seconds,
        batch_size=args.batch_size,
        max_wait_s=args.max_wait_s,
        tokens=args.tokens,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
