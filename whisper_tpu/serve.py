"""Dynamic-batching transcription server.

No reference analog (openai/whisper is a library + one-file-at-a-time CLI,
reference whisper/transcribe.py:517-619); this is the serving layer a
TPU deployment actually needs: the decode loop is HBM-bandwidth-bound, so
cost-per-audio-second falls almost linearly with batch size until ~16
(docs/BENCHMARKS.md) — a server must therefore coalesce concurrent
requests into fixed-shape ``transcribe_batch`` calls rather than decode
them one by one.

Two layers:

- :class:`BatchingTranscriber` — in-process request coalescing.  ``submit``
  returns a Future; a worker thread groups compatible requests (same
  decode options) into batches of up to ``batch_size``, waiting at most
  ``max_wait_s`` after the first request of a group before dispatching a
  partial batch.  Engine compiles are shape-bucketed, so a partial batch
  still reuses the full-batch program (transcribe_batch pads rows).
- :func:`serve` / ``python -m whisper_tpu.serve`` — a stdlib ThreadingHTTP
  front-end: ``POST /v1/audio/transcriptions`` with the audio file as the
  request body (WAV/FLAC natively; anything ffmpeg reads when available),
  options as query parameters; ``GET /healthz`` for liveness.
"""

import argparse
import json
import os
import tempfile
import threading
import time
from collections import OrderedDict, deque
from concurrent.futures import Future
from concurrent.futures import TimeoutError as FutureTimeoutError
from typing import Any, Dict, List, Optional

import numpy as np

__all__ = ["BatchingTranscriber", "make_server", "serve"]


def _freeze(v):
    """Hashable stand-in for an option value (lists/tuples -> tuples).

    Frozen values round-trip into transcribe() via dict(key): every
    list-valued transcribe option (temperature ladder, clip_timestamps)
    accepts a tuple equally.
    """
    if isinstance(v, (list, tuple)):
        return tuple(_freeze(x) for x in v)
    return v


class BatchingTranscriber:
    """Coalesces concurrent transcription requests into device batches.

    ``mesh``: an optional ``jax.sharding.Mesh`` — the model's parameters are
    resharded over it once (Megatron rules, parallel/sharding.py) and every
    batch dispatch runs under the mesh so GSPMD shards the decode over the
    chips.  Per-request results are identical to single-device serving
    (validated on a virtual 8-device mesh in tests/test_serve.py; real
    multi-chip hardware has not been exercised — docs/PARITY.md).

    ``submit(..., priority=True)`` puts a request in the priority lane: it
    is batched ahead of every queued normal request (same options group),
    and groups with priority work are dispatched first.
    """

    def __init__(
        self,
        model,
        batch_size: int = 16,
        max_wait_s: float = 0.25,
        mesh=None,
        **transcribe_options,
    ):
        from .batch import transcribe_batch  # local import: avoid cycles

        self._transcribe_batch = transcribe_batch
        self.mesh = mesh
        if mesh is not None:
            from .models.whisper import Whisper
            from .parallel import shard_params

            with mesh:
                sharded = Whisper(model.dims, shard_params(model.params, mesh))
            sharded.dtype = model.dtype
            sharded.alignment_heads = model.alignment_heads
            model = sharded
        self.model = model
        self.batch_size = int(batch_size)
        self.max_wait_s = float(max_wait_s)
        self.defaults = transcribe_options
        # option-key -> {"p": priority deque, "n": normal deque} of
        # (audio, future, enqueue_time); key insertion order approximates
        # request order across groups
        self._groups: "OrderedDict[tuple, Dict[str, deque]]" = OrderedDict()
        self._cv = threading.Condition()
        self._closed = False
        # when the engine last became free: the batch-fill wait window is
        # measured from max(oldest request, engine free), so requests that
        # queued DURING a decode still get max_wait_s to coalesce with the
        # re-sends of the clients that decode just answered (without this,
        # their deadline expires inside the decode and the next batch
        # dispatches part-full an instant before those re-sends arrive —
        # measured occupancy 9/16 on the closed-loop load test)
        self._engine_free_t = 0.0
        self.stats: Dict[str, int] = {"requests": 0, "batches": 0, "errors": 0}
        self._worker = threading.Thread(
            target=self._run, name="whisper-tpu-batcher", daemon=True
        )
        self._worker.start()

    # -- client API ---------------------------------------------------------

    def submit(self, audio, priority: bool = False, **overrides) -> Future:
        """Queue one audio (float32 PCM @16 kHz, or a file path) for
        transcription; returns a Future resolving to the transcribe() dict."""
        fut: Future = Future()
        # overrides equal to the server defaults don't fragment batching:
        # submit(x) and submit(x, temperature=T_default) share a group
        overrides = {
            k: v
            for k, v in overrides.items()
            if not (k in self.defaults and self.defaults[k] == v)
        }
        # list-valued options (temperature ladder, clip_timestamps) are
        # unhashable; freeze them so the group key can be a dict key
        key = tuple(sorted((k, _freeze(v)) for k, v in overrides.items()))
        with self._cv:
            if self._closed:
                raise RuntimeError("BatchingTranscriber is closed")
            lanes = self._groups.setdefault(
                key, {"p": deque(), "n": deque()}
            )
            lanes["p" if priority else "n"].append((audio, fut, time.monotonic()))
            self.stats["requests"] += 1
            self._cv.notify()
        return fut

    def transcribe(self, audio, timeout: Optional[float] = None, **overrides):
        """Synchronous convenience wrapper over submit()."""
        return self.submit(audio, **overrides).result(timeout)

    def submit_chunk_futures(
        self, audio, chunk_overlap: float = 5.0, priority: bool = False,
        **overrides,
    ):
        """Split ONE long audio into fixed overlapping 30 s chunks and queue
        each as its own request; returns ``(offsets_sec, futures)``.

        The chunks share one options group, so they coalesce into the same
        device batches as each other (and as any concurrent requests with
        the same options).  Ownership boundaries are fixed by the offsets
        (chunked.owned_segments), so a caller can emit chunk i's stitched
        segments as soon as futures[i] resolves — no waiting on neighbors.
        """
        from .audio import SAMPLE_RATE, load_audio
        from .chunked import chunk_offsets, detect_file_language

        if overrides.pop("condition_on_previous_text", False):
            raise ValueError(
                "chunked requests decode chunks independently; "
                "condition_on_previous_text=True requires a non-chunked request"
            )
        wave = load_audio(audio) if isinstance(audio, str) else np.asarray(audio)
        if wave.ndim != 1:
            wave = wave.reshape(-1)
        language = overrides.get("language", self.defaults.get("language"))
        if language is None:
            language = detect_file_language(self.model, wave)
        offsets = chunk_offsets(wave.shape[0], chunk_overlap)
        chunk_samples = 30 * SAMPLE_RATE
        futures = [
            self.submit(
                wave[o : o + chunk_samples],
                priority=priority,
                condition_on_previous_text=False,
                language=language,
                **{k: v for k, v in overrides.items() if k != "language"},
            )
            for o in offsets
        ]
        return [o / SAMPLE_RATE for o in offsets], futures

    def submit_chunked(
        self, audio, chunk_overlap: float = 5.0, priority: bool = False,
        **overrides,
    ) -> Future:
        """Queue one long audio as parallel chunks; returns a Future of the
        stitched ``{"text", "segments", "language"}`` dict (the
        ``transcribe_chunked`` result shape)."""
        from .chunked import merge_chunk_segments

        offsets_sec, futures = self.submit_chunk_futures(
            audio, chunk_overlap=chunk_overlap, priority=priority, **overrides
        )
        out: Future = Future()
        lock = threading.Lock()
        remaining = [len(futures)]

        def _done(_):
            with lock:
                remaining[0] -= 1
                if remaining[0] > 0:
                    return
            try:
                results = [f.result() for f in futures]
                if len(results) == 1:
                    merged = results[0]["segments"]
                else:
                    merged = merge_chunk_segments(
                        [r["segments"] for r in results], offsets_sec
                    )
                out.set_result(
                    dict(
                        text="".join(s["text"] for s in merged),
                        segments=merged,
                        language=results[0]["language"],
                    )
                )
            except BaseException as exc:  # propagate the first chunk failure
                out.set_exception(exc)

        for f in futures:
            f.add_done_callback(_done)
        return out

    def close(self, drain: bool = True):
        """Stop the worker; with drain=True, first finish queued requests."""
        if drain:
            while self._worker.is_alive():
                with self._cv:
                    if not any(
                        lanes["p"] or lanes["n"]
                        for lanes in self._groups.values()
                    ):
                        break
                time.sleep(0.01)
        with self._cv:
            self._closed = True
            self._cv.notify_all()
        self._worker.join(timeout=30)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- worker -------------------------------------------------------------

    def _pick_group(self):
        """Group to serve next: oldest priority head wins over any normal."""
        best_key, best_t = None, None
        for key, lanes in self._groups.items():
            if lanes["p"] and (best_t is None or lanes["p"][0][2] < best_t):
                best_key, best_t = key, lanes["p"][0][2]
        if best_key is not None:
            return best_key
        for key, lanes in self._groups.items():
            if lanes["n"] and (best_t is None or lanes["n"][0][2] < best_t):
                best_key, best_t = key, lanes["n"][0][2]
        return best_key

    def _run(self):
        while True:
            with self._cv:
                key = self._pick_group()
                while key is None and not self._closed:
                    self._cv.wait()
                    key = self._pick_group()
                if key is None and self._closed:
                    return
                lanes = self._groups[key]

                def count():
                    return len(lanes["p"]) + len(lanes["n"])

                def oldest():
                    heads = [dq[0][2] for dq in lanes.values() if dq]
                    return min(heads)

                # wait for the batch to fill, up to max_wait after the
                # group's oldest request arrived OR the engine became free,
                # whichever is later (see _engine_free_t above); an idle
                # engine with a lone request still pays only max_wait_s
                deadline = max(oldest(), self._engine_free_t) + self.max_wait_s
                while (
                    count() < self.batch_size
                    and not self._closed
                    and time.monotonic() < deadline
                ):
                    self._cv.wait(timeout=max(deadline - time.monotonic(), 0.001))
                items = []
                for dq in (lanes["p"], lanes["n"]):  # priority lane first
                    while dq and len(items) < self.batch_size:
                        items.append(dq.popleft())
                if not (lanes["p"] or lanes["n"]):
                    del self._groups[key]  # drained groups don't accumulate
            if not items:
                continue
            options = dict(self.defaults)
            options.update(dict(key))
            self._dispatch(items, options)
            self._engine_free_t = time.monotonic()

    def _dispatch(self, items, options):
        import contextlib

        audios = [a for a, _, _ in items]
        futures = [f for _, f, _ in items]
        try:
            # pad the dispatch to a full batch with empty files: the mel
            # store and window-slice programs compile per batch SHAPE, so
            # without padding every distinct request count is a fresh
            # multi-second XLA compile.  Empty rows carry no decode work
            # (their file state is exhausted on arrival) — only a silent
            # mel row — and their results are dropped below.
            n_real = len(audios)
            if n_real < self.batch_size:
                import numpy as _np

                audios = audios + [
                    _np.zeros(0, _np.int16)
                    for _ in range(self.batch_size - n_real)
                ]
            with (self.mesh if self.mesh is not None else contextlib.nullcontext()):
                results = self._transcribe_batch(
                    self.model, audios, batch_size=self.batch_size, **options
                )[:n_real]
            with self._cv:
                self.stats["batches"] += 1
            for fut, res in zip(futures, results):
                try:
                    fut.set_result(res)
                except Exception:  # cancelled by the client — drop the result
                    pass
        except Exception as exc:
            with self._cv:
                self.stats["errors"] += 1
            if len(items) > 1:
                # one bad item (unreadable path, undecodable audio) must not
                # fail its co-batched neighbours: retry each alone
                for item in items:
                    self._dispatch([item], options)
            else:
                try:
                    futures[0].set_exception(exc)
                except Exception:  # cancelled by the client
                    pass


# ---------------------------------------------------------------------------
# HTTP front-end
# ---------------------------------------------------------------------------

# per-request ceiling for the HTTP layer; generous because first-compile of
# a new engine shape over the TPU tunnel can take 10+ minutes
REQUEST_TIMEOUT_S = float(os.environ.get("WHISPER_TPU_REQUEST_TIMEOUT", "1200"))

_BOOL = {"true": True, "1": True, "false": False, "0": False}
_OPTION_TYPES = {
    "language": str,
    "task": str,
    "temperature": float,
    "beam_size": int,
    "best_of": int,
    "patience": float,
    "length_penalty": float,
    "initial_prompt": str,
    "condition_on_previous_text": bool,
    "word_timestamps": bool,
    "no_speech_threshold": float,
    "logprob_threshold": float,
    "compression_ratio_threshold": float,
    "hallucination_silence_threshold": float,
}


def _parse_options(query: str) -> Dict[str, Any]:
    from urllib.parse import parse_qsl

    out: Dict[str, Any] = {}
    for k, v in parse_qsl(query):
        # request-routing flags, not transcribe options
        if k in ("priority", "stream", "chunked"):
            out[k] = _BOOL[v.lower()]
            continue
        if k == "chunk_overlap":
            out[k] = float(v)
            continue
        typ = _OPTION_TYPES.get(k)
        if typ is None:
            raise ValueError(f"unknown option {k!r}")
        out[k] = _BOOL[v.lower()] if typ is bool else typ(v)
    return out


def _make_handler(batcher: BatchingTranscriber):
    from http.server import BaseHTTPRequestHandler

    from .audio import load_audio

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def _send_json(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.split("?")[0] in ("/healthz", "/health"):
                stats = dict(batcher.stats)
                self._send_json(200, {"status": "ok", **stats})
            else:
                self._send_json(404, {"error": "not found"})

        def do_POST(self):
            # drain the body before any response, or the keep-alive
            # connection breaks mid-pipeline on error paths
            length = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(length) if length > 0 else b""
            path, _, query = self.path.partition("?")
            if path not in ("/v1/audio/transcriptions", "/transcribe"):
                self._send_json(404, {"error": "not found"})
                return
            try:
                options = _parse_options(query)
            except (ValueError, KeyError) as exc:
                self._send_json(400, {"error": str(exc)})
                return
            if not data:
                self._send_json(400, {"error": "empty request body"})
                return
            priority = bool(options.pop("priority", False))
            stream = bool(options.pop("stream", False))
            chunked = bool(options.pop("chunked", False))
            chunk_overlap = float(options.pop("chunk_overlap", 5.0))
            try:
                # the decoders are file-based (native WAV/FLAC or ffmpeg);
                # spool the body to a temp file
                with tempfile.NamedTemporaryFile(suffix=".audio", delete=False) as f:
                    f.write(data)
                    tmp = f.name
                try:
                    audio = load_audio(tmp)
                finally:
                    os.unlink(tmp)
                if stream:
                    if chunked:
                        self._stream_chunked_response(
                            audio, options, chunk_overlap, priority
                        )
                    else:
                        self._stream_response(audio, options)
                    return
                # bounded wait: a wedged device must surface as an error,
                # not as indefinitely accumulating blocked HTTP threads
                if chunked:
                    try:
                        fut = batcher.submit_chunked(
                            audio, chunk_overlap=chunk_overlap,
                            priority=priority, **options,
                        )
                    except ValueError as exc:  # contradictory chunked options
                        self._send_json(400, {"error": str(exc)})
                        return
                else:
                    fut = batcher.submit(audio, priority=priority, **options)
                try:
                    result = fut.result(timeout=REQUEST_TIMEOUT_S)
                # concurrent.futures.TimeoutError is an alias of the builtin
                # only since Python 3.11; catch both for 3.10
                except (TimeoutError, FutureTimeoutError):
                    fut.cancel()
                    self._send_json(
                        503, {"error": "transcription timed out; server busy"}
                    )
                    return
            except Exception as exc:
                self._send_json(500, {"error": f"{type(exc).__name__}: {exc}"})
                return
            self._send_json(
                200,
                {
                    "text": result["text"],
                    "language": result["language"],
                    "segments": [
                        {
                            k: v
                            for k, v in seg.items()
                            if k in ("id", "start", "end", "text", "words",
                                     "avg_logprob", "no_speech_prob")
                        }
                        for seg in result["segments"]
                    ],
                },
            )

        def _stream_response(self, audio, options):
            """Chunked NDJSON response: one line per finalized segment.

            Driven by StreamingTranscriber — the first 30-second window's
            segments go out while later windows are still decoding, so
            time-to-first-segment is far below the full-file latency on
            long inputs (asserted in tests/test_serve.py).
            """
            from .streaming import StreamingTranscriber

            merged = dict(batcher.defaults)
            merged.update(options)
            merged.pop("batch_size", None)
            st = StreamingTranscriber(batcher.model, **merged)

            self.send_response(200)
            self.send_header("Content-Type", "application/x-ndjson")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()

            def write_chunk(obj):
                body = (json.dumps(obj) + "\n").encode()
                self.wfile.write(f"{len(body):x}\r\n".encode() + body + b"\r\n")
                self.wfile.flush()

            def emit(segments):
                for seg in segments:
                    write_chunk(
                        {
                            k: v
                            for k, v in seg.items()
                            if k in ("id", "start", "end", "text", "words",
                                     "avg_logprob", "no_speech_prob")
                        }
                    )

            try:
                # feed in ~5 s slices so segments stream out per window
                # instead of all at flush time
                step = 5 * 16000
                for off in range(0, len(audio), step):
                    emit(st.push(audio[off : off + step]))
                emit(st.flush())
                final = st.result
                write_chunk(
                    {"done": True, "text": final["text"],
                     "language": final["language"]}
                )
            except Exception as exc:
                write_chunk({"error": f"{type(exc).__name__}: {exc}"})
            self.wfile.write(b"0\r\n\r\n")

        def _stream_chunked_response(self, audio, options, chunk_overlap,
                                     priority):
            """Chunked NDJSON for a chunked-parallel request.

            All chunks decode concurrently through the batcher; ownership
            boundaries are fixed by the offsets alone, so chunk i's owned
            segments stream out the moment its future resolves (in order)
            — time-to-first-segment is one batch round, not the whole file.
            """
            from .chunked import owned_segments

            self.send_response(200)
            self.send_header("Content-Type", "application/x-ndjson")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()

            def write_chunk(obj):
                body = (json.dumps(obj) + "\n").encode()
                self.wfile.write(f"{len(body):x}\r\n".encode() + body + b"\r\n")
                self.wfile.flush()

            try:
                offsets_sec, futures = batcher.submit_chunk_futures(
                    audio, chunk_overlap=chunk_overlap, priority=priority,
                    **options,
                )
                texts, language, next_id = [], None, 0
                for i, fut in enumerate(futures):
                    result = fut.result(timeout=REQUEST_TIMEOUT_S)
                    language = result["language"]
                    for seg in owned_segments(result["segments"], i, offsets_sec):
                        seg = dict(seg, id=next_id)
                        next_id += 1
                        texts.append(seg["text"])
                        write_chunk(
                            {
                                k: v
                                for k, v in seg.items()
                                if k in ("id", "start", "end", "text", "words",
                                         "avg_logprob", "no_speech_prob")
                            }
                        )
                write_chunk(
                    {"done": True, "text": "".join(texts), "language": language}
                )
            except Exception as exc:
                write_chunk({"error": f"{type(exc).__name__}: {exc}"})
            self.wfile.write(b"0\r\n\r\n")

        def log_message(self, fmt, *args):  # quiet by default
            pass

    return Handler


def parse_mesh(spec: str):
    """Build a Mesh from a CLI spec like "data=8" or "data=4,model=2"."""
    from .parallel import make_mesh

    sizes = {"data": 1, "model": 1}
    for part in spec.split(","):
        name, _, num = part.partition("=")
        name = name.strip()
        if name not in sizes or not num.strip().isdigit():
            raise ValueError(
                f"bad mesh spec {spec!r}; expected e.g. 'data=8' or 'data=4,model=2'"
            )
        sizes[name] = int(num)
    return make_mesh((sizes["data"], sizes["model"]))


def serve(
    model,
    host: str = "127.0.0.1",
    port: int = 9000,
    batch_size: int = 16,
    max_wait_s: float = 0.25,
    mesh=None,
    **transcribe_options,
):
    """Start the HTTP server (blocking).  Returns never; raises on bind error."""
    server = make_server(
        model, host, port, batch_size, max_wait_s, mesh=mesh,
        **transcribe_options
    )
    print(f"whisper_tpu serving on http://{host}:{server.server_port} "
          f"(batch_size={batch_size}, max_wait={max_wait_s}s)")
    try:
        server.serve_forever()
    finally:
        server.batcher.close(drain=False)


def make_server(
    model,
    host: str = "127.0.0.1",
    port: int = 0,
    batch_size: int = 16,
    max_wait_s: float = 0.25,
    mesh=None,
    **transcribe_options,
):
    """Build (without starting) the ThreadingHTTPServer; port 0 = ephemeral.

    The server object carries its ``batcher``; callers embedding the server
    (tests, notebooks) run ``serve_forever`` in a thread and must
    ``batcher.close()`` on teardown.
    """
    from http.server import ThreadingHTTPServer

    batcher = BatchingTranscriber(
        model, batch_size=batch_size, max_wait_s=max_wait_s, mesh=mesh,
        **transcribe_options
    )
    server = ThreadingHTTPServer((host, port), _make_handler(batcher))
    server.batcher = batcher
    return server


def main(argv: Optional[List[str]] = None):
    parser = argparse.ArgumentParser(
        prog="python -m whisper_tpu.serve",
        description="Batching transcription HTTP server",
    )
    parser.add_argument("--model", default="turbo")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=9000)
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--max-wait", type=float, default=0.25)
    parser.add_argument("--language", default=None)
    parser.add_argument("--task", default="transcribe")
    parser.add_argument(
        "--quantize", default=None, choices=[None, "int8", "int8+logits"]
    )
    parser.add_argument(
        "--mesh", default=None, metavar="SPEC",
        help="multi-chip serving: shard the model and batches over a device "
        "mesh, e.g. 'data=8' (pure data parallel) or 'data=4,model=2' "
        "(tensor parallel pairs)",
    )
    args = parser.parse_args(argv)

    import whisper_tpu

    model = whisper_tpu.load_model(args.model, quantize=args.quantize)
    options = {"task": args.task}
    if args.language:
        options["language"] = args.language
    serve(
        model,
        host=args.host,
        port=args.port,
        batch_size=args.batch_size,
        max_wait_s=args.max_wait,
        mesh=parse_mesh(args.mesh) if args.mesh else None,
        **options,
    )


if __name__ == "__main__":
    main()
