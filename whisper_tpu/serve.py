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
    """Coalesces concurrent transcription requests into device batches."""

    def __init__(
        self,
        model,
        batch_size: int = 16,
        max_wait_s: float = 0.25,
        **transcribe_options,
    ):
        from .batch import transcribe_batch  # local import: avoid cycles

        self._transcribe_batch = transcribe_batch
        self.model = model
        self.batch_size = int(batch_size)
        self.max_wait_s = float(max_wait_s)
        self.defaults = transcribe_options
        # option-key -> deque of (audio, future, enqueue_time); insertion
        # order of keys approximates request order across groups
        self._groups: "OrderedDict[tuple, deque]" = OrderedDict()
        self._cv = threading.Condition()
        self._closed = False
        self.stats: Dict[str, int] = {"requests": 0, "batches": 0, "errors": 0}
        self._worker = threading.Thread(
            target=self._run, name="whisper-tpu-batcher", daemon=True
        )
        self._worker.start()

    # -- client API ---------------------------------------------------------

    def submit(self, audio, **overrides) -> Future:
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
            self._groups.setdefault(key, deque()).append(
                (audio, fut, time.monotonic())
            )
            self.stats["requests"] += 1
            self._cv.notify()
        return fut

    def transcribe(self, audio, timeout: Optional[float] = None, **overrides):
        """Synchronous convenience wrapper over submit()."""
        return self.submit(audio, **overrides).result(timeout)

    def close(self, drain: bool = True):
        """Stop the worker; with drain=True, first finish queued requests."""
        if drain:
            while self._worker.is_alive():
                with self._cv:
                    if not any(self._groups.values()):
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
        """Oldest-head nonempty group, or None."""
        best_key, best_t = None, None
        for key, dq in self._groups.items():
            if dq and (best_t is None or dq[0][2] < best_t):
                best_key, best_t = key, dq[0][2]
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
                dq = self._groups[key]
                # wait for the batch to fill, up to max_wait after the
                # group's oldest request arrived
                deadline = dq[0][2] + self.max_wait_s
                while (
                    len(dq) < self.batch_size
                    and not self._closed
                    and time.monotonic() < deadline
                ):
                    self._cv.wait(timeout=max(deadline - time.monotonic(), 0.001))
                items = [dq.popleft() for _ in range(min(len(dq), self.batch_size))]
                if not dq:
                    del self._groups[key]  # drained groups don't accumulate
            if not items:
                continue
            options = dict(self.defaults)
            options.update(dict(key))
            self._dispatch(items, options)

    def _dispatch(self, items, options):
        audios = [a for a, _, _ in items]
        futures = [f for _, f, _ in items]
        try:
            results = self._transcribe_batch(
                self.model, audios, batch_size=self.batch_size, **options
            )
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
                # bounded wait: a wedged device must surface as an error,
                # not as indefinitely accumulating blocked HTTP threads
                fut = batcher.submit(audio, **options)
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

        def log_message(self, fmt, *args):  # quiet by default
            pass

    return Handler


def serve(
    model,
    host: str = "127.0.0.1",
    port: int = 9000,
    batch_size: int = 16,
    max_wait_s: float = 0.25,
    **transcribe_options,
):
    """Start the HTTP server (blocking).  Returns never; raises on bind error."""
    server = make_server(
        model, host, port, batch_size, max_wait_s, **transcribe_options
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
    **transcribe_options,
):
    """Build (without starting) the ThreadingHTTPServer; port 0 = ephemeral.

    The server object carries its ``batcher``; callers embedding the server
    (tests, notebooks) run ``serve_forever`` in a thread and must
    ``batcher.close()`` on teardown.
    """
    from http.server import ThreadingHTTPServer

    batcher = BatchingTranscriber(
        model, batch_size=batch_size, max_wait_s=max_wait_s, **transcribe_options
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
        **options,
    )


if __name__ == "__main__":
    main()
