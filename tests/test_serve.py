"""Batching server: request coalescing and the HTTP front-end (CPU)."""

import http.client
import json
import threading

import numpy as np
import pytest

import jax

from whisper_tpu.models.dims import ModelDimensions
from whisper_tpu.models.whisper import Whisper, init_params
from whisper_tpu.serve import BatchingTranscriber, make_server

DIMS = ModelDimensions(
    n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=2,
    n_audio_layer=2, n_vocab=51865, n_text_ctx=448, n_text_state=64,
    n_text_head=2, n_text_layer=2,
)


@pytest.fixture(scope="module")
def model():
    return Whisper(DIMS, init_params(DIMS, jax.random.PRNGKey(0)))


OPTS = dict(
    language="en", temperature=0.0, sample_len=12,
    condition_on_previous_text=False, no_speech_threshold=None,
    logprob_threshold=None, compression_ratio_threshold=None,
)


def _tone(seconds=2.0, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.randn(int(16000 * seconds)) * 0.1).astype(np.float32)


def test_batcher_coalesces_and_matches_direct(model):
    from whisper_tpu.batch import transcribe_batch

    audios = [_tone(seed=i) for i in range(5)]
    with BatchingTranscriber(model, batch_size=8, max_wait_s=0.5, **OPTS) as bt:
        futures = [bt.submit(a) for a in audios]
        results = [f.result(timeout=300) for f in futures]
        stats = dict(bt.stats)

    direct = transcribe_batch(model, audios, batch_size=8, **OPTS)
    assert [r["text"] for r in results] == [d["text"] for d in direct]
    # five near-simultaneous requests must NOT become five batches
    assert stats["requests"] == 5
    assert stats["batches"] < 5


def test_fill_window_reopens_when_engine_frees(model):
    """Requests that queued DURING a decode must still get max_wait_s to
    coalesce with client re-sends arriving just after the decode answers.
    Their own arrival-based deadline expires inside the decode; without an
    engine-free grace the next batch dispatches part-full an instant before
    the re-sends land (measured occupancy 9/16 on the loopback load test)."""
    sizes = []

    with BatchingTranscriber(model, batch_size=4, max_wait_s=0.3, **OPTS) as bt:
        real = bt._transcribe_batch

        def slow(model_, audios, **kw):
            sizes.append(sum(1 for a in audios if len(a)))
            import time as _t

            _t.sleep(0.4)
            return [
                {"text": "", "segments": [], "language": "en"}
                for _ in audios
            ]

        bt._transcribe_batch = slow
        try:
            fut1 = bt.submit(_tone(seed=0))
            threading.Event().wait(0.35)  # batch 1 ([fut1]) is now decoding
            fut2 = bt.submit(_tone(seed=1))  # queue during the decode:
            fut3 = bt.submit(_tone(seed=2))  # arrival deadline expires in it
            fut1.result(timeout=60)
            fut4 = bt.submit(_tone(seed=3))  # the "client re-send"
            for f in (fut2, fut3, fut4):
                f.result(timeout=60)
        finally:
            bt._transcribe_batch = real

    assert sizes == [1, 3]  # not [1, 2, 1]: the re-send joined the batch


def test_batcher_groups_by_options(model):
    with BatchingTranscriber(model, batch_size=4, max_wait_s=0.3, **OPTS) as bt:
        f1 = bt.submit(_tone(seed=1))
        # an override equal to the server default must land in the SAME
        # group as no-override requests (no batching fragmentation)
        f2 = bt.submit(_tone(seed=2), temperature=0.0)
        r1, r2 = f1.result(timeout=300), f2.result(timeout=300)
        stats = dict(bt.stats)
    assert isinstance(r1["text"], str) and isinstance(r2["text"], str)
    assert stats["batches"] == 1, stats  # coalesced despite the override


def test_batcher_propagates_errors(model):
    with BatchingTranscriber(model, batch_size=2, max_wait_s=0.1, **OPTS) as bt:
        bad = bt.submit("/nonexistent/audio.wav")
        with pytest.raises(Exception):
            bad.result(timeout=300)
        assert bt.stats["errors"] >= 1


def test_bad_request_does_not_poison_the_batch(model):
    """A failing co-batched item must not fail its neighbours."""
    with BatchingTranscriber(model, batch_size=4, max_wait_s=0.3, **OPTS) as bt:
        good = bt.submit(_tone(seed=3))
        bad = bt.submit("/nonexistent/audio.wav")
        with pytest.raises(Exception):
            bad.result(timeout=300)
        assert isinstance(good.result(timeout=300)["text"], str)


def test_cancelled_future_does_not_kill_the_worker(model):
    with BatchingTranscriber(model, batch_size=2, max_wait_s=0.2, **OPTS) as bt:
        doomed = bt.submit(_tone(seed=4))
        doomed.cancel()
        # the worker must survive delivering into the cancelled future and
        # keep serving subsequent requests
        later = bt.submit(_tone(seed=5))
        assert isinstance(later.result(timeout=300)["text"], str)


def test_http_server_end_to_end(model):
    from conftest import JFK

    server = make_server(model, port=0, batch_size=4, max_wait_s=0.1, **OPTS)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        port = server.server_port
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)

        conn.request("GET", "/healthz")
        health = conn.getresponse()
        assert health.status == 200
        assert json.loads(health.read())["status"] == "ok"

        with open(JFK, "rb") as f:
            payload = f.read()
        conn.request(
            "POST", "/v1/audio/transcriptions?language=en", body=payload
        )
        resp = conn.getresponse()
        body = json.loads(resp.read())
        assert resp.status == 200, body
        assert set(body) == {"text", "language", "segments"}
        assert body["language"] == "en"
        assert len(body["segments"]) > 0
        assert {"start", "end", "text"} <= set(body["segments"][0])

        # unknown option -> 400, unknown path -> 404 (read each body fully:
        # keep-alive pipelining requires it)
        conn.request("POST", "/v1/audio/transcriptions?bogus=1", body=payload)
        r = conn.getresponse()
        r.read()
        assert r.status == 400
        conn.request("POST", "/nope", body=b"x")
        r = conn.getresponse()
        r.read()
        assert r.status == 404
        conn.close()
    finally:
        server.shutdown()
        server.batcher.close(drain=False)


def test_http_timeout_returns_503(model, monkeypatch):
    """A wedged device surfaces as 503, not an eternally blocked thread."""
    import time as _time

    import whisper_tpu.serve as serve_mod
    from conftest import JFK

    server = make_server(model, port=0, batch_size=2, max_wait_s=0.05, **OPTS)
    monkeypatch.setattr(serve_mod, "REQUEST_TIMEOUT_S", 0.2)
    real = server.batcher._transcribe_batch

    def slow(*args, **kwargs):
        _time.sleep(2.0)
        return real(*args, **kwargs)

    server.batcher._transcribe_batch = slow
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        conn = http.client.HTTPConnection(
            "127.0.0.1", server.server_port, timeout=600
        )
        with open(JFK, "rb") as f:
            conn.request("POST", "/v1/audio/transcriptions", body=f.read())
        resp = conn.getresponse()
        body = json.loads(resp.read())
        assert resp.status == 503, body
        assert "timed out" in body["error"]
        conn.close()
    finally:
        server.shutdown()
        server.batcher.close(drain=False)


def test_list_valued_override_groups_ok(model):
    """List-valued options (temperature ladder, clip_timestamps) must not
    crash group-key construction at enqueue time (ADVICE r2)."""
    opts = {k: v for k, v in OPTS.items() if k != "temperature"}
    with BatchingTranscriber(model, batch_size=2, max_wait_s=0.2, **opts) as bt:
        fut = bt.submit(_tone(seed=6), temperature=[0.0, 0.2])
        assert isinstance(fut.result(timeout=300)["text"], str)


def test_priority_lane_jumps_queue(model):
    """A priority request overtakes normal requests queued before it."""
    import time as _time

    order = []
    with BatchingTranscriber(model, batch_size=1, max_wait_s=0.05, **OPTS) as bt:
        real = bt._transcribe_batch

        def slow(*a, **kw):
            _time.sleep(0.4)
            return real(*a, **kw)

        bt._transcribe_batch = slow
        futs = {}
        futs["n1"] = bt.submit(_tone(seed=10))
        _time.sleep(0.1)  # n1 is now being dispatched
        futs["n2"] = bt.submit(_tone(seed=11))
        futs["n3"] = bt.submit(_tone(seed=12))
        futs["prio"] = bt.submit(_tone(seed=13), priority=True)
        for name, fut in futs.items():
            fut.add_done_callback(lambda _, n=name: order.append(n))
        for fut in futs.values():
            fut.result(timeout=600)
    assert order.index("prio") < order.index("n2"), order
    assert order.index("prio") < order.index("n3"), order


def test_mesh_server_matches_single_device(model):
    """Mesh-sharded serving produces single-device-identical results
    (virtual 8-device CPU mesh; real multi-chip hardware not exercised)."""
    from whisper_tpu.parallel import make_mesh

    audios = [_tone(seed=i) for i in range(3)]
    with BatchingTranscriber(model, batch_size=4, max_wait_s=0.4, **OPTS) as bt:
        plain = [f.result(timeout=600) for f in [bt.submit(a) for a in audios]]

    mesh = make_mesh((2, 2))  # data x model: exercises TP sharding too
    with BatchingTranscriber(
        model, batch_size=4, max_wait_s=0.4, mesh=mesh, **OPTS
    ) as bt:
        assert bt.model is not model  # params were resharded, not mutated
        sharded = [f.result(timeout=600) for f in [bt.submit(a) for a in audios]]

    assert [r["text"] for r in plain] == [r["text"] for r in sharded]
    assert [
        [s["tokens"] for s in r["segments"]] for r in plain
    ] == [[s["tokens"] for s in r["segments"]] for r in sharded]


def test_batcher_chunked_matches_transcribe_chunked(model):
    """submit_chunked (chunks as parallel batcher requests) must reproduce
    transcribe_chunked exactly: same per-chunk decode, same stitching."""
    from whisper_tpu.chunked import transcribe_chunked

    audio = _tone(seconds=40.0, seed=7)  # > 30 s -> two chunks
    with BatchingTranscriber(model, batch_size=4, max_wait_s=0.3, **OPTS) as bt:
        served = bt.submit_chunked(audio).result(timeout=600)
        stats = dict(bt.stats)
    assert stats["requests"] == 2  # one request per chunk
    direct = transcribe_chunked(model, audio, verbose=None, **OPTS)
    assert served["text"] == direct["text"]
    assert served["language"] == direct["language"]
    assert [s["tokens"] for s in served["segments"]] == [
        s["tokens"] for s in direct["segments"]
    ]
    assert [(s["id"], s["start"], s["end"], s["seek"])
            for s in served["segments"]] == [
        (s["id"], s["start"], s["end"], s["seek"]) for s in direct["segments"]
    ]


def test_batcher_chunked_rejects_conditioning(model):
    with BatchingTranscriber(model, batch_size=2, max_wait_s=0.1, **OPTS) as bt:
        with pytest.raises(ValueError):
            bt.submit_chunked(_tone(), condition_on_previous_text=True)


def test_batcher_chunked_propagates_chunk_failure(model):
    """A failing chunk fails the stitched future, not a hang."""
    with BatchingTranscriber(model, batch_size=2, max_wait_s=0.1, **OPTS) as bt:
        real = bt._transcribe_batch

        def flaky(model_, audios, **kw):
            # the trailing 15 s chunk of a 40 s file fails persistently
            # (also under the batcher's per-item retry)
            if any(np.asarray(a).shape[0] < 20 * 16000 for a in audios):
                raise RuntimeError("injected chunk failure")
            return real(model_, audios, **kw)

        bt._transcribe_batch = flaky
        fut = bt.submit_chunked(_tone(seconds=40.0, seed=8))
        with pytest.raises(RuntimeError):
            fut.result(timeout=600)


def test_http_chunked_end_to_end(model):
    """?chunked=true returns the stitched transcribe_chunked result shape;
    on a sub-30s file it matches the non-chunked response exactly."""
    from conftest import JFK

    server = make_server(model, port=0, batch_size=4, max_wait_s=0.1, **OPTS)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        conn = http.client.HTTPConnection(
            "127.0.0.1", server.server_port, timeout=600
        )
        with open(JFK, "rb") as f:
            payload = f.read()
        conn.request("POST", "/v1/audio/transcriptions", body=payload)
        plain = json.loads(conn.getresponse().read())
        conn.request(
            "POST",
            "/v1/audio/transcriptions?chunked=true&chunk_overlap=5.0",
            body=payload,
        )
        resp = conn.getresponse()
        chunked = json.loads(resp.read())
        assert resp.status == 200, chunked
        assert chunked["text"] == plain["text"]
        assert len(chunked["segments"]) == len(plain["segments"])

        # contradictory options -> 400, not a wedged request
        conn.request(
            "POST",
            "/v1/audio/transcriptions?chunked=true"
            "&condition_on_previous_text=true",
            body=payload,
        )
        r = conn.getresponse()
        body = json.loads(r.read())
        assert r.status == 400, body
        conn.close()
    finally:
        server.shutdown()
        server.batcher.close(drain=False)


def test_http_chunked_streaming_response(model):
    """?chunked=true&stream=true streams each chunk's owned segments as its
    decode lands: NDJSON segments with globally renumbered ids, then a done
    line whose text is the concatenation."""
    import io
    import wave as wave_mod

    server = make_server(model, port=0, batch_size=4, max_wait_s=0.1, **OPTS)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        pcm = (_tone(seconds=70.0, seed=21) * 32767 * 0.05).astype(np.int16)
        buf = io.BytesIO()
        with wave_mod.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(pcm.tobytes())
        conn = http.client.HTTPConnection(
            "127.0.0.1", server.server_port, timeout=600
        )
        conn.request(
            "POST",
            "/v1/audio/transcriptions?chunked=true&stream=true",
            body=buf.getvalue(),
        )
        resp = conn.getresponse()
        assert resp.status == 200
        assert resp.getheader("Content-Type") == "application/x-ndjson"
        lines = [json.loads(l) for l in resp.read().decode().splitlines() if l]
        conn.close()

        assert lines[-1].get("done") is True
        segments = [l for l in lines if "done" not in l]
        assert "error" not in lines[-1], lines[-1]
        assert [s["id"] for s in segments] == list(range(len(segments)))
        starts = [s["start"] for s in segments]
        assert starts == sorted(starts)  # absolute, monotonic across chunks
        assert lines[-1]["text"] == "".join(s["text"] for s in segments)
    finally:
        server.shutdown()
        server.batcher.close(drain=False)


def test_http_streaming_response(model):
    """?stream=true sends segments incrementally: the first NDJSON line
    arrives well before the full transcription completes."""
    import io
    import time as _time
    import wave

    server = make_server(model, port=0, batch_size=4, max_wait_s=0.1, **OPTS)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        # ~70 s of audio = 3 windows; WAV so load_audio's native path reads it
        pcm = (_tone(seconds=70.0, seed=20) * 32767 * 0.05).astype(np.int16)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(pcm.tobytes())
        payload = buf.getvalue()

        conn = http.client.HTTPConnection("127.0.0.1", server.server_port, timeout=600)
        # warmup: the first request pays the engine compiles for every
        # window variant; latency is only meaningful on the second
        conn.request("POST", "/v1/audio/transcriptions?stream=true", body=payload)
        warm = conn.getresponse()
        warm.read()
        t0 = _time.monotonic()
        conn.request("POST", "/v1/audio/transcriptions?stream=true", body=payload)
        resp = conn.getresponse()
        assert resp.status == 200
        assert resp.getheader("Content-Type") == "application/x-ndjson"

        lines, t_first = [], None
        body = b""
        while True:
            chunk = resp.read(1)
            if not chunk:
                break
            body += chunk
            if chunk == b"\n" and t_first is None:
                t_first = _time.monotonic() - t0
        t_total = _time.monotonic() - t0
        conn.close()

        lines = [json.loads(l) for l in body.decode().splitlines() if l]
        assert lines[-1].get("done") is True
        segments = [l for l in lines if "text" in l and "done" not in l]
        assert len(segments) >= 2  # multiple windows streamed
        # the whole point: first segment long before the end of the stream
        assert t_first < 0.7 * t_total, (t_first, t_total)
    finally:
        server.shutdown()
        server.batcher.close(drain=False)
