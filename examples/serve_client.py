"""Talk to the dynamic-batching server (whisper_tpu.serve).

Start the server:   python -m whisper_tpu.serve --model turbo --port 9000
Then:               python examples/serve_client.py a.flac b.flac ...

Concurrent requests coalesce into one fixed-shape device batch on the
server, so N files cost roughly one batched decode, not N sequential ones.
"""

import http.client
import json
import sys
import threading
import time

HOST, PORT = "127.0.0.1", 9000


def transcribe(path: str, out: dict):
    conn = http.client.HTTPConnection(HOST, PORT, timeout=1800)
    with open(path, "rb") as f:
        conn.request("POST", "/v1/audio/transcriptions", body=f.read())
    resp = conn.getresponse()
    out[path] = json.loads(resp.read())
    conn.close()


def main():
    files = sys.argv[1:]
    if not files:
        sys.exit(__doc__)
    results: dict = {}
    t0 = time.perf_counter()
    threads = [
        threading.Thread(target=transcribe, args=(f, results)) for f in files
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    elapsed = time.perf_counter() - t0
    for path in files:
        r = results[path]
        print(f"== {path} [{r.get('language')}]\n{r.get('text', r)}\n")
    print(f"{len(files)} files in {elapsed:.1f}s (batched server-side)")


if __name__ == "__main__":
    main()
