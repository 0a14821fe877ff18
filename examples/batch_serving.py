"""Throughput serving: many files decoded in lockstep batches on one chip.

transcribe_batch fills fixed-shape device batches with 30-second windows
drawn from every active file, so the (bandwidth-bound) decode loop is shared
across streams — the TPU-native answer to the reference's one-file-at-a-time
CLI loop.
"""

import sys
import time

import whisper_tpu

files = sys.argv[1:]
model = whisper_tpu.load_model("turbo")

t0 = time.perf_counter()
results = whisper_tpu.transcribe_batch(model, files, batch_size=16)
elapsed = time.perf_counter() - t0

total_audio = sum(
    len(whisper_tpu.load_audio(f)) / whisper_tpu.audio.SAMPLE_RATE for f in files
)
print(f"{len(files)} files, {total_audio:.0f}s audio in {elapsed:.1f}s "
      f"(RTF {total_audio / elapsed:.1f}x)")
for f, r in zip(files, results):
    print(f"== {f} [{r['language']}]\n{r['text']}\n")
