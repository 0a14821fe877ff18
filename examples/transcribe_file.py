"""Minimal transcription example (mirrors the reference README usage)."""

import sys

import whisper_tpu

model = whisper_tpu.load_model(sys.argv[2] if len(sys.argv) > 2 else "turbo")
result = model.transcribe(sys.argv[1], word_timestamps=True)

print(result["text"])
for segment in result["segments"]:
    print(f"[{segment['start']:7.2f} -> {segment['end']:7.2f}] {segment['text']}")
    for word in segment.get("words", []):
        print(f"    {word['start']:6.2f}-{word['end']:6.2f} {word['word']!r} "
              f"p={word['probability']:.2f}")
