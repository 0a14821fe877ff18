"""Graceful degradation: everything must work without the native library."""

import numpy as np

import whisper_tpu.native as native_mod
from whisper_tpu.ops.dtw import backtrace


def test_bpe_python_fallback(monkeypatch):
    from whisper_tpu import tokenizer as tok_mod

    tok = tok_mod.get_tokenizer(True, language="en", task="transcribe")
    enc = tok.encoding
    text = "The quick brown fox, naïve café ♪"
    expected = enc.encode(text)

    # force the pure-Python merge loop and clear caches
    monkeypatch.setattr(enc, "_native_handle", None)
    enc._piece_cache = {}
    assert enc.encode(text) == expected


def test_backtrace_numpy_fallback(monkeypatch):
    rng = np.random.RandomState(0)
    trace = rng.randint(0, 3, (12, 20)).astype(np.int32)
    expected = backtrace(trace.copy())
    monkeypatch.setattr(native_mod, "_lib", None)
    monkeypatch.setattr(native_mod, "_build_failed", True)
    got = backtrace(trace.copy())
    np.testing.assert_array_equal(expected, got)


def test_audio_decode_requires_backend(monkeypatch, tmp_path):
    import pytest

    from whisper_tpu import audio as audio_mod

    monkeypatch.setattr(audio_mod, "_load_audio_native", lambda *a: None)
    monkeypatch.setattr("shutil.which", lambda *_: None)
    bogus = tmp_path / "x.xyz"
    bogus.write_bytes(b"not audio")
    with pytest.raises(RuntimeError, match="native decoder supports WAV/FLAC"):
        audio_mod.load_audio(str(bogus))


def test_wav_decode_native(tmp_path):
    """The C++ WAV path: synthesize, write, decode, compare."""
    import struct
    import wave

    sr = 8000
    t = np.arange(sr) / sr
    wave_samples = (np.sin(2 * np.pi * 440 * t) * 20000).astype(np.int16)
    path = str(tmp_path / "tone.wav")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(struct.pack(f"<{len(wave_samples)}h", *wave_samples))

    from whisper_tpu.audio import load_audio

    decoded = load_audio(path, sr=16000)  # involves 2x upsampling
    assert abs(len(decoded) - 2 * sr) <= 2
    # energy preserved within the resampler's passband tolerance
    rms_in = np.sqrt(np.mean((wave_samples / 32768.0) ** 2))
    rms_out = np.sqrt(np.mean(decoded**2))
    assert abs(rms_in - rms_out) / rms_in < 0.05
