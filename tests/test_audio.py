import numpy as np
import pytest

from whisper_tpu.audio import (
    N_FRAMES,
    N_SAMPLES,
    SAMPLE_RATE,
    load_audio,
    log_mel_spectrogram,
    pad_or_trim,
)

from conftest import JFK


def test_audio():
    # mirrors reference tests/test_audio.py:10-19
    audio = load_audio(JFK)
    assert audio.ndim == 1
    assert SAMPLE_RATE * 10 < audio.shape[0] < SAMPLE_RATE * 12
    assert 0 < audio.std() < 1

    mel_from_audio = np.asarray(log_mel_spectrogram(audio))
    mel_from_file = np.asarray(log_mel_spectrogram(JFK))

    assert np.allclose(mel_from_audio, mel_from_file)
    assert mel_from_audio.max() - mel_from_audio.min() <= 2.0


def test_pad_or_trim():
    audio = load_audio(JFK)
    padded = pad_or_trim(audio)
    assert padded.shape == (N_SAMPLES,)
    assert np.all(padded[len(audio) :] == 0)
    trimmed = pad_or_trim(np.zeros(N_SAMPLES * 2))
    assert trimmed.shape == (N_SAMPLES,)

    mel = np.asarray(log_mel_spectrogram(audio))
    mel_padded = pad_or_trim(mel, N_FRAMES)
    assert mel_padded.shape == (80, N_FRAMES)


@pytest.mark.reference
@pytest.mark.parametrize("n_mels", [80, 128])
@pytest.mark.parametrize("padding", [0, N_SAMPLES])
def test_mel_parity_vs_reference(n_mels, padding):
    import torch

    from _reference import import_reference

    ref_whisper = import_reference()
    audio = load_audio(JFK)
    ref = ref_whisper.log_mel_spectrogram(
        torch.from_numpy(audio.copy()), n_mels=n_mels, padding=padding
    ).numpy()
    ours = np.asarray(log_mel_spectrogram(audio, n_mels=n_mels, padding=padding))
    assert ref.shape == ours.shape
    assert np.abs(ref - ours).max() < 1e-4


def test_as_transfer_array_exact_pcm_roundtrip():
    from whisper_tpu.audio import as_transfer_array

    # 16-bit-PCM-valued float32 (what load_audio produces) converts exactly
    pcm = np.array([-32768, -1, 0, 1, 17, 32767], np.int16)
    f32 = pcm.astype(np.float32) / 32768.0
    out = as_transfer_array(f32)
    assert out.dtype == np.int16
    assert np.array_equal(out, pcm)

    # non-PCM floats (resampled/synthetic audio) stay float32
    synth = np.random.RandomState(0).randn(100).astype(np.float32) * 0.1
    out = as_transfer_array(synth)
    assert out.dtype == np.float32 and out is synth

    # out-of-range floats stay float32 (would clip as int16)
    loud = np.array([1.5, -2.0], np.float32)
    assert as_transfer_array(loud).dtype == np.float32

    # int16 passes through
    assert as_transfer_array(pcm) is pcm


def test_log_mel_int16_bit_identical():
    audio = load_audio(JFK)
    pcm = np.round(audio * 32768.0).astype(np.int16)
    f32 = pcm.astype(np.float32) / 32768.0
    mel_f32 = np.asarray(log_mel_spectrogram(f32))
    mel_i16 = np.asarray(log_mel_spectrogram(pcm))
    assert np.array_equal(mel_f32, mel_i16)
