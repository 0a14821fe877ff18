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
