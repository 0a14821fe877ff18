"""Audio front-end: decode → 16 kHz mono PCM → log-Mel spectrogram, on device.

Functional parity target: reference ``whisper/audio.py`` (constants at 13-22,
load_audio at 25-62, pad_or_trim at 65-88, log_mel_spectrogram at 110-157).

TPU-first design: the STFT is an XLA computation (patch extraction + rfft +
mel matmul fused under jit) instead of torch.stft; it runs on-device in one
call for an entire file, batched.  Decoding uses the native C++ WAV/FLAC
decoder + resampler (whisper_tpu/native/audioio.cpp) with an ffmpeg-subprocess
fallback for other containers when ffmpeg exists on the host.
"""

import ctypes
import os
from functools import lru_cache, partial
from subprocess import CalledProcessError, run
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .native import load_native
from .utils import exact_div

# hard-coded audio hyperparameters (reference whisper/audio.py:13-22)
SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_LENGTH = 30
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE  # 480000 samples in a 30-second chunk
N_FRAMES = exact_div(N_SAMPLES, HOP_LENGTH)  # 3000 frames in a mel spectrogram

N_SAMPLES_PER_TOKEN = HOP_LENGTH * 2  # the initial convolutions have stride 2
FRAMES_PER_SECOND = exact_div(SAMPLE_RATE, HOP_LENGTH)  # 10ms per audio frame
TOKENS_PER_SECOND = exact_div(SAMPLE_RATE, N_SAMPLES_PER_TOKEN)  # 20ms per token


def _load_audio_native(file: str, sr: int) -> Optional[np.ndarray]:
    lib = load_native()
    if lib is None:
        return None
    out_len = ctypes.c_int64(0)
    ptr = lib.audio_decode_file(file.encode(), sr, ctypes.byref(out_len))
    if not ptr:
        return None
    try:
        return np.ctypeslib.as_array(ptr, shape=(out_len.value,)).astype(np.float32)
    finally:
        lib.audio_free(ptr)


def _load_audio_ffmpeg(file: str, sr: int) -> np.ndarray:
    # same ffmpeg invocation semantics as reference whisper/audio.py:44-58
    cmd = [
        "ffmpeg",
        "-nostdin",
        "-threads", "0",
        "-i", file,
        "-f", "s16le",
        "-ac", "1",
        "-acodec", "pcm_s16le",
        "-ar", str(sr),
        "-",
    ]
    try:
        out = run(cmd, capture_output=True, check=True).stdout
    except CalledProcessError as e:
        raise RuntimeError(f"Failed to load audio: {e.stderr.decode()}") from e
    return np.frombuffer(out, np.int16).flatten().astype(np.float32) / 32768.0


def load_audio(file: str, sr: int = SAMPLE_RATE) -> np.ndarray:
    """Read an audio file as mono float32 PCM at `sr`, resampling as needed.

    WAV and FLAC decode natively (C++); other containers fall back to the
    ffmpeg CLI when available (matching reference whisper/audio.py:25-62).
    """
    audio = _load_audio_native(file, sr)
    if audio is not None:
        return audio
    import shutil

    if shutil.which("ffmpeg"):
        return _load_audio_ffmpeg(file, sr)
    raise RuntimeError(
        f"Failed to load audio from {file!r}: the native decoder supports "
        "WAV/FLAC, and no ffmpeg CLI was found for other formats."
    )


def pad_or_trim(array, length: int = N_SAMPLES, *, axis: int = -1):
    """Pad (zeros) or trim the audio/mel array to `length` along `axis`."""
    if isinstance(array, np.ndarray):
        if array.shape[axis] > length:
            array = array.take(indices=range(length), axis=axis)
        if array.shape[axis] < length:
            pad_widths = [(0, 0)] * array.ndim
            pad_widths[axis] = (0, length - array.shape[axis])
            array = np.pad(array, pad_widths)
        return array

    array = jnp.asarray(array)
    if array.shape[axis] > length:
        array = jax.lax.slice_in_dim(array, 0, length, axis=axis)
    if array.shape[axis] < length:
        pad_widths = [(0, 0)] * array.ndim
        pad_widths[axis] = (0, length - array.shape[axis])
        array = jnp.pad(array, pad_widths)
    return array


def as_transfer_array(audio: np.ndarray) -> np.ndarray:
    """Re-quantize a float waveform to int16 when exactly lossless.

    Every real audio input is 16-bit PCM at some point in its pipeline
    (ffmpeg decodes to s16le — reference whisper/audio.py:47 — and WAV/FLAC
    sources are 16-bit), so the float32 waveform is usually int16/32768
    exactly.  Uploading the int16 stream halves-to-quarters the host→device
    transfer — the dominant cost of batched transcription over a remote
    attachment — and the device-side ``x * (1/32768)`` reconstruction is
    exact (power-of-two scale), so the mel output is bit-identical.

    Returns the int16 array when the conversion is exact, otherwise the
    input unchanged (resampled or synthetic float audio stays float32).
    """
    if audio.dtype == np.int16:
        return audio
    if audio.dtype != np.float32:
        return audio
    scaled = audio * 32768.0
    if (
        np.all(scaled >= -32768.0)
        and np.all(scaled <= 32767.0)
        and np.array_equal(scaled, np.floor(scaled))
    ):
        return scaled.astype(np.int16)
    return audio


def _pcm_scale(audio: jax.Array) -> jax.Array:
    """f32 samples from a possibly-int16 device array (exact: 2^-15 scale)."""
    if audio.dtype == jnp.int16:
        return audio.astype(jnp.float32) * (1.0 / 32768.0)
    return audio.astype(jnp.float32)


@lru_cache(maxsize=None)
def mel_filters(n_mels: int) -> np.ndarray:
    """Load the mel filterbank matrix projecting the STFT onto `n_mels` bins.

    Same asset as the reference (librosa-derived 80x201 / 128x201 matrices,
    provenance per reference whisper/audio.py:91-107).
    """
    assert n_mels in {80, 128}, f"Unsupported n_mels: {n_mels}"
    filters_path = os.path.join(os.path.dirname(__file__), "assets", "mel_filters.npz")
    with np.load(filters_path, allow_pickle=False) as f:
        return f[f"mel_{n_mels}"]


@lru_cache(maxsize=None)
def _dft_matrices():
    """Windowed real-DFT bases: (N_FFT, N_FFT//2+1) cos/sin matrices.

    The STFT runs as two real matmuls on the MXU instead of an FFT: at
    n_fft=400 the DFT matrix is tiny, the matmul formulation fuses with the
    mel projection, and float32 accumulation keeps parity with torch.stft
    (TPU FFT lowering loses precision; matmul at HIGHEST does not).
    """
    n = np.arange(N_FFT)
    k = np.arange(N_FFT // 2 + 1)
    angles = -2.0 * np.pi * np.outer(n, k) / N_FFT
    # fold the periodic Hann window into the DFT basis
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / N_FFT))
    cos_b = (np.cos(angles) * window[:, None]).astype(np.float32)
    sin_b = (np.sin(angles) * window[:, None]).astype(np.float32)
    return cos_b, sin_b


@partial(jax.jit, static_argnames=("n_mels",))
def _log_mel_jax(audio: jax.Array, filters: jax.Array, n_mels: int) -> jax.Array:
    """Device computation: framed DFT -> power -> mel matmul -> log/clamp/scale.

    Numerics mirror reference whisper/audio.py:147-156 (torch.stft with
    center=True reflect padding, Hann window, drop last frame, power spectrum,
    clamp at 1e-10, floor at max-8, (x+4)/4).
    """
    squeeze = audio.ndim == 1
    if squeeze:
        audio = audio[None, :]
    audio = _pcm_scale(audio)

    half = N_FFT // 2
    padded = jnp.pad(audio, ((0, 0), (half, half)), mode="reflect")

    n_frames = 1 + audio.shape[-1] // HOP_LENGTH
    # extract overlapping frames: (B, n_frames, N_FFT); gather keeps samples
    # bit-exact (a conv-based patch extraction would round through bf16 on TPU)
    idx = (
        jnp.arange(n_frames)[:, None] * HOP_LENGTH + jnp.arange(N_FFT)[None, :]
    )
    patches = padded[:, idx]
    # drop the trailing frame (reference audio.py:149 stft[..., :-1])
    patches = patches[:, :-1, :]

    cos_b, sin_b = _dft_matrices()
    real = jnp.einsum(
        "btn,nk->btk", patches, cos_b,
        precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32,
    )
    imag = jnp.einsum(
        "btn,nk->btk", patches, sin_b,
        precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32,
    )
    magnitudes = real * real + imag * imag  # (B, 3000, 201)

    mel_spec = jnp.einsum(
        "mf,btf->bmt", filters, magnitudes,
        precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32,
    )
    log_spec = jnp.log10(jnp.maximum(mel_spec, 1e-10))
    log_spec = jnp.maximum(log_spec, log_spec.max(axis=(-2, -1), keepdims=True) - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return log_spec[0] if squeeze else log_spec


@partial(jax.jit, static_argnames=("n_mels",))
def _log_mel_frames_jax(samples: jax.Array, filters: jax.Array, n_mels: int) -> jax.Array:
    """Mel frames from a pre-margined raw-sample slice (streaming path).

    ``samples`` must cover every frame's full window: frame i of the output
    reads samples [i*HOP, i*HOP + N_FFT), i.e. the caller supplies the
    N_FFT//2-sample margins itself (real neighboring samples for interior
    windows, reflected/zero samples at stream edges).  Numerics are identical
    to :func:`_log_mel_jax` except the dynamic-range floor (max - 8) is
    computed over these frames only — a streaming transcriber cannot see the
    whole file's maximum (see streaming.StreamingTranscriber notes).
    """
    samples = _pcm_scale(samples)
    n_frames = (samples.shape[-1] - N_FFT) // HOP_LENGTH + 1
    idx = (
        jnp.arange(n_frames)[:, None] * HOP_LENGTH + jnp.arange(N_FFT)[None, :]
    )
    patches = samples[idx]
    cos_b, sin_b = _dft_matrices()
    real = jnp.einsum(
        "tn,nk->tk", patches, cos_b,
        precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32,
    )
    imag = jnp.einsum(
        "tn,nk->tk", patches, sin_b,
        precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32,
    )
    magnitudes = real * real + imag * imag
    mel_spec = jnp.einsum(
        "mf,tf->mt", filters, magnitudes,
        precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32,
    )
    log_spec = jnp.log10(jnp.maximum(mel_spec, 1e-10))
    log_spec = jnp.maximum(log_spec, log_spec.max() - 8.0)
    return (log_spec + 4.0) / 4.0


def log_mel_frames(samples: Union[np.ndarray, jax.Array], n_mels: int = 80) -> jax.Array:
    """Log-Mel frames of a pre-margined sample slice (see _log_mel_frames_jax)."""
    filters = jnp.asarray(mel_filters(n_mels))
    if isinstance(samples, np.ndarray):
        samples = as_transfer_array(samples)
    return _log_mel_frames_jax(jnp.asarray(samples), filters, n_mels)


def log_mel_spectrogram(
    audio: Union[str, np.ndarray, jax.Array],
    n_mels: int = 80,
    padding: int = 0,
    device=None,
) -> jax.Array:
    """Compute the log-Mel spectrogram of audio.

    Parameters
    ----------
    audio : path, 1-D waveform, or batch of waveforms at 16 kHz.  int16
        arrays are interpreted as 16-bit PCM and scaled by 1/32768 on
        device; float32 arrays that are exactly 16-bit-PCM-valued upload
        as int16 automatically (bit-identical, far fewer transfer bytes)
    n_mels : 80 or 128
    padding : zero samples to append (transcribe pads a full 30 s window)
    device : optional jax.Device to place the computation on

    Returns
    -------
    jax.Array, shape (..., n_mels, n_frames)
    """
    if isinstance(audio, str):
        audio = load_audio(audio)
    if isinstance(audio, np.ndarray):
        # ship 16-bit PCM streams as int16 (exactness-checked): the upload is
        # the dominant cost on remote attachments and the on-device
        # reconstruction is bit-exact (see as_transfer_array)
        audio = as_transfer_array(audio)
    audio = jnp.asarray(audio)
    if audio.dtype != jnp.int16:
        audio = audio.astype(jnp.float32)
    if device is not None:
        audio = jax.device_put(audio, device)
    if padding > 0:
        pad_widths = [(0, 0)] * (audio.ndim - 1) + [(0, padding)]
        audio = jnp.pad(audio, pad_widths)
    filters = jnp.asarray(mel_filters(n_mels))
    return _log_mel_jax(audio, filters, n_mels)
