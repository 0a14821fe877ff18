"""ctypes bindings for the native C++ runtime (BPE core, audio IO, DTW backtrace).

The shared library is compiled on first import (g++, cached next to the
sources).  Every binding has a pure-Python/NumPy fallback at its call site, so
a missing toolchain degrades performance, not functionality.
"""

import ctypes
import os
import subprocess
import threading
import warnings
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libwhisper_native.so")
_SOURCES = ["bpe.cpp", "audioio.cpp", "dtw.cpp"]

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _needs_build() -> bool:
    if not os.path.exists(_LIB_PATH):
        return True
    lib_mtime = os.path.getmtime(_LIB_PATH)
    return any(
        os.path.getmtime(os.path.join(_DIR, s)) > lib_mtime for s in _SOURCES
    )


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-std=c++17", "-shared", "-o", _LIB_PATH]
            + [os.path.join(_DIR, s) for s in _SOURCES],
            check=True,
            capture_output=True,
            cwd=_DIR,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        detail = getattr(e, "stderr", b"") or b""
        warnings.warn(
            "Failed to build whisper_tpu native library; falling back to pure "
            f"Python implementations. {detail.decode(errors='replace')[:500]}"
        )
        return False


def load_native() -> Optional[ctypes.CDLL]:
    """Return the native library handle, building it if necessary; None on failure."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if _needs_build() and not _build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            warnings.warn(f"Failed to load whisper_tpu native library: {e}")
            _build_failed = True
            return None

        # ---- BPE core (bpe.cpp) ----
        lib.bpe_new.restype = ctypes.c_void_p
        lib.bpe_free.argtypes = [ctypes.c_void_p]
        lib.bpe_load.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        lib.bpe_encode_piece.restype = ctypes.c_int32
        lib.bpe_encode_piece.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]

        # ---- Audio IO (audioio.cpp) ----
        lib.audio_decode_file.restype = ctypes.POINTER(ctypes.c_float)
        lib.audio_decode_file.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.audio_resample.restype = ctypes.POINTER(ctypes.c_float)
        lib.audio_resample.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_double,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.audio_free.argtypes = [ctypes.POINTER(ctypes.c_float)]

        # ---- DTW backtrace (dtw.cpp) ----
        lib.dtw_backtrace.restype = ctypes.c_int32
        lib.dtw_backtrace.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]

        _lib = lib
        return _lib
