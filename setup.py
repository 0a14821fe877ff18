"""Build hooks: compile the native C++ runtime into the wheel.

``whisper_tpu/native`` is a plain shared library loaded via ctypes (not a
CPython extension module), so the stock build_ext naming (ABI-tagged
``.cpython-312-*.so``) is wrong for it.  This custom command compiles
``libwhisper_native.so`` with the same flags the first-import fallback
uses (native/__init__.py), placing it inside the package so an installed
wheel never compiles at import time.  Environments without a C++
toolchain can still build with ``WHISPER_TPU_SKIP_NATIVE=1`` — the
runtime then falls back to the pure-Python implementations.
"""

import os
import subprocess

from setuptools import Extension, setup
from setuptools.command.build_ext import build_ext

SOURCES = ["bpe.cpp", "audioio.cpp", "dtw.cpp"]


class NativeBuildExt(build_ext):
    def get_ext_filename(self, fullname):
        # plain SONAME, no CPython ABI tag: the library is dlopen'd by
        # ctypes, not imported
        parts = fullname.split(".")
        return os.path.join(*parts[:-1], "libwhisper_native.so")

    def build_extension(self, ext):
        if os.environ.get("WHISPER_TPU_SKIP_NATIVE") == "1":
            return
        out = self.get_ext_fullpath(ext.name)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        src_dir = os.path.join(os.path.dirname(__file__), "whisper_tpu", "native")
        cmd = [
            "g++", "-O3", "-fPIC", "-std=c++17", "-shared", "-o", out,
        ] + [os.path.join(src_dir, s) for s in SOURCES]
        subprocess.run(cmd, check=True)


setup(
    ext_modules=[
        Extension(
            "whisper_tpu.native.libwhisper_native",
            sources=[f"whisper_tpu/native/{s}" for s in SOURCES],
        )
    ],
    cmdclass={"build_ext": NativeBuildExt},
)
