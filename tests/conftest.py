import os
import random as _random
import sys

import numpy as np
import pytest

# tests run on CPU: force the platform before any jax computation (the axon
# TPU plugin otherwise wins regardless of JAX_PLATFORMS), and give sharding
# tests an 8-device virtual mesh
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(__file__))

JFK = os.path.join(os.path.dirname(__file__), "jfk.flac")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "reference: requires the reference checkout at /root/reference"
    )


def pytest_collection_modifyitems(config, items):
    if os.path.isdir("/root/reference"):
        return
    skip = pytest.mark.skip(reason="reference checkout not available")
    n = 0
    for item in items:
        if "reference" in item.keywords:
            item.add_marker(skip)
            n += 1
    if n:
        import warnings

        warnings.warn(
            f"/root/reference not found: SKIPPING {n} reference-parity tests "
            "(token-exactness, transcribe/writers/timing parity). The remaining "
            "suite is smoke coverage only — do NOT treat a green run as parity.",
            stacklevel=1,
        )


@pytest.fixture
def random():
    _random.seed(42)
    np.random.seed(42)


# The XLA CPU compiler segfaults deterministically once a single process has
# accumulated ~190 tests' worth of live compiled executables (observed at
# tests/test_speculative.py::test_speculative_buffer_cap in full-suite runs;
# every sub-slice of the suite passes in isolation).  Dropping the jit caches
# between modules bounds that accumulation — modules rarely share programs
# (different model dims per file), so the recompile cost is minor.
@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    yield
    jax.clear_caches()
