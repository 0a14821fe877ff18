"""Tracing and performance reporting.

The reference has no profiling beyond tqdm (SURVEY.md §5).  Here:

- :class:`StageTimer` — lightweight per-stage wall-time accumulator used by
  ``transcribe`` to attribute time to front-end / decode / word-timing and
  report the real-time factor (the framework's north-star metric);
- :func:`trace` — context manager around ``jax.profiler.trace`` for XLA-level
  traces viewable in TensorBoard/Perfetto;
- :func:`device_memory_stats` — live HBM usage of the backing device.
"""

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class StageTimer:
    """Accumulates wall time per named stage; ``block_until_ready``-safe."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self, audio_seconds: Optional[float] = None) -> Dict[str, float]:
        out = {f"{k}_seconds": round(v, 4) for k, v in self.totals.items()}
        total = sum(self.totals.values())
        out["total_seconds"] = round(total, 4)
        if audio_seconds is not None and total > 0:
            out["audio_seconds"] = round(audio_seconds, 3)
            out["rtf"] = round(audio_seconds / total, 2)
        return out


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/whisper_tpu_trace"):
    """Capture an XLA profiler trace (open with TensorBoard or Perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_memory_stats(device=None) -> Dict[str, int]:
    import jax

    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    return dict(stats) if stats else {}
