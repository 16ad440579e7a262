"""Profiling / tracing subsystem.

The reference has none (``torch-tb-profiler`` pinned but never imported; the
only instrumentation is a caller-less CUDA memory printout, reference
``src/utils.py:3-10``). The TPU build treats tracing as first-class:
``jax.profiler`` traces on demand plus cheap per-step wall-clock timing with
device-sync so numbers mean what they say.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


def memory_usage(device: Optional[jax.Device] = None) -> Dict[str, float]:
    """Device memory stats in GiB (the ``utils.memory_usage`` equivalent,
    reference ``src/utils.py:3-10``, which printed CUDA allocator stats)."""
    device = device or jax.devices()[0]
    stats = device.memory_stats() or {}
    gib = 1024**3
    return {
        "bytes_in_use_gib": stats.get("bytes_in_use", 0) / gib,
        "peak_bytes_in_use_gib": stats.get("peak_bytes_in_use", 0) / gib,
        "bytes_limit_gib": stats.get("bytes_limit", 0) / gib,
    }


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard or Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timer that blocks on device results, keeping a rolling
    window of durations; reports mean/p50/p90 and steps/sec."""

    def __init__(self, window: int = 100):
        self.window = window
        self._durs: List[float] = []
        self._t: Optional[float] = None

    def start(self) -> None:
        self._t = time.perf_counter()

    def stop(self, *sync_arrays) -> float:
        for a in sync_arrays:
            jax.block_until_ready(a)
        dur = time.perf_counter() - self._t
        self._durs.append(dur)
        if len(self._durs) > self.window:
            self._durs.pop(0)
        return dur

    def stats(self) -> Dict[str, float]:
        if not self._durs:
            return {}
        ds = sorted(self._durs)
        n = len(ds)
        mean = sum(ds) / n
        return {
            "step_ms_mean": mean * 1e3,
            "step_ms_p50": ds[n // 2] * 1e3,
            "step_ms_p90": ds[min(n - 1, int(0.9 * n))] * 1e3,
            "steps_per_sec": 1.0 / mean if mean > 0 else 0.0,
        }
