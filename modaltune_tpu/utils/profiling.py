"""Profiling helpers (aux subsystem; the reference has none beyond MoE
all-to-all CUDA-event timing, SURVEY.md §5 — here: `jax.profiler` traces
plus a lightweight step timer)."""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard/Perfetto)."""
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling per-step wall-time stats. Call ``sync()``-style by passing
    a device value whose materialization forces the step (remote
    transports may report buffer readiness early, so timing must be
    anchored on a host value fetch)."""

    def __init__(self):
        self.times = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_value=None) -> float:
        if sync_value is not None:
            float(jax.device_get(sync_value).ravel()[0])
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        t = sorted(self.times)
        n = len(t)
        return {
            "steps": n,
            "mean_s": sum(t) / n,
            "p50_s": t[n // 2],
            "p90_s": t[int(n * 0.9)],
            "total_s": sum(t),
        }
