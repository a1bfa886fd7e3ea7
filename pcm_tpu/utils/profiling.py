"""Profiling helpers: jax.profiler traces + per-step timing (SURVEY.md §5 —
the reference has no tracing; here steps/sec and device traces are
first-class)."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling steps/sec + wall-time accounting."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times = []

    def tick(self) -> Dict[str, float]:
        now = time.perf_counter()
        self.times.append(now)
        if len(self.times) > self.window:
            self.times.pop(0)
        if len(self.times) < 2:
            return {}
        dt = (self.times[-1] - self.times[0]) / (len(self.times) - 1)
        return {"step_time_ms": dt * 1000.0, "steps_per_sec": 1.0 / dt}
