"""Profiling helpers: jax.profiler traces + per-step timing (SURVEY.md §5 —
the reference has no tracing; here steps/sec and device traces are
first-class)."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


def device_fence(out) -> float:
    """True execution fence: pull one scalar to the host.

    On the axon remote TPU backend `jax.block_until_ready` returns before the
    device has executed anything (measured: un-fenced 8192^3 matmul loops
    report >20 PFLOP/s); only a device->host readback blocks on completion.
    Reduces the first array leaf to a scalar on-device and floats it.
    """
    import jax.numpy as jnp

    leaf = next(x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "dtype"))
    return float(jnp.sum(leaf.astype(jnp.float32)))


def device_timeit(fn, *args, iters: int = 20, warmup: int = 3) -> float:
    """Milliseconds per call, measured with a real device fence.

    The readback roundtrip (~60 ms to the remote chip) is measured on a
    ready output and subtracted, then the fenced loop is amortized over
    `iters`. Calls need not be chained: repeated identical executions are
    genuinely re-run by the backend (verified, no dedupe).
    """
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    device_fence(out)
    t0 = time.perf_counter()
    device_fence(out)
    t_fence = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    device_fence(out)
    return max(time.perf_counter() - t0 - t_fence, 0.0) / iters * 1000.0


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
