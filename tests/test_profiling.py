"""Tests for the timing helpers every on-chip measurement relies on
(SURVEY.md §5 tracing/profiling; axon gotcha: block_until_ready is not an
execution fence, so device_fence/device_timeit are the only trusted clocks)."""

import jax
import jax.numpy as jnp
import numpy as np

from pcm_tpu.utils.profiling import StepTimer, device_fence, device_timeit


def test_device_fence_returns_scalar_sum():
    out = {"a": jnp.arange(4, dtype=jnp.bfloat16), "meta": 3}
    assert device_fence(out) == 6.0


def test_device_timeit_positive_and_scales():
    f_small = jax.jit(lambda x: x @ x)
    f_big = jax.jit(lambda x: ((x @ x) @ x) @ x)
    x = jnp.asarray(np.random.RandomState(0).randn(256, 256), jnp.float32)
    t_small = device_timeit(f_small, x, iters=20, warmup=2)
    t_big = device_timeit(f_big, x, iters=20, warmup=2)
    assert t_small >= 0.0
    assert t_big > t_small  # 3 matmuls cost more than 1


def test_step_timer_window():
    st = StepTimer(window=4)
    assert st.tick() == {}
    for _ in range(5):
        m = st.tick()
    assert len(st.times) == 4
    assert m["steps_per_sec"] > 0
    assert abs(m["step_time_ms"] - 1000.0 / m["steps_per_sec"]) < 1e-6
