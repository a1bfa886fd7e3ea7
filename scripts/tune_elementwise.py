#!/usr/bin/env python
"""Fenced on-chip comparison of the Pallas GroupNorm+SiLU and GEGLU kernels
against their XLA oracles, at the shapes the SDXL/SD1.5 UNets actually run.
Decides whether the fused kernels stay on the hot path (earlier measurements
used a broken fence — see pcm_tpu/utils/profiling.py:device_fence).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from pcm_tpu.utils.cachedirs import setup_compile_cache

setup_compile_cache()

from pcm_tpu.ops import geglu, geglu_reference, group_norm_silu, group_norm_silu_reference
from pcm_tpu.utils.profiling import device_timeit

rng = np.random.RandomState(0)


def bench_pair(name, fused, oracle, args, grad_wrt=(0,)):
    f_fused = jax.jit(fused)
    f_oracle = jax.jit(oracle)
    t1 = device_timeit(f_fused, *args, iters=150)
    t2 = device_timeit(f_oracle, *args, iters=150)

    def loss(fn):
        def g(*a):
            return jnp.sum(fn(*a).astype(jnp.float32) ** 2)
        return g

    g_fused = jax.jit(jax.grad(loss(fused), argnums=grad_wrt))
    g_oracle = jax.jit(jax.grad(loss(oracle), argnums=grad_wrt))
    t3 = device_timeit(g_fused, *args, iters=150)
    t4 = device_timeit(g_oracle, *args, iters=150)
    print(f"{name}: fwd pallas {t1:7.3f}ms xla {t2:7.3f}ms | "
          f"fwd+bwd pallas {t3:7.3f}ms xla {t4:7.3f}ms", flush=True)


def main():
    # GroupNorm shapes: SDXL 1024px levels (N, H, W, C) with 32 groups
    for (n, hw, c) in [(2, 128, 320), (2, 64, 640), (2, 32, 1280), (1, 128, 1280)]:
        x = jnp.asarray(rng.randn(n, hw, hw, c), jnp.bfloat16)
        gamma = jnp.asarray(rng.randn(c), jnp.float32)
        beta = jnp.asarray(rng.randn(c), jnp.float32)
        bench_pair(f"GN+SiLU n{n} {hw}x{hw}x{c}", group_norm_silu,
                   group_norm_silu_reference, (x, gamma, beta))

    # GEGLU shapes: SDXL transformer FF (seq, model_dim) -> 4x inner
    for (b, s, k) in [(2, 4096, 640), (2, 1024, 1280)]:
        x = jnp.asarray(rng.randn(b, s, k), jnp.bfloat16)
        w = jnp.asarray(rng.randn(k, 8 * k) / np.sqrt(k), jnp.bfloat16)
        bias = jnp.zeros((8 * k,), jnp.bfloat16)
        bench_pair(f"GEGLU b{b} s{s} k{k}", geglu, geglu_reference,
                   (x, w, bias), grad_wrt=(0, 1))


if __name__ == "__main__":
    main()
