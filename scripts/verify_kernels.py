#!/usr/bin/env python
"""On-chip (compiled, non-interpret) kernel sanity at production shapes.

CI runs the kernels through the Pallas interpreter on CPU (tests/test_ops.py);
this script is the TPU half of the story: compile each kernel at the SDXL-size
shapes the train step actually uses and compare against the XLA oracle on the
chip. Exits non-zero on any tolerance miss so it can gate a detached queue.

Usage: python scripts/verify_kernels.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from pcm_tpu.utils.cachedirs import setup_compile_cache

setup_compile_cache()

FAILS = []


def check(name, got, want, tol):
    d = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
    ok = d <= tol
    print(f"{'ok ' if ok else 'FAIL'} {name}: max|diff|={d:.3e} (tol {tol:g})", flush=True)
    if not ok:
        FAILS.append(name)


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.RandomState(0)

    # --- GEGLU at the SDXL FF shapes (k=1280 -> bk=256 divisor path; k=640
    # -> bk=128; both read the (K, 2F) weight in place via BlockSpec) -------
    from pcm_tpu.ops.geglu import _geglu, geglu_reference

    for m, k in [(4096, 1280), (4096, 640), (1024, 2560)]:
        f = 4 * k
        x = jnp.asarray(rng.randn(m, k) * 0.5, jnp.bfloat16)
        w = jnp.asarray(rng.randn(k, 2 * f) * (1.0 / np.sqrt(k)), jnp.bfloat16)
        b = jnp.asarray(rng.randn(2 * f) * 0.02, jnp.bfloat16)
        got = jax.jit(lambda x, w, b: _geglu(x, w, b, False))(x, w, b)
        want = geglu_reference(x, w, b)
        # bf16 inputs, fp32 accum in both paths; gelu approximations differ
        # by <=1.5e-7 but bf16 rounding of ~O(1) outputs quantizes at ~1e-2
        check(f"geglu m{m} k{k}", got, want, 5e-2)

    # --- GroupNorm+SiLU at UNet / VAE-decode scales ------------------------
    from pcm_tpu.ops.groupnorm import _group_norm_silu, group_norm_silu_reference

    for shape in [(1, 128, 128, 1280), (1, 512, 512, 512)]:
        x = jnp.asarray(rng.randn(*shape), jnp.bfloat16)
        gamma = jnp.asarray(rng.randn(shape[-1]) * 0.1 + 1.0, jnp.bfloat16)
        beta = jnp.asarray(rng.randn(shape[-1]) * 0.1, jnp.bfloat16)
        got = jax.jit(
            lambda x, g, b: _group_norm_silu(x, g, b, 32, 1e-5, "silu", False)
        )(x, gamma, beta)
        want = group_norm_silu_reference(x, gamma, beta, 32)
        check(f"groupnorm {shape}", got, want, 5e-2)

    # --- Flash attention at SDXL 1024px self-attn scale --------------------
    from pcm_tpu.ops import attention_reference, flash_attention

    q = jnp.asarray(rng.randn(2, 4096, 10, 64), jnp.bfloat16)
    k = jnp.asarray(rng.randn(2, 4096, 10, 64), jnp.bfloat16)
    v = jnp.asarray(rng.randn(2, 4096, 10, 64), jnp.bfloat16)
    got = jax.jit(flash_attention)(q, k, v)
    want = attention_reference(q, k, v)
    check("flash_attention 4096", got, want, 2e-2)

    # grad path (bwd kernels) at a 1024-seq slice
    def loss(fn):
        return lambda q, k, v: jnp.sum(jnp.sin(fn(q, k, v).astype(jnp.float32)))

    q1, k1, v1 = q[:1, :1024], k[:1, :1024], v[:1, :1024]
    g = jax.jit(jax.grad(loss(flash_attention), argnums=(0, 1, 2)))(q1, k1, v1)
    g_ref = jax.grad(loss(attention_reference), argnums=(0, 1, 2))(q1, k1, v1)
    for a, b_, n in zip(g, g_ref, "qkv"):
        check(f"flash_attention d{n}", a, b_, 5e-2)

    if FAILS:
        print(f"FAILED: {FAILS}", flush=True)
        sys.exit(1)
    print("all kernel checks passed", flush=True)


if __name__ == "__main__":
    main()
