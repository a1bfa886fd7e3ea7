#!/usr/bin/env python
"""Micro-benchmark the int8 matmul paths on the local chip.

Compares, at SDXL/SD3 model shapes:
  bf16   — x @ dequant(W)     (the default QTensor compute path)
  xla    — utils/quant._qdot  (XLA act-quant chain + int8 dot)
  fused  — ops/int8_matmul.fused_quantized_dot (in-VMEM act quant)

    python scripts/tune_int8.py [--iters 50]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pcm_tpu.ops.int8_matmul import fused_quantized_dot
    from pcm_tpu.utils.profiling import device_timeit
    from pcm_tpu.utils.quant import quantize, quantized_dot
    print(f"# backend: {jax.default_backend()}", flush=True)

    # (M, K, N): SDXL attention/ff dims at 1024px (seq 4096) + SD3 (seq 4096+154),
    # plus pointwise-conv shapes (resnet conv_shortcut at 128/64/32px latent —
    # routed through this kernel under int8_matmul(which="fused"))
    shapes = [
        (4096, 640, 5120), (4096, 1280, 1280), (4096, 2048, 2048),
        (4250, 1536, 6144), (4096, 2560, 640), (1024, 1280, 10240),
        (16384, 320, 640), (4096, 640, 1280), (1024, 1280, 1280),
    ]
    rng = np.random.default_rng(0)
    for (m, k, n) in shapes:
        x = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(k, n)) * 0.05, jnp.float32)
        qt = quantize(w)
        wdq = (qt.values.astype(jnp.float32) * qt.scale).astype(jnp.bfloat16)

        bf16 = jax.jit(lambda a, b: (a @ b).astype(jnp.bfloat16))
        xla = jax.jit(lambda a, q=qt: quantized_dot(a, q, jnp.bfloat16))
        fused = jax.jit(lambda a, v=qt.values, s=qt.scale:
                        fused_quantized_dot(a, v, s, out_dtype=jnp.bfloat16))

        t_b = device_timeit(lambda: bf16(x, wdq), iters=args.iters)
        t_x = device_timeit(lambda: xla(x), iters=args.iters)
        t_f = device_timeit(lambda: fused(x), iters=args.iters)
        rel = float(jnp.linalg.norm(
            (fused(x) - bf16(x, wdq)).astype(jnp.float32))
            / jnp.linalg.norm(bf16(x, wdq).astype(jnp.float32)))
        print(f"({m},{k},{n}): bf16 {t_b*1e3:.3f} ms  xla-int8 {t_x*1e3:.3f} "
              f"({t_b/t_x:.2f}x)  fused {t_f*1e3:.3f} ({t_b/t_f:.2f}x)  "
              f"rel-err {rel:.4f}", flush=True)


if __name__ == "__main__":
    main()
