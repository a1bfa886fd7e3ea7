#!/usr/bin/env python
"""Minimal repro for the int8 spatial-conv full-graph pathology.

Round-2 finding (docs/PERF.md "int8 MXU compute", docs/ROUND2_NOTES.md
session 2): per-op, XLA's int8 conv is fine (0.44-1.45x bf16), but the full
SDXL train step regressed 30x with `int8_matmul(which='conv'|'both')`. The
bisect pointed at `quantized_conv` with dynamic activation quantization in a
CHAIN of convs. This script reproduces that with the smallest graph that
shows the cliff: a UNet-ish chain of conv3x3+GroupNorm+SiLU blocks, measured
(a) as one op, (b) as an N-block chain, under the dequant-bf16 vs the int8
act-quant conv path.

Expected result (v5e, see docs/PERF.md): single-op ratio ~1x; chained ratio
blows up — the unfused act-quant (abs-max reduce + rescale, an extra HBM
round-trip per conv) serializes against the conv and defeats XLA's fusion of
the norm/act epilogues into the next conv. This is why 'conv'/'both' are
bisect-only modes: production int8 is weight-only dequant ('dense'/'fused',
which touch only MXU dots where the quant fuses in-VMEM).

Usage:  python scripts/repro_int8_conv.py [--blocks 8] [--hw 64] [--ch 640]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pcm_tpu.utils.cachedirs import setup_compile_cache

setup_compile_cache()

import warnings

import jax
import jax.numpy as jnp
import numpy as np

from pcm_tpu.utils.profiling import device_timeit
from pcm_tpu.utils.quant import int8_matmul, quantize, quantized_conv


def build_chain(n_blocks: int, ch: int, groups: int = 32):
    rng = np.random.RandomState(0)
    kernels = [
        quantize(jnp.asarray(rng.randn(3, 3, ch, ch) * (1 / np.sqrt(9 * ch)),
                             jnp.bfloat16))
        for _ in range(n_blocks)
    ]

    def block(x, qt):
        y = quantized_conv(x, qt, jnp.bfloat16)
        # GroupNorm + SiLU epilogue, as in every UNet resnet block
        b, h, w, c = y.shape
        g = y.reshape(b, h, w, groups, c // groups).astype(jnp.float32)
        mu = g.mean(axis=(1, 2, 4), keepdims=True)
        var = g.var(axis=(1, 2, 4), keepdims=True)
        g = (g - mu) * jax.lax.rsqrt(var + 1e-5)
        y = g.reshape(b, h, w, c).astype(jnp.bfloat16)
        return y * jax.nn.sigmoid(y)

    def chain(x):
        for qt in kernels:
            x = block(x, qt)
        return x

    def single(x):
        return quantized_conv(x, kernels[0], jnp.bfloat16)

    return single, chain


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=8)
    ap.add_argument("--hw", type=int, default=64)
    ap.add_argument("--ch", type=int, default=640)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    single, chain = build_chain(args.blocks, args.ch)
    x = jnp.asarray(
        np.random.RandomState(1).randn(args.batch, args.hw, args.hw, args.ch),
        jnp.bfloat16,
    )

    results = {}
    for name, fn in [("single", single), (f"chain{args.blocks}", chain)]:
        for mode in ["bf16-dequant", "int8-conv"]:
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")  # the bisect-mode warning
                ctx = (int8_matmul(which="conv") if mode == "int8-conv"
                       else int8_matmul(enable=False))
                with ctx:
                    compiled = jax.jit(fn).lower(x).compile()
            ms = device_timeit(lambda xx: compiled(xx), x)
            results[(name, mode)] = ms
            print(f"{name:10s} {mode:13s} {ms:9.3f} ms", flush=True)

    for name in ("single", f"chain{args.blocks}"):
        r = results[(name, "int8-conv")] / results[(name, "bf16-dequant")]
        print(f"{name:10s} int8/bf16 ratio = {r:.2f}x")


if __name__ == "__main__":
    main()
