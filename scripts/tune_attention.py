#!/usr/bin/env python
"""Sweep flash-attention block sizes on the real chip at the shapes the
SDXL/SD1.5/SD3 models actually run (self-attn seq 4096/1024, d=64; cross-attn
kv=77). Reports fwd and fwd+bwd ms per config; used to pick the defaults in
`pcm_tpu/ops/flash_attention.py:_block_sizes`.
"""

import argparse
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from pcm_tpu.utils.cachedirs import setup_compile_cache

setup_compile_cache()

from pcm_tpu.ops import flash_attention
from pcm_tpu.utils.profiling import device_timeit as timeit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    # (label, b, h, sq, sk, d) — SDXL 1024px self-attn at the two transformer
    # levels, cross-attn, and SD3 MMDiT joint seq (4096 img + 154 txt)
    shapes = [
        ("sdxl-L1-self", 2, 10, 4096, 4096, 64),
        ("sdxl-L2-self", 2, 20, 1024, 1024, 64),
        ("sdxl-L1-cross", 2, 10, 4096, 77, 64),
        ("sd3-joint", 2, 24, 4250, 4250, 64),
    ]
    blocks = [256, 512, 1024, 2048]

    rng = np.random.RandomState(0)
    for label, b, h, sq, sk, d in shapes:
        q = jnp.asarray(rng.randn(b, sq, h, d), jnp.bfloat16)
        k = jnp.asarray(rng.randn(b, sk, h, d), jnp.bfloat16)
        v = jnp.asarray(rng.randn(b, sk, h, d), jnp.bfloat16)

        print(f"== {label}  b={b} h={h} sq={sq} sk={sk} d={d}", flush=True)
        best = (None, 1e9, 1e9)
        for bq, bk in itertools.product(blocks, blocks):
            if bq > sq * 2 or bk > max(sk, 128) * 2:
                continue

            fwd = jax.jit(lambda q_, k_, v_, _bq=bq, _bk=bk: flash_attention(
                q_, k_, v_, block_q=_bq, block_k=_bk))

            def loss(q_, k_, v_, _bq=bq, _bk=bk):
                o = flash_attention(q_, k_, v_, block_q=_bq, block_k=_bk)
                return jnp.sum(o.astype(jnp.float32) ** 2)

            fb = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
            try:
                t_f = timeit(fwd, q, k, v, iters=args.iters)
                t_fb = timeit(fb, q, k, v, iters=args.iters)
            except Exception as e:  # noqa: BLE001 — OOM/VMEM configs just get skipped
                print(f"  bq={bq:5d} bk={bk:5d}  FAILED: {type(e).__name__}", flush=True)
                continue
            mark = ""
            if t_fb < best[2]:
                best = ((bq, bk), t_f, t_fb)
                mark = "  <-- best fwd+bwd"
            print(f"  bq={bq:5d} bk={bk:5d}  fwd {t_f:7.3f}ms  fwd+bwd {t_fb:7.3f}ms{mark}",
                  flush=True)
        print(f"  BEST {label}: bq,bk={best[0]}  fwd {best[1]:.3f}ms fwd+bwd {best[2]:.3f}ms",
              flush=True)


if __name__ == "__main__":
    main()
