#!/usr/bin/env python
"""Locate the MMDiT (SD3) forward's MFU gap: time the pieces on-chip.

The SD3 distill step sits at ~21% hardware MFU even remat-free while the
SDXL step reaches ~40% (docs/PERF.md) — this times (a) the bare teacher
forward, (b) the student fwd+bwd, (c) the flash-attention kernel at the
joint-sequence shape, (d) a bare dense-chain matmul at MMDiT shapes, and
(e) the AdaLN modulation elementwise chain, each jitted separately and
fenced (utils/profiling.device_timeit — block_until_ready is not a fence
on axon).

Usage: python scripts/profile_mmdit.py [--batch 1] [--resolution 1024]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from pcm_tpu.utils.cachedirs import setup_compile_cache

setup_compile_cache()


def t(name, fn, *args, iters=10):
    from pcm_tpu.utils.compilelock import compile_lock
    from pcm_tpu.utils.profiling import device_timeit

    with compile_lock(f"profile_mmdit {name}"):
        ms = device_timeit(jax.jit(fn), *args, iters=iters, warmup=1)
    print(f"{name:28s} {ms:8.2f} ms")
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--resolution", type=int, default=1024)
    ap.add_argument("--weights", default="int8", choices=["bf16", "int8"])
    args = ap.parse_args()

    from pcm_tpu.configs.families import sd3_bundle
    from pcm_tpu.ops import flash_attention
    from pcm_tpu.utils.deviceinit import device_init

    bundle = sd3_bundle(remat=False)
    t0 = time.time()
    frozen, lora = device_init(bundle, seed=0, weights=args.weights)
    jax.block_until_ready(jax.tree_util.tree_leaves(lora)[:1])
    print(f"# init {time.time()-t0:.1f}s", file=sys.stderr)
    # drop the encoder towers (T5-XXL/CLIP/VAE, ~5.7 G) — only the MMDiT is
    # profiled, and keeping them OOMs the remat-free fwd+bwd at bs1
    frozen = {"mmdit": frozen["mmdit"]}

    cfg = bundle.mmdit_cfg
    b = args.batch
    lat = args.resolution // 8
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, lat, lat, cfg.in_channels), jnp.bfloat16)
    ts = jnp.full((b,), 500.0)
    cond = {
        "prompt_embeds": jnp.asarray(
            rng.randn(b, 154, cfg.joint_attention_dim), jnp.bfloat16
        ),
        "pooled": jnp.asarray(
            rng.randn(b, cfg.pooled_projection_dim), jnp.bfloat16
        ),
    }

    def teacher_fwd(fz, xx):
        return bundle.teacher(fz, xx, ts, cond)

    t("teacher fwd", teacher_fwd, frozen, x)

    # NOTE: frozen must be an ARGUMENT everywhere — a closure would bake the
    # 2.15 GB tree into the graph as constants and the remote-compile POST
    # dies with a broken pipe.
    def student_loss(fz, lo, xx):
        out = bundle.student(fz, lo, xx, ts, cond)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    t("student fwd", student_loss, frozen, lora, x)
    t("student fwd+bwd", lambda fz, lo, xx: jax.grad(student_loss, argnums=1)(fz, lo, xx),
      frozen, lora, x)

    # flash attention at the joint-sequence shape (24 heads x 64)
    seq = (lat // cfg.patch_size) ** 2 + 154
    q = jnp.asarray(rng.randn(b, seq, cfg.num_heads, cfg.head_dim), jnp.bfloat16)
    fa_flops = 4 * b * seq * seq * cfg.inner_dim  # QK^T + AV
    ms = t("flash attn fwd (1 block)", lambda a: flash_attention(a, a, a), q)
    print(f"  -> {fa_flops/ms*1e-9:.1f} TFLOP/s")

    def fa_bwd(a):
        return jax.grad(
            lambda z: jnp.sum(flash_attention(z, z, z).astype(jnp.float32))
        )(a)

    ms = t("flash attn fwd+bwd", fa_bwd, q, iters=5)
    print(f"  -> {3.5*fa_flops/ms*1e-9:.1f} TFLOP/s (approx 3.5x fwd flops)")

    # bare dense chain: 10 x (seq,1536)@(1536,1536) matmuls
    w = jnp.asarray(rng.randn(cfg.inner_dim, cfg.inner_dim) * 0.02, jnp.bfloat16)
    h0 = jnp.asarray(rng.randn(b, seq, cfg.inner_dim), jnp.bfloat16)

    def dense_chain(h, ww):
        for _ in range(10):
            h = jnp.dot(h, ww)
        return h

    ms = t("dense chain x10", dense_chain, h0, w)
    dflops = 10 * 2 * b * seq * cfg.inner_dim * cfg.inner_dim
    print(f"  -> {dflops/ms*1e-9:.1f} TFLOP/s")

    # same chain but with int8-stored weights dequantized per use — isolates
    # the QTensor dequant-materialization cost the int8 storage default pays
    # on every forward (MMDiT frozen is ~2.3 GB int8 -> 4.6 GB bf16 per pass
    # if XLA does not fuse the dequant into the dot)
    from pcm_tpu.utils.quant import QTensor, quantize

    # 10 DISTINCT stacked int8 weights (a single reused one would be CSE'd
    # into one dequant and hide the per-layer cost)
    ws = jnp.stack([w * (1.0 + 0.01 * i) for i in range(10)])
    qs = quantize(ws, stacked=True)

    def dense_chain_q(h, q):
        for i in range(10):
            wi = QTensor(q.values[i], q.scale[i], q.logical_dtype)
            h = jnp.dot(h, wi.astype(jnp.bfloat16))
        return h

    ms = t("dense chain x10 (int8 deq)", dense_chain_q, h0, qs)
    print(f"  -> {dflops/ms*1e-9:.1f} TFLOP/s")

    # AdaLN-style modulation chain (LN + scale/shift/gate), 10x
    g = jnp.asarray(rng.randn(b, cfg.inner_dim), jnp.bfloat16)

    def mod_chain(h, gg):
        for _ in range(10):
            m = jnp.mean(h.astype(jnp.float32), axis=-1, keepdims=True)
            v = jnp.mean(jnp.square(h.astype(jnp.float32) - m), axis=-1, keepdims=True)
            hn = ((h.astype(jnp.float32) - m) * jax.lax.rsqrt(v + 1e-6)).astype(h.dtype)
            h = h + gg[:, None] * (hn * (1.0 + gg[:, None]) + gg[:, None])
        return h

    t("modulation chain x10", mod_chain, h0, g)


if __name__ == "__main__":
    main()
