#!/usr/bin/env python
"""Decompose the distill step's time: each stage jitted and timed separately
on the chip, plus an optional jax.profiler trace of the fused step.

Usage: python scripts/profile_step.py [--family sdxl] [--resolution 1024]
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


def timeit(fn, *args, iters=5, warmup=1):
    from pcm_tpu.utils.profiling import device_timeit

    return device_timeit(fn, *args, iters=iters, warmup=warmup) / 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="sdxl")
    ap.add_argument("--resolution", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--trace-dir", default=None)
    ap.add_argument("--weights", default="bf16", choices=["bf16", "int8"],
                    help="int8 = weight-only quantized frozen kernels "
                         "(match the bench.py headline config)")
    args = ap.parse_args()

    from pcm_tpu.configs.families import sd15_bundle, sdxl_bundle
    from pcm_tpu.train.bundles import init_frozen_fast

    bundle = sdxl_bundle() if args.family == "sdxl" else sd15_bundle()
    frozen, lora = init_frozen_fast(bundle, 0)
    if args.weights == "int8":
        from pcm_tpu.utils.quant import quantize_frozen

        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            frozen = quantize_frozen(frozen)
    dev = jax.devices()[0]
    frozen = jax.device_put(frozen, dev)
    lora = jax.device_put(lora, dev)

    b = args.batch
    res = args.resolution
    lat = res // 8
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, lat, lat, 4), jnp.bfloat16)
    t = jnp.full((b,), 500.0)
    ctx_dim = bundle.unet_cfg.cross_attention_dim
    ctx = jnp.asarray(rng.randn(b, 77, ctx_dim), jnp.bfloat16)
    pixels = jnp.asarray(rng.rand(b, res, res, 3) * 2 - 1, jnp.bfloat16)
    ids = jnp.asarray(rng.randint(1, 49000, size=(b, 77)))
    added = None
    if args.family == "sdxl":
        added = {
            "text_embeds": jnp.asarray(rng.randn(b, 1280), jnp.bfloat16),
            "time_ids": jnp.tile(jnp.asarray([[res, res, 0, 0, res, res]], jnp.float32), (b, 1)),
        }
    cond = {"prompt_embeds": ctx, "added_cond": added}

    # stage timings
    teacher = jax.jit(lambda f, x_, t_: bundle.teacher(f, x_, t_, cond))
    dt = timeit(teacher, frozen, x, t)
    print(f"teacher fwd (bs{b}):            {dt*1000:8.1f} ms")

    x2 = jnp.concatenate([x, x]); t2 = jnp.concatenate([t, t])
    cond2 = jax.tree.map(lambda a: jnp.concatenate([a, a]) if hasattr(a, "shape") else a, cond)
    teacher2 = jax.jit(lambda f, x_, t_: bundle.teacher(f, x_, t_, cond2))
    dt = timeit(teacher2, frozen, x2, t2)
    print(f"teacher CFG fwd (bs{2*b}):      {dt*1000:8.1f} ms")

    student = jax.jit(lambda f, l, x_, t_: bundle.student(f, l, x_, t_, cond))
    dt = timeit(student, frozen, lora, x, t)
    print(f"student fwd (no grad, bs{b}):   {dt*1000:8.1f} ms")

    def loss(l, f, x_, t_):
        # frozen passed as an arg — closing over it would bake 5GB of
        # constants into the lowered graph
        return jnp.sum(bundle.student(f, l, x_, t_, cond).astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss))
    dt = timeit(g, lora, frozen, x, t)
    print(f"student fwd+bwd (remat, bs{b}): {dt*1000:8.1f} ms")

    from pcm_tpu.models.vae import AutoencoderKL

    vae_enc = jax.jit(
        lambda f, p: bundle._vae.apply({"params": f["vae"]}, p, jax.random.PRNGKey(0),
                                       method=AutoencoderKL.encode)
    )
    dt = timeit(vae_enc, frozen, pixels)
    print(f"vae encode (bs{b}, {res}px):    {dt*1000:8.1f} ms")

    text = jax.jit(lambda f, i: bundle._text.apply({"params": f["text"]}, i)[1])
    dt = timeit(text, frozen, ids)
    print(f"clip text (bs{b}):              {dt*1000:8.1f} ms")
    if hasattr(bundle, "_text2"):
        text2 = jax.jit(lambda f, i: bundle._text2.apply({"params": f["text2"]}, i)[2])
        dt = timeit(text2, frozen, ids)
        print(f"clip bigG (bs{b}):              {dt*1000:8.1f} ms")

    if args.trace_dir:
        jax.profiler.start_trace(args.trace_dir)
        for _ in range(3):
            out = g(lora, x, t)
        jax.block_until_ready(out)
        jax.profiler.stop_trace()
        print("trace written to", args.trace_dir)


if __name__ == "__main__":
    main()
