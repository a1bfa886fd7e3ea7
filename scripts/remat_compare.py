#!/usr/bin/env python
"""Compare remat configurations for the SDXL student fwd+bwd at 1024px on the
real chip: full remat (save-nothing), remat with dots-saveable policy, and no
remat. Prints ms per variant; used to pick the bench/train default.
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
    ap.add_argument("--resolution", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--variants", nargs="*", default=["full", "dots", "none"])
    args = ap.parse_args()

    from pcm_tpu.lora.layers import LoRASpec
    from pcm_tpu.models.unet import SDXL_CONFIG, UNet2DCondition
    from pcm_tpu.train.bundles import SD_UNET_LORA_TARGETS

    b, lat = args.batch, args.resolution // 8
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, lat, lat, 4), jnp.bfloat16)
    t = jnp.full((b,), 500.0)
    ctx = jnp.asarray(rng.randn(b, 77, 2048), jnp.bfloat16)
    added = {
        "text_embeds": jnp.asarray(rng.randn(b, 1280), jnp.bfloat16),
        "time_ids": jnp.tile(
            jnp.asarray([[args.resolution, args.resolution, 0, 0,
                          args.resolution, args.resolution]], jnp.float32), (b, 1)),
    }

    lora_spec = LoRASpec(rank=64, targets=SD_UNET_LORA_TARGETS)

    import __graft_entry__ as ge  # reuse the structure-only fast init

    _fn0, (params0, lora0, *_rest) = ge.entry()
    dev = jax.devices()[0]
    params0 = jax.device_put(params0, dev)
    lora0 = jax.device_put(lora0, dev)

    variants = {
        "full": dict(remat=True, remat_policy=None),
        "dots": dict(remat=True, remat_policy="dots"),
        "none": dict(remat=False, remat_policy=None),
    }
    for name in args.variants:
        kw = variants[name]
        model = UNet2DCondition(SDXL_CONFIG, dtype=jnp.bfloat16, lora=lora_spec, **kw)

        def loss(l, p, x_, t_):
            out = model.apply({"params": p, "lora": l}, x_, t_, ctx, added)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        g = jax.jit(jax.grad(loss))
        t0 = time.time()
        try:
            dt = timeit(g, lora0, params0, x, t)
            print(f"{name:5s}: fwd+bwd {dt*1000:8.1f} ms   (compile {time.time()-t0:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"{name:5s}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)

    # reference point: plain teacher fwd
    model = UNet2DCondition(SDXL_CONFIG, dtype=jnp.bfloat16)
    fwd = jax.jit(lambda p, x_, t_: model.apply({"params": p}, x_, t_, ctx, added))
    dt = timeit(fwd, params0, x, t)  # params passed as arg (no captured consts)
    print(f"fwd only:        {dt*1000:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
