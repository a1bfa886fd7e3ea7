#!/usr/bin/env python
"""Measure the encoders' algorithmic FLOPs (VAE encode + text stacks) via
XLA cost analysis of an encoders-only jit.

Purpose: the SD3 full-workload remat-free step does not fit the chip
(15.98 G, OOM by ~240 M both elementwise dispatches — docs/ROUND5_NOTES.md),
so its remat-free algo constant cannot be measured directly. Instead:

  full_constant = cached-workload remat-free flops (measured: bs1 none)
                + encoders-only flops (this script)

Both pieces ARE measurable remat-free; the sum is the same accounting the
SDXL constant got from one compile.

Usage: python scripts/encoder_flops.py [--family sd3] [--resolution 1024]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from pcm_tpu.utils.cachedirs import setup_compile_cache

setup_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="sd3", choices=["sd15", "sdxl", "sd3"])
    ap.add_argument("--resolution", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    from pcm_tpu.configs.families import sd3_bundle, sd15_bundle, sdxl_bundle
    from pcm_tpu.utils.compilelock import compile_lock
    from pcm_tpu.utils.deviceinit import device_init

    bundle = {
        "sd15": lambda: sd15_bundle(remat=False),
        "sdxl": lambda: sdxl_bundle(remat=False),
        "sd3": lambda: sd3_bundle(remat=False),
    }[args.family]()
    frozen, _ = device_init(bundle, seed=0, weights="int8")

    rng = np.random.RandomState(0)
    b, res = args.batch, args.resolution
    batch = {
        "pixel_values": jnp.asarray(rng.rand(b, res, res, 3) * 2 - 1, jnp.bfloat16),
        "input_ids": jnp.asarray(rng.randint(1, 49000, size=(b, 77))),
    }
    if args.family == "sdxl":
        batch["input_ids_2"] = jnp.asarray(rng.randint(1, 49000, size=(b, 77)))
        batch["time_ids"] = jnp.tile(
            jnp.asarray([[res, res, 0, 0, res, res]], jnp.float32), (b, 1))
    elif args.family == "sd3":
        batch["input_ids_2"] = jnp.asarray(rng.randint(1, 49000, size=(b, 77)))
        batch["input_ids_3"] = jnp.asarray(rng.randint(1, 32000, size=(b, 77)))
        mcfg = bundle.mmdit_cfg
        batch["uncond_embeds"] = jnp.zeros((b, 154, mcfg.joint_attention_dim), jnp.bfloat16)
        batch["uncond_pooled"] = jnp.zeros((b, mcfg.pooled_projection_dim), jnp.bfloat16)
    elif args.family == "sd15":
        batch["uncond_embeds"] = jnp.zeros(
            (b, 77, bundle.unet_cfg.cross_attention_dim), jnp.bfloat16)

    def enc(fz, bt, key):
        return bundle.encode(fz, bt, key)

    with compile_lock("encoder flops"):
        compiled = jax.jit(enc).lower(frozen, batch, jax.random.PRNGKey(0)).compile()
    flops = float(compiled.cost_analysis()["flops"])
    print(f"encoders-only ({args.family}, bs{b}, {res}px): "
          f"{flops:.4e} flops total, {flops/b:.4e}/sample")


if __name__ == "__main__":
    main()
