#!/usr/bin/env python
"""Benchmark: SDXL 1024px PCM-LoRA distillation throughput on one TPU chip.

Measures the full fused distillation step (text encode + VAE encode + CFG
teacher + student + stop-grad target + LoRA AdamW update) — the same work the
reference does per optimizer step on an A800 (`train_pcm_lora_sdxl_adv.py`
hot loop, minus the GAN alternation which halves its student updates).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline: measured samples/sec/chip divided by an analytic estimate of the
reference's per-GPU throughput — identical math FLOPs (taken from this very
compiled step via XLA cost analysis) executed at 312 TFLOP/s fp16 peak x 35%
MFU, a generous efficiency for the reference's eager torch + xformers + grad
checkpointing pipeline (the repo publishes no numbers to anchor against,
BASELINE.md).
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

A800_PEAK_FLOPS = 312e12
REF_ASSUMED_MFU = 0.35


def build(family: str, resolution: int, batch: int, lora_rank: int):
    from pcm_tpu.configs.families import sd15_bundle, sdxl_bundle
    from pcm_tpu.core import make_ddpm_schedule
    from pcm_tpu.train.distill import DistillConfig, build_ddim_distill_step
    from pcm_tpu.train.state import TrainState, make_optimizer

    if family == "sdxl":
        bundle = sdxl_bundle(lora_rank=lora_rank, remat=True)
        cfg = DistillConfig(num_solver_steps=40, multiphase=4, w_min=6, w_max=7)
    elif family == "sd15":
        bundle = sd15_bundle(lora_rank=lora_rank, remat=True)
        cfg = DistillConfig(num_solver_steps=50, multiphase=4, w_min=4, w_max=5)
    else:
        raise ValueError(family)

    schedule = make_ddpm_schedule()
    tx = make_optimizer(2e-6)
    t0 = time.time()
    # init on the host CPU backend (the TPU remote compiler chokes on the
    # billion-parameter init graph), then push bf16 weights to the chip
    from pcm_tpu.train.bundles import init_frozen_fast

    frozen, lora = init_frozen_fast(bundle, seed=0)
    dev = jax.devices()[0]
    frozen = jax.device_put(frozen, dev)
    lora = jax.device_put(lora, dev)
    jax.block_until_ready(frozen)
    print(f"# init: {time.time()-t0:.1f}s", file=sys.stderr)
    state = TrainState.create(lora, tx)
    step = build_ddim_distill_step(bundle, schedule, cfg, tx)

    rng = np.random.RandomState(0)
    batch_data = {
        "pixel_values": jnp.asarray(
            rng.rand(batch, resolution, resolution, 3) * 2 - 1, jnp.bfloat16
        ),
        "input_ids": jnp.asarray(rng.randint(1, 49000, size=(batch, 77))),
        "uncond_embeds": jnp.zeros(
            (batch, 77, bundle.unet_cfg.cross_attention_dim), jnp.bfloat16
        ),
    }
    if family == "sdxl":
        batch_data["input_ids_2"] = jnp.asarray(rng.randint(1, 49000, size=(batch, 77)))
        batch_data["time_ids"] = jnp.tile(
            jnp.asarray([[resolution, resolution, 0, 0, resolution, resolution]], jnp.float32),
            (batch, 1),
        )
        del batch_data["uncond_embeds"]
    return bundle, frozen, state, step, batch_data


def main():
    ap = argparse.ArgumentParser()
    # headline config (BASELINE.json metric). NOTE: cold-cache compile of the
    # SDXL 1024px step takes ~25 min on the axon remote compiler; the
    # persistent cache at /tmp/jax_cache makes subsequent runs fast.
    ap.add_argument("--family", default="sdxl")
    ap.add_argument("--resolution", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--lora-rank", type=int, default=64)
    args = ap.parse_args()

    bundle, frozen, state, step, batch = build(
        args.family, args.resolution, args.batch, args.lora_rank
    )
    rng = jax.random.PRNGKey(0)

    t0 = time.time()
    jstep = jax.jit(step, donate_argnums=(0,))
    lowered = jstep.lower(state, frozen, batch, rng)
    compiled = lowered.compile()
    print(f"# compile: {time.time()-t0:.1f}s", file=sys.stderr)
    try:
        flops_per_step = float(compiled.cost_analysis()["flops"])
    except Exception:
        flops_per_step = float("nan")

    # warmup
    state, m = compiled(state, frozen, batch, rng)
    jax.block_until_ready(m)

    t0 = time.time()
    for _ in range(args.iters):
        state, m = compiled(state, frozen, batch, rng)
    jax.block_until_ready(m)
    dt = (time.time() - t0) / args.iters
    samples_per_sec = args.batch / dt
    print(f"# step: {dt*1000:.1f}ms  loss={float(m['loss']):.4f}", file=sys.stderr)

    # analytic reference estimate (see module docstring)
    if np.isfinite(flops_per_step):
        ref_time_per_step = flops_per_step / (A800_PEAK_FLOPS * REF_ASSUMED_MFU)
        ref_samples_per_sec = args.batch / ref_time_per_step
        vs_baseline = samples_per_sec / ref_samples_per_sec
        mfu = flops_per_step / dt / 197e12  # v5e bf16 peak
        print(f"# flops/step={flops_per_step:.3e}  v5e MFU={mfu:.2%}", file=sys.stderr)
    else:
        vs_baseline = float("nan")

    print(
        json.dumps(
            {
                "metric": f"{args.family} {args.resolution}px PCM-LoRA distill samples/sec/chip",
                "value": round(samples_per_sec, 4),
                "unit": "samples/sec/chip",
                "vs_baseline": round(vs_baseline, 3) if np.isfinite(vs_baseline) else None,
            }
        )
    )


if __name__ == "__main__":
    main()
