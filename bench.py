#!/usr/bin/env python
"""Benchmark: SDXL 1024px PCM-LoRA distillation throughput on one TPU chip.

Measures the full fused distillation step (text encode + VAE encode + CFG
teacher + student + stop-grad target + LoRA AdamW update) — the same work the
reference does per optimizer step on an A800 (`train_pcm_lora_sdxl_adv.py`
hot loop, minus the GAN alternation which halves its student updates).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline: measured samples/sec/chip divided by an analytic estimate of the
reference's per-GPU throughput (the repo publishes no numbers to anchor
against, BASELINE.md): the FLOPs of this very compiled step (XLA cost
analysis — note this count includes OUR remat recompute, inflating the
reference's credit) executed at 312 TFLOP/s A800 fp16 peak x 20% model-FLOPs
utilization. 20% reflects the reference pipeline's eager per-step python,
gradient checkpointing on BOTH student and teacher (its recompute is excluded
from model FLOPs), fp16 GradScaler, DDP sync, and 8-bit Adam — typical
measured MFU for diffusers UNet training on A100-class parts is 15-25%.
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
REF_ASSUMED_MFU = 0.20  # see module docstring


def build(family: str, resolution: int, batch: int, lora_rank: int, remat: str = "dots",
          adam: str = "8bit", weights: str = "bf16"):
    from pcm_tpu.configs.families import sd3_bundle, sd15_bundle, sdxl_bundle
    from pcm_tpu.core import make_ddpm_schedule, make_flow_schedule
    from pcm_tpu.train.distill import (
        DistillConfig,
        build_ddim_distill_step,
        build_flow_distill_step,
    )
    from pcm_tpu.train.state import TrainState, make_optimizer

    # measured on v5e, SDXL 1024px bs1 student fwd+bwd (scripts/remat_compare.py):
    # no remat 321ms < dots-saveable 419ms < full remat 436ms. Full-step HBM
    # (15.75G budget): none 17.2G OOM; dots+fp32Adam 16.2G OOM; dots+8bitAdam
    # 15.82G OOM by 69M; "hybrid" per-level remat SIGKILLs the remote compiler.
    # Default "dots_small" caps saved dot outputs at 16MB (drops the 40MB GEGLU
    # inner projections), keeping the fast backward within budget.
    use_remat = remat != "none"
    policy = remat if remat in ("dots", "dots_small") else None
    levels = (True, True, False) if remat == "hybrid" else None
    if family == "sdxl":
        bundle = sdxl_bundle(
            lora_rank=lora_rank, remat=use_remat, remat_policy=policy, remat_levels=levels
        )
        cfg = DistillConfig(num_solver_steps=40, multiphase=4, w_min=6, w_max=7)
    elif family == "sd15":
        bundle = sd15_bundle(
            lora_rank=lora_rank, remat=use_remat, remat_policy=policy,
            remat_levels=(True, True, True, False) if remat == "hybrid" else None,
        )
        cfg = DistillConfig(num_solver_steps=50, multiphase=4, w_min=4, w_max=5)
    elif family == "sd3":
        # run.sh:65-95 recipe: 100 euler steps, 4-phase, fixed teacher w=3,
        # rank-32 LoRA. bf16 SD3 (MMDiT 2B + T5-XXL 4.7B + 2xCLIP) does NOT
        # fit one 15.75G v5e — pair with --weights int8 (~7.7G frozen).
        bundle = sd3_bundle(lora_rank=min(lora_rank, 32), remat=use_remat,
                            remat_policy=policy)
        cfg = DistillConfig(num_solver_steps=100, multiphase=4, fixed_w=3.0)
    else:
        raise ValueError(family)

    schedule = make_flow_schedule(shift=3.0) if family == "sd3" else make_ddpm_schedule()
    # 8-bit Adam is what the reference recipes run (--use_8bit_adam in
    # train_pcm_lora_sd15.sh:23 / train_pcm_lora_sdxl.sh:28); fp32 moments on
    # 197M LoRA params cost 1.57G HBM and push the 1024px step out of memory
    tx = make_optimizer(2e-6, use_8bit=(adam == "8bit"))
    t0 = time.time()
    # init on the host CPU backend (the TPU remote compiler chokes on the
    # billion-parameter init graph), then push bf16 weights to the chip
    from pcm_tpu.train.bundles import init_frozen_fast

    frozen, lora = init_frozen_fast(bundle, seed=0)
    if weights == "int8":
        # weight-only int8 frozen weights (per-output-channel scales, VAE kept
        # bf16): ~2.6G HBM back on SDXL — enough to run remat="none"
        from pcm_tpu.utils.quant import quantize_frozen, quantized_bytes_saved

        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            frozen = quantize_frozen(frozen)
        print(f"# int8 weights: {quantized_bytes_saved(frozen)/2**30:.2f} GiB saved",
              file=sys.stderr)
    dev = jax.devices()[0]
    frozen = jax.device_put(frozen, dev)
    lora = jax.device_put(lora, dev)
    jax.block_until_ready(frozen)
    print(f"# init: {time.time()-t0:.1f}s", file=sys.stderr)
    state = TrainState.create(lora, tx)
    builder = build_flow_distill_step if family == "sd3" else build_ddim_distill_step
    step = builder(bundle, schedule, cfg, tx)

    rng = np.random.RandomState(0)
    batch_data = {
        "pixel_values": jnp.asarray(
            rng.rand(batch, resolution, resolution, 3) * 2 - 1, jnp.bfloat16
        ),
        "input_ids": jnp.asarray(rng.randint(1, 49000, size=(batch, 77))),
    }
    if family == "sd15":
        batch_data["uncond_embeds"] = jnp.zeros(
            (batch, 77, bundle.unet_cfg.cross_attention_dim), jnp.bfloat16
        )
    elif family == "sdxl":
        batch_data["input_ids_2"] = jnp.asarray(rng.randint(1, 49000, size=(batch, 77)))
        batch_data["time_ids"] = jnp.tile(
            jnp.asarray([[resolution, resolution, 0, 0, resolution, resolution]], jnp.float32),
            (batch, 1),
        )
    elif family == "sd3":
        batch_data["input_ids_2"] = jnp.asarray(rng.randint(1, 49000, size=(batch, 77)))
        batch_data["input_ids_3"] = jnp.asarray(rng.randint(1, 32000, size=(batch, 77)))
        # zero-tensor uncond (CLIP 77 + T5 77 seq concat at T5 width)
        batch_data["uncond_embeds"] = jnp.zeros(
            (batch, 154, bundle.mmdit_cfg.joint_attention_dim), jnp.bfloat16
        )
        batch_data["uncond_pooled"] = jnp.zeros(
            (batch, bundle.mmdit_cfg.pooled_projection_dim), jnp.bfloat16
        )
    return bundle, frozen, state, step, batch_data


def build_infer(family: str, resolution: int, batch: int, steps: int,
                decode_chunk=None, weights: str = "bf16"):
    """2-step (or k-step) generation throughput: k student forwards + VAE
    decode through TextToImagePipeline — the deployment path (BASELINE.json
    '2-step images/sec'). LoRA B factors are zero at random init, so the
    compiled work is identical to a trained student's."""
    from pcm_tpu.configs.families import sd15_bundle, sdxl_bundle
    from pcm_tpu.core import make_ddpm_schedule
    from pcm_tpu.sampling import DDIMSampler, TextToImagePipeline
    from pcm_tpu.train.bundles import init_frozen_fast

    bundle = (sdxl_bundle if family == "sdxl" else sd15_bundle)(remat=False)
    frozen, lora = init_frozen_fast(bundle, seed=0)
    if weights == "int8":
        from pcm_tpu.utils.quant import quantize_frozen

        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            frozen = quantize_frozen(frozen)
    dev = jax.devices()[0]
    frozen = jax.device_put(frozen, dev)
    lora = jax.device_put(lora, dev)
    jax.block_until_ready(frozen)

    sampler = DDIMSampler.create(make_ddpm_schedule(), steps)
    pipe = TextToImagePipeline(bundle=bundle, sampler=sampler)

    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(1, 49000, size=(batch, 77)))
    if family == "sdxl":
        time_ids = jnp.tile(
            jnp.asarray([[resolution, resolution, 0, 0, resolution, resolution]],
                        jnp.float32), (batch, 1))
        cond = bundle.encode_prompts(frozen, ids, ids, time_ids)
    else:
        cond = bundle.encode_prompts(frozen, ids)

    def run(frozen_, lora_, cond_, key):
        return pipe.generate(
            frozen_, lora_, cond_, None, key, resolution // 8, guidance_scale=1.0,
            decode_chunk=decode_chunk,
        )

    return frozen, lora, cond, run


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
    ap.add_argument("--remat", default="dots_small",
                choices=["hybrid", "none", "dots", "dots_small", "full"])
    ap.add_argument("--adam", default="8bit", choices=["8bit", "fp32"])
    ap.add_argument("--weights", default="bf16", choices=["bf16", "int8"],
                    help="frozen-weight storage; int8 = weight-only quantized "
                         "kernels (per-channel scales), VAE stays bf16")
    ap.add_argument("--mode", default="train", choices=["train", "infer"])
    ap.add_argument("--steps", type=int, default=2, help="inference steps (infer mode)")
    ap.add_argument("--decode-chunk", type=int, default=None,
                    help="VAE-decode this many samples at a time (infer mode; "
                         "bounds decoder memory so batch can exceed 4 at 1024px)")
    args = ap.parse_args()

    if args.mode == "infer":
        return main_infer(args)

    bundle, frozen, state, step, batch = build(
        args.family, args.resolution, args.batch, args.lora_rank, args.remat, args.adam,
        args.weights,
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

    # warmup (axon gotcha: block_until_ready is NOT an execution fence on the
    # remote backend — only a device->host readback blocks; see
    # pcm_tpu/utils/profiling.py:device_fence)
    state, m = compiled(state, frozen, batch, rng)
    loss0 = float(m["loss"])
    t0 = time.time()
    _ = float(m["loss"])
    t_fence = time.time() - t0

    t0 = time.time()
    for _ in range(args.iters):
        state, m = compiled(state, frozen, batch, rng)
    _ = float(m["loss"])
    dt = max(time.time() - t0 - t_fence, 1e-9) / args.iters
    samples_per_sec = args.batch / dt
    print(f"# step: {dt*1000:.1f}ms  loss={loss0:.4f}", file=sys.stderr)

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


def main_infer(args):
    frozen, lora, cond, run = build_infer(
        args.family, args.resolution, args.batch, args.steps, args.decode_chunk,
        args.weights,
    )
    t0 = time.time()
    jrun = jax.jit(run)
    compiled = jrun.lower(frozen, lora, cond, jax.random.PRNGKey(0)).compile()
    print(f"# compile: {time.time()-t0:.1f}s", file=sys.stderr)
    try:
        flops = float(compiled.cost_analysis()["flops"])
    except Exception:
        flops = float("nan")

    def fence(x):
        # real execution fence on the axon backend (block_until_ready is not)
        return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))

    imgs = compiled(frozen, lora, cond, jax.random.PRNGKey(0))
    fence(imgs)
    t0 = time.time()
    fence(imgs)
    t_fence = time.time() - t0
    t0 = time.time()
    for i in range(args.iters):
        imgs = compiled(frozen, lora, cond, jax.random.PRNGKey(i))
    fence(imgs)
    dt = max(time.time() - t0 - t_fence, 1e-9) / args.iters
    images_per_sec = args.batch / dt
    print(f"# batch latency: {dt*1000:.1f}ms", file=sys.stderr)
    if np.isfinite(flops):
        # eager fp16 torch inference with xformers utilizes an A800 well;
        # credit the reference 30% of fp16 peak on the same FLOPs
        ref = args.batch / (flops / (A800_PEAK_FLOPS * 0.30))
        vs_baseline = images_per_sec / ref
        print(f"# flops={flops:.3e}  v5e MFU={flops/dt/197e12:.2%}", file=sys.stderr)
    else:
        vs_baseline = float("nan")
    print(json.dumps({
        "metric": f"{args.family} {args.resolution}px {args.steps}-step images/sec/chip",
        "value": round(images_per_sec, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs_baseline, 3) if np.isfinite(vs_baseline) else None,
    }))


if __name__ == "__main__":
    main()
