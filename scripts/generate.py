#!/usr/bin/env python
"""Few-step text-to-image generation with a distilled PCM-LoRA student —
the deployment equivalent of the reference's `sd3_test.py` / demo app.

Example:
  python scripts/generate.py --family sd15 --teacher-checkpoint ckpts/sd15 \
      --lora runs/sd15_4phase/pcm_lora_0005000.safetensors \
      --prompt "a photo of a cat" --steps 2 --cfg 1.0 --out out.png
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pcm_tpu.utils.cachedirs import setup_compile_cache

setup_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", required=True, choices=["sd15", "sdxl", "sd3"])
    ap.add_argument("--teacher-checkpoint", required=True)
    ap.add_argument("--lora", default=None, help="kohya-format LoRA safetensors")
    ap.add_argument("--prompt", required=True, nargs="+")
    ap.add_argument("--negative-prompt", default="")
    ap.add_argument("--steps", type=int, default=2, choices=[1, 2, 4, 8, 16])
    ap.add_argument("--cfg", type=float, default=1.0)
    ap.add_argument("--shift", type=float, default=3.0,
                    help="SD3 sigma-shift; the reference's sd3_test.py "
                         "recipes use shift 1 and 3 (`sd3_test.py:11-193`)")
    ap.add_argument("--resolution", type=int, default=None)
    ap.add_argument("--scheduler", default=None,
                    choices=[None, "ddim", "tcd", "fm_det", "fm_stoch"])
    ap.add_argument("--tokenizer-dir", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--decode-chunk", type=int, default=None,
                    help="VAE-decode this many images at a time (bounds memory)")
    ap.add_argument("--out", default="out.png")
    ap.add_argument("--weights", default="bf16", choices=["bf16", "int8"],
                    help="int8 = weight-only quantized frozen kernels "
                         "(halves model HBM; VAE stays bf16)")
    args = ap.parse_args()

    import orbax.checkpoint as ocp

    from pcm_tpu.configs.families import sd3_bundle, sd15_bundle, sdxl_bundle
    from pcm_tpu.core import make_ddpm_schedule, make_flow_schedule

    from pcm_tpu.lora.kohya import load_kohya_safetensors
    from pcm_tpu.sampling import DDIMSampler, PCMFMSampler, TCDSampler, TextToImagePipeline

    res = args.resolution or (512 if args.family == "sd15" else 1024)
    if args.family == "sd15":
        bundle = sd15_bundle(remat=False)
    elif args.family == "sdxl":
        bundle = sdxl_bundle(remat=False)
    else:
        bundle = sd3_bundle(remat=False)

    from pcm_tpu.train.bundles import init_frozen_cpu

    frozen, lora_template = init_frozen_cpu(bundle, jax.random.PRNGKey(0))
    ckptr = ocp.StandardCheckpointer()
    frozen = ckptr.restore(os.path.abspath(args.teacher_checkpoint), frozen)
    if args.weights == "int8":
        from pcm_tpu.utils.quant import quantize_frozen

        frozen = quantize_frozen(frozen)

    lora = None
    if args.lora:
        prefix = "lora_unet" if args.family != "sd3" else "lora_transformer"
        lora, _ = load_kohya_safetensors(
            args.lora, lora_template, bundle.lora.rank, prefix=prefix
        )

    from pcm_tpu.data.tokenizer import resolve_tokenizers

    tok = resolve_tokenizers(args.tokenizer_dir, ["input_ids"],
                             allow_hash=True)["input_ids"]
    prompts = args.prompt
    neg = [args.negative_prompt] * len(prompts)
    ids = jnp.asarray(tok(prompts))
    nids = jnp.asarray(tok(neg))

    if args.family == "sd3":
        sched = make_flow_schedule(shift=args.shift)
        stochastic = args.scheduler == "fm_stoch"
        sampler = PCMFMSampler.create(sched, args.steps, pcm_timesteps=100, stochastic=stochastic)
        cond = bundle.encode_prompts(frozen, ids, ids, ids)
        uncond = bundle.encode_prompts(frozen, nids, nids, nids)
    else:
        sched = make_ddpm_schedule()
        if args.scheduler == "tcd":
            sampler = TCDSampler.create(sched, args.steps)
        else:
            sampler = DDIMSampler.create(sched, args.steps)
        if args.family == "sd15":
            cond = bundle.encode_prompts(frozen, ids)
            uncond = bundle.encode_prompts(frozen, nids)
        else:
            time_ids = jnp.tile(
                jnp.asarray([[res, res, 0, 0, res, res]], jnp.float32), (len(prompts), 1)
            )
            cond = bundle.encode_prompts(frozen, ids, ids, time_ids)
            uncond = bundle.encode_prompts(frozen, nids, nids, time_ids)

    pipe = TextToImagePipeline(bundle, sampler)
    images = jax.jit(
        lambda f, l, c, u, r: pipe.generate(
            f, l, c, u, r, latent_hw=res // 8, guidance_scale=args.cfg,
            decode_chunk=args.decode_chunk,
        )
    )(frozen, lora, cond, uncond, jax.random.PRNGKey(args.seed))

    from PIL import Image

    arr = np.clip((np.asarray(images, np.float32) + 1) * 127.5, 0, 255).astype(np.uint8)
    for i, a in enumerate(arr):
        path = args.out if len(arr) == 1 else args.out.replace(".png", f"_{i}.png")
        Image.fromarray(a).save(path)
        print("wrote", path)


if __name__ == "__main__":
    main()
