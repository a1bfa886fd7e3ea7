#!/usr/bin/env python
"""Serve a distilled PCM student over HTTP with request batching.

Production counterpart of the single-request gradio demo (`demo/app.py`):
one fixed-shape compiled graph, queued requests coalesced into padded
batches, per-request seeds.

  python scripts/serve.py --family sd15 --teacher-checkpoint ckpts/sd15 \
      --lora runs/sd15_4phase/pcm_lora_0005000.safetensors \
      --steps 2 --batch-size 4 --port 8000

  curl -s localhost:8000/generate -d '{"prompt": "an astronaut", "seed": 1}'
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pcm_tpu.utils.cachedirs import setup_compile_cache

setup_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="sd15", choices=["sd15", "sdxl", "sd3"])
    ap.add_argument("--teacher-checkpoint", default=None)
    ap.add_argument("--lora", default=None, help="kohya safetensors LoRA")
    ap.add_argument("--tokenizer-dir", default=None)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--cfg", type=float, default=1.0)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--resolution", type=int, default=None)
    ap.add_argument("--max-wait-ms", type=float, default=50.0)
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--weights", default="int8", choices=["bf16", "int8"])
    ap.add_argument("--stochastic", action="store_true",
                    help="SD3: PCM-FM stochastic sampler")
    ap.add_argument("--tiny", action="store_true", help="tiny-model smoke mode")
    ap.add_argument("--enable-lora-swap", action="store_true",
                    help="without --lora: start with a no-op adapter so "
                         "POST /lora can hot-swap kohya weights later "
                         "without recompiling")
    ap.add_argument("--data-parallel", type=int, default=1,
                    help="shard each serving batch over this many devices "
                         "(batch-size must divide by it); 1 = single chip")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pcm_tpu.configs.families import sd3_bundle, sd15_bundle, sdxl_bundle
    from pcm_tpu.core import make_ddpm_schedule, make_flow_schedule

    from pcm_tpu.sampling import DDIMSampler, PCMFMSampler
    from pcm_tpu.serving import BatchingServer, EngineConfig, InferenceEngine
    from pcm_tpu.train.bundles import init_frozen_cpu

    if args.family == "sd15":
        bundle = sd15_bundle(remat=False, tiny=args.tiny)
        res = args.resolution or 512
        tok_keys = ["input_ids"]
    elif args.family == "sdxl":
        bundle = sdxl_bundle(remat=False, tiny=args.tiny)
        res = args.resolution or 1024
        tok_keys = ["input_ids", "input_ids_2"]
    else:
        bundle = sd3_bundle(remat=False, tiny=args.tiny)
        res = args.resolution or 1024
        tok_keys = ["input_ids", "input_ids_2", "input_ids_3"]

    frozen, lora_template = init_frozen_cpu(bundle, jax.random.PRNGKey(0))
    if args.teacher_checkpoint:
        import orbax.checkpoint as ocp

        frozen = ocp.StandardCheckpointer().restore(
            os.path.abspath(args.teacher_checkpoint), frozen
        )
    if args.weights == "int8":
        from pcm_tpu.utils.quant import quantize_frozen

        frozen = quantize_frozen(frozen)

    lora = None
    if args.lora:
        from pcm_tpu.lora.kohya import load_kohya_safetensors

        lora, _ = load_kohya_safetensors(args.lora, lora_template, bundle.lora.rank)
    elif args.enable_lora_swap:
        # zero-init template = no-op adapter (b=0); keeps the compiled graph's
        # pytree structure stable so POST /lora can swap without a recompile
        lora = lora_template

    if args.family == "sd3":
        sampler = PCMFMSampler.create(
            make_flow_schedule(shift=3.0), args.steps, stochastic=args.stochastic
        )
    else:
        sampler = DDIMSampler.create(make_ddpm_schedule(), args.steps)

    from pcm_tpu.data.tokenizer import resolve_tokenizers

    toks = resolve_tokenizers(args.tokenizer_dir, tok_keys, allow_hash=True)
    mesh = None
    if args.data_parallel > 1:
        from pcm_tpu.parallel.mesh import make_mesh

        if args.batch_size % args.data_parallel:
            ap.error("--batch-size must be divisible by --data-parallel")
        if args.data_parallel > len(jax.devices()):
            ap.error(f"--data-parallel {args.data_parallel} > "
                     f"{len(jax.devices())} visible devices")
        mesh = make_mesh(data=args.data_parallel, fsdp=1,
                         devices=jax.devices()[: args.data_parallel])

    vae_scale = 2 ** (len(bundle.vae_cfg.block_out_channels) - 1)
    engine = InferenceEngine(
        bundle, sampler, frozen, lora, toks,
        EngineConfig(
            batch_size=args.batch_size,
            latent_hw=res // vae_scale,
            resolution=res,
            guidance_scale=args.cfg,
            decode_chunk=2 if res >= 1024 and args.batch_size > 4 else None,
        ),
        mesh=mesh,
    )
    print(f"# compiling {args.family} {args.steps}-step graph (bs={args.batch_size})...")
    engine.warmup()
    server = BatchingServer(engine, args.host, args.port, args.max_wait_ms)
    print(f"# serving on http://{args.host}:{server.address[1]}")
    server.serve_forever()


if __name__ == "__main__":
    main()
