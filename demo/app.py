"""Gradio demo for PCM few-step generation — port of reference `demo/app.py`.

Checkpoint registry maps the released PCM LoRA variants (2/4/8/16-step,
normal-CFG, LCM-like) to (steps, scheduler, cfg) configs like the reference's
(`demo/app.py:11-24`). Degrades to a CLI loop when gradio isn't installed
(it is not part of this image).

Usage:
  python demo/app.py --family sd15 --teacher-checkpoint ckpts/sd15 \
      --lora-dir loras/ [--tokenizer-dir tok/]
"""

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

CHECKPOINT_REGISTRY = {
    # name -> (filename, steps, scheduler, default cfg)
    "2-Step": ("pcm_{family}_smallcfg_2step_converted.safetensors", 2, "ddim", 1.0),
    "4-Step": ("pcm_{family}_smallcfg_4step_converted.safetensors", 4, "ddim", 1.0),
    "8-Step": ("pcm_{family}_smallcfg_8step_converted.safetensors", 8, "ddim", 1.0),
    "16-Step": ("pcm_{family}_smallcfg_16step_converted.safetensors", 16, "ddim", 1.0),
    "Normal CFG 4-Step": ("pcm_{family}_normalcfg_4step_converted.safetensors", 4, "ddim", 7.5),
    "Normal CFG 8-Step": ("pcm_{family}_normalcfg_8step_converted.safetensors", 8, "ddim", 7.5),
    "Normal CFG 16-Step": ("pcm_{family}_normalcfg_16step_converted.safetensors", 16, "ddim", 7.5),
    "LCM-Like LoRA": ("pcm_{family}_lcmlike_lora_converted.safetensors", 4, "tcd", 1.0),
}


def build_generator(args):
    import jax
    import jax.numpy as jnp

    from pcm_tpu.configs.families import sd15_bundle, sdxl_bundle
    from pcm_tpu.core import make_ddpm_schedule
    from pcm_tpu.data.tokenizer import HashTokenizer, HFTokenizer
    from pcm_tpu.lora.kohya import load_kohya_safetensors
    from pcm_tpu.sampling import DDIMSampler, TCDSampler, TextToImagePipeline
    from pcm_tpu.train.bundles import init_frozen_cpu
    from pcm_tpu.utils.safety import SafetyChecker

    bundle = (sd15_bundle(remat=False, tiny=args.tiny) if args.family == "sd15"
              else sdxl_bundle(remat=False, tiny=args.tiny))
    frozen, lora_template = init_frozen_cpu(bundle, jax.random.PRNGKey(0))
    if args.teacher_checkpoint:
        import orbax.checkpoint as ocp

        frozen = ocp.StandardCheckpointer().restore(
            os.path.abspath(args.teacher_checkpoint), frozen
        )
    if args.weights == "int8":
        from pcm_tpu.utils.quant import quantize_frozen

        frozen = quantize_frozen(frozen)
    tok = HFTokenizer(args.tokenizer_dir) if args.tokenizer_dir else HashTokenizer()
    sched = make_ddpm_schedule()
    res = 512 if args.family == "sd15" else 1024
    if args.tiny:
        res = 32
    # latent downscale follows the VAE depth (8x real VAEs, 2x TINY_VAE)
    vae_scale = 2 ** (len(bundle.vae_cfg.block_out_channels) - 1)

    # live safety checker (ref demo/safety_checker.py:31-137): CLIP ViT-L/14
    # image features vs concept embeddings. Needs BOTH the concept npz and the
    # vision-tower weights; anything less is announced, not silently skipped.
    safety = SafetyChecker(args.safety_concepts)
    vision_extract = None
    if safety.active:
        if not args.safety_clip_weights:
            raise SystemExit(
                "--safety-concepts requires --safety-clip-weights "
                "(CLIP vision tower checkpoint) to compute image features"
            )
        from pcm_tpu.utils.fid import CLIPFeatures

        vision_extract = CLIPFeatures.from_torch_file(args.safety_clip_weights)
        print("# safety checker ACTIVE (CLIP ViT-L/14 + concept embeddings)")
    else:
        print("# safety checker disabled (no --safety-concepts provided)")

    @functools.lru_cache(maxsize=4)
    def make_pipe(mode):
        fname, steps, scheduler, cfg = CHECKPOINT_REGISTRY[mode]
        sampler = (
            TCDSampler.create(sched, steps)
            if scheduler == "tcd"
            else DDIMSampler.create(sched, steps)
        )
        lora = None
        path = os.path.join(args.lora_dir or "", fname.format(family=args.family))
        if args.lora_dir and os.path.exists(path):
            lora, _ = load_kohya_safetensors(path, lora_template, bundle.lora.rank)
        return TextToImagePipeline(bundle, sampler), lora, cfg

    def generate(prompt: str, mode: str, seed: int = 0):
        import jax

        pipe, lora, cfg = make_pipe(mode)
        ids = jnp.asarray(tok([prompt]))
        if args.family == "sd15":
            cond = bundle.encode_prompts(frozen, ids)
            uncond = bundle.encode_prompts(frozen, jnp.asarray(tok([""])))
        else:
            time_ids = jnp.asarray([[res, res, 0, 0, res, res]], jnp.float32)
            cond = bundle.encode_prompts(frozen, ids, ids, time_ids)
            uncond = bundle.encode_prompts(
                frozen, jnp.asarray(tok([""])), jnp.asarray(tok([""])), time_ids
            )
        img = pipe.generate(
            frozen, lora, cond, uncond, jax.random.PRNGKey(seed),
            latent_hw=res // vae_scale, guidance_scale=cfg,
        )
        arr = np.clip((np.asarray(img[0], np.float32) + 1) * 127.5, 0, 255).astype(np.uint8)
        if vision_extract is not None:
            feats = vision_extract(np.asarray(img[:1], np.float32))[0]
            if safety.is_unsafe(arr, image_features=feats):
                arr = np.zeros_like(arr)
        return arr

    return generate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="sd15", choices=["sd15", "sdxl"])
    ap.add_argument("--teacher-checkpoint", default=None)
    ap.add_argument("--lora-dir", default=None)
    ap.add_argument("--tokenizer-dir", default=None)
    ap.add_argument("--port", type=int, default=7860)
    ap.add_argument("--weights", default="bf16", choices=["bf16", "int8"],
                    help="int8 = weight-only quantized frozen kernels")
    ap.add_argument("--safety-concepts", default=None,
                    help="npz with concept_embeds/_weights + special_care_* "
                         "(ported from the HF safety checker)")
    ap.add_argument("--safety-clip-weights", default=None,
                    help="CLIP ViT-L/14 vision checkpoint (.safetensors/.bin) "
                         "for image features")
    ap.add_argument("--tiny", action="store_true",
                    help="TINY_* model configs at 32px (smoke/test mode)")
    args = ap.parse_args()

    generate = build_generator(args)
    try:
        import gradio as gr
    except ImportError:
        print("gradio not installed — interactive CLI mode")
        while True:
            prompt = input("prompt> ").strip()
            if not prompt:
                break
            arr = generate(prompt, "2-Step")
            from PIL import Image

            Image.fromarray(arr).save("demo_out.png")
            print("wrote demo_out.png")
        return

    with gr.Blocks(title="Phased Consistency Model (TPU)") as demo:
        gr.Markdown("# PCM few-step generation (TPU-native)")
        with gr.Row():
            prompt = gr.Textbox(label="Prompt")
            mode = gr.Dropdown(list(CHECKPOINT_REGISTRY), value="2-Step", label="Mode")
            seed = gr.Number(value=0, label="Seed", precision=0)
        btn = gr.Button("Generate")
        out = gr.Image(label="Result")
        btn.click(lambda p, m, s: generate(p, m, int(s)), [prompt, mode, seed], out)
    demo.launch(server_port=args.port)


if __name__ == "__main__":
    main()
