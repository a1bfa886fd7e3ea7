#!/usr/bin/env python
"""Port diffusers/transformers checkpoints (safetensors) into an orbax
checkpoint holding this framework's frozen param trees.

Example (SD1.5):
  python scripts/port_weights.py --family sd15 --output ckpts/sd15 \
      --unet sd15/unet/*.safetensors --vae sd15/vae/*.safetensors \
      --text sd15/text_encoder/*.safetensors

The output directory restores directly as the ``frozen`` tree used by
`scripts/train.py` / `scripts/generate.py`.
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def load_safetensors(patterns):
    from safetensors.numpy import load_file

    sd = {}
    for pat in patterns:
        for f in sorted(glob.glob(pat)):
            sd.update(load_file(f))
    if not sd:
        raise FileNotFoundError(patterns)
    return sd


def main():
    jax.config.update("jax_platforms", "cpu")  # porting is host-side work

    ap = argparse.ArgumentParser()
    ap.add_argument("--family", required=True, choices=["sd15", "sdxl", "sd3"])
    ap.add_argument("--output", required=True)
    ap.add_argument("--unet", nargs="+", help="UNet/MMDiT safetensors")
    ap.add_argument("--vae", nargs="+")
    ap.add_argument("--text", nargs="+", help="text_encoder (CLIP-L)")
    ap.add_argument("--text2", nargs="+", help="text_encoder_2 (bigG)")
    ap.add_argument("--t5", nargs="+", help="text_encoder_3 (T5-XXL)")
    ap.add_argument("--tiny", action="store_true",
                    help="TINY_* model configs (smoke/test mode)")
    args = ap.parse_args()

    from pcm_tpu.models.clip import convert_clip_torch_state
    from pcm_tpu.models.convert import (
        convert_mmdit_torch_state,
        convert_unet_torch_state,
        convert_vae_torch_state,
    )
    from pcm_tpu.models.t5 import convert_t5_torch_state
    from pcm_tpu.configs.families import sd3_bundle, sd15_bundle, sdxl_bundle

    if args.family == "sd15":
        bundle = sd15_bundle(tiny=args.tiny)
        frozen = {
            "unet": convert_unet_torch_state(load_safetensors(args.unet), bundle.unet_cfg),
            "vae": convert_vae_torch_state(load_safetensors(args.vae), bundle.vae_cfg),
            "text": convert_clip_torch_state(load_safetensors(args.text), bundle.text_cfg),
        }
    elif args.family == "sdxl":
        bundle = sdxl_bundle(tiny=args.tiny)
        frozen = {
            "unet": convert_unet_torch_state(load_safetensors(args.unet), bundle.unet_cfg),
            "vae": convert_vae_torch_state(load_safetensors(args.vae), bundle.vae_cfg),
            "text": convert_clip_torch_state(load_safetensors(args.text), bundle.text_cfg),
            "text2": convert_clip_torch_state(load_safetensors(args.text2), bundle.text2_cfg),
        }
    else:
        bundle = sd3_bundle(tiny=args.tiny)
        frozen = {
            "mmdit": convert_mmdit_torch_state(load_safetensors(args.unet), bundle.mmdit_cfg),
            "vae": convert_vae_torch_state(load_safetensors(args.vae), bundle.vae_cfg),
            "text": convert_clip_torch_state(load_safetensors(args.text), bundle.text_cfg),
            "text2": convert_clip_torch_state(load_safetensors(args.text2), bundle.text2_cfg),
            "t5": convert_t5_torch_state(load_safetensors(args.t5), bundle.t5_cfg),
        }

    # sanity: structure must match the bundle's randomly-initialized tree
    template, _ = bundle.init(jax.random.PRNGKey(0))
    t_paths = {p for p, _ in jax.tree_util.tree_leaves_with_path(template)}
    f_paths = {p for p, _ in jax.tree_util.tree_leaves_with_path(frozen)}
    missing, extra = t_paths - f_paths, f_paths - t_paths
    if missing or extra:
        for p in sorted(missing):
            print("MISSING:", jax.tree_util.keystr(p), file=sys.stderr)
        for p in sorted(extra):
            print("EXTRA:  ", jax.tree_util.keystr(p), file=sys.stderr)
        raise SystemExit(1)

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(args.output), frozen, force=True)
    ckptr.wait_until_finished()
    n = sum(x.size for x in jax.tree.leaves(frozen))
    print(f"ported {n/1e6:.1f}M params -> {args.output}")


if __name__ == "__main__":
    main()
