#!/usr/bin/env python
"""CLIP-score CLI: mean 100*max(0,cos) prompt↔image alignment over a folder.

    python scripts/eval_clip_score.py --image-dir gen/ \
        --vision-weights clip_vit_l14_vision.safetensors \
        --text-weights clip_vit_l14_text.safetensors \
        --tokenizer-dir /path/to/clip-tokenizer [--prompts-file prompts.txt]

Images pair with prompts by order: either one prompt per image from
--prompts-file, or each image's sidecar .txt caption (the dataset
convention). The PCM paper reports CLIP-score alongside FID
(arXiv:2405.18407); the reference repo has no instrument for it.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image-dir", required=True)
    ap.add_argument("--prompts-file", default=None,
                    help="one prompt per line, paired with sorted image files; "
                         "default: per-image sidecar .txt captions")
    ap.add_argument("--vision-weights", default=None,
                    help="HF CLIPVisionModelWithProjection ckpt (.safetensors/.bin)")
    ap.add_argument("--text-weights", default=None,
                    help="HF CLIPTextModelWithProjection ckpt (.safetensors/.bin)")
    ap.add_argument("--tokenizer-dir", default=None,
                    help="local transformers CLIP tokenizer dir; fallback: hash "
                         "tokenizer (smoke only)")
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    from PIL import Image

    from pcm_tpu.data.dataset import list_image_files

    from pcm_tpu.models.clip import convert_clip_torch_state
    from pcm_tpu.utils.clip_score import (
        CLIP_VIT_L14_TEXT_CONFIG,
        CLIPTextFeatures,
        clip_score_from_features,
    )
    from pcm_tpu.utils.fid import CLIPFeatures

    files = list_image_files(args.image_dir)
    if args.prompts_file:
        with open(args.prompts_file) as f:
            prompts = [l.strip() for l in f if l.strip()]
        if len(prompts) != len(files):
            ap.error(f"{len(prompts)} prompts for {len(files)} images")
    else:
        prompts = []
        for f in files:
            cap = os.path.splitext(f)[0] + ".txt"
            if not os.path.exists(cap):
                ap.error(f"no sidecar caption for {f}; use --prompts-file")
            with open(cap) as fh:
                prompts.append(fh.read().strip())

    from pcm_tpu.data.tokenizer import resolve_tokenizers

    tok = resolve_tokenizers(args.tokenizer_dir, ["input_ids"],
                             allow_hash=True)["input_ids"]
    img_ex = (
        CLIPFeatures.from_torch_file(args.vision_weights, batch=args.batch)
        if args.vision_weights
        else CLIPFeatures(batch=args.batch)
    )
    if args.text_weights:
        if args.text_weights.endswith(".safetensors"):
            from safetensors import safe_open

            sd = {}
            with safe_open(args.text_weights, framework="np") as f:
                for k in f.keys():
                    sd[k] = f.get_tensor(k)
        else:
            import torch

            sd = torch.load(args.text_weights, map_location="cpu", weights_only=True)
        txt_params = convert_clip_torch_state(sd, CLIP_VIT_L14_TEXT_CONFIG)
        txt_ex = CLIPTextFeatures(tok, weights=txt_params, batch=args.batch)
    else:
        txt_ex = CLIPTextFeatures(tok, batch=args.batch)

    res = img_ex.cfg.image_size
    feats_i, feats_t = [], []
    for i in range(0, len(files), args.batch):
        imgs = []
        for f in files[i : i + args.batch]:
            im = Image.open(f).convert("RGB").resize((res, res), Image.LANCZOS)
            imgs.append(np.asarray(im, np.float32) / 127.5 - 1.0)
        feats_i.append(img_ex(np.stack(imgs)))
        feats_t.append(txt_ex(prompts[i : i + args.batch]))
    score = clip_score_from_features(np.concatenate(feats_i), np.concatenate(feats_t))
    print(f"CLIP-score: {score:.4f}")


if __name__ == "__main__":
    main()
