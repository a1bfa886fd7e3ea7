#!/usr/bin/env python
"""FID evaluation CLI over `pcm_tpu.utils.fid` (the reference pins pytorch-fid
but never invokes it, SURVEY.md §4 — this makes the metric runnable).

Two modes:
  features:  python scripts/eval_fid.py --features-a a.npy --features-b b.npy
  images:    python scripts/eval_fid.py --image-dir-a gen/ --image-dir-b ref/ \
                 [--extractor pkg.mod:fn] [--batch 32] [--resolution 299]

In images mode the extractor is any callable mapping (N,H,W,3) images in
[-1,1] to (N,D) activations — e.g. an InceptionV3 port with local weights.
Without --extractor a downsampled-pixel extractor is used, which is a smoke
metric only (NOT comparable to pytorch-fid numbers).
"""

import argparse
import importlib
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def pixel_extractor(images: np.ndarray, out_hw: int = 16) -> np.ndarray:
    """Downsampled-pixel 'features' — smoke fallback, not Inception-comparable."""
    n, h, w, c = images.shape
    fh, fw = h // out_hw, w // out_hw
    x = images[:, : fh * out_hw, : fw * out_hw]
    x = x.reshape(n, out_hw, fh, out_hw, fw, c).mean(axis=(2, 4))
    return x.reshape(n, -1)


def iter_image_batches(root: str, batch: int, resolution: int):
    from PIL import Image

    from pcm_tpu.data.dataset import list_image_files

    files = list_image_files(root)
    for i in range(0, len(files), batch):
        imgs = []
        for f in files[i : i + batch]:
            im = Image.open(f).convert("RGB").resize((resolution, resolution), Image.LANCZOS)
            imgs.append(np.asarray(im, np.float32) / 127.5 - 1.0)
        if imgs:
            yield np.stack(imgs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--features-a")
    ap.add_argument("--features-b")
    ap.add_argument("--image-dir-a")
    ap.add_argument("--image-dir-b")
    ap.add_argument("--extractor", default=None, help="import path 'module:callable'")
    ap.add_argument("--clip-weights", default=None,
                    help="HF CLIPVisionModelWithProjection checkpoint "
                         "(.safetensors/.bin); runs the parity-tested ViT-L/14 "
                         "tower -> CLIP-FID")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--resolution", type=int, default=299)
    args = ap.parse_args()

    from pcm_tpu.utils.fid import CLIPFeatures, fid_from_features, fid_from_generator

    if args.features_a and args.features_b:
        fid = fid_from_features(np.load(args.features_a), np.load(args.features_b))
    elif args.image_dir_a and args.image_dir_b:
        if args.clip_weights:
            extract = CLIPFeatures.from_torch_file(args.clip_weights, batch=args.batch)
        elif args.extractor:
            mod, fn = args.extractor.split(":")
            extract = getattr(importlib.import_module(mod), fn)
        else:
            print("# WARNING: pixel fallback extractor — smoke metric only", file=sys.stderr)
            extract = pixel_extractor
        fid = fid_from_generator(
            iter_image_batches(args.image_dir_a, args.batch, args.resolution),
            iter_image_batches(args.image_dir_b, args.batch, args.resolution),
            extract,
        )
    else:
        ap.error("need --features-a/-b or --image-dir-a/-b")
    print(f"FID: {fid:.4f}")


if __name__ == "__main__":
    main()
