#!/usr/bin/env python
"""Generate a synthetic image-folder dataset (image + sidecar .txt caption).

This image has no CC3M/LAION copy (the reference hardcodes
`/mnt/data/wangfuyun/cc3m`, `train_pcm_lora_sd15.py:1009`), so on-chip
training-run evidence uses structured synthetic images: random colored
shapes on gradient backgrounds — enough signal that the distill loss is
non-degenerate, cheap enough to generate on one core.

Usage: python scripts/make_synth_dataset.py --out .cache/synth512 --n 256 --size 512
"""

import argparse
import os

import numpy as np
from PIL import Image, ImageDraw

SHAPES = ("rectangle", "ellipse", "line")
NOUNS = ("sphere", "cube", "ribbon", "panel", "disc", "bar")
COLORS = ("red", "orange", "yellow", "green", "cyan", "blue", "violet", "white")


def make_image(rng: np.random.RandomState, size: int):
    # gradient background
    a = rng.randint(0, 256, 3)
    b = rng.randint(0, 256, 3)
    t = np.linspace(0, 1, size)[:, None]
    grad = (a[None, None] * (1 - t[:, :, None]) + b[None, None] * t[:, :, None])
    if rng.rand() < 0.5:
        grad = np.transpose(grad, (1, 0, 2))
    img = Image.fromarray(grad.astype("uint8"))
    draw = ImageDraw.Draw(img)
    words = []
    for _ in range(rng.randint(2, 6)):
        kind = SHAPES[rng.randint(len(SHAPES))]
        ci = rng.randint(len(COLORS))
        rgb = tuple(
            int(c) for c in np.clip(
                np.array(Image.new("RGB", (1, 1), COLORS[ci]).getpixel((0, 0)))
                + rng.randint(-40, 40, 3), 0, 255,
            )
        )
        x0, y0 = rng.randint(0, size - 32, 2)
        x1 = x0 + rng.randint(16, size // 2)
        y1 = y0 + rng.randint(16, size // 2)
        if kind == "rectangle":
            draw.rectangle([x0, y0, x1, y1], fill=rgb)
        elif kind == "ellipse":
            draw.ellipse([x0, y0, x1, y1], fill=rgb)
        else:
            draw.line([x0, y0, x1, y1], fill=rgb, width=rng.randint(2, 12))
        words.append(f"a {COLORS[ci]} {NOUNS[rng.randint(len(NOUNS))]}")
    caption = ", ".join(words[:3]) + " on a gradient background"
    return img, caption


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    for i in range(args.n):
        img, caption = make_image(rng, args.size)
        img.save(os.path.join(args.out, f"synth{i:05d}.jpg"), quality=92)
        with open(os.path.join(args.out, f"synth{i:05d}.txt"), "w") as f:
            f.write(caption)
    print(f"wrote {args.n} images to {args.out}")


if __name__ == "__main__":
    main()
