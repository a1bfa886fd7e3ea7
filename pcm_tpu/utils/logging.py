"""Metrics logging: JSONL always; tensorboard when available.

Host-0-only, mirroring the reference's ``is_main_process`` guards.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax
import numpy as np


class MetricsLogger:
    def __init__(self, out_dir: str, use_tensorboard: bool = True):
        self.is_main = jax.process_index() == 0
        self.out_dir = out_dir
        self.tb = None
        if not self.is_main:
            return
        os.makedirs(out_dir, exist_ok=True)
        self.jsonl = open(os.path.join(out_dir, "metrics.jsonl"), "a")
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(os.path.join(out_dir, "tb"))
            except Exception:
                self.tb = None

    def log(self, step: int, metrics: Dict):
        if not self.is_main:
            return
        row = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                continue
        self.jsonl.write(json.dumps(row) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            for k, v in row.items():
                if k not in ("step", "time"):
                    self.tb.add_scalar(k, v, step)

    def log_images(self, step: int, tag: str, images: np.ndarray):
        """images: (N, H, W, 3) in [-1, 1]; saved as a PNG grid."""
        if not self.is_main:
            return
        from PIL import Image

        arr = np.clip((np.asarray(images, np.float32) + 1) * 127.5, 0, 255).astype(np.uint8)
        n, h, w, _ = arr.shape
        cols = min(4, n)
        rows = (n + cols - 1) // cols
        grid = np.zeros((rows * h, cols * w, 3), np.uint8)
        for i in range(n):
            r, c = divmod(i, cols)
            grid[r * h : (r + 1) * h, c * w : (c + 1) * w] = arr[i]
        # tags may be paths ("validation/cfg7.5") -> nested dirs under images/
        path = os.path.join(self.out_dir, "images", f"{tag}_{step:07d}.png")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        Image.fromarray(grid).save(path)
        if self.tb is not None:
            self.tb.add_image(tag, grid, step, dataformats="HWC")
