"""Tests for metrics logging (SURVEY.md §5 — JSONL + tensorboard + image
grids; host-0-only like the reference's ``is_main_process`` guards)."""

import json
import os

import numpy as np

from pcm_tpu.utils.logging import MetricsLogger


def test_jsonl_rows_and_non_numeric_skip(tmp_path):
    lg = MetricsLogger(str(tmp_path), use_tensorboard=False)
    lg.log(1, {"loss": 0.5, "lr": np.float32(1e-4), "name": "not-a-number"})
    lg.log(2, {"loss": 0.25})
    rows = [json.loads(l) for l in
            open(tmp_path / "metrics.jsonl").read().splitlines()]
    assert [r["step"] for r in rows] == [1, 2]
    assert rows[0]["loss"] == 0.5 and abs(rows[0]["lr"] - 1e-4) < 1e-9
    assert "name" not in rows[0]  # non-numeric values skipped, not crashed


def test_image_grid_layout(tmp_path):
    lg = MetricsLogger(str(tmp_path), use_tensorboard=False)
    imgs = np.zeros((6, 8, 8, 3), np.float32)
    imgs[0] = 1.0  # white tile at grid position (0, 0)
    lg.log_images(3, "val", imgs)
    from PIL import Image

    path = os.path.join(tmp_path, "images", "val_0000003.png")
    grid = np.asarray(Image.open(path))
    # 6 images -> 4 cols x 2 rows
    assert grid.shape == (16, 32, 3)
    assert grid[:8, :8].min() == 255  # 1.0 -> 255 ([-1,1] -> [0,255])
    assert grid[:8, 8:16].max() == 127  # 0.0 -> 127
    assert grid[8:, 16:].max() == 0  # unfilled slots stay black
