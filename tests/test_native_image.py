"""Native image pipeline (native/image_pipe.cpp) vs the PIL reference path.

The native decoder must reproduce the dataset's PIL semantics
(reference: Lanczos resize + crop, `train_pcm_lora_sd15.py:75-117`):
same output dims for any input size, pixels within a couple LSB.
"""

import os

import numpy as np
import pytest
from PIL import Image

from pcm_tpu.data import native_image
from pcm_tpu.data.dataset import ImageFolderDataset

pytestmark = pytest.mark.skipif(
    not native_image.available(), reason="native image pipeline unavailable"
)


def _pil_resized(path, res):
    img = Image.open(path).convert("RGB")
    w, h = img.size
    s = res / min(w, h)
    img = img.resize((max(res, round(w * s)), max(res, round(h * s))), Image.LANCZOS)
    return np.asarray(img, np.uint8)


def _make(path, size, fmt, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (16, 16, 3), np.uint8)
    Image.fromarray(base).resize(size, Image.BICUBIC).save(path, fmt)


@pytest.mark.parametrize(
    "name,size,fmt",
    [
        ("a.png", (300, 200), "PNG"),
        ("b.jpg", (640, 480), "JPEG"),
        ("c.webp", (123, 456), "WEBP"),
        ("big.jpg", (2048, 1536), "JPEG"),  # exercises DCT prescale
        ("tiny.png", (40, 64), "PNG"),  # upscale path
        ("exact.png", (64, 96), "PNG"),  # shortest side == res: no resize
    ],
)
def test_parity_vs_pil(tmp_path, name, size, fmt):
    p = str(tmp_path / name)
    _make(p, size, fmt)
    res = 64 if "tiny" in name or "exact" in name else 128
    nat = native_image.load_resized(p, res)
    ref = _pil_resized(p, res)
    assert nat.shape == ref.shape
    diff = np.abs(nat.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 3, f"max LSB diff {diff.max()}"
    assert diff.mean() < 1.0


def test_grayscale_png_decode_exact(tmp_path):
    """Gray->RGB expansion is bit-exact (no gamma surprises from libpng)."""
    p = str(tmp_path / "gray.png")
    rng = np.random.default_rng(1)
    Image.fromarray(rng.integers(0, 256, (90, 120), np.uint8), "L").save(p)
    nat = native_image.load_resized(p, 90)  # shortest side already 90: no resize
    ref = np.asarray(Image.open(p).convert("RGB"), np.uint8)
    np.testing.assert_array_equal(nat, ref)


def test_grayscale_png_resized(tmp_path):
    """Full-range noise is the worst case for resample comparison: PIL
    rounds to uint8 between the horizontal and vertical passes, the native
    path accumulates in float (single rounding) — Lanczos negative lobes
    amplify that intermediate rounding to several LSB on noise."""
    p = str(tmp_path / "gray.png")
    rng = np.random.default_rng(1)
    Image.fromarray(rng.integers(0, 256, (90, 120), np.uint8), "L").save(p)
    nat = native_image.load_resized(p, 48)
    ref = _pil_resized(p, 48)
    assert nat.shape == ref.shape
    diff = np.abs(nat.astype(int) - ref.astype(int))
    assert diff.max() <= 10
    assert diff.mean() < 1.5


def test_bad_file_raises(tmp_path):
    p = str(tmp_path / "junk.jpg")
    with open(p, "wb") as f:
        f.write(b"\xff\xd8 this is not really a jpeg at all" + b"\x00" * 64)
    with pytest.raises(ValueError):
        native_image.load_resized(p, 64)


def test_dataset_native_matches_pil(tmp_path):
    for i, (size, fmt, ext) in enumerate(
        [((200, 300), "JPEG", "jpg"), ((333, 150), "PNG", "png")]
    ):
        p = str(tmp_path / f"img{i}.{ext}")
        _make(p, size, fmt, seed=i)
        with open(str(tmp_path / f"img{i}.txt"), "w") as f:
            f.write(f"caption {i}")
    ds_nat = ImageFolderDataset(str(tmp_path), resolution=96, use_native=True)
    ds_pil = ImageFolderDataset(str(tmp_path), resolution=96, use_native=False)
    assert ds_nat.use_native and not ds_pil.use_native
    for i in range(2):
        a, b = ds_nat.get(i), ds_pil.get(i)
        assert a["pixel_values"].shape == (96, 96, 3)
        # [-1,1] normalized. JPEGs go through DCT prescale (draft-mode
        # decode at 1/2 size before Lanczos) — a proper low-pass decimation
        # but not bit-identical to PIL's full-size decode, so allow a
        # looser max; the mean stays sub-LSB.
        diff = np.abs(a["pixel_values"] - b["pixel_values"])
        assert diff.max() <= 16 / 127.5
        assert diff.mean() < 1.5 / 127.5
        assert a["caption"] == b["caption"]


def test_dataset_random_crop_coords_consistent(tmp_path):
    p = str(tmp_path / "x.jpg")
    _make(p, (400, 250), "JPEG")
    ds = ImageFolderDataset(str(tmp_path), resolution=128, crop="random",
                            use_native=True, seed=3)
    s = ds.get(0)
    assert s["pixel_values"].shape == (128, 128, 3)
    h, w = s["original_size"]
    top, left = s["crop_coords"]
    assert h == 128 and w == round(400 * 128 / 250)
    assert 0 <= top <= h - 128 and 0 <= left <= w - 128
