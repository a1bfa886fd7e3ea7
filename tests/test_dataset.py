"""Tests for the data pipeline (SURVEY.md §2 #16): folder dataset + sidecar
captions, Lanczos resize + center/random crop, SDXL crop-coord conditioning,
bad-sample retry (`train_pcm_lora_sd15.py:103-117` semantics), host sharding,
threaded loader, and the cached-latents fast path."""

import os

import numpy as np
import pytest

from pcm_tpu.data.dataset import (
    CachedLatentsDataset,
    DataLoader,
    ImageFolderDataset,
    cached_collate,
    list_image_files,
    make_collate,
    shard_for_process,
)


@pytest.fixture
def image_root(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(0)
    for i, size in enumerate([(40, 24), (24, 40), (64, 64), (33, 57)]):
        arr = rng.randint(0, 255, size=(size[1], size[0], 3), dtype=np.uint8)
        p = tmp_path / f"img_{i}.png"
        Image.fromarray(arr).save(p)
        (tmp_path / f"img_{i}.txt").write_text(f"caption {i}")
    # a non-image file that must be ignored
    (tmp_path / "notes.md").write_text("ignore me")
    return str(tmp_path)


def test_center_crop_shapes_and_captions(image_root):
    ds = ImageFolderDataset(image_root, resolution=16, crop="center")
    assert len(ds) == 4
    s = ds.get(0)
    assert s["pixel_values"].shape == (16, 16, 3)
    assert s["pixel_values"].min() >= -1.0 and s["pixel_values"].max() <= 1.0
    assert s["caption"] == "caption 0"
    assert "crop_coords" not in s


def test_random_crop_returns_coords(image_root):
    ds = ImageFolderDataset(image_root, resolution=16, crop="random", seed=3)
    s = ds.get(1)
    assert s["pixel_values"].shape == (16, 16, 3)
    top, left = s["crop_coords"]
    h, w = s["original_size"]
    # coords must index a valid crop window of the resized image
    assert 0 <= top <= h - 16 and 0 <= left <= w - 16
    assert min(h, w) >= 16


def test_bad_sample_retry(image_root):
    # corrupt one file: get() must silently retry another index
    files = sorted(os.listdir(image_root))
    bad = os.path.join(image_root, "img_2.png")
    with open(bad, "wb") as f:
        f.write(b"not a png")
    ds = ImageFolderDataset(image_root, resolution=16)
    bad_idx = ds.files.index(bad)
    s = ds.get(bad_idx)
    assert s["pixel_values"].shape == (16, 16, 3)
    assert files  # silence unused warning


def test_all_bad_raises(tmp_path):
    p = tmp_path / "only.png"
    p.write_bytes(b"junk")
    ds = ImageFolderDataset(str(tmp_path), resolution=16)
    with pytest.raises(RuntimeError, match="bad samples"):
        ds.get(0)


def test_empty_prompt_dropout(image_root):
    ds = ImageFolderDataset(image_root, resolution=16,
                            proportion_empty_prompts=1.0)
    assert ds.get(0)["caption"] == ""


def test_shard_for_process_partitions():
    files = [f"f{i}" for i in range(10)]
    shards = [shard_for_process(files, p, 3) for p in range(3)]
    assert sorted(sum(shards, [])) == sorted(files)
    assert {len(s) for s in shards} == {3, 4}


def test_list_image_files_filters_extensions(image_root):
    files = list_image_files(image_root)
    assert len(files) == 4
    assert all(f.endswith(".png") for f in files)


def test_loader_batches_and_sdxl_time_ids(image_root):
    ds = ImageFolderDataset(image_root, resolution=16, crop="random")
    tok = {"input_ids": lambda caps: np.full((len(caps), 4), 7, np.int32)}
    collate = make_collate(tok, resolution=16, sdxl=True)
    loader = DataLoader(ds, batch_size=2, collate=collate, num_workers=2,
                        prefetch=1)
    it = iter(loader)
    b = next(it)
    assert b["pixel_values"].shape == (2, 16, 16, 3)
    assert b["input_ids"].shape == (2, 4)
    # time_ids = [orig_h, orig_w, c_top, c_left, target_h, target_w]
    assert b["time_ids"].shape == (2, 6)
    assert np.all(b["time_ids"][:, 4:] == 16)
    it.close()


def test_cached_latents_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    for si, n in enumerate([3, 2]):
        np.savez(
            tmp_path / f"shard_{si:04d}.npz",
            latents=rng.randn(n, 4, 4, 4).astype(np.float32),
            prompt_embeds=rng.randn(n, 5, 8).astype(np.float32),
        )
    ds = CachedLatentsDataset(str(tmp_path), keep_shards=1)
    assert len(ds) == 5
    s = ds.get(4)  # second shard, local index 1
    assert s["latents"].shape == (4, 4, 4)
    batch = cached_collate([ds.get(i) for i in (0, 3)])
    assert batch["latents"].shape == (2, 4, 4, 4)
    assert batch["prompt_embeds"].shape == (2, 5, 8)


def test_prefetch_to_device_order_and_exhaustion():
    from pcm_tpu.data.dataset import prefetch_to_device

    src = ({"i": np.full((2,), i, np.float32)} for i in range(7))
    out = list(prefetch_to_device(src, size=3))
    assert [int(b["i"][0]) for b in out] == list(range(7))
