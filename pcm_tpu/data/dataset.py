"""Image-folder dataset with sidecar .txt captions + threaded device prefetch.

Mirrors the reference datasets (SURVEY.md §2 #16): Lanczos resize +
center-crop (SD1.5/SD3, `train_pcm_lora_sd15.py:75-117`) or random-crop
returning crop coordinates for SDXL micro-conditioning
(`train_pcm_lora_sdxl_adv.py:98-158`), bad samples skipped by retrying
another index, empty-prompt dropout by proportion.

The loader is host-sharded: with multi-host `jax.distributed`, each process
reads its own slice of the file list (`shard_for_process`).
"""

from __future__ import annotations

import os
import queue
import random
import threading
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".webp", ".bmp")


def list_image_files(root: str) -> List[str]:
    out = []
    for dirpath, _, files in os.walk(root):
        for f in sorted(files):
            if f.lower().endswith(IMAGE_EXTS):
                out.append(os.path.join(dirpath, f))
    return sorted(out)


def shard_for_process(files: Sequence[str], process_index: int, process_count: int):
    return list(files[process_index::process_count])


class ImageFolderDataset:
    def __init__(
        self,
        root: str,
        resolution: int = 512,
        crop: str = "center",  # "center" | "random" (random returns crop coords)
        proportion_empty_prompts: float = 0.0,
        seed: int = 0,
        use_native: Optional[bool] = None,  # None = auto-detect
    ):
        self.files = list_image_files(root)
        if not self.files:
            raise FileNotFoundError(f"no images under {root}")
        self.resolution = resolution
        self.crop = crop
        self.proportion_empty_prompts = proportion_empty_prompts
        self.rng = random.Random(seed)
        if use_native is None:
            from . import native_image

            use_native = native_image.available()
        self.use_native = use_native

    def __len__(self) -> int:
        return len(self.files)

    def _load_resized_rgb(self, path: str) -> np.ndarray:
        """(H, W, 3) uint8 with the shortest side Lanczos-resized to
        ``self.resolution`` — native C++ pipeline (GIL-free decode+resize,
        JPEG DCT prescale) when available, PIL otherwise."""
        res = self.resolution
        if self.use_native:
            from . import native_image

            if path.lower().endswith(native_image.NATIVE_EXTS):
                try:
                    return native_image.load_resized(path, res)
                except ValueError:
                    pass  # exotic subformat (e.g. CMYK JPEG) — PIL fallback
        from PIL import Image

        img = Image.open(path).convert("RGB")
        w, h = img.size
        scale = res / min(w, h)
        img = img.resize((max(res, round(w * scale)), max(res, round(h * scale))), Image.LANCZOS)
        return np.asarray(img, np.uint8)

    def _load(self, idx: int) -> Dict:
        path = self.files[idx]
        res = self.resolution
        rgb = self._load_resized_rgb(path)
        h, w = rgb.shape[:2]
        if self.crop == "center":
            left, top = (w - res) // 2, (h - res) // 2
        else:
            left = self.rng.randint(0, w - res) if w > res else 0
            top = self.rng.randint(0, h - res) if h > res else 0
        crop = rgb[top : top + res, left : left + res]
        arr = crop.astype(np.float32) / 127.5 - 1.0  # (H, W, 3) in [-1, 1]

        cap_path = os.path.splitext(path)[0] + ".txt"
        caption = ""
        if os.path.exists(cap_path):
            with open(cap_path) as f:
                caption = f.read().strip()
        if self.proportion_empty_prompts > 0 and self.rng.random() < self.proportion_empty_prompts:
            caption = ""
        out = {"pixel_values": arr, "caption": caption}
        if self.crop == "random":
            # SDXL micro-conditioning: original size + crop coords
            out["original_size"] = np.asarray([h, w], np.float32)
            out["crop_coords"] = np.asarray([top, left], np.float32)
        return out

    def get(self, idx: int) -> Dict:
        """Load with the reference's skip-bad-sample retry behavior."""
        for _ in range(16):
            try:
                return self._load(idx)
            except Exception:
                idx = self.rng.randrange(len(self.files))
        raise RuntimeError("too many consecutive bad samples")


class DataLoader:
    """Shuffling, batching, background-threaded loader yielding numpy batches.

    ``collate`` receives the list of samples and must return the final batch
    dict (tokenization happens there).
    """

    def __init__(
        self,
        dataset: ImageFolderDataset,
        batch_size: int,
        collate: Callable[[List[Dict]], Dict],
        num_workers: int = 8,
        prefetch: int = 4,
        seed: int = 0,
        drop_last: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate = collate
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.drop_last = drop_last

    def __iter__(self) -> Iterator[Dict]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            rng = random.Random(self.seed)
            epoch = 0
            while not stop.is_set():
                order = list(range(len(self.dataset)))
                rng.shuffle(order)
                for i in range(0, len(order) - self.batch_size + 1, self.batch_size):
                    if stop.is_set():
                        return
                    idxs = order[i : i + self.batch_size]
                    # parallel sample loading
                    samples: List[Optional[Dict]] = [None] * len(idxs)

                    def load(j, idx):
                        samples[j] = self.dataset.get(idx)

                    threads = [
                        threading.Thread(target=load, args=(j, idx))
                        for j, idx in enumerate(idxs)
                    ]
                    for t in threads:
                        t.start()
                    for t in threads:
                        t.join()
                    q.put(self.collate([s for s in samples if s is not None]))
                epoch += 1

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                yield q.get()
        finally:
            stop.set()


def prefetch_to_device(iterator: Iterator[Dict], size: int = 2,
                       device=None, sharding=None) -> Iterator[Dict]:
    """Overlap host batch assembly + H2D transfer with device compute.

    Keeps ``size`` batches in flight: each is pushed with ``jax.device_put``
    (async on TPU backends) before the consumer needs it, so the train step
    never waits on the host. The reference gets this from torch DataLoader
    pinned-memory workers + CUDA async copies; this is the JAX equivalent.
    ``sharding`` (e.g. a NamedSharding over the data mesh) takes precedence
    over ``device``.
    """
    import collections

    import jax

    put_target = sharding if sharding is not None else device
    buf: "collections.deque" = collections.deque()

    def put(batch):
        if put_target is None:
            return jax.device_put(batch)
        return jax.device_put(batch, put_target)

    for batch in iterator:
        buf.append(put(batch))
        if len(buf) > max(size, 1):
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def make_collate(tokenizers: Dict[str, Callable], resolution: int, sdxl: bool = False):
    """Build the batch-assembly fn: stack pixels, tokenize captions per tower,
    and (SDXL) build time_ids [orig_h, orig_w, c_top, c_left, res, res]."""

    def collate(samples: List[Dict]) -> Dict:
        caps = [s["caption"] for s in samples]
        batch = {"pixel_values": np.stack([s["pixel_values"] for s in samples])}
        for key, tok in tokenizers.items():
            batch[key] = tok(caps)
        if sdxl:
            orig = np.stack([s["original_size"] for s in samples])
            crop = np.stack([s["crop_coords"] for s in samples])
            tgt = np.full((len(samples), 2), resolution, np.float32)
            batch["time_ids"] = np.concatenate([orig, crop, tgt], axis=1)
        return batch

    return collate


class CachedLatentsDataset:
    """Dataset over precomputed VAE latents / text embeddings (npz shards).

    Cache layout (written by ``scripts/cache_latents.py``): a directory of
    ``shard_*.npz`` files, each holding same-length arrays per key — at least
    ``latents``; optionally ``prompt_embeds``, ``pooled_embeds``, ``time_ids``.
    Batches produced from it feed the same train step — the bundles' ``encode``
    skips the VAE/text towers when these keys are present (key presence is a
    static jit property). The reference has no equivalent (it re-encodes every
    step, `train_pcm_lora_sd15.py:1121-1135`); this is the standard
    fixed-dataset optimization.
    """

    def __init__(self, cache_dir: str, keep_shards: int = 2):
        self.files = sorted(
            os.path.join(cache_dir, f)
            for f in os.listdir(cache_dir)
            if f.startswith("shard_") and f.endswith(".npz")
        )
        if not self.files:
            raise FileNotFoundError(f"no shard_*.npz under {cache_dir}")
        self._sizes = []
        for f in self.files:
            with np.load(f) as z:
                self._sizes.append(z["latents"].shape[0])
        self._offsets = np.cumsum([0] + self._sizes)
        self._cache: Dict[int, Dict[str, np.ndarray]] = {}
        self._keep = keep_shards

    def __len__(self) -> int:
        return int(self._offsets[-1])

    def _shard(self, si: int) -> Dict[str, np.ndarray]:
        if si not in self._cache:
            if len(self._cache) >= self._keep:
                self._cache.pop(next(iter(self._cache)))
            with np.load(self.files[si]) as z:
                self._cache[si] = {k: z[k] for k in z.files}
        return self._cache[si]

    def get(self, idx: int) -> Dict:
        si = int(np.searchsorted(self._offsets, idx, side="right")) - 1
        shard = self._shard(si)
        j = idx - self._offsets[si]
        return {k: v[j] for k, v in shard.items()}


def cached_collate(samples: List[Dict]) -> Dict:
    """Collate for CachedLatentsDataset: stack every key."""
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}
