"""FID / feature-statistics evaluation harness.

The reference pins ``pytorch-fid`` but never invokes it (SURVEY.md §4); this
framework makes the metric a first-class eval. The Frechet distance math is
self-contained; the feature extractor is pluggable — `CLIPFeatures` runs the
parity-tested CLIP ViT-L/14 vision tower (`models/clip_vision.py`, the
"CLIP-FID" convention; torchvision is absent from this image so an
InceptionV3 port could not be numerics-verified) over ported weights, and any
(N, D) activation matrix works.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional, Tuple

import numpy as np


class CLIPFeatures:
    """CLIP-image-feature extractor for Frechet distance ("CLIP-FID").

    ``weights``: flax params for `CLIPVisionModel` (e.g. from
    `convert_clip_vision_torch_state` over a HF ``CLIPVisionModelWithProjection``
    checkpoint, loaded via :meth:`from_torch_file`). Random init (weights=None)
    yields a smoke-only metric and prints a warning.
    """

    def __init__(self, weights=None, cfg=None, batch: int = 32):
        import jax

        from ..models.clip_vision import CLIP_VIT_L14_CONFIG, CLIPVisionModel

        self.cfg = cfg or CLIP_VIT_L14_CONFIG
        self.model = CLIPVisionModel(self.cfg)
        if weights is None:
            import sys

            print("# WARNING: CLIPFeatures with random weights — smoke metric only",
                  file=sys.stderr)
            import jax.numpy as jnp

            weights = self.model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, self.cfg.image_size, self.cfg.image_size, 3)),
            )["params"]
        self.params = weights
        self.batch = batch
        self._apply = jax.jit(lambda p, x: self.model.apply({"params": p}, x)[1])

    @classmethod
    def from_torch_file(cls, path: str, cfg=None, **kw):
        """Load a HF CLIPVisionModel(WithProjection) checkpoint
        (.safetensors or torch .bin) and convert."""
        from ..models.clip_vision import CLIP_VIT_L14_CONFIG, convert_clip_vision_torch_state

        cfg = cfg or CLIP_VIT_L14_CONFIG
        if path.endswith(".safetensors"):
            from safetensors import safe_open

            sd = {}
            with safe_open(path, framework="np") as f:
                for k in f.keys():
                    sd[k] = f.get_tensor(k)
        else:
            import torch

            sd = torch.load(path, map_location="cpu", weights_only=True)
        return cls(weights=convert_clip_vision_torch_state(sd, cfg), cfg=cfg, **kw)

    def __call__(self, images: np.ndarray) -> np.ndarray:
        """(N, H, W, 3) images in [-1, 1] -> (N, projection_dim) features."""
        from ..models.clip_vision import preprocess_images

        out = []
        for i in range(0, len(images), self.batch):
            x = preprocess_images(images[i : i + self.batch], self.cfg.image_size)
            out.append(np.asarray(self._apply(self.params, x)))
        return np.concatenate(out)


def activation_statistics(feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(N, D) activations -> (mean, covariance)."""
    feats = np.asarray(feats, np.float64)
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, sigma


def frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray, eps: float = 1e-6
) -> float:
    """FID = |mu1-mu2|^2 + Tr(s1 + s2 - 2 sqrt(s1 s2))."""
    import scipy.linalg

    diff = mu1 - mu2
    covmean, _ = scipy.linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = scipy.linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def fid_from_features(feats_a: np.ndarray, feats_b: np.ndarray) -> float:
    return frechet_distance(*activation_statistics(feats_a), *activation_statistics(feats_b))


def fid_from_generator(
    gen_batches: Iterable[np.ndarray],
    ref_batches: Iterable[np.ndarray],
    extract: Callable[[np.ndarray], np.ndarray],
) -> float:
    """Stream two image sources ((N,H,W,3) in [-1,1]) through an extractor."""
    fa = np.concatenate([np.asarray(extract(b)) for b in gen_batches])
    fb = np.concatenate([np.asarray(extract(b)) for b in ref_batches])
    return fid_from_features(fa, fb)
