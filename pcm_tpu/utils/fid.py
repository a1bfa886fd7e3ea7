"""FID / feature-statistics evaluation harness.

The reference pins ``pytorch-fid`` but never invokes it (SURVEY.md §4); this
framework makes the metric a first-class eval. The Frechet distance math is
self-contained; the feature extractor is pluggable — `InceptionFeatures`
ports the standard pytorch-fid InceptionV3 weights when a local checkpoint is
available, and any (N, D) activation matrix works (e.g. CLIP image features).
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional, Tuple

import numpy as np


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
