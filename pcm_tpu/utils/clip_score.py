"""CLIP-score evaluation (prompt↔image alignment).

The PCM paper (arXiv:2405.18407) reports CLIP-score next to FID; the
reference repo ships neither instrument (SURVEY.md §4 — `pytorch-fid` is
pinned but never imported). With the parity-tested CLIP ViT-L/14 vision
tower (`models/clip_vision.py`) and the text tower (`models/clip.py`,
`projection_dim` set) both in-repo, the metric is first-class here:

    score_i = 100 * max(0, cos(E_img(x_i), E_txt(p_i)))

averaged over the eval set — the `torchmetrics.CLIPScore` convention.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ..models.clip import CLIPTextConfig

# CLIP ViT-L/14 text tower (openai/clip-vit-large-patch14) — pairs with
# models/clip_vision.py:CLIP_VIT_L14_CONFIG for CLIP-score / CLIP-FID.
CLIP_VIT_L14_TEXT_CONFIG = CLIPTextConfig(
    vocab_size=49408,
    hidden_size=768,
    num_layers=12,
    num_heads=12,
    intermediate_size=3072,
    projection_dim=768,
)


class CLIPTextFeatures:
    """Projected text embeddings from the CLIP text tower.

    ``weights``: flax params for `CLIPTextModel` with ``projection_dim`` set
    (convert a HF ``CLIPTextModelWithProjection`` state dict via
    `models/clip.py:convert_clip_torch_state`). Random init (weights=None) is
    smoke-only and warns.
    """

    def __init__(self, tokenizer, weights=None, cfg: Optional[CLIPTextConfig] = None,
                 batch: int = 32):
        import jax
        import jax.numpy as jnp

        from ..models.clip import CLIPTextModel

        self.cfg = cfg or CLIP_VIT_L14_TEXT_CONFIG
        assert self.cfg.projection_dim is not None, "CLIP-score needs the projected tower"
        self.tokenizer = tokenizer
        self.model = CLIPTextModel(self.cfg)
        if weights is None:
            import sys

            print("# WARNING: CLIPTextFeatures with random weights — smoke metric only",
                  file=sys.stderr)
            weights = self.model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32)
            )["params"]
        self.params = weights
        self.batch = batch
        self._apply = jax.jit(lambda p, ids: self.model.apply({"params": p}, ids)[2])

    def __call__(self, prompts: Sequence[str]) -> np.ndarray:
        out = []
        for i in range(0, len(prompts), self.batch):
            ids = self.tokenizer(list(prompts[i : i + self.batch]))
            out.append(np.asarray(self._apply(self.params, ids)))
        return np.concatenate(out)


def clip_score_from_features(img_feats: np.ndarray, txt_feats: np.ndarray) -> float:
    """Mean ``100 * max(0, cos)`` over aligned (N, D) feature rows."""
    a = np.asarray(img_feats, np.float64)
    b = np.asarray(txt_feats, np.float64)
    assert a.shape[0] == b.shape[0], (a.shape, b.shape)
    a = a / np.linalg.norm(a, axis=-1, keepdims=True)
    b = b / np.linalg.norm(b, axis=-1, keepdims=True)
    cos = np.sum(a * b, axis=-1)
    return float(np.mean(100.0 * np.maximum(cos, 0.0)))


def clip_score(images: np.ndarray, prompts: Sequence[str], image_extractor,
               text_extractor) -> float:
    """End-to-end: (N,H,W,3) images in [-1,1] + N prompts -> mean CLIP-score.

    ``image_extractor`` = `utils/fid.py:CLIPFeatures`, ``text_extractor`` =
    `CLIPTextFeatures` — both over the same ViT-L/14 checkpoint pair.
    """
    return clip_score_from_features(image_extractor(images), text_extractor(prompts))
