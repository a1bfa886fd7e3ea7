"""NSFW safety checker — equivalent of the reference's CLIP-based checker
(`demo/safety_checker.py`): CLIP-image features compared against concept
embeddings with per-concept thresholds.

Requires a ported CLIP vision tower + concept embeddings checkpoint; without
one (this image has no released weights) the checker degrades to a
pass-through and reports itself inactive.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class SafetyChecker:
    def __init__(self, concept_embeds_path: Optional[str] = None, threshold_adjust: float = 0.0):
        self.active = False
        self.threshold_adjust = threshold_adjust
        if concept_embeds_path is not None:
            import jax.numpy as jnp

            data = np.load(concept_embeds_path)
            self.concept_embeds = jnp.asarray(data["concept_embeds"])
            self.concept_thresholds = jnp.asarray(data["concept_embeds_weights"])
            self.special_embeds = jnp.asarray(data["special_care_embeds"])
            self.special_thresholds = jnp.asarray(data["special_care_embeds_weights"])
            self.active = True

    def is_unsafe(self, image: np.ndarray, image_features: Optional[np.ndarray] = None) -> bool:
        """image: (H, W, 3) uint8. Returns True when flagged.

        ``image_features``: optional precomputed CLIP-image embedding; without
        it (no vision tower available) the checker is inactive -> False.
        """
        if not self.active or image_features is None:
            return False
        import jax.numpy as jnp

        feats = jnp.asarray(image_features)
        feats = feats / jnp.linalg.norm(feats)
        special = feats @ self.special_embeds.T - self.special_thresholds
        adjustment = self.threshold_adjust + jnp.where(jnp.any(special > 0), 0.01, 0.0)
        scores = feats @ self.concept_embeds.T - self.concept_thresholds + adjustment
        return bool(jnp.any(scores > 0))
