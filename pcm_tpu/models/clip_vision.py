"""CLIP vision tower — TPU-native reimplementation.

Two jobs the reference delegates to external CLIP-vision weights:

* the demo's NSFW safety checker (`/root/reference/demo/safety_checker.py:
  31-137` runs CLIPVisionModel features against concept embeddings) —
  `pcm_tpu.utils.safety.SafetyChecker` consumes the projected features this
  tower produces;
* a real FID-class eval instrument: CLIP-image-feature Frechet distance
  (the "CLIP-FID" convention) through `pcm_tpu.utils.fid.CLIPFeatures`.

`convert_clip_vision_torch_state` ports a HuggingFace
`CLIPVisionModel(WithProjection)` state_dict; numerical parity vs
transformers is tested in `tests/test_clip_vision.py` the same way the text
towers are.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .clip import CLIPEncoderLayer, CLIPTextConfig


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    hidden_act: str = "quick_gelu"
    projection_dim: Optional[int] = 768

    @property
    def num_positions(self) -> int:
        return (self.image_size // self.patch_size) ** 2 + 1


# ViT-L/14 — the tower behind the SD safety checker and CLIP-FID
CLIP_VIT_L14_CONFIG = CLIPVisionConfig()
TINY_CLIP_VISION_CONFIG = CLIPVisionConfig(
    image_size=32, patch_size=8, hidden_size=64, num_layers=2, num_heads=4,
    intermediate_size=128, projection_dim=48,
)

# CLIPProcessor normalization constants (OpenAI CLIP convention)
CLIP_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


class CLIPVisionModel(nn.Module):
    """Returns (last_hidden, pooled) — pooled is the post-LN CLS embedding,
    projected when ``projection_dim`` is set (the "image features" every
    consumer wants)."""

    cfg: CLIPVisionConfig = CLIP_VIT_L14_CONFIG
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray):
        """pixel_values: (N, H, W, 3), already CLIP-normalized."""
        cfg = self.cfg
        n = pixel_values.shape[0]
        p = cfg.patch_size
        d = cfg.hidden_size

        patches = nn.Conv(
            d, (p, p), strides=(p, p), padding="VALID", use_bias=False,
            dtype=self.dtype, name="patch_embedding",
        )(pixel_values.astype(self.dtype))
        patches = patches.reshape(n, -1, d)

        cls = self.param("class_embedding", nn.initializers.normal(0.02), (d,))
        x = jnp.concatenate(
            [jnp.tile(cls.astype(self.dtype)[None, None], (n, 1, 1)), patches], axis=1
        )
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02), (cfg.num_positions, d)
        )
        x = x + pos[None, : x.shape[1]].astype(self.dtype)

        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="pre_layrnorm")(x)
        # full (non-causal) self-attention; reuse the text encoder layer
        mask = jnp.ones((x.shape[1], x.shape[1]), bool)
        layer_cfg = CLIPTextConfig(
            hidden_size=d, num_heads=cfg.num_heads,
            intermediate_size=cfg.intermediate_size, hidden_act=cfg.hidden_act,
        )
        for i in range(cfg.num_layers):
            x = CLIPEncoderLayer(layer_cfg, dtype=self.dtype, name=f"layers_{i}")(x, mask)

        pooled = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="post_layernorm")(x[:, 0])
        if cfg.projection_dim is not None:
            pooled = nn.Dense(
                cfg.projection_dim, use_bias=False, dtype=self.dtype,
                name="visual_projection",
            )(pooled)
        return x, pooled


def preprocess_images(images: np.ndarray, size: int = 224) -> np.ndarray:
    """(N, H, W, 3) images in [-1, 1] -> CLIP-normalized (N, size, size, 3).

    Bilinear resize of the full frame (generator outputs are square already,
    so resize==shortest-side resize + center crop).
    """
    import jax
    import jax.image

    x = (np.asarray(images, np.float32) + 1.0) / 2.0
    x = np.clip(x, 0.0, 1.0)
    n, h, w, _ = x.shape
    if (h, w) != (size, size):
        x = np.asarray(
            jax.image.resize(jnp.asarray(x), (n, size, size, 3), method="bilinear")
        )
    return (x - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD


def convert_clip_vision_torch_state(state_dict, cfg: CLIPVisionConfig):
    """HF ``CLIPVisionModel(WithProjection)`` torch state_dict -> flax params."""

    def g(key):
        t = state_dict[key]
        return jnp.asarray(np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t))

    prefix = "vision_model."
    params = {
        "class_embedding": g(prefix + "embeddings.class_embedding"),
        "position_embedding": g(prefix + "embeddings.position_embedding.weight"),
        # torch conv (out, in, kh, kw) -> flax (kh, kw, in, out)
        "patch_embedding": {
            "kernel": jnp.transpose(
                g(prefix + "embeddings.patch_embedding.weight"), (2, 3, 1, 0)
            )
        },
        "pre_layrnorm": {
            "scale": g(prefix + "pre_layrnorm.weight"),
            "bias": g(prefix + "pre_layrnorm.bias"),
        },
        "post_layernorm": {
            "scale": g(prefix + "post_layernorm.weight"),
            "bias": g(prefix + "post_layernorm.bias"),
        },
    }
    for i in range(cfg.num_layers):
        lp = f"{prefix}encoder.layers.{i}."
        layer = {}
        for name in ("layer_norm1", "layer_norm2"):
            layer[name] = {"scale": g(lp + name + ".weight"), "bias": g(lp + name + ".bias")}
        for ours, theirs in [
            ("q_proj", "self_attn.q_proj"),
            ("k_proj", "self_attn.k_proj"),
            ("v_proj", "self_attn.v_proj"),
            ("out_proj", "self_attn.out_proj"),
            ("fc1", "mlp.fc1"),
            ("fc2", "mlp.fc2"),
        ]:
            layer[ours] = {
                "kernel": g(lp + theirs + ".weight").T,
                "bias": g(lp + theirs + ".bias"),
            }
        params[f"layers_{i}"] = layer
    if cfg.projection_dim is not None and "visual_projection.weight" in state_dict:
        params["visual_projection"] = {"kernel": g("visual_projection.weight").T}
    return params
