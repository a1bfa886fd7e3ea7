"""Embedding layers shared by the diffusion backbones.

Conventions follow the models the reference distills (SD1.5/SDXL UNets and
SD3 MMDiT as loaded from diffusers, cf. SURVEY.md §2 L0) so that ported
HF checkpoints are bit-compatible: sinusoidal timestep embedding with
``flip_sin_to_cos`` and ``downscale_freq_shift=0``, SiLU MLP to the time
embedding width, and SDXL's fourier "add_time_ids" micro-conditioning.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..lora.layers import LoRADense, LoRASpec, NO_LORA


def sinusoidal_embedding(
    t: jnp.ndarray,
    dim: int,
    max_period: float = 10000.0,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
) -> jnp.ndarray:
    """Sinusoidal position/timestep embedding, diffusers-compatible."""
    half = dim // 2
    exponent = -np.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """linear -> SiLU -> linear MLP lifting the sinusoid to the model width."""

    embed_dim: int
    dtype: jnp.dtype = jnp.float32
    lora: LoRASpec = NO_LORA

    @nn.compact
    def __call__(self, sample: jnp.ndarray) -> jnp.ndarray:
        h = LoRADense(self.embed_dim, dtype=self.dtype, lora=self.lora, name="linear_1")(sample)
        h = nn.silu(h)
        h = LoRADense(self.embed_dim, dtype=self.dtype, lora=self.lora, name="linear_2")(h)
        return h


class PixArtAlphaTextProjection(nn.Module):
    """Pooled-text projection used by SD3 (linear -> SiLU -> linear)."""

    hidden_size: int
    dtype: jnp.dtype = jnp.float32
    lora: LoRASpec = NO_LORA

    @nn.compact
    def __call__(self, caption: jnp.ndarray) -> jnp.ndarray:
        h = LoRADense(self.hidden_size, dtype=self.dtype, lora=self.lora, name="linear_1")(caption)
        h = nn.silu(h)
        h = LoRADense(self.hidden_size, dtype=self.dtype, lora=self.lora, name="linear_2")(h)
        return h


class PatchEmbed(nn.Module):
    """Image-latent patchifier for MMDiT: conv(p=2) + learned pos embed."""

    patch_size: int = 2
    embed_dim: int = 1536
    pos_embed_max_size: int = 192
    dtype: jnp.dtype = jnp.float32
    lora: LoRASpec = NO_LORA

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (N, H, W, C)
        from ..lora.layers import LoRAConv

        n, h, w, _ = x.shape
        p = self.patch_size
        proj = LoRAConv(
            self.embed_dim,
            kernel_size=(p, p),
            strides=(p, p),
            padding="VALID",
            dtype=self.dtype,
            lora=self.lora,
            name="proj",
        )(x)
        hp, wp = h // p, w // p
        tokens = proj.reshape(n, hp * wp, self.embed_dim)

        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, self.pos_embed_max_size, self.pos_embed_max_size, self.embed_dim),
        )
        # center-crop the (max, max) grid to (hp, wp) — SD3 convention
        top = (self.pos_embed_max_size - hp) // 2
        left = (self.pos_embed_max_size - wp) // 2
        pos = pos[:, top : top + hp, left : left + wp].reshape(1, hp * wp, self.embed_dim)
        return tokens + pos.astype(tokens.dtype)
