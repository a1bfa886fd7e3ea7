"""Resnet / resampling blocks for the UNet backbones (channels-last).

Mirrors diffusers `ResnetBlock2D` / `Downsample2D` / `Upsample2D` structure
(SURVEY.md §2 L0) with the fused Pallas GroupNorm+SiLU on the norm+act pairs.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..lora.layers import LoRAConv, LoRADense, LoRASpec, NO_LORA
from .normalization import GroupNorm


class ResnetBlock2D(nn.Module):
    out_channels: int
    norm_groups: int = 32
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    lora: LoRASpec = NO_LORA

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: jnp.ndarray) -> jnp.ndarray:
        in_channels = x.shape[-1]
        h = GroupNorm(self.norm_groups, self.eps, act="silu", dtype=self.dtype, name="norm1")(x)
        h = LoRAConv(self.out_channels, (3, 3), dtype=self.dtype, lora=self.lora, name="conv1")(h)

        t = LoRADense(self.out_channels, dtype=self.dtype, lora=self.lora, name="time_emb_proj")(
            nn.silu(temb)
        )
        h = h + t[:, None, None, :]

        h = GroupNorm(self.norm_groups, self.eps, act="silu", dtype=self.dtype, name="norm2")(h)
        h = LoRAConv(self.out_channels, (3, 3), dtype=self.dtype, lora=self.lora, name="conv2")(h)

        if in_channels != self.out_channels:
            x = LoRAConv(
                self.out_channels, (1, 1), padding="VALID", dtype=self.dtype,
                lora=self.lora, name="conv_shortcut",
            )(x)
        return x + h


class Downsample2D(nn.Module):
    """3x3 stride-2 conv with symmetric padding=1.

    diffusers' UNet2DConditionModel uses ``downsample_padding=1`` (torch
    ``Conv2d(..., stride=2, padding=1)``); for even spatial sizes that equals
    lax padding ``((1,1),(1,1))`` — windows start at -1, the trailing pad row
    is unused. The asymmetric (0,1) pad belongs ONLY to the VAE encoder
    (``DownEncoderBlock2D`` pads (0,1,0,1) explicitly) — using it here was a
    round-1 teacher-parity bug caught by tests/test_parity_torch.py.
    """

    channels: int
    dtype: jnp.dtype = jnp.float32
    lora: LoRASpec = NO_LORA

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return LoRAConv(
            self.channels, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
            dtype=self.dtype, lora=self.lora, name="conv",
        )(x)


class Upsample2D(nn.Module):
    """Nearest-neighbor x2 upsample followed by a 3x3 conv."""

    channels: int
    dtype: jnp.dtype = jnp.float32
    lora: LoRASpec = NO_LORA

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return LoRAConv(
            self.channels, (3, 3), dtype=self.dtype, lora=self.lora, name="conv"
        )(x)
