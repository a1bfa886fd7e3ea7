"""AutoencoderKL — TPU-native VAE for latent encode/decode.

Covers the three VAE variants the reference uses: SD1.5/SDXL (4 latent
channels, quant convs, scaling 0.18215/0.13025 — `train_pcm_lora_sd15.py:
1127-1135`) and SD3 (16 channels, no quant convs, scaling 1.5305 + shift
0.0609). Channels-last, fused Pallas GroupNorm+SiLU, flash attention in the
mid-block.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import flash_attention
from .normalization import GroupNorm


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_groups: int = 32
    use_quant_conv: bool = True
    scaling_factor: float = 0.18215
    shift_factor: float = 0.0


SD15_VAE_CONFIG = VAEConfig()
SDXL_VAE_CONFIG = VAEConfig(scaling_factor=0.13025)
SD3_VAE_CONFIG = VAEConfig(
    latent_channels=16, use_quant_conv=False, scaling_factor=1.5305, shift_factor=0.0609
)
TINY_VAE_CONFIG = VAEConfig(block_out_channels=(32, 64), layers_per_block=1)


class VAEResnetBlock(nn.Module):
    out_channels: int
    norm_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        h = GroupNorm(self.norm_groups, 1e-6, act="silu", dtype=self.dtype, name="norm1")(x)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name="conv1")(h)
        h = GroupNorm(self.norm_groups, 1e-6, act="silu", dtype=self.dtype, name="norm2")(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1, 1), padding="VALID", dtype=self.dtype,
                name="conv_shortcut",
            )(x)
        return x + h


class VAEAttention(nn.Module):
    """Single-head self-attention over spatial positions (mid-block)."""

    channels: int
    norm_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, c = x.shape
        res = x
        y = GroupNorm(self.norm_groups, 1e-6, act=None, dtype=self.dtype, name="group_norm")(x)
        y = y.reshape(n, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y)[:, :, None, :]
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y)[:, :, None, :]
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y)[:, :, None, :]
        o = flash_attention(q, k, v)[:, :, 0, :]
        o = nn.Dense(c, dtype=self.dtype, name="to_out_0")(o)
        return res + o.reshape(n, h, w, c)


class Encoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        chans = cfg.block_out_channels
        h = nn.Conv(chans[0], (3, 3), dtype=self.dtype, name="conv_in")(x.astype(self.dtype))
        for level, ch in enumerate(chans):
            for j in range(cfg.layers_per_block):
                h = VAEResnetBlock(
                    ch, cfg.norm_groups, dtype=self.dtype,
                    name=f"down_blocks_{level}_resnets_{j}",
                )(h)
            if level < len(chans) - 1:
                h = nn.Conv(
                    ch, (3, 3), strides=(2, 2), padding=((0, 1), (0, 1)),
                    dtype=self.dtype, name=f"down_blocks_{level}_downsamplers_0_conv",
                )(h)
        ch = chans[-1]
        h = VAEResnetBlock(ch, cfg.norm_groups, dtype=self.dtype, name="mid_resnets_0")(h)
        h = VAEAttention(ch, cfg.norm_groups, dtype=self.dtype, name="mid_attentions_0")(h)
        h = VAEResnetBlock(ch, cfg.norm_groups, dtype=self.dtype, name="mid_resnets_1")(h)
        h = GroupNorm(cfg.norm_groups, 1e-6, act="silu", dtype=self.dtype, name="conv_norm_out")(h)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        chans = cfg.block_out_channels
        ch = chans[-1]
        h = nn.Conv(ch, (3, 3), dtype=self.dtype, name="conv_in")(z.astype(self.dtype))
        h = VAEResnetBlock(ch, cfg.norm_groups, dtype=self.dtype, name="mid_resnets_0")(h)
        h = VAEAttention(ch, cfg.norm_groups, dtype=self.dtype, name="mid_attentions_0")(h)
        h = VAEResnetBlock(ch, cfg.norm_groups, dtype=self.dtype, name="mid_resnets_1")(h)
        for up_idx, level in enumerate(reversed(range(len(chans)))):
            ch = chans[level]
            for j in range(cfg.layers_per_block + 1):
                h = VAEResnetBlock(
                    ch, cfg.norm_groups, dtype=self.dtype,
                    name=f"up_blocks_{up_idx}_resnets_{j}",
                )(h)
            if level > 0:
                n, hh, ww, cc = h.shape
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                h = nn.Conv(
                    ch, (3, 3), dtype=self.dtype,
                    name=f"up_blocks_{up_idx}_upsamplers_0_conv",
                )(h)
        h = GroupNorm(cfg.norm_groups, 1e-6, act="silu", dtype=self.dtype, name="conv_norm_out")(h)
        return nn.Conv(cfg.in_channels, (3, 3), dtype=self.dtype, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    cfg: VAEConfig = SD15_VAE_CONFIG
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.cfg, self.dtype)
        self.decoder = Decoder(self.cfg, self.dtype)
        if self.cfg.use_quant_conv:
            self.quant_conv = nn.Conv(
                2 * self.cfg.latent_channels, (1, 1), padding="VALID", dtype=self.dtype
            )
            self.post_quant_conv = nn.Conv(
                self.cfg.latent_channels, (1, 1), padding="VALID", dtype=self.dtype
            )

    def encode_moments(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """pixel (N,H,W,3) in [-1,1] -> (mean, logvar) of the latent posterior."""
        moments = self.encoder(x)
        if self.cfg.use_quant_conv:
            moments = self.quant_conv(moments)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, x: jnp.ndarray, rng: Optional[jax.Array] = None) -> jnp.ndarray:
        """Sample latents and apply the (shift, scale) normalization used for
        diffusion training: z = (sample - shift) * scale."""
        mean, logvar = self.encode_moments(x)
        if rng is not None:
            std = jnp.exp(0.5 * logvar)
            mean = mean + std * jax.random.normal(rng, mean.shape, dtype=mean.dtype)
        return (mean - self.cfg.shift_factor) * self.cfg.scaling_factor

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """Normalized latent -> pixels in [-1,1]."""
        z = z / self.cfg.scaling_factor + self.cfg.shift_factor
        if self.cfg.use_quant_conv:
            z = self.post_quant_conv(z)
        return self.decoder(z)

    def __call__(self, x: jnp.ndarray, rng: Optional[jax.Array] = None) -> jnp.ndarray:
        return self.decode(self.encode(x, rng))
