"""MMDiT (SD3 `SD3Transformer2DModel`) — TPU-native reimplementation.

The flow-matching teacher/student backbone of the reference's SD3 trainers
(`train_pcm_lora_sd3.py`). Dual-stream joint transformer: image tokens
(patchified latents) and context tokens (CLIP+T5 projections) attend jointly,
each stream modulated by AdaLayerNormZero from the combined
timestep+pooled-text embedding.

Channels-last; Pallas flash attention over the ~4250-token joint sequence;
per-block feature taps (``mutable=['features']``) mirroring the SD3
discriminator's 24 hidden-state hooks (`discriminator_sd3.py:80-137`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..lora.layers import LoRADense, LoRASpec, NO_LORA
from ..ops import flash_attention
from ..ops.common import resolve_remat_policy
from .embeddings import PatchEmbed, PixArtAlphaTextProjection, sinusoidal_embedding


@dataclasses.dataclass(frozen=True)
class MMDiTConfig:
    in_channels: int = 16
    out_channels: int = 16
    patch_size: int = 2
    num_layers: int = 24
    num_heads: int = 24
    head_dim: int = 64
    joint_attention_dim: int = 4096  # context (T5-padded) width
    pooled_projection_dim: int = 2048
    pos_embed_max_size: int = 192
    qk_norm: Optional[str] = None  # "rms" for SD3.5-style blocks

    @property
    def inner_dim(self) -> int:
        return self.num_heads * self.head_dim


SD3_MEDIUM_CONFIG = MMDiTConfig()
TINY_MMDIT_CONFIG = MMDiTConfig(
    in_channels=4,
    out_channels=4,
    num_layers=2,
    num_heads=2,
    head_dim=16,
    joint_attention_dim=32,
    pooled_projection_dim=32,
    pos_embed_max_size=32,
)


class AdaLayerNormZero(nn.Module):
    """SiLU(temb) -> Linear(6*dim); modulated LN + gates."""

    dim: int
    dtype: jnp.dtype = jnp.float32
    lora: LoRASpec = NO_LORA

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: jnp.ndarray):
        emb = LoRADense(6 * self.dim, dtype=self.dtype, lora=self.lora, name="linear")(
            nn.silu(temb)
        )
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(emb, 6, axis=-1)
        h = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, dtype=self.dtype)(x)
        h = h * (1.0 + scale_msa[:, None]) + shift_msa[:, None]
        return h, gate_msa, shift_mlp, scale_mlp, gate_mlp


class AdaLayerNormContinuous(nn.Module):
    """SiLU(temb) -> Linear(2*dim); modulated LN (no gates)."""

    dim: int
    dtype: jnp.dtype = jnp.float32
    lora: LoRASpec = NO_LORA

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: jnp.ndarray) -> jnp.ndarray:
        emb = LoRADense(2 * self.dim, dtype=self.dtype, lora=self.lora, name="linear")(
            nn.silu(temb)
        )
        scale, shift = jnp.split(emb, 2, axis=-1)
        h = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, dtype=self.dtype)(x)
        return h * (1.0 + scale[:, None]) + shift[:, None]


class GELUMLP(nn.Module):
    """dim -> 4*dim (tanh gelu) -> dim, diffusers FeedForward("gelu-approximate")."""

    dim: int
    dtype: jnp.dtype = jnp.float32
    lora: LoRASpec = NO_LORA

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = LoRADense(4 * self.dim, dtype=self.dtype, lora=self.lora, name="net_0_proj")(x)
        h = nn.gelu(h, approximate=True)
        return LoRADense(self.dim, dtype=self.dtype, lora=self.lora, name="net_2")(h)


class JointTransformerBlock(nn.Module):
    cfg: MMDiTConfig
    context_pre_only: bool = False
    dtype: jnp.dtype = jnp.float32
    lora: LoRASpec = NO_LORA

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray, temb: jnp.ndarray):
        cfg = self.cfg
        dim = cfg.inner_dim
        nh, hd = cfg.num_heads, cfg.head_dim

        hx, gate_msa, shift_mlp, scale_mlp, gate_mlp = AdaLayerNormZero(
            dim, dtype=self.dtype, lora=self.lora, name="norm1"
        )(x, temb)
        if self.context_pre_only:
            hc = AdaLayerNormContinuous(
                dim, dtype=self.dtype, lora=self.lora, name="norm1_context"
            )(context, temb)
            c_gate_msa = c_shift_mlp = c_scale_mlp = c_gate_mlp = None
        else:
            hc, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = AdaLayerNormZero(
                dim, dtype=self.dtype, lora=self.lora, name="norm1_context"
            )(context, temb)

        b, sx, _ = hx.shape
        sc = hc.shape[1]

        def proj(h, name):
            return LoRADense(dim, dtype=self.dtype, lora=self.lora, name=name)(h)

        q = jnp.concatenate([proj(hx, "to_q"), proj(hc, "add_q_proj")], axis=1)
        k = jnp.concatenate([proj(hx, "to_k"), proj(hc, "add_k_proj")], axis=1)
        v = jnp.concatenate([proj(hx, "to_v"), proj(hc, "add_v_proj")], axis=1)
        q = q.reshape(b, sx + sc, nh, hd)
        k = k.reshape(b, sx + sc, nh, hd)
        v = v.reshape(b, sx + sc, nh, hd)
        if cfg.qk_norm == "rms":
            q = _rms(q, self.param("norm_q_weight", nn.initializers.ones, (hd,)), self.dtype)
            k = _rms(k, self.param("norm_k_weight", nn.initializers.ones, (hd,)), self.dtype)
        o = flash_attention(q, k, v).reshape(b, sx + sc, dim)
        ox, oc = o[:, :sx], o[:, sx:]

        x = x + gate_msa[:, None] * LoRADense(
            dim, dtype=self.dtype, lora=self.lora, name="to_out_0"
        )(ox)
        h = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, dtype=self.dtype)(x)
        h = h * (1.0 + scale_mlp[:, None]) + shift_mlp[:, None]
        x = x + gate_mlp[:, None] * GELUMLP(dim, dtype=self.dtype, lora=self.lora, name="ff")(h)

        if self.context_pre_only:
            return x, None
        context = context + c_gate_msa[:, None] * LoRADense(
            dim, dtype=self.dtype, lora=self.lora, name="to_add_out"
        )(oc)
        h = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, dtype=self.dtype)(context)
        h = h * (1.0 + c_scale_mlp[:, None]) + c_shift_mlp[:, None]
        context = context + c_gate_mlp[:, None] * GELUMLP(
            dim, dtype=self.dtype, lora=self.lora, name="ff_context"
        )(h)
        return x, context


def _rms(x, w, dtype):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x.astype(jnp.float32) * jax.lax.rsqrt(var + 1e-6)).astype(dtype) * w


class MMDiT(nn.Module):
    cfg: MMDiTConfig = SD3_MEDIUM_CONFIG
    dtype: jnp.dtype = jnp.float32
    lora: LoRASpec = NO_LORA
    remat: bool = False
    remat_policy: Optional[str] = None  # see ops/common.py:resolve_remat_policy

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # (N, H, W, C) latent
        timesteps: jnp.ndarray,  # (N,) in [0, 1000]
        encoder_hidden_states: jnp.ndarray,  # (N, S, joint_attention_dim)
        pooled_projections: jnp.ndarray,  # (N, pooled_projection_dim)
    ) -> jnp.ndarray:
        cfg = self.cfg
        n, h, w, _ = sample.shape
        p = cfg.patch_size

        x = PatchEmbed(
            p, cfg.inner_dim, cfg.pos_embed_max_size, dtype=self.dtype,
            lora=self.lora, name="pos_embed",
        )(sample.astype(self.dtype))

        t_emb = sinusoidal_embedding(timesteps, 256).astype(self.dtype)
        temb = _TimestepMLP(
            cfg.inner_dim, dtype=self.dtype, lora=self.lora, name="timestep_embedder"
        )(t_emb)
        temb = temb + PixArtAlphaTextProjection(
            cfg.inner_dim, dtype=self.dtype, lora=self.lora, name="text_embedder"
        )(pooled_projections.astype(self.dtype))

        context = LoRADense(
            cfg.inner_dim, dtype=self.dtype, lora=self.lora, name="context_embedder"
        )(encoder_hidden_states.astype(self.dtype))

        remat_kw = (
            {"policy": resolve_remat_policy(self.remat_policy)} if self.remat_policy else {}
        )
        Block = nn.remat(JointTransformerBlock, **remat_kw) if self.remat else JointTransformerBlock
        for i in range(cfg.num_layers):
            x, context = Block(
                cfg,
                context_pre_only=(i == cfg.num_layers - 1),
                dtype=self.dtype,
                lora=self.lora,
                name=f"transformer_blocks_{i}",
            )(x, context, temb)
            self.sow("features", f"block_{i}", x)

        x = AdaLayerNormContinuous(cfg.inner_dim, dtype=self.dtype, name="norm_out")(x, temb)
        x = LoRADense(p * p * cfg.out_channels, dtype=self.dtype, lora=self.lora, name="proj_out")(x)

        hp, wp = h // p, w // p
        x = x.reshape(n, hp, wp, p, p, cfg.out_channels)
        x = jnp.einsum("nhwpqc->nhpwqc", x).reshape(n, h, w, cfg.out_channels)
        return x


class _TimestepMLP(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32
    lora: LoRASpec = NO_LORA

    @nn.compact
    def __call__(self, x):
        h = LoRADense(self.dim, dtype=self.dtype, lora=self.lora, name="linear_1")(x)
        h = nn.silu(h)
        return LoRADense(self.dim, dtype=self.dtype, lora=self.lora, name="linear_2")(h)


# LoRA target lists mirroring the reference SD3 trainers, with peft's
# endswith-matching translated to our '/'-joined-path substring matcher:
#
# * base (`train_pcm_lora_sd3.py:978-988`): attention qkv/out, the block FF
#   (ff.net.* — NOT ff_context, which peft's ".ff.net.0.proj" suffix match
#   excludes), and the model-level `proj_out` final projection ("proj_in"
#   matches nothing on SD3Transformer2DModel).
# * adv (`train_pcm_lora_sd3_adv.py:996-1015`): + joint-stream add_* projs,
#   ff_context, AdaLN linears, context/text/timestep embedders, pos_embed.proj.
# * adv_stochastic (`train_pcm_lora_sd3_adv_stochastic.py:986-1008`): the adv
#   list WITHOUT pos_embed.proj.
SD3_LORA_TARGETS = (
    "to_q", "to_k", "to_v", "to_out_0", "ff/net_0_proj", "ff/net_2", "proj_out",
)
SD3_ADV_STOCHASTIC_LORA_TARGETS = SD3_LORA_TARGETS + (
    "add_q_proj", "add_k_proj", "add_v_proj", "to_add_out",
    "ff_context/net_0_proj", "ff_context/net_2",
    "norm1/linear", "norm1_context/linear", "context_embedder",
    "text_embedder/linear_1", "text_embedder/linear_2",
    "timestep_embedder/linear_1", "timestep_embedder/linear_2",
)
SD3_ADV_LORA_TARGETS = SD3_ADV_STOCHASTIC_LORA_TARGETS + ("pos_embed/proj",)
