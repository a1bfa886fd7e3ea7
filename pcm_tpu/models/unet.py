"""UNet2DCondition — TPU-native reimplementation of the SD1.5/SDXL UNet.

One configurable flax module covers both teacher families the reference
distills (`train_pcm_lora_sd15.py` loads `UNet2DConditionModel`; SDXL adds
pooled-text + time_ids micro-conditioning, `train_pcm_lora_sdxl_adv.py:
1093-1131`). Channels-last layout, Pallas flash attention / fused
GroupNorm+SiLU / GEGLU kernels, LoRA overlay via the ``lora`` collection.

Feature taps for the adversarial discriminators (`discriminator_sd15.py:
266-345` collects per-block features) are first-class: pass
``mutable=['features']`` to ``apply`` and every down/mid/up block output is
sown into the ``features`` collection.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..lora.layers import LoRAConv, LoRASpec, NO_LORA
from ..ops.common import resolve_remat_policy
from .attention import Transformer2D
from .embeddings import TimestepEmbedding, sinusoidal_embedding
from .normalization import GroupNorm
from .resnet import Downsample2D, ResnetBlock2D, Upsample2D


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    # per-level: True => cross-attention transformer after each resnet
    attn_blocks: Tuple[bool, ...] = (True, True, True, False)
    num_heads: Tuple[int, ...] = (8, 8, 8, 8)
    transformer_depth: Tuple[int, ...] = (1, 1, 1, 1)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    use_linear_projection: bool = False
    norm_groups: int = 32
    # SDXL micro-conditioning: pooled text (addition) embedding widths
    addition_embed_dim: Optional[int] = None  # sinusoid dim per time_id (SDXL: 256)
    addition_in_dim: Optional[int] = None  # total concat width (SDXL: 2816)
    # LCM-style guidance-scale embedding input width (ref guidance_scale_embedding,
    # `train_pcm_lora_sd15.py:211-237`; passed as timestep_cond). None = disabled.
    time_cond_proj_dim: Optional[int] = None

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4


SD15_CONFIG = UNetConfig()

SDXL_CONFIG = UNetConfig(
    block_out_channels=(320, 640, 1280),
    attn_blocks=(False, True, True),
    num_heads=(5, 10, 20),
    transformer_depth=(1, 2, 10),
    cross_attention_dim=2048,
    use_linear_projection=True,
    addition_embed_dim=256,
    addition_in_dim=2816,
)

# Tiny config for fast tests.
TINY_UNET_CONFIG = UNetConfig(
    block_out_channels=(32, 64),
    attn_blocks=(True, False),
    num_heads=(2, 2),
    transformer_depth=(1, 1),
    layers_per_block=1,
    cross_attention_dim=32,
)

TINY_SDXL_CONFIG = UNetConfig(
    block_out_channels=(32, 64),
    attn_blocks=(False, True),
    num_heads=(2, 2),
    transformer_depth=(1, 1),
    layers_per_block=1,
    cross_attention_dim=32,
    use_linear_projection=True,
    addition_embed_dim=32,
    addition_in_dim=32 * 6 + 32,
)


class UNet2DCondition(nn.Module):
    cfg: UNetConfig = SD15_CONFIG
    dtype: jnp.dtype = jnp.float32
    lora: LoRASpec = NO_LORA
    remat: bool = False  # rematerialize resnet/transformer blocks (1024px memory)
    # None = recompute everything in bwd (min memory); "dots" = keep matmul
    # outputs resident and recompute only cheap elementwise ops (faster bwd,
    # more HBM) — jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    remat_policy: Optional[str] = None
    # per-resolution-level remat mask (len == len(block_out_channels)); None =
    # remat every level. (True, True, False) remats only the two high-res
    # levels — their activations dominate HBM while the deep low-res
    # transformer stack dominates FLOPs, so this buys most of the no-remat
    # speed at a fraction of the memory (v5e measurements in bench.py)
    remat_levels: Optional[Tuple[bool, ...]] = None
    # "module" checkpoints each whole Transformer2D/Resnet (historical
    # default); "block" moves the transformer boundary inside, to each
    # BasicTransformerBlock — same recompute FLOPs, but the backward's peak
    # drops from all-of-a-depth-10-stack's temps to one block's (the measured
    # bs8 SDXL OOM was 10 simultaneous 160M GEGLU remat temps). proj_in/out
    # and the Transformer2D GroupNorm then stay out of any remat region
    # (their residuals are one ~20M tensor each).
    remat_granularity: str = "module"  # "module" | "block"
    # lax.scan over each Transformer2D's block stack (attention.py
    # _ScanBlockBody): one traced block per stack instead of depth-d unrolled
    # copies — several-fold smaller MLIR/compile time for the SDXL-1024 step.
    # Param layout changes (stacked `blocks_scan/block/...`), so this is the
    # perf-graph option; converter/kohya interop stays on the unrolled layout.
    scan_blocks: bool = False

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # (N, H, W, C) latent
        timesteps: jnp.ndarray,  # (N,)
        encoder_hidden_states: jnp.ndarray,  # (N, S, D)
        added_cond: Optional[Dict[str, jnp.ndarray]] = None,
        # SDXL: {"text_embeds": (N, 1280), "time_ids": (N, 6)}
        stop_after_mid: bool = False,  # feature-extraction mode (discriminator)
        timestep_cond: Optional[jnp.ndarray] = None,  # (N, time_cond_proj_dim)
    ) -> jnp.ndarray:
        cfg = self.cfg
        lora = self.lora
        ch0 = cfg.block_out_channels[0]
        remat_kw = {"policy": resolve_remat_policy(self.remat_policy)} if self.remat_policy else {}

        def blocks_for(level: int):
            do = self.remat and (
                self.remat_levels is None or self.remat_levels[level]
            )
            Xf2D = (
                functools.partial(Transformer2D, scan_blocks=True)
                if self.scan_blocks
                else Transformer2D
            )
            if not do:
                return ResnetBlock2D, Xf2D
            if self.remat_granularity == "block" or self.scan_blocks:
                # scan mode always remats at the block/carry boundary: a
                # module-level checkpoint AROUND the scan would re-run the
                # whole stack per block gradient in the reverse scan
                return nn.remat(ResnetBlock2D, **remat_kw), functools.partial(
                    Xf2D,
                    remat_blocks=True,
                    remat_policy=self.remat_policy,
                )
            return nn.remat(ResnetBlock2D, **remat_kw), nn.remat(Transformer2D, **remat_kw)

        # --- time embedding (fp32 sinusoid, then model dtype MLP) ---
        t_emb = sinusoidal_embedding(timesteps, ch0).astype(self.dtype)
        if cfg.time_cond_proj_dim is not None and timestep_cond is not None:
            t_emb = t_emb + nn.Dense(
                ch0, use_bias=False, dtype=self.dtype, name="time_embedding_cond_proj"
            )(timestep_cond.astype(self.dtype))
        temb = TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype, name="time_embedding")(t_emb)

        if cfg.addition_in_dim is not None:
            assert added_cond is not None, "SDXL config requires added_cond"
            time_ids = added_cond["time_ids"]  # (N, 6)
            n = time_ids.shape[0]
            aug = sinusoidal_embedding(
                time_ids.reshape(-1), cfg.addition_embed_dim
            ).reshape(n, -1)
            aug = jnp.concatenate(
                [added_cond["text_embeds"].astype(jnp.float32), aug], axis=-1
            ).astype(self.dtype)
            temb = temb + TimestepEmbedding(
                cfg.time_embed_dim, dtype=self.dtype, name="add_embedding"
            )(aug)

        context = encoder_hidden_states.astype(self.dtype)
        sample = sample.astype(self.dtype)

        # --- down ---
        h = LoRAConv(ch0, (3, 3), dtype=self.dtype, lora=lora, name="conv_in")(sample)
        skips = [h]
        num_levels = len(cfg.block_out_channels)
        for level, ch in enumerate(cfg.block_out_channels):
            prefix = f"down_blocks_{level}"
            Resnet, Transformer = blocks_for(level)
            for j in range(cfg.layers_per_block):
                h = Resnet(
                    ch, cfg.norm_groups, dtype=self.dtype, lora=lora,
                    name=f"{prefix}_resnets_{j}",
                )(h, temb)
                if cfg.attn_blocks[level]:
                    h = Transformer(
                        ch,
                        cfg.num_heads[level],
                        ch // cfg.num_heads[level],
                        cfg.transformer_depth[level],
                        cfg.cross_attention_dim,
                        cfg.use_linear_projection,
                        cfg.norm_groups,
                        dtype=self.dtype,
                        lora=lora,
                        name=f"{prefix}_attentions_{j}",
                    )(h, context)
                skips.append(h)
            if level < num_levels - 1:
                h = Downsample2D(ch, dtype=self.dtype, lora=lora, name=f"{prefix}_downsamplers_0")(h)
                skips.append(h)
            self.sow("features", f"down_{level}", h)

        # --- mid ---
        ch = cfg.block_out_channels[-1]
        Resnet, Transformer = blocks_for(num_levels - 1)
        h = Resnet(
            ch, cfg.norm_groups, dtype=self.dtype, lora=lora, name="mid_block_resnets_0"
        )(h, temb)
        h = Transformer(
            ch,
            cfg.num_heads[-1],
            ch // cfg.num_heads[-1],
            cfg.transformer_depth[-1],
            cfg.cross_attention_dim,
            cfg.use_linear_projection,
            cfg.norm_groups,
            dtype=self.dtype,
            lora=lora,
            name="mid_block_attentions_0",
        )(h, context)
        h = Resnet(
            ch, cfg.norm_groups, dtype=self.dtype, lora=lora, name="mid_block_resnets_1"
        )(h, temb)
        self.sow("features", "mid", h)

        # --- up ---
        for up_idx, level in enumerate(reversed(range(num_levels))):
            ch = cfg.block_out_channels[level]
            prefix = f"up_blocks_{up_idx}"
            Resnet, Transformer = blocks_for(level)
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = Resnet(
                    ch, cfg.norm_groups, dtype=self.dtype, lora=lora,
                    name=f"{prefix}_resnets_{j}",
                )(h, temb)
                if cfg.attn_blocks[level]:
                    h = Transformer(
                        ch,
                        cfg.num_heads[level],
                        ch // cfg.num_heads[level],
                        cfg.transformer_depth[level],
                        cfg.cross_attention_dim,
                        cfg.use_linear_projection,
                        cfg.norm_groups,
                        dtype=self.dtype,
                        lora=lora,
                        name=f"{prefix}_attentions_{j}",
                    )(h, context)
            if level > 0:
                h = Upsample2D(ch, dtype=self.dtype, lora=lora, name=f"{prefix}_upsamplers_0")(h)
            self.sow("features", f"up_{up_idx}", h)

        h = GroupNorm(
            cfg.norm_groups, act="silu", dtype=self.dtype, name="conv_norm_out"
        )(h)
        return LoRAConv(
            cfg.out_channels, (3, 3), dtype=self.dtype, lora=lora, name="conv_out"
        )(h)
