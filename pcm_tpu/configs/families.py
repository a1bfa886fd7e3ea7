"""Production model-family bundle constructors (mirror the reference's three
teacher families) plus the six training recipes from the reference shell
scripts (SURVEY.md §2 #22, BASELINE.md)."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from ..lora.layers import LoRASpec
from ..models.clip import CLIP_BIG_G_CONFIG, CLIP_L_CONFIG, CLIPTextConfig
from ..models.mmdit import (
    SD3_ADV_LORA_TARGETS,
    SD3_ADV_STOCHASTIC_LORA_TARGETS,
    SD3_LORA_TARGETS,
    SD3_MEDIUM_CONFIG,
    TINY_MMDIT_CONFIG,
)
from ..models.t5 import T5_XXL_CONFIG, T5Config
from ..models.unet import SD15_CONFIG, SDXL_CONFIG, TINY_SDXL_CONFIG, TINY_UNET_CONFIG
from ..models.vae import SD3_VAE_CONFIG, SD15_VAE_CONFIG, SDXL_VAE_CONFIG, TINY_VAE_CONFIG
from ..train.bundles import SD3Bundle, SD15Bundle, SDXLBundle, SD_UNET_LORA_TARGETS
from ..train.distill import DistillConfig

# Tiny text-encoder configs for `tiny=True` bundles (CLI smoke mode): real
# tokenizer-width vocab so HashTokenizer/CLIP token ids are always in range,
# hidden sizes matched to the TINY_* backbone conditioning dims.
_TINY_CLIP_SD15 = CLIPTextConfig(
    hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64
)
_TINY_CLIP_XL1 = CLIPTextConfig(
    hidden_size=16, num_layers=2, num_heads=2, intermediate_size=32
)
_TINY_CLIP_XL2 = CLIPTextConfig(
    hidden_size=16, num_layers=2, num_heads=2, intermediate_size=32,
    hidden_act="gelu", projection_dim=32,
)
_TINY_CLIP_SD3 = CLIPTextConfig(
    hidden_size=16, num_layers=2, num_heads=2, intermediate_size=32,
    projection_dim=16,
)
_TINY_T5 = T5Config(
    vocab_size=49408, d_model=32, d_kv=8, d_ff=64, num_layers=2, num_heads=4
)


def sd15_bundle(lora_rank: int = 64, dtype=jnp.bfloat16, remat: bool = True,
                remat_policy=None, remat_levels=None, tiny: bool = False,
                vae_encode_chunk=None, vae_encode_shards: int = 1,
                remat_granularity: str = "module",
                scan_blocks: bool = False) -> SD15Bundle:
    return SD15Bundle(
        unet_cfg=TINY_UNET_CONFIG if tiny else SD15_CONFIG,
        vae_cfg=TINY_VAE_CONFIG if tiny else SD15_VAE_CONFIG,
        text_cfg=_TINY_CLIP_SD15 if tiny else CLIP_L_CONFIG,
        lora=LoRASpec(rank=lora_rank, alpha=8.0, targets=SD_UNET_LORA_TARGETS),
        dtype=dtype,
        remat=remat,
        remat_policy=remat_policy,
        remat_levels=remat_levels,
        vae_encode_chunk=vae_encode_chunk,
        vae_encode_shards=vae_encode_shards,
        remat_granularity=remat_granularity,
        scan_blocks=scan_blocks,
    )


def sdxl_bundle(lora_rank: int = 64, dtype=jnp.bfloat16, remat: bool = True,
                remat_policy=None, remat_levels=None, tiny: bool = False,
                vae_encode_chunk=None, vae_encode_shards: int = 1,
                remat_granularity: str = "module",
                scan_blocks: bool = False) -> SDXLBundle:
    return SDXLBundle(
        unet_cfg=TINY_SDXL_CONFIG if tiny else SDXL_CONFIG,
        vae_cfg=TINY_VAE_CONFIG if tiny else SDXL_VAE_CONFIG,
        text_cfg=_TINY_CLIP_XL1 if tiny else CLIP_L_CONFIG,
        text2_cfg=_TINY_CLIP_XL2 if tiny else CLIP_BIG_G_CONFIG,
        lora=LoRASpec(rank=lora_rank, alpha=8.0, targets=SD_UNET_LORA_TARGETS),
        dtype=dtype,
        remat=remat,
        remat_policy=remat_policy,
        remat_levels=remat_levels,
        vae_encode_chunk=vae_encode_chunk,
        vae_encode_shards=vae_encode_shards,
        remat_granularity=remat_granularity,
        scan_blocks=scan_blocks,
    )


def sd3_bundle(
    lora_rank: int = 32, dtype=jnp.bfloat16, remat: bool = True, adv_targets: bool = False,
    remat_policy=None, stochastic: bool = False, tiny: bool = False,
    vae_encode_chunk=None, vae_encode_shards: int = 1,
) -> SD3Bundle:
    """``adv_targets`` extends LoRA to the reference's adversarial target list;
    ``stochastic`` additionally drops ``pos_embed.proj`` (the
    `train_pcm_lora_sd3_adv_stochastic.py:986-1008` target-list diff)."""
    clip_l = dataclasses.replace(CLIP_L_CONFIG, projection_dim=768)
    if adv_targets:
        targets = SD3_ADV_STOCHASTIC_LORA_TARGETS if stochastic else SD3_ADV_LORA_TARGETS
    else:
        targets = SD3_LORA_TARGETS
    return SD3Bundle(
        mmdit_cfg=TINY_MMDIT_CONFIG if tiny else SD3_MEDIUM_CONFIG,
        vae_cfg=TINY_VAE_CONFIG if tiny else SD3_VAE_CONFIG,
        text_cfg=_TINY_CLIP_SD3 if tiny else clip_l,
        text2_cfg=_TINY_CLIP_SD3 if tiny else CLIP_BIG_G_CONFIG,
        t5_cfg=_TINY_T5 if tiny else T5_XXL_CONFIG,
        lora=LoRASpec(rank=lora_rank, alpha=8.0, targets=targets),
        dtype=dtype,
        remat=remat,
        remat_policy=remat_policy,
        vae_encode_chunk=vae_encode_chunk,
        vae_encode_shards=vae_encode_shards,
    )


# ---------------------------------------------------------------------------
# The six reference recipes (shell-script configs, BASELINE.md table).
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Recipe:
    name: str
    family: str  # sd15 | sdxl | sd3
    resolution: int
    batch_per_chip: int
    max_steps: int
    lr: float
    distill: DistillConfig
    lora_rank: int
    adversarial: bool = False
    adv_lr: float = 1e-5
    adv_weight: float = 0.1
    proportion_empty_prompts: float = 0.0
    # SD3 stochastic-adv variant: shift-3 scheduler baked + LoRA targets
    # without pos_embed.proj (+ validates with the stochastic sampler)
    stochastic: bool = False


RECIPES = {
    # train_pcm_lora_sd15.sh:5-29
    "sd15_4phase": Recipe(
        "sd15_4phase", "sd15", 512, 20, 5000, 5e-6,
        DistillConfig(num_solver_steps=50, multiphase=4, w_min=4, w_max=5),
        lora_rank=64,
    ),
    # train_pcm_lora_sd15.sh:41-67 (no CFG solver, 10% prompt dropout)
    "sd15_4phase_nocfg": Recipe(
        "sd15_4phase_nocfg", "sd15", 512, 20, 5000, 5e-6,
        DistillConfig(num_solver_steps=50, multiphase=4, not_apply_cfg_solver=True),
        lora_rank=64, proportion_empty_prompts=0.1,
    ),
    # train_pcm_lora_sd15.sh:78-104 (2-phase adversarial)
    "sd15_2phase_adv": Recipe(
        "sd15_2phase_adv", "sd15", 512, 20, 10000, 5e-6,
        DistillConfig(num_solver_steps=50, multiphase=2, w_min=4, w_max=5),
        lora_rank=64, adversarial=True,
    ),
    # train_pcm_lora_sdxl.sh:9-37
    "sdxl_4phase_adv": Recipe(
        "sdxl_4phase_adv", "sdxl", 1024, 10, 20000, 2e-6,
        DistillConfig(num_solver_steps=40, multiphase=4, w_min=6, w_max=7),
        lora_rank=64, adversarial=True,
    ),
    # run.sh:7-95 (SD3, phases 1/2/4, fixed w=3)
    "sd3_1phase_adv": Recipe(
        "sd3_1phase_adv", "sd3", 1024, 2, 20000, 5e-6,
        DistillConfig(num_solver_steps=100, multiphase=1, fixed_w=3.0),
        lora_rank=32, adversarial=True,
    ),
    "sd3_2phase_adv": Recipe(
        "sd3_2phase_adv", "sd3", 1024, 2, 20000, 5e-6,
        DistillConfig(num_solver_steps=100, multiphase=2, fixed_w=3.0),
        lora_rank=32, adversarial=True,
    ),
    "sd3_4phase_adv": Recipe(
        "sd3_4phase_adv", "sd3", 1024, 2, 20000, 5e-6,
        DistillConfig(num_solver_steps=100, multiphase=4, fixed_w=3.0),
        lora_rank=32, adversarial=True,
    ),
    # train_pcm_lora_sd3_adv_stochastic.py: same training math with the
    # shift=3 scheduler baked in; deploy/validate with the stochastic sampler
    "sd3_adv_stochastic": Recipe(
        "sd3_adv_stochastic", "sd3", 1024, 2, 20000, 5e-6,
        DistillConfig(num_solver_steps=100, multiphase=1, fixed_w=3.0),
        lora_rank=32, adversarial=True, stochastic=True,
    ),
}
