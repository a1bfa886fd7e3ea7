"""Weight porting: diffusers (torch) state dicts -> our flax param trees.

Covers the checkpoint formats of the models the reference distills
(UNet2DConditionModel for SD1.5/SDXL, AutoencoderKL, SD3Transformer2DModel)
so released teachers and students port 1:1. CLIP/T5 converters live with
their models (`clip.py`, `t5.py`) and are parity-tested against transformers.

Conventions:
  torch Linear weight (out, in)        -> kernel (in, out)       [transpose]
  torch Conv2d weight (out, in, kh, kw) -> kernel (kh, kw, in, out)
  GroupNorm/LayerNorm weight/bias      -> scale/bias
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _lin(sd, key):
    return {"kernel": jnp.asarray(_np(sd[key + ".weight"]).T),
            "bias": jnp.asarray(_np(sd[key + ".bias"]))}


def _lin_nobias(sd, key):
    return {"kernel": jnp.asarray(_np(sd[key + ".weight"]).T)}


def _conv(sd, key):
    w = _np(sd[key + ".weight"]).transpose(2, 3, 1, 0)
    out = {"kernel": jnp.asarray(w)}
    if key + ".bias" in sd:
        out["bias"] = jnp.asarray(_np(sd[key + ".bias"]))
    return out


def _norm(sd, key):
    return {"scale": jnp.asarray(_np(sd[key + ".weight"])),
            "bias": jnp.asarray(_np(sd[key + ".bias"]))}


def _attn(sd, key):
    return {
        "to_q": _lin_nobias(sd, key + ".to_q"),
        "to_k": _lin_nobias(sd, key + ".to_k"),
        "to_v": _lin_nobias(sd, key + ".to_v"),
        "to_out_0": _lin(sd, key + ".to_out.0"),
    }


def _transformer_block(sd, key):
    return {
        "norm1": _norm(sd, key + ".norm1"),
        "attn1": _attn(sd, key + ".attn1"),
        "norm2": _norm(sd, key + ".norm2"),
        "attn2": _attn(sd, key + ".attn2"),
        "norm3": _norm(sd, key + ".norm3"),
        "ff": {
            "net_0_proj": _lin(sd, key + ".ff.net.0.proj"),
            "net_2": _lin(sd, key + ".ff.net.2"),
        },
    }


def _transformer2d(sd, key, depth, linear_proj):
    out = {"norm": _norm(sd, key + ".norm")}
    proj = _lin if linear_proj else _conv
    out["proj_in"] = proj(sd, key + ".proj_in")
    out["proj_out"] = proj(sd, key + ".proj_out")
    for k in range(depth):
        out[f"transformer_blocks_{k}"] = _transformer_block(
            sd, key + f".transformer_blocks.{k}"
        )
    return out


def _resnet(sd, key, has_time=True):
    out = {
        "norm1": _norm(sd, key + ".norm1"),
        "conv1": _conv(sd, key + ".conv1"),
        "norm2": _norm(sd, key + ".norm2"),
        "conv2": _conv(sd, key + ".conv2"),
    }
    if has_time and key + ".time_emb_proj.weight" in sd:
        out["time_emb_proj"] = _lin(sd, key + ".time_emb_proj")
    if key + ".conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, key + ".conv_shortcut")
    return out


def convert_unet_torch_state(sd: Dict[str, Any], cfg) -> Dict[str, Any]:
    """diffusers ``UNet2DConditionModel`` state dict -> our UNet params."""
    p: Dict[str, Any] = {
        "conv_in": _conv(sd, "conv_in"),
        "time_embedding": {
            "linear_1": _lin(sd, "time_embedding.linear_1"),
            "linear_2": _lin(sd, "time_embedding.linear_2"),
        },
        "conv_norm_out": _norm(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
    }
    if "add_embedding.linear_1.weight" in sd:
        p["add_embedding"] = {
            "linear_1": _lin(sd, "add_embedding.linear_1"),
            "linear_2": _lin(sd, "add_embedding.linear_2"),
        }

    num_levels = len(cfg.block_out_channels)
    for i in range(num_levels):
        for j in range(cfg.layers_per_block):
            p[f"down_blocks_{i}_resnets_{j}"] = _resnet(sd, f"down_blocks.{i}.resnets.{j}")
            if cfg.attn_blocks[i]:
                p[f"down_blocks_{i}_attentions_{j}"] = _transformer2d(
                    sd, f"down_blocks.{i}.attentions.{j}",
                    cfg.transformer_depth[i], cfg.use_linear_projection,
                )
        if i < num_levels - 1:
            p[f"down_blocks_{i}_downsamplers_0"] = {
                "conv": _conv(sd, f"down_blocks.{i}.downsamplers.0.conv")
            }

    p["mid_block_resnets_0"] = _resnet(sd, "mid_block.resnets.0")
    p["mid_block_attentions_0"] = _transformer2d(
        sd, "mid_block.attentions.0", cfg.transformer_depth[-1], cfg.use_linear_projection
    )
    p["mid_block_resnets_1"] = _resnet(sd, "mid_block.resnets.1")

    for up_idx, level in enumerate(reversed(range(num_levels))):
        for j in range(cfg.layers_per_block + 1):
            p[f"up_blocks_{up_idx}_resnets_{j}"] = _resnet(
                sd, f"up_blocks.{up_idx}.resnets.{j}"
            )
            if cfg.attn_blocks[level]:
                p[f"up_blocks_{up_idx}_attentions_{j}"] = _transformer2d(
                    sd, f"up_blocks.{up_idx}.attentions.{j}",
                    cfg.transformer_depth[level], cfg.use_linear_projection,
                )
        if level > 0:
            p[f"up_blocks_{up_idx}_upsamplers_0"] = {
                "conv": _conv(sd, f"up_blocks.{up_idx}.upsamplers.0.conv")
            }
    return p


def _vae_attn(sd, key):
    return {
        "group_norm": _norm(sd, key + ".group_norm"),
        "to_q": _lin(sd, key + ".to_q"),
        "to_k": _lin(sd, key + ".to_k"),
        "to_v": _lin(sd, key + ".to_v"),
        "to_out_0": _lin(sd, key + ".to_out.0"),
    }


def convert_vae_torch_state(sd: Dict[str, Any], cfg) -> Dict[str, Any]:
    """diffusers ``AutoencoderKL`` state dict -> our AutoencoderKL params."""
    chans = cfg.block_out_channels
    num_levels = len(chans)

    enc: Dict[str, Any] = {"conv_in": _conv(sd, "encoder.conv_in"),
                           "conv_norm_out": _norm(sd, "encoder.conv_norm_out"),
                           "conv_out": _conv(sd, "encoder.conv_out")}
    for i in range(num_levels):
        for j in range(cfg.layers_per_block):
            enc[f"down_blocks_{i}_resnets_{j}"] = _resnet(
                sd, f"encoder.down_blocks.{i}.resnets.{j}", has_time=False
            )
        if i < num_levels - 1:
            enc[f"down_blocks_{i}_downsamplers_0_conv"] = _conv(
                sd, f"encoder.down_blocks.{i}.downsamplers.0.conv"
            )
    enc["mid_resnets_0"] = _resnet(sd, "encoder.mid_block.resnets.0", has_time=False)
    enc["mid_attentions_0"] = _vae_attn(sd, "encoder.mid_block.attentions.0")
    enc["mid_resnets_1"] = _resnet(sd, "encoder.mid_block.resnets.1", has_time=False)

    dec: Dict[str, Any] = {"conv_in": _conv(sd, "decoder.conv_in"),
                           "conv_norm_out": _norm(sd, "decoder.conv_norm_out"),
                           "conv_out": _conv(sd, "decoder.conv_out")}
    dec["mid_resnets_0"] = _resnet(sd, "decoder.mid_block.resnets.0", has_time=False)
    dec["mid_attentions_0"] = _vae_attn(sd, "decoder.mid_block.attentions.0")
    dec["mid_resnets_1"] = _resnet(sd, "decoder.mid_block.resnets.1", has_time=False)
    for up_idx, level in enumerate(reversed(range(num_levels))):
        for j in range(cfg.layers_per_block + 1):
            dec[f"up_blocks_{up_idx}_resnets_{j}"] = _resnet(
                sd, f"decoder.up_blocks.{up_idx}.resnets.{j}", has_time=False
            )
        if level > 0:
            dec[f"up_blocks_{up_idx}_upsamplers_0_conv"] = _conv(
                sd, f"decoder.up_blocks.{up_idx}.upsamplers.0.conv"
            )

    out = {"encoder": enc, "decoder": dec}
    if cfg.use_quant_conv:
        out["quant_conv"] = _conv(sd, "quant_conv")
        out["post_quant_conv"] = _conv(sd, "post_quant_conv")
    return out


def convert_mmdit_torch_state(sd: Dict[str, Any], cfg) -> Dict[str, Any]:
    """diffusers ``SD3Transformer2DModel`` state dict -> our MMDiT params."""
    pos_w = _np(sd["pos_embed.pos_embed"])  # (1, max*max, dim)
    m = cfg.pos_embed_max_size
    p: Dict[str, Any] = {
        "pos_embed": {
            "proj": _conv(sd, "pos_embed.proj"),
            "pos_embed": jnp.asarray(pos_w.reshape(1, m, m, cfg.inner_dim)),
        },
        "timestep_embedder": {
            "linear_1": _lin(sd, "time_text_embed.timestep_embedder.linear_1"),
            "linear_2": _lin(sd, "time_text_embed.timestep_embedder.linear_2"),
        },
        "text_embedder": {
            "linear_1": _lin(sd, "time_text_embed.text_embedder.linear_1"),
            "linear_2": _lin(sd, "time_text_embed.text_embedder.linear_2"),
        },
        "context_embedder": _lin(sd, "context_embedder"),
        "norm_out": {"linear": _lin(sd, "norm_out.linear")},
        "proj_out": _lin(sd, "proj_out"),
    }
    for i in range(cfg.num_layers):
        b = f"transformer_blocks.{i}"
        blk: Dict[str, Any] = {
            "norm1": {"linear": _lin(sd, b + ".norm1.linear")},
            "norm1_context": {"linear": _lin(sd, b + ".norm1_context.linear")},
            "to_q": _lin(sd, b + ".attn.to_q"),
            "to_k": _lin(sd, b + ".attn.to_k"),
            "to_v": _lin(sd, b + ".attn.to_v"),
            "add_q_proj": _lin(sd, b + ".attn.add_q_proj"),
            "add_k_proj": _lin(sd, b + ".attn.add_k_proj"),
            "add_v_proj": _lin(sd, b + ".attn.add_v_proj"),
            "to_out_0": _lin(sd, b + ".attn.to_out.0"),
            "ff": {
                "net_0_proj": _lin(sd, b + ".ff.net.0.proj"),
                "net_2": _lin(sd, b + ".ff.net.2"),
            },
        }
        if b + ".attn.to_add_out.weight" in sd:
            blk["to_add_out"] = _lin(sd, b + ".attn.to_add_out")
        if b + ".ff_context.net.0.proj.weight" in sd:
            blk["ff_context"] = {
                "net_0_proj": _lin(sd, b + ".ff_context.net.0.proj"),
                "net_2": _lin(sd, b + ".ff_context.net.2"),
            }
        p[f"transformer_blocks_{i}"] = blk
    return p
