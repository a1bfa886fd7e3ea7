"""Minimal PyTorch oracles of the diffusers modules the reference depends on.

The reference gets UNet/VAE/MMDiT correctness "for free" from diffusers
(`/root/reference/code/text_to_image_sd15/train_pcm_lora_sd15.py:820-852`
loads `UNet2DConditionModel`/`AutoencoderKL`; the SD3 trainers load
`SD3Transformer2DModel`). diffusers is not installed in this image, so these
are independent re-implementations of those architectures (written from the
published model specs) used purely as numerical parity oracles for our flax
models + `pcm_tpu/models/convert.py` (VERDICT round-1 item #2).

``state_dict()`` keys intentionally match diffusers' naming so the converter
consumes them unchanged — that is the same key layout released SD teacher
checkpoints use.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


# --------------------------------------------------------------------------
# shared pieces
# --------------------------------------------------------------------------

def timestep_sinusoid(t: torch.Tensor, dim: int, flip_sin_to_cos: bool = True,
                      downscale_freq_shift: float = 0.0,
                      max_period: float = 10000.0) -> torch.Tensor:
    """diffusers ``Timesteps`` module math (get_timestep_embedding)."""
    half = dim // 2
    exponent = -math.log(max_period) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = t.float()[:, None] * torch.exp(exponent)[None, :]
    emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half:], emb[:, :half]], dim=-1)
    if dim % 2 == 1:
        emb = F.pad(emb, (0, 1))
    return emb


class TimestepEmbedding(nn.Module):
    """linear_1 -> SiLU -> linear_2."""

    def __init__(self, in_dim: int, dim: int):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class ResnetBlock2D(nn.Module):
    def __init__(self, in_ch: int, out_ch: int, temb_ch: int = 0,
                 groups: int = 32, eps: float = 1e-5):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_ch, eps=eps)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        if temb_ch:
            self.time_emb_proj = nn.Linear(temb_ch, out_ch)
        self.norm2 = nn.GroupNorm(groups, out_ch, eps=eps)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        if in_ch != out_ch:
            self.conv_shortcut = nn.Conv2d(in_ch, out_ch, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None and hasattr(self, "time_emb_proj"):
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class Attention(nn.Module):
    """Multi-head attention with diffusers key names (to_out is a ModuleList
    so the out projection serializes as ``to_out.0``)."""

    def __init__(self, query_dim: int, heads: int, head_dim: int,
                 cross_dim: int | None = None, qkv_bias: bool = False):
        super().__init__()
        inner = heads * head_dim
        ctx = cross_dim if cross_dim is not None else query_dim
        self.heads, self.head_dim = heads, head_dim
        self.to_q = nn.Linear(query_dim, inner, bias=qkv_bias)
        self.to_k = nn.Linear(ctx, inner, bias=qkv_bias)
        self.to_v = nn.Linear(ctx, inner, bias=qkv_bias)
        self.to_out = nn.ModuleList([nn.Linear(inner, query_dim)])

    def _heads(self, x):
        b, s, _ = x.shape
        return x.reshape(b, s, self.heads, self.head_dim).permute(0, 2, 1, 3)

    def forward(self, x, context=None):
        ctx = x if context is None else context
        q, k, v = self._heads(self.to_q(x)), self._heads(self.to_k(ctx)), self._heads(self.to_v(ctx))
        o = F.scaled_dot_product_attention(q, k, v)
        b, h, s, d = o.shape
        o = o.permute(0, 2, 1, 3).reshape(b, s, h * d)
        return self.to_out[0](o)


class GEGLU(nn.Module):
    def __init__(self, dim: int, inner: int):
        super().__init__()
        self.proj = nn.Linear(dim, inner * 2)

    def forward(self, x):
        a, gate = self.proj(x).chunk(2, dim=-1)
        return a * F.gelu(gate)


class GELUProj(nn.Module):
    """diffusers GELU(approximate='tanh') activation module (SD3 FF)."""

    def __init__(self, dim: int, inner: int):
        super().__init__()
        self.proj = nn.Linear(dim, inner)

    def forward(self, x):
        return F.gelu(self.proj(x), approximate="tanh")


class FeedForward(nn.Module):
    """``net.0`` = act module (with ``.proj``), ``net.1`` = dropout,
    ``net.2`` = out linear — diffusers serialization layout."""

    def __init__(self, dim: int, mult: int = 4, act: str = "geglu"):
        super().__init__()
        inner = dim * mult
        act_mod = GEGLU(dim, inner) if act == "geglu" else GELUProj(dim, inner)
        self.net = nn.ModuleList([act_mod, nn.Identity(), nn.Linear(inner, dim)])

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim: int, heads: int, head_dim: int, cross_dim: int):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = Attention(dim, heads, head_dim)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = Attention(dim, heads, head_dim, cross_dim=cross_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = FeedForward(dim)

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        x = x + self.ff(self.norm3(x))
        return x


class Transformer2DModel(nn.Module):
    def __init__(self, ch: int, heads: int, head_dim: int, depth: int,
                 cross_dim: int, use_linear_projection: bool, groups: int = 32):
        super().__init__()
        inner = heads * head_dim
        self.use_linear_projection = use_linear_projection
        self.norm = nn.GroupNorm(groups, ch, eps=1e-6)
        if use_linear_projection:
            self.proj_in = nn.Linear(ch, inner)
            self.proj_out = nn.Linear(inner, ch)
        else:
            self.proj_in = nn.Conv2d(ch, inner, 1)
            self.proj_out = nn.Conv2d(inner, ch, 1)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(inner, heads, head_dim, cross_dim) for _ in range(depth)]
        )

    def forward(self, x, context):
        n, c, h, w = x.shape
        res = x
        hidden = self.norm(x)
        if self.use_linear_projection:
            hidden = hidden.permute(0, 2, 3, 1).reshape(n, h * w, c)
            hidden = self.proj_in(hidden)
        else:
            hidden = self.proj_in(hidden)
            inner = hidden.shape[1]
            hidden = hidden.permute(0, 2, 3, 1).reshape(n, h * w, inner)
        for blk in self.transformer_blocks:
            hidden = blk(hidden, context)
        if self.use_linear_projection:
            hidden = self.proj_out(hidden)
            hidden = hidden.reshape(n, h, w, c).permute(0, 3, 1, 2)
        else:
            inner = hidden.shape[-1]
            hidden = hidden.reshape(n, h, w, inner).permute(0, 3, 1, 2)
            hidden = self.proj_out(hidden)
        return hidden + res


class Downsample2D(nn.Module):
    """UNet flavor: 3x3 stride-2 conv with symmetric padding=1 (diffusers
    ``downsample_padding=1`` for UNet2DConditionModel)."""

    def __init__(self, ch: int):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=1)

    def forward(self, x):
        return self.conv(x)


class DownsampleVAE(nn.Module):
    """VAE encoder flavor: padding=0 plus explicit asymmetric (0,1,0,1) pad."""

    def __init__(self, ch: int):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class Upsample2D(nn.Module):
    def __init__(self, ch: int):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class _Container(nn.Module):
    """Bag of named submodules (for diffusers' block nesting)."""

    def __init__(self, **mods):
        super().__init__()
        for k, v in mods.items():
            setattr(self, k, v)


# --------------------------------------------------------------------------
# UNet2DConditionModel oracle (configurable: covers SD1.5 and SDXL layouts)
# --------------------------------------------------------------------------

class UNet2DConditionModel(nn.Module):
    """Mirror of our ``UNetConfig``-driven flax UNet in torch/diffusers form."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        ch0 = cfg.block_out_channels[0]
        tdim = cfg.time_embed_dim
        self.conv_in = nn.Conv2d(cfg.in_channels, ch0, 3, padding=1)
        self.time_embedding = TimestepEmbedding(ch0, tdim)
        if cfg.addition_in_dim is not None:
            self.add_embedding = TimestepEmbedding(cfg.addition_in_dim, tdim)

        def make_attn(level):
            return Transformer2DModel(
                cfg.block_out_channels[level], cfg.num_heads[level],
                cfg.block_out_channels[level] // cfg.num_heads[level],
                cfg.transformer_depth[level], cfg.cross_attention_dim,
                cfg.use_linear_projection, cfg.norm_groups,
            )

        levels = len(cfg.block_out_channels)
        self.down_blocks = nn.ModuleList()
        in_ch = ch0
        for level, ch in enumerate(cfg.block_out_channels):
            resnets, attns = nn.ModuleList(), nn.ModuleList()
            for _ in range(cfg.layers_per_block):
                resnets.append(ResnetBlock2D(in_ch, ch, tdim, cfg.norm_groups))
                in_ch = ch
                if cfg.attn_blocks[level]:
                    attns.append(make_attn(level))
            mods = {"resnets": resnets}
            if cfg.attn_blocks[level]:
                mods["attentions"] = attns
            if level < levels - 1:
                mods["downsamplers"] = nn.ModuleList([Downsample2D(ch)])
            self.down_blocks.append(_Container(**mods))

        ch = cfg.block_out_channels[-1]
        self.mid_block = _Container(
            resnets=nn.ModuleList(
                [ResnetBlock2D(ch, ch, tdim, cfg.norm_groups),
                 ResnetBlock2D(ch, ch, tdim, cfg.norm_groups)]
            ),
            attentions=nn.ModuleList([make_attn(levels - 1)]),
        )

        self.up_blocks = nn.ModuleList()
        # skip-channel bookkeeping mirrors the forward's stack
        skip_chs = [ch0]
        for level, c in enumerate(cfg.block_out_channels):
            skip_chs += [c] * cfg.layers_per_block
            if level < levels - 1:
                skip_chs.append(c)
        h_ch = cfg.block_out_channels[-1]
        for up_idx, level in enumerate(reversed(range(levels))):
            c = cfg.block_out_channels[level]
            resnets, attns = nn.ModuleList(), nn.ModuleList()
            for _ in range(cfg.layers_per_block + 1):
                skip = skip_chs.pop()
                resnets.append(ResnetBlock2D(h_ch + skip, c, tdim, cfg.norm_groups))
                h_ch = c
                if cfg.attn_blocks[level]:
                    attns.append(make_attn(level))
            mods = {"resnets": resnets}
            if cfg.attn_blocks[level]:
                mods["attentions"] = attns
            if level > 0:
                mods["upsamplers"] = nn.ModuleList([Upsample2D(c)])
            self.up_blocks.append(_Container(**mods))

        self.conv_norm_out = nn.GroupNorm(cfg.norm_groups, ch0, eps=1e-5)
        self.conv_out = nn.Conv2d(ch0, cfg.out_channels, 3, padding=1)

    def forward(self, sample, timesteps, context, text_embeds=None, time_ids=None):
        cfg = self.cfg
        ch0 = cfg.block_out_channels[0]
        temb = self.time_embedding(timestep_sinusoid(timesteps, ch0))
        if cfg.addition_in_dim is not None:
            n = time_ids.shape[0]
            aug = timestep_sinusoid(time_ids.reshape(-1), cfg.addition_embed_dim)
            aug = aug.reshape(n, -1)
            temb = temb + self.add_embedding(torch.cat([text_embeds, aug], dim=-1))

        h = self.conv_in(sample)
        skips = [h]
        for blk in self.down_blocks:
            attns = list(getattr(blk, "attentions", []))
            for j, res in enumerate(blk.resnets):
                h = res(h, temb)
                if attns:
                    h = attns[j](h, context)
                skips.append(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
                skips.append(h)

        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, context)
        h = self.mid_block.resnets[1](h, temb)

        for blk in self.up_blocks:
            attns = list(getattr(blk, "attentions", []))
            for j, res in enumerate(blk.resnets):
                h = torch.cat([h, skips.pop()], dim=1)
                h = res(h, temb)
                if attns:
                    h = attns[j](h, context)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0](h)

        return self.conv_out(F.silu(self.conv_norm_out(h)))


# --------------------------------------------------------------------------
# AutoencoderKL oracle
# --------------------------------------------------------------------------

class VAEAttention(nn.Module):
    """Single-head spatial self-attention of the VAE mid block."""

    def __init__(self, ch: int, groups: int = 32):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = nn.ModuleList([nn.Linear(ch, ch)])

    def forward(self, x):
        n, c, h, w = x.shape
        y = self.group_norm(x).permute(0, 2, 3, 1).reshape(n, h * w, c)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        o = F.scaled_dot_product_attention(
            q[:, None], k[:, None], v[:, None]
        )[:, 0]
        o = self.to_out[0](o)
        return x + o.reshape(n, h, w, c).permute(0, 3, 1, 2)


class VAEEncoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        chans = cfg.block_out_channels
        self.conv_in = nn.Conv2d(cfg.in_channels, chans[0], 3, padding=1)
        self.down_blocks = nn.ModuleList()
        in_ch = chans[0]
        for level, ch in enumerate(chans):
            resnets = nn.ModuleList()
            for _ in range(cfg.layers_per_block):
                resnets.append(ResnetBlock2D(in_ch, ch, 0, cfg.norm_groups, eps=1e-6))
                in_ch = ch
            mods = {"resnets": resnets}
            if level < len(chans) - 1:
                mods["downsamplers"] = nn.ModuleList([DownsampleVAE(ch)])
            self.down_blocks.append(_Container(**mods))
        ch = chans[-1]
        self.mid_block = _Container(
            resnets=nn.ModuleList([ResnetBlock2D(ch, ch, 0, cfg.norm_groups, eps=1e-6),
                                   ResnetBlock2D(ch, ch, 0, cfg.norm_groups, eps=1e-6)]),
            attentions=nn.ModuleList([VAEAttention(ch, cfg.norm_groups)]),
        )
        self.conv_norm_out = nn.GroupNorm(cfg.norm_groups, ch, eps=1e-6)
        self.conv_out = nn.Conv2d(ch, 2 * cfg.latent_channels, 3, padding=1)

    def forward(self, x):
        h = self.conv_in(x)
        for blk in self.down_blocks:
            for res in blk.resnets:
                h = res(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
        h = self.mid_block.resnets[0](h)
        h = self.mid_block.attentions[0](h)
        h = self.mid_block.resnets[1](h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class VAEDecoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        chans = cfg.block_out_channels
        ch = chans[-1]
        self.conv_in = nn.Conv2d(cfg.latent_channels, ch, 3, padding=1)
        self.mid_block = _Container(
            resnets=nn.ModuleList([ResnetBlock2D(ch, ch, 0, cfg.norm_groups, eps=1e-6),
                                   ResnetBlock2D(ch, ch, 0, cfg.norm_groups, eps=1e-6)]),
            attentions=nn.ModuleList([VAEAttention(ch, cfg.norm_groups)]),
        )
        self.up_blocks = nn.ModuleList()
        in_ch = ch
        for up_idx, level in enumerate(reversed(range(len(chans)))):
            c = chans[level]
            resnets = nn.ModuleList()
            for _ in range(cfg.layers_per_block + 1):
                resnets.append(ResnetBlock2D(in_ch, c, 0, cfg.norm_groups, eps=1e-6))
                in_ch = c
            mods = {"resnets": resnets}
            if level > 0:
                mods["upsamplers"] = nn.ModuleList([Upsample2D(c)])
            self.up_blocks.append(_Container(**mods))
        self.conv_norm_out = nn.GroupNorm(cfg.norm_groups, chans[0], eps=1e-6)
        self.conv_out = nn.Conv2d(chans[0], cfg.in_channels, 3, padding=1)

    def forward(self, z):
        h = self.conv_in(z)
        h = self.mid_block.resnets[0](h)
        h = self.mid_block.attentions[0](h)
        h = self.mid_block.resnets[1](h)
        for blk in self.up_blocks:
            for res in blk.resnets:
                h = res(h)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0](h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class AutoencoderKL(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.encoder = VAEEncoder(cfg)
        self.decoder = VAEDecoder(cfg)
        if cfg.use_quant_conv:
            self.quant_conv = nn.Conv2d(2 * cfg.latent_channels, 2 * cfg.latent_channels, 1)
            self.post_quant_conv = nn.Conv2d(cfg.latent_channels, cfg.latent_channels, 1)

    def encode_moments(self, x):
        m = self.encoder(x)
        if self.cfg.use_quant_conv:
            m = self.quant_conv(m)
        mean, logvar = m.chunk(2, dim=1)
        return mean, torch.clamp(logvar, -30.0, 20.0)

    def decode(self, z):
        if self.cfg.use_quant_conv:
            z = self.post_quant_conv(z)
        return self.decoder(z)


# --------------------------------------------------------------------------
# SD3Transformer2DModel (MMDiT) oracle
# --------------------------------------------------------------------------

class AdaLayerNormZero(nn.Module):
    def __init__(self, dim: int):
        super().__init__()
        self.linear = nn.Linear(dim, 6 * dim)
        self.norm = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)

    def forward(self, x, temb):
        emb = self.linear(F.silu(temb))
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = emb.chunk(6, dim=1)
        h = self.norm(x) * (1 + scale_msa[:, None]) + shift_msa[:, None]
        return h, gate_msa, shift_mlp, scale_mlp, gate_mlp


class AdaLayerNormContinuous(nn.Module):
    def __init__(self, dim: int):
        super().__init__()
        self.linear = nn.Linear(dim, 2 * dim)
        self.norm = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)

    def forward(self, x, temb):
        emb = self.linear(F.silu(temb))
        scale, shift = emb.chunk(2, dim=1)
        return self.norm(x) * (1 + scale[:, None]) + shift[:, None]


class JointAttention(nn.Module):
    def __init__(self, dim: int, heads: int, head_dim: int, context_pre_only: bool):
        super().__init__()
        self.heads, self.head_dim = heads, head_dim
        self.to_q = nn.Linear(dim, dim)
        self.to_k = nn.Linear(dim, dim)
        self.to_v = nn.Linear(dim, dim)
        self.add_q_proj = nn.Linear(dim, dim)
        self.add_k_proj = nn.Linear(dim, dim)
        self.add_v_proj = nn.Linear(dim, dim)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])
        if not context_pre_only:
            self.to_add_out = nn.Linear(dim, dim)

    def forward(self, hx, hc):
        b, sx, dim = hx.shape
        sc = hc.shape[1]
        q = torch.cat([self.to_q(hx), self.add_q_proj(hc)], dim=1)
        k = torch.cat([self.to_k(hx), self.add_k_proj(hc)], dim=1)
        v = torch.cat([self.to_v(hx), self.add_v_proj(hc)], dim=1)

        def heads(x):
            return x.reshape(b, sx + sc, self.heads, self.head_dim).permute(0, 2, 1, 3)

        o = F.scaled_dot_product_attention(heads(q), heads(k), heads(v))
        o = o.permute(0, 2, 1, 3).reshape(b, sx + sc, dim)
        ox, oc = o[:, :sx], o[:, sx:]
        ox = self.to_out[0](ox)
        if hasattr(self, "to_add_out"):
            oc = self.to_add_out(oc)
        return ox, oc


class JointTransformerBlock(nn.Module):
    def __init__(self, dim: int, heads: int, head_dim: int, context_pre_only: bool):
        super().__init__()
        self.context_pre_only = context_pre_only
        self.norm1 = AdaLayerNormZero(dim)
        self.norm1_context = (AdaLayerNormContinuous(dim) if context_pre_only
                              else AdaLayerNormZero(dim))
        self.attn = JointAttention(dim, heads, head_dim, context_pre_only)
        self.norm2 = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.ff = FeedForward(dim, act="gelu-approximate")
        if not context_pre_only:
            self.norm2_context = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
            self.ff_context = FeedForward(dim, act="gelu-approximate")

    def forward(self, x, context, temb):
        hx, gate_msa, shift_mlp, scale_mlp, gate_mlp = self.norm1(x, temb)
        if self.context_pre_only:
            hc = self.norm1_context(context, temb)
        else:
            hc, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = self.norm1_context(
                context, temb
            )
        ox, oc = self.attn(hx, hc)
        x = x + gate_msa[:, None] * ox
        h = self.norm2(x) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
        x = x + gate_mlp[:, None] * self.ff(h)
        if self.context_pre_only:
            return x, None
        context = context + c_gate_msa[:, None] * oc
        h = self.norm2_context(context) * (1 + c_scale_mlp[:, None]) + c_shift_mlp[:, None]
        context = context + c_gate_mlp[:, None] * self.ff_context(h)
        return x, context


class PatchEmbed(nn.Module):
    def __init__(self, patch: int, in_ch: int, dim: int, max_size: int):
        super().__init__()
        self.patch, self.max_size, self.dim = patch, max_size, dim
        self.proj = nn.Conv2d(in_ch, dim, patch, stride=patch)
        self.register_buffer("pos_embed", torch.zeros(1, max_size * max_size, dim))

    def forward(self, x):
        n, c, h, w = x.shape
        hp, wp = h // self.patch, w // self.patch
        tokens = self.proj(x).flatten(2).transpose(1, 2)  # (N, hp*wp, dim)
        pos = self.pos_embed.reshape(1, self.max_size, self.max_size, self.dim)
        top = (self.max_size - hp) // 2
        left = (self.max_size - wp) // 2
        pos = pos[:, top:top + hp, left:left + wp].reshape(1, hp * wp, self.dim)
        return tokens + pos


class SD3Transformer2DModel(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        dim = cfg.inner_dim
        self.pos_embed = PatchEmbed(cfg.patch_size, cfg.in_channels, dim,
                                    cfg.pos_embed_max_size)
        self.time_text_embed = _Container(
            timestep_embedder=TimestepEmbedding(256, dim),
            text_embedder=_Container(
                linear_1=nn.Linear(cfg.pooled_projection_dim, dim),
                linear_2=nn.Linear(dim, dim),
            ),
        )
        self.context_embedder = nn.Linear(cfg.joint_attention_dim, dim)
        self.transformer_blocks = nn.ModuleList(
            [JointTransformerBlock(dim, cfg.num_heads, cfg.head_dim,
                                   context_pre_only=(i == cfg.num_layers - 1))
             for i in range(cfg.num_layers)]
        )
        self.norm_out = AdaLayerNormContinuous(dim)
        self.proj_out = nn.Linear(dim, cfg.patch_size ** 2 * cfg.out_channels)

    def forward(self, sample, timesteps, context, pooled):
        cfg = self.cfg
        n, c, h, w = sample.shape
        p = cfg.patch_size
        x = self.pos_embed(sample)
        temb = self.time_text_embed.timestep_embedder(timestep_sinusoid(timesteps, 256))
        te = self.time_text_embed.text_embedder
        temb = temb + te.linear_2(F.silu(te.linear_1(pooled)))
        context = self.context_embedder(context)
        for blk in self.transformer_blocks:
            x, context = blk(x, context, temb)
        x = self.norm_out(x, temb)
        x = self.proj_out(x)
        hp, wp = h // p, w // p
        x = x.reshape(n, hp, wp, p, p, cfg.out_channels)
        x = torch.einsum("nhwpqc->nchpwq", x).reshape(n, cfg.out_channels, h, w)
        return x
