"""Backbone numerical parity vs independent torch oracles (fp32, CPU).

Round-1 VERDICT item #2: the reference's UNet/VAE/MMDiT correctness comes
from diffusers (`train_pcm_lora_sd15.py:820-852`); ours is re-implemented, so
we prove forward parity here. `tests/torch_oracles.py` re-implements the
diffusers architectures in plain torch with diffusers state_dict naming;
weights flow through the real converter (`pcm_tpu/models/convert.py`) — the
same path released teacher checkpoints take — and forwards must agree.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

import torch_oracles as oracle
from pcm_tpu.models import convert
from pcm_tpu.models.attention import Transformer2D
from pcm_tpu.models.mmdit import MMDiT, MMDiTConfig
from pcm_tpu.models.resnet import ResnetBlock2D
from pcm_tpu.models.unet import UNet2DCondition, UNetConfig
from pcm_tpu.models.vae import AutoencoderKL, VAEConfig


def _t2n(x):
    return x.detach().numpy()


def _nhwc(x):
    return jnp.asarray(_t2n(x).transpose(0, 2, 3, 1))


def _assert_close(ours, theirs, tol, what):
    ours = np.asarray(ours, np.float32)
    theirs = np.asarray(theirs, np.float32)
    scale = max(float(np.abs(theirs).max()), 1e-6)
    diff = float(np.abs(ours - theirs).max()) / scale
    assert diff < tol, f"{what}: rel-max diff {diff:.2e} (tol {tol:.1e})"


def _prefixed(module, prefix="m"):
    return {f"{prefix}.{k}": v for k, v in module.state_dict().items()}


@torch.no_grad()
def test_resnet_block_parity():
    torch.manual_seed(0)
    blk = oracle.ResnetBlock2D(32, 64, temb_ch=48, groups=8).eval()
    x = torch.randn(2, 32, 8, 8)
    temb = torch.randn(2, 48)
    ref = blk(x, temb)

    params = convert._resnet(_prefixed(blk), "m")
    ours = ResnetBlock2D(out_channels=64, norm_groups=8).apply(
        {"params": params}, _nhwc(x), jnp.asarray(_t2n(temb))
    )
    _assert_close(ours.transpose(0, 3, 1, 2), ref, 2e-4, "ResnetBlock2D")


@torch.no_grad()
@pytest.mark.parametrize("linear_proj,depth", [(False, 1), (True, 2)])
def test_transformer2d_parity(linear_proj, depth):
    torch.manual_seed(1)
    heads, head_dim, ch, cross = 2, 16, 32, 48
    blk = oracle.Transformer2DModel(ch, heads, head_dim, depth, cross,
                                    linear_proj, groups=8).eval()
    x = torch.randn(2, ch, 8, 8)
    ctx = torch.randn(2, 7, cross)
    ref = blk(x, ctx)

    params = convert._transformer2d(_prefixed(blk), "m", depth, linear_proj)
    ours = Transformer2D(
        channels=ch, heads=heads, head_dim=head_dim, depth=depth,
        cross_attention_dim=cross, use_linear_projection=linear_proj, norm_groups=8,
    ).apply({"params": params}, _nhwc(x), jnp.asarray(_t2n(ctx)))
    _assert_close(ours.transpose(0, 3, 1, 2), ref, 2e-4,
                  f"Transformer2D(linear={linear_proj})")


PARITY_UNET_SD15 = UNetConfig(
    block_out_channels=(32, 64),
    attn_blocks=(True, False),
    num_heads=(2, 2),
    transformer_depth=(1, 1),
    layers_per_block=2,
    cross_attention_dim=48,
    norm_groups=8,
)

PARITY_UNET_SDXL = UNetConfig(
    block_out_channels=(32, 64),
    attn_blocks=(False, True),
    num_heads=(2, 4),
    transformer_depth=(1, 2),
    layers_per_block=2,
    cross_attention_dim=48,
    use_linear_projection=True,
    norm_groups=8,
    addition_embed_dim=32,
    addition_in_dim=32 + 6 * 32,
)


@torch.no_grad()
@pytest.mark.parametrize("cfg", [PARITY_UNET_SD15, PARITY_UNET_SDXL],
                         ids=["sd15-like", "sdxl-like"])
def test_unet_full_parity(cfg):
    torch.manual_seed(2)
    net = oracle.UNet2DConditionModel(cfg).eval()
    x = torch.randn(2, cfg.in_channels, 16, 16)
    t = torch.tensor([3.0, 777.0])
    ctx = torch.randn(2, 7, cfg.cross_attention_dim)
    added = None
    kw = {}
    if cfg.addition_in_dim is not None:
        text_embeds = torch.randn(2, 32)
        time_ids = torch.tensor([[16.0, 16, 0, 0, 16, 16]] * 2)
        kw = {"text_embeds": text_embeds, "time_ids": time_ids}
        added = {"text_embeds": jnp.asarray(_t2n(text_embeds)),
                 "time_ids": jnp.asarray(_t2n(time_ids))}
    ref = net(x, t, ctx, **kw)

    params = convert.convert_unet_torch_state(net.state_dict(), cfg)
    ours = UNet2DCondition(cfg=cfg).apply(
        {"params": params}, _nhwc(x), jnp.asarray(_t2n(t)),
        jnp.asarray(_t2n(ctx)), added_cond=added,
    )
    _assert_close(ours.transpose(0, 3, 1, 2), ref, 5e-4, "UNet2DCondition")


@torch.no_grad()
def test_vae_full_parity():
    torch.manual_seed(3)
    cfg = VAEConfig(block_out_channels=(32, 64), layers_per_block=1, norm_groups=8)
    vae = oracle.AutoencoderKL(cfg).eval()
    x = torch.randn(2, 3, 16, 16)
    mean_ref, logvar_ref = vae.encode_moments(x)
    z = torch.randn(2, cfg.latent_channels, 8, 8)
    dec_ref = vae.decode(z)

    params = convert.convert_vae_torch_state(vae.state_dict(), cfg)
    ours = AutoencoderKL(cfg=cfg)
    mean, logvar = ours.apply({"params": params}, _nhwc(x), method="encode_moments")
    _assert_close(mean.transpose(0, 3, 1, 2), mean_ref, 5e-4, "VAE encode mean")
    _assert_close(logvar.transpose(0, 3, 1, 2), logvar_ref, 5e-4, "VAE encode logvar")

    # decode() on the flax side also applies the (shift, scale) latent
    # normalization — feed it the normalized z so both sides see the same
    # post_quant input
    z_j = _nhwc(z)
    dec = ours.apply(
        {"params": params},
        (z_j - cfg.shift_factor) * cfg.scaling_factor,
        method="decode",
    )
    _assert_close(dec.transpose(0, 3, 1, 2), dec_ref, 5e-4, "VAE decode")


@torch.no_grad()
def test_mmdit_full_parity():
    torch.manual_seed(4)
    cfg = MMDiTConfig(
        in_channels=4, out_channels=4, num_layers=3, num_heads=2, head_dim=16,
        joint_attention_dim=48, pooled_projection_dim=40, pos_embed_max_size=16,
    )
    net = oracle.SD3Transformer2DModel(cfg).eval()
    # give the pos-embed buffer real values (it initializes to zero)
    net.pos_embed.pos_embed.normal_(0.0, 0.02)
    x = torch.randn(2, cfg.in_channels, 16, 16)
    t = torch.tensor([250.0, 999.0])
    ctx = torch.randn(2, 11, cfg.joint_attention_dim)
    pooled = torch.randn(2, cfg.pooled_projection_dim)
    ref = net(x, t, ctx, pooled)

    params = convert.convert_mmdit_torch_state(net.state_dict(), cfg)
    ours = MMDiT(cfg=cfg).apply(
        {"params": params}, _nhwc(x), jnp.asarray(_t2n(t)),
        jnp.asarray(_t2n(ctx)), jnp.asarray(_t2n(pooled)),
    )
    _assert_close(ours.transpose(0, 3, 1, 2), ref, 5e-4, "MMDiT")
