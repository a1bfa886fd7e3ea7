"""Converter round-trip tests: our init params -> synthetic diffusers-format
state dict (inverse naming/transposes) -> converter -> must exactly equal the
original tree, for tiny UNet/VAE/MMDiT configs.

This validates key coverage and transpose conventions; true numerical parity
for CLIP/T5 is covered against transformers in test_clip.py/test_t5.py.
"""

import re

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from pcm_tpu.models.convert import (
    convert_mmdit_torch_state,
    convert_unet_torch_state,
    convert_vae_torch_state,
)
from pcm_tpu.models.mmdit import MMDiT, TINY_MMDIT_CONFIG
from pcm_tpu.models.unet import TINY_SDXL_CONFIG, TINY_UNET_CONFIG, UNet2DCondition
from pcm_tpu.models.vae import TINY_VAE_CONFIG, AutoencoderKL


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


_TOP_RE = re.compile(
    r"^(down_blocks|up_blocks)_(\d+)_(resnets|attentions|downsamplers|upsamplers)_(\d+)$"
)


def _diffusers_name(path):
    """Our param path tuple -> diffusers dotted module name + leaf kind."""
    parts = []
    for seg in path[:-1]:
        m = _TOP_RE.match(seg)
        if m:
            parts.append(f"{m.group(1)}.{m.group(2)}.{m.group(3)}.{m.group(4)}")
        elif seg.startswith("mid_block_"):
            rest = seg[len("mid_block_"):]
            kind, idx = rest.rsplit("_", 1)
            parts.append(f"mid_block.{kind}.{idx}")
        elif seg.startswith("mid_") and seg.count("_") >= 2:  # VAE mid_resnets_0
            rest = seg[len("mid_"):]
            kind, idx = rest.rsplit("_", 1)
            parts.append(f"mid_block.{kind}.{idx}")
        elif seg.startswith("transformer_blocks_"):
            parts.append("transformer_blocks." + seg.rsplit("_", 1)[1])
        elif seg.startswith("down_blocks_") and seg.endswith("_downsamplers_0_conv"):
            m2 = re.match(r"down_blocks_(\d+)_downsamplers_0_conv", seg)
            parts.append(f"down_blocks.{m2.group(1)}.downsamplers.0.conv")
        elif seg.startswith("up_blocks_") and seg.endswith("_upsamplers_0_conv"):
            m2 = re.match(r"up_blocks_(\d+)_upsamplers_0_conv", seg)
            parts.append(f"up_blocks.{m2.group(1)}.upsamplers.0.conv")
        elif seg == "net_0_proj":
            parts.append("net.0.proj")
        elif seg == "net_2":
            parts.append("net.2")
        elif seg == "to_out_0":
            parts.append("to_out.0")
        else:
            parts.append(seg)
    return ".".join(parts), path[-1]


def _to_sd(flat, attn_under=None, prefix="", mmdit=False):
    """Build the synthetic diffusers state dict from our flattened params."""
    sd = {}
    for path, v in flat.items():
        name, leaf = _diffusers_name(path)
        v = np.asarray(v)
        if mmdit:
            # attention projections live under ".attn." in diffusers SD3
            name = re.sub(
                r"(transformer_blocks\.\d+)\.(to_q|to_k|to_v|add_q_proj|add_k_proj|add_v_proj|to_out\.0|to_add_out)",
                r"\1.attn.\2",
                name,
            )
            name = re.sub(r"^(timestep_embedder|text_embedder)", r"time_text_embed.\1", name)
        if leaf == "kernel":
            if v.ndim == 2:
                sd[prefix + name + ".weight"] = v.T
            else:  # (kh, kw, in, out) -> (out, in, kh, kw)
                sd[prefix + name + ".weight"] = v.transpose(3, 2, 0, 1)
        elif leaf == "bias":
            sd[prefix + name + ".bias"] = v
        elif leaf == "scale":
            sd[prefix + name + ".weight"] = v
        elif leaf == "pos_embed":
            sd[prefix + name + ".pos_embed"] = v.reshape(1, -1, v.shape[-1])
        else:
            raise AssertionError((path, leaf))
    return sd


def _assert_trees_equal(a, b):
    fa, fb = _flatten(a), _flatten(b)
    assert set(fa) == set(fb), (set(fa) ^ set(fb))
    for k in fa:
        np.testing.assert_array_equal(np.asarray(fa[k]), np.asarray(fb[k]), err_msg=str(k))


@pytest.mark.slow  # quick-tier budget: see docs/PERF.md 'Test suite budget'
def test_unet_converter_roundtrip():
    for cfg in (TINY_UNET_CONFIG, TINY_SDXL_CONFIG):
        m = UNet2DCondition(cfg)
        x = jnp.zeros((1, 8, 8, 4))
        added = (
            None
            if cfg.addition_in_dim is None
            else {"text_embeds": jnp.zeros((1, 32)), "time_ids": jnp.zeros((1, 6))}
        )
        params = m.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)), jnp.zeros((1, 5, 32)), added)[
            "params"
        ]
        sd = _to_sd(_flatten(params))
        back = convert_unet_torch_state(sd, cfg)
        _assert_trees_equal(params, back)


@pytest.mark.slow  # quick-tier budget: see docs/PERF.md 'Test suite budget'
def test_vae_converter_roundtrip():
    m = AutoencoderKL(TINY_VAE_CONFIG)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
    flat = _flatten(params)
    # encoder./decoder. prefixes; quant convs at root
    sd = {}
    for scope in ("encoder", "decoder"):
        sub = {p[1:]: v for p, v in flat.items() if p[0] == scope}
        sd.update(_to_sd(sub, prefix=scope + "."))
    for qc in ("quant_conv", "post_quant_conv"):
        sub = {p[1:]: v for p, v in flat.items() if p[0] == qc}
        if sub:
            sd.update(_to_sd({(qc,) + p: v for p, v in sub.items()}))
    back = convert_vae_torch_state(sd, TINY_VAE_CONFIG)
    _assert_trees_equal(params, back)


def test_mmdit_converter_roundtrip():
    m = MMDiT(TINY_MMDIT_CONFIG)
    params = m.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 8, 8, 4)),
        jnp.zeros((1,)),
        jnp.zeros((1, 5, 32)),
        jnp.zeros((1, 32)),
    )["params"]
    sd = _to_sd(_flatten(params), mmdit=True)
    back = convert_mmdit_torch_state(sd, TINY_MMDIT_CONFIG)
    _assert_trees_equal(params, back)
