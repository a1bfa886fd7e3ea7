"""CLIP text encoder — TPU-native reimplementation.

Covers the text-encoding stacks of all three families (SURVEY.md §2 #17):
SD1.5's CLIP-L last-hidden (`train_pcm_lora_sd15.py:739-763`), SDXL's dual
encoders with penultimate hidden + pooled-projected output
(`train_pcm_lora_sdxl_adv.py:770-809`), and SD3's CLIP towers.

Text self-attention is causal over <=77 tokens — tiny next to the image
tokens — so it runs through plain XLA attention with a causal mask rather
than the flash kernel.

`convert_clip_torch_state` ports a HuggingFace `CLIPTextModel(WithProjection)`
state_dict; tested for numerical parity against transformers in
`tests/test_clip.py`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_length: int = 77
    hidden_act: str = "quick_gelu"  # CLIP-L; bigG uses "gelu"
    projection_dim: Optional[int] = None  # set for CLIPTextModelWithProjection


CLIP_L_CONFIG = CLIPTextConfig()  # SD1.5 / SDXL te1 / SD3 te1 (proj added per use)
CLIP_BIG_G_CONFIG = CLIPTextConfig(
    hidden_size=1280,
    num_layers=32,
    num_heads=20,
    intermediate_size=5120,
    hidden_act="gelu",
    projection_dim=1280,
)
TINY_CLIP_CONFIG = CLIPTextConfig(
    vocab_size=1000, hidden_size=64, num_layers=2, num_heads=4,
    intermediate_size=128, projection_dim=64,
)


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name in ("gelu", "gelu_new"):
        return lambda x: nn.gelu(x, approximate=False)
    raise ValueError(name)


class CLIPEncoderLayer(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        d = cfg.hidden_size
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm1")(x)
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(h)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(h)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(h)
        b, s, _ = q.shape
        hd = d // cfg.num_heads
        q = q.reshape(b, s, cfg.num_heads, hd)
        k = k.reshape(b, s, cfg.num_heads, hd)
        v = v.reshape(b, s, cfg.num_heads, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) / np.sqrt(hd)
        logits = jnp.where(mask[None, None], logits, -1e9)
        p = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, s, d)
        x = x + nn.Dense(d, dtype=self.dtype, name="out_proj")(o)

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = _act(cfg.hidden_act)(h)
        x = x + nn.Dense(d, dtype=self.dtype, name="fc2")(h)
        return x


class CLIPTextModel(nn.Module):
    """Returns (all_hidden_states, last_hidden_after_final_ln, pooled).

    ``hidden_states[i]`` is the input of layer i (transformers convention),
    ``hidden_states[-1]`` the raw last layer output (pre final-LN); the
    penultimate entry is what SDXL/SD3 consume for conditioning.
    Pooled output is the final-LN hidden at each sequence's argmax token (the
    end-of-text token has the highest id), projected when ``projection_dim``
    is set.
    """

    cfg: CLIPTextConfig = CLIP_L_CONFIG
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray):
        cfg = self.cfg
        b, s = input_ids.shape
        tok = self.param(
            "token_embedding", nn.initializers.normal(0.02), (cfg.vocab_size, cfg.hidden_size)
        )
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02), (cfg.max_length, cfg.hidden_size)
        )
        x = tok[input_ids].astype(self.dtype) + pos[None, :s].astype(self.dtype)

        mask = jnp.tril(jnp.ones((s, s), bool))
        hidden_states = []
        for i in range(cfg.num_layers):
            hidden_states.append(x)
            x = CLIPEncoderLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(x, mask)
        hidden_states.append(x)

        last = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_layer_norm")(x)
        eot = jnp.argmax(input_ids, axis=-1)
        pooled = last[jnp.arange(b), eot]
        if cfg.projection_dim is not None:
            pooled = nn.Dense(
                cfg.projection_dim, use_bias=False, dtype=self.dtype, name="text_projection"
            )(pooled)
        return hidden_states, last, pooled


def convert_clip_torch_state(state_dict, cfg: CLIPTextConfig):
    """HF CLIPTextModel(WithProjection) torch state_dict -> flax params."""

    def g(key):
        t = state_dict[key]
        return jnp.asarray(np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t))

    prefix = "text_model."
    params = {
        "token_embedding": g(prefix + "embeddings.token_embedding.weight"),
        "position_embedding": g(prefix + "embeddings.position_embedding.weight"),
        "final_layer_norm": {
            "scale": g(prefix + "final_layer_norm.weight"),
            "bias": g(prefix + "final_layer_norm.bias"),
        },
    }
    for i in range(cfg.num_layers):
        lp = f"{prefix}encoder.layers.{i}."
        layer = {}
        for ours, theirs in [
            ("layer_norm1", "layer_norm1"),
            ("layer_norm2", "layer_norm2"),
        ]:
            layer[ours] = {"scale": g(lp + theirs + ".weight"), "bias": g(lp + theirs + ".bias")}
        for ours, theirs in [
            ("q_proj", "self_attn.q_proj"),
            ("k_proj", "self_attn.k_proj"),
            ("v_proj", "self_attn.v_proj"),
            ("out_proj", "self_attn.out_proj"),
            ("fc1", "mlp.fc1"),
            ("fc2", "mlp.fc2"),
        ]:
            layer[ours] = {
                "kernel": g(lp + theirs + ".weight").T,
                "bias": g(lp + theirs + ".bias"),
            }
        params[f"layers_{i}"] = layer
    if cfg.projection_dim is not None and "text_projection.weight" in state_dict:
        params["text_projection"] = {"kernel": g("text_projection.weight").T}
    return params
