"""T5 encoder — TPU-native reimplementation (SD3's third text tower).

Matches `transformers.T5EncoderModel` for v1.1-style checkpoints (gated-gelu
FF, no biases, RMSNorm, unscaled attention with shared relative position
bias) — google/t5-v1_1-xxl is what SD3 ships (`train_pcm_lora_sd3.py`
text_encoder_3). Parity-tested against transformers in `tests/test_t5.py`.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6


T5_XXL_CONFIG = T5Config()
TINY_T5_CONFIG = T5Config(
    vocab_size=1000, d_model=64, d_kv=16, d_ff=128, num_layers=2, num_heads=4
)


class RMSNorm(nn.Module):
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        return (x.astype(jnp.float32) * jax.lax.rsqrt(var + self.eps)).astype(self.dtype) * w.astype(self.dtype)


def relative_position_bucket(relative_position, num_buckets=32, max_distance=128):
    """T5 bidirectional bucketing (memory_pos - query_pos)."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class T5Block(nn.Module):
    cfg: T5Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, position_bias):
        cfg = self.cfg
        inner = cfg.num_heads * cfg.d_kv
        h = RMSNorm(cfg.layer_norm_epsilon, self.dtype, name="attn_layer_norm")(x)
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="q")(h)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="k")(h)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="v")(h)
        b, s, _ = q.shape
        q = q.reshape(b, s, cfg.num_heads, cfg.d_kv)
        k = k.reshape(b, s, cfg.num_heads, cfg.d_kv)
        v = v.reshape(b, s, cfg.num_heads, cfg.d_kv)
        # T5 attention is unscaled and biased; small text seq -> XLA path
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        logits = logits + position_bias
        p = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, s, inner)
        x = x + nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype, name="o")(o)

        h = RMSNorm(cfg.layer_norm_epsilon, self.dtype, name="ff_layer_norm")(x)
        hg = nn.gelu(
            nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype, name="wi_0")(h),
            approximate=True,
        )
        hl = nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype, name="wi_1")(h)
        x = x + nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype, name="wo")(hg * hl)
        return x


class T5Encoder(nn.Module):
    cfg: T5Config = T5_XXL_CONFIG
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        emb = self.param(
            "token_embedding", nn.initializers.normal(1.0), (cfg.vocab_size, cfg.d_model)
        )
        x = emb[input_ids].astype(self.dtype)

        s = input_ids.shape[1]
        pos = jnp.arange(s)
        rel = pos[None, :] - pos[:, None]  # memory - query
        buckets = relative_position_bucket(
            rel, cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance
        )
        bias_table = self.param(
            "relative_attention_bias",
            nn.initializers.normal(1.0),
            (cfg.relative_attention_num_buckets, cfg.num_heads),
        )
        position_bias = jnp.transpose(bias_table[buckets], (2, 0, 1))[None]  # (1,H,S,S)
        position_bias = position_bias.astype(jnp.float32)

        for i in range(cfg.num_layers):
            x = T5Block(cfg, dtype=self.dtype, name=f"block_{i}")(x, position_bias)
        return RMSNorm(cfg.layer_norm_epsilon, self.dtype, name="final_layer_norm")(x)


def convert_t5_torch_state(state_dict, cfg: T5Config):
    """transformers T5EncoderModel state_dict -> flax params."""

    def g(key):
        t = state_dict[key]
        return jnp.asarray(np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t))

    params = {
        "token_embedding": g("shared.weight"),
        "relative_attention_bias": g(
            "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
        ),
        "final_layer_norm": {"weight": g("encoder.final_layer_norm.weight")},
    }
    for i in range(cfg.num_layers):
        bp = f"encoder.block.{i}.layer."
        params[f"block_{i}"] = {
            "attn_layer_norm": {"weight": g(bp + "0.layer_norm.weight")},
            "q": {"kernel": g(bp + "0.SelfAttention.q.weight").T},
            "k": {"kernel": g(bp + "0.SelfAttention.k.weight").T},
            "v": {"kernel": g(bp + "0.SelfAttention.v.weight").T},
            "o": {"kernel": g(bp + "0.SelfAttention.o.weight").T},
            "ff_layer_norm": {"weight": g(bp + "1.layer_norm.weight")},
            "wi_0": {"kernel": g(bp + "1.DenseReluDense.wi_0.weight").T},
            "wi_1": {"kernel": g(bp + "1.DenseReluDense.wi_1.weight").T},
            "wo": {"kernel": g(bp + "1.DenseReluDense.wo.weight").T},
        }
    return params
