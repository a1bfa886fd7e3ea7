"""SD3 LoRA target-list fidelity (VERDICT round-1 item #5).

The reference's three SD3 trainers use three different peft target lists:
  * base  (`train_pcm_lora_sd3.py:978-988`): attn qkv/out + ff.net.* +
    proj_out (model-level), NOT ff_context;
  * adv   (`train_pcm_lora_sd3_adv.py:996-1015`): + add_* projections,
    ff_context, AdaLN linears, embedders, pos_embed.proj;
  * adv_stochastic (`train_pcm_lora_sd3_adv_stochastic.py:986-1008`): the adv
    list without pos_embed.proj.
These tests resolve each list against a tiny MMDiT and assert exactly which
modules got LoRA factors.
"""

import jax
import jax.numpy as jnp

from pcm_tpu.lora.layers import LoRASpec
from pcm_tpu.models.mmdit import (
    MMDiT,
    SD3_ADV_LORA_TARGETS,
    SD3_ADV_STOCHASTIC_LORA_TARGETS,
    SD3_LORA_TARGETS,
    TINY_MMDIT_CONFIG,
)


def _lora_paths(targets):
    model = MMDiT(cfg=TINY_MMDIT_CONFIG, lora=LoRASpec(rank=2, targets=targets))
    cfg = TINY_MMDIT_CONFIG
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 8, 8, cfg.in_channels)),
        jnp.zeros((1,)),
        jnp.zeros((1, 5, cfg.joint_attention_dim)),
        jnp.zeros((1, cfg.pooled_projection_dim)),
    )
    paths = set()
    for path, _ in jax.tree_util.tree_flatten_with_path(variables.get("lora", {}))[0]:
        keys = [getattr(p, "key", None) for p in path]
        paths.add("/".join(k for k in keys if isinstance(k, str) and k not in ("a", "b")))
    return paths


def test_sd3_base_targets():
    paths = _lora_paths(SD3_LORA_TARGETS)
    assert "proj_out" in paths  # model-level final projection IS targeted
    assert "transformer_blocks_0/to_q" in paths
    assert "transformer_blocks_0/ff/net_0_proj" in paths
    assert "transformer_blocks_0/ff/net_2" in paths
    # the base list must NOT reach the context stream / embedders
    assert not any("ff_context" in p for p in paths)
    assert not any("add_q_proj" in p for p in paths)
    assert not any("norm1" in p for p in paths)
    assert not any("pos_embed" in p for p in paths)
    assert not any("context_embedder" in p for p in paths)
    assert not any("norm_out" in p for p in paths)


def test_sd3_adv_targets():
    paths = _lora_paths(SD3_ADV_LORA_TARGETS)
    for want in [
        "pos_embed/proj",
        "context_embedder",
        "transformer_blocks_0/add_q_proj",
        "transformer_blocks_0/to_add_out",
        "transformer_blocks_0/ff_context/net_0_proj",
        "transformer_blocks_0/norm1/linear",
        "transformer_blocks_0/norm1_context/linear",
        "timestep_embedder/linear_1",
        "text_embedder/linear_2",
        "proj_out",
    ]:
        assert want in paths, want
    # norm_out is never a peft target ("norm1.linear" suffix doesn't match it)
    assert not any(p.startswith("norm_out") for p in paths)


def test_sd3_adv_stochastic_targets():
    adv = _lora_paths(SD3_ADV_LORA_TARGETS)
    stoch = _lora_paths(SD3_ADV_STOCHASTIC_LORA_TARGETS)
    assert adv - stoch == {"pos_embed/proj"}
