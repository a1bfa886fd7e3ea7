"""GroupNorm module wrapper over the fused Pallas kernel."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops import group_norm_silu


class GroupNorm(nn.Module):
    """Channels-last GroupNorm with optional fused SiLU epilogue.

    Param names (`scale`, `bias`) match `flax.linen.GroupNorm` so converted
    checkpoints are interchangeable.
    """

    num_groups: int = 32
    epsilon: float = 1e-5
    act: Optional[str] = None  # None | "silu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        y = group_norm_silu(x, scale, bias, self.num_groups, self.epsilon, self.act)
        return y.astype(self.dtype)
