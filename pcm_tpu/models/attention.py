"""Transformer building blocks for the UNet backbones.

Structure mirrors the diffusers `BasicTransformerBlock`/`Transformer2DModel`
the reference relies on (SURVEY.md §2 L0) so HF weights port 1:1, but the
compute path is TPU-native: Pallas flash attention (`ops/flash_attention.py`)
and, when the feed-forward carries no LoRA, the fused GEGLU matmul kernel.

Module names intentionally match diffusers state_dict segments
(`to_q`/`to_k`/`to_v`/`to_out_0`, `ff/net_0_proj`, `ff/net_2`, ...) to keep
the weight converter and kohya-LoRA interop trivial.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..lora.layers import LoRADense, LoRASpec, NO_LORA
from ..ops import flash_attention, geglu


class Attention(nn.Module):
    """Multi-head attention (self or cross) with Pallas flash attention."""

    query_dim: int
    heads: int
    head_dim: int
    cross_attention_dim: Optional[int] = None
    out_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    lora: LoRASpec = NO_LORA

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        inner = self.heads * self.head_dim
        ctx = x if context is None else context
        q = LoRADense(inner, use_bias=False, dtype=self.dtype, lora=self.lora, name="to_q")(x)
        k = LoRADense(inner, use_bias=False, dtype=self.dtype, lora=self.lora, name="to_k")(ctx)
        v = LoRADense(inner, use_bias=False, dtype=self.dtype, lora=self.lora, name="to_v")(ctx)

        b, sq, _ = q.shape
        sk = k.shape[1]
        q = q.reshape(b, sq, self.heads, self.head_dim)
        k = k.reshape(b, sk, self.heads, self.head_dim)
        v = v.reshape(b, sk, self.heads, self.head_dim)
        o = flash_attention(q, k, v)
        o = o.reshape(b, sq, inner)
        return LoRADense(
            self.query_dim, use_bias=self.out_bias, dtype=self.dtype, lora=self.lora, name="to_out_0"
        )(o)


class FeedForward(nn.Module):
    """GEGLU feed-forward (dim -> mult*dim -> dim).

    Without LoRA the in-projection+gate runs through the fused Pallas GEGLU
    kernel; with LoRA it falls back to the two-skinny-matmul form so backward
    stays rank-r.
    """

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32
    lora: LoRASpec = NO_LORA

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inner = self.dim * self.mult
        # Detect whether this FF's in-projection actually carries LoRA: the
        # fused kernel can only consume a plain base weight.
        scope_path = tuple(self.scope.path) if self.scope is not None else ()
        lora_here = self.lora.matches(scope_path + ("net_0_proj",))
        if lora_here:
            h = LoRADense(inner * 2, dtype=self.dtype, lora=self.lora, name="net_0_proj")(x)
            a, gate = jnp.split(h, 2, axis=-1)
            h = a * nn.gelu(gate, approximate=False)
        else:
            h = _FusedGEGLU(inner * 2, dtype=self.dtype, name="net_0_proj")(x)
        return LoRADense(self.dim, dtype=self.dtype, lora=self.lora, name="net_2")(h)


class _FusedGEGLU(nn.Module):
    """Parameter-compatible stand-in for the GEGLU in-projection that routes
    through the fused Pallas kernel (same param names as LoRADense)."""

    features: int  # == 2 * inner
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_features, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        dtype = self.dtype or x.dtype
        return geglu(x.astype(dtype), kernel.astype(dtype), bias.astype(dtype))


class BasicTransformerBlock(nn.Module):
    """LayerNorm -> self-attn -> LayerNorm -> cross-attn -> LayerNorm -> FF."""

    dim: int
    heads: int
    head_dim: int
    cross_attention_dim: int
    dtype: jnp.dtype = jnp.float32
    lora: LoRASpec = NO_LORA

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x + Attention(
            self.dim, self.heads, self.head_dim, dtype=self.dtype, lora=self.lora, name="attn1"
        )(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        x = x + Attention(
            self.dim,
            self.heads,
            self.head_dim,
            cross_attention_dim=self.cross_attention_dim,
            dtype=self.dtype,
            lora=self.lora,
            name="attn2",
        )(h, context)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        x = x + FeedForward(self.dim, dtype=self.dtype, lora=self.lora, name="ff")(h)
        return x


class _ScanBlockBody(nn.Module):
    """nn.scan body for Transformer2D's block stack: carry = hidden states,
    broadcast = context. One traced BasicTransformerBlock regardless of depth
    (params stacked on a leading axis by nn.scan's variable_axes)."""

    dim: int
    heads: int
    head_dim: int
    cross_attention_dim: int
    dtype: jnp.dtype = jnp.float32
    lora: LoRASpec = NO_LORA
    remat: bool = False
    remat_policy: Optional[str] = None

    @nn.compact
    def __call__(self, hidden: jnp.ndarray, context: jnp.ndarray):
        Block = BasicTransformerBlock
        if self.remat:
            from ..ops.common import resolve_remat_policy

            kw = (
                {"policy": resolve_remat_policy(self.remat_policy)}
                if self.remat_policy
                else {}
            )
            Block = nn.remat(BasicTransformerBlock, **kw)
        hidden = Block(
            self.dim,
            self.heads,
            self.head_dim,
            self.cross_attention_dim,
            dtype=self.dtype,
            lora=self.lora,
            name="block",
        )(hidden, context)
        return hidden, None


class Transformer2D(nn.Module):
    """Spatial transformer wrapping N BasicTransformerBlocks.

    ``use_linear_projection`` selects the SD1.5 (1x1 conv) vs SDXL (linear)
    in/out projection variant, matching diffusers.
    """

    channels: int
    heads: int
    head_dim: int
    depth: int
    cross_attention_dim: int
    use_linear_projection: bool = False
    norm_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    lora: LoRASpec = NO_LORA
    # checkpoint each BasicTransformerBlock instead of (the caller wrapping)
    # this whole module: a module-level checkpoint over a depth-10 SDXL stack
    # materializes every block's recomputed intermediates at once in the
    # backward (~10 x 160M GEGLU temps at bs8 — the measured bs8 OOM), while
    # block-level regions bound the peak to one block + a 20M boundary input
    # per block, for identical recompute FLOPs.
    remat_blocks: bool = False
    remat_policy: Optional[str] = None  # ops/common.py:resolve_remat_policy
    # lax.scan over the depth-d block stack instead of a Python loop: the
    # traced program carries ONE block body (the SDXL-1024 full step's ~14 MB
    # MLIR — ~70 unrolled blocks x 3-4 forwards — SIGKILLs the axon compile
    # helper; scan cuts both MLIR size and compile time several-fold). Params
    # gain a leading (depth,) axis under `blocks_scan/block/...` — a DIFFERENT
    # layout from the unrolled `transformer_blocks_{i}/...` (converter/kohya
    # interop stays on the unrolled layout; scan is the perf-graph option).
    # The scan carry boundary doubles as the block-granular remat boundary.
    scan_blocks: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        # x: (N, H, W, C)
        from .normalization import GroupNorm

        n, h, w, c = x.shape
        residual = x
        hidden = GroupNorm(
            self.norm_groups, epsilon=1e-6, act=None, dtype=self.dtype, name="norm"
        )(x)

        inner = self.heads * self.head_dim
        if self.use_linear_projection:
            hidden = hidden.reshape(n, h * w, c)
            hidden = LoRADense(inner, dtype=self.dtype, lora=self.lora, name="proj_in")(hidden)
        else:
            from ..lora.layers import LoRAConv

            hidden = LoRAConv(
                inner, kernel_size=(1, 1), padding="VALID", dtype=self.dtype,
                lora=self.lora, name="proj_in",
            )(hidden)
            hidden = hidden.reshape(n, h * w, inner)

        Block = BasicTransformerBlock
        if self.remat_blocks:
            from ..ops.common import resolve_remat_policy

            kw = (
                {"policy": resolve_remat_policy(self.remat_policy)}
                if self.remat_policy
                else {}
            )
            Block = nn.remat(BasicTransformerBlock, **kw)
        if self.scan_blocks and self.depth > 1:
            Scanned = nn.scan(
                _ScanBlockBody,
                variable_axes={"params": 0, "lora": 0},
                split_rngs={"params": True},
                in_axes=nn.broadcast,  # context
                length=self.depth,
            )
            hidden, _ = Scanned(
                inner,
                self.heads,
                self.head_dim,
                self.cross_attention_dim,
                dtype=self.dtype,
                lora=self.lora,
                remat=self.remat_blocks,
                remat_policy=self.remat_policy,
                name="blocks_scan",
            )(hidden, context)
        else:
            for i in range(self.depth):
                hidden = Block(
                    inner,
                    self.heads,
                    self.head_dim,
                    self.cross_attention_dim,
                    dtype=self.dtype,
                    lora=self.lora,
                    name=f"transformer_blocks_{i}",
                )(hidden, context)

        if self.use_linear_projection:
            hidden = LoRADense(c, dtype=self.dtype, lora=self.lora, name="proj_out")(hidden)
            hidden = hidden.reshape(n, h, w, c)
        else:
            from ..lora.layers import LoRAConv

            hidden = hidden.reshape(n, h, w, inner)
            hidden = LoRAConv(
                c, kernel_size=(1, 1), padding="VALID", dtype=self.dtype,
                lora=self.lora, name="proj_out",
            )(hidden)
        return hidden + residual
