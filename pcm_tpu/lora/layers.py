"""LoRA-aware building-block layers.

The reference trains LoRA adapters via peft wrappers around torch modules
(`train_pcm_lora_sd15.py:866-885`). Here LoRA is a first-class *flax
collection*: every `LoRADense`/`LoRAConv` stores its base kernel in the
``params`` collection and, when its module path matches the active
`LoRASpec` targets, low-rank factors in a separate ``lora`` collection.

  * teacher forward:  ``model.apply({'params': p}, ...)``            (no lora)
  * student forward:  ``model.apply({'params': p, 'lora': l}, ...)``

so the frozen base weights are shared between teacher/student/target with zero
copies, and the optimizer differentiates w.r.t. the ``lora`` tree only.

The student path uses the two-skinny-matmul form ``y = xW + s·(xA)B`` — never
materializing ``W + sBA`` — so backward produces only rank-r gradients instead
of full dense weight gradients.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import lax


@dataclasses.dataclass(frozen=True)
class LoRASpec:
    """Which layers carry LoRA and at what rank.

    ``targets``: substrings matched against the '/'-joined module path
    (mirroring peft's ``target_modules`` name matching). ``rank=0`` disables
    LoRA entirely (teacher-only model instance).
    """

    rank: int = 0
    alpha: Optional[float] = None  # defaults to rank (scale 1.0)
    targets: Tuple[str, ...] = ()

    @property
    def scale(self) -> float:
        return (self.alpha if self.alpha is not None else self.rank) / max(self.rank, 1)

    def matches(self, path: Sequence[str]) -> bool:
        if self.rank <= 0 or not self.targets:
            return False
        name = "/".join(path)
        return any(t in name for t in self.targets)


NO_LORA = LoRASpec()


def _path(module: nn.Module) -> Tuple[str, ...]:
    scope = module.scope
    return tuple(scope.path) if scope is not None else ()


def _base_dot(x, kernel, dtype):
    """Base-weight matmul; routes int8-stored kernels through the int8 MXU
    path when `pcm_tpu.utils.quant.int8_matmul` is active at trace time."""
    from ..utils.quant import QTensor, int8_matmul_enabled, quantized_dot

    if isinstance(kernel, QTensor) and int8_matmul_enabled("dense"):
        return quantized_dot(x, kernel, dtype)
    return jnp.dot(x, kernel.astype(dtype))


def _base_conv(x, kernel, dtype, strides, padding):
    from ..utils.quant import (QTensor, int8_fused_enabled,
                               int8_matmul_enabled, quantized_conv)

    if isinstance(kernel, QTensor) and (
            int8_matmul_enabled("conv") or int8_fused_enabled()):
        # fused mode: quantized_conv lowers pointwise (1x1) convs to the
        # fused Pallas dot and leaves spatial convs on dequant-bf16.
        return quantized_conv(x, kernel, dtype, strides, padding)
    return lax.conv_general_dilated(
        x, kernel.astype(dtype), window_strides=tuple(strides), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class LoRADense(nn.Module):
    """Dense layer with optional LoRA overlay in the ``lora`` collection."""

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    lora: LoRASpec = NO_LORA

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_features, self.features)
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        y = _base_dot(x, kernel, dtype)
        if self.lora.matches(_path(self)):
            r = self.lora.rank
            a = self.variable(
                "lora",
                "a",
                lambda: nn.initializers.normal(stddev=1.0 / r)(
                    self.make_rng("params"), (in_features, r)
                ),
            ).value
            b = self.variable(
                "lora", "b", lambda: jnp.zeros((r, self.features), jnp.float32)
            ).value
            y = y + self.lora.scale * jnp.dot(jnp.dot(x, a.astype(dtype)), b.astype(dtype))
        if bias is not None:
            y = y + bias.astype(dtype)
        return y


class LoRAConv(nn.Module):
    """2D conv (NHWC) with optional LoRA overlay.

    LoRA on convs follows the kohya/peft convention: factor A is a conv with
    the same spatial kernel mapping C_in -> r, factor B is a 1x1 conv
    r -> C_out.
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: object = "SAME"
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    lora: LoRASpec = NO_LORA

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, in_features, self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        dtype = self.dtype or x.dtype
        x = x.astype(dtype)

        def conv(inp, w, strides=(1, 1), padding=self.padding):
            return lax.conv_general_dilated(
                inp,
                w.astype(dtype),
                window_strides=strides,
                padding=padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        y = _base_conv(x, kernel, dtype, self.strides, self.padding)
        if self.lora.matches(_path(self)):
            r = self.lora.rank
            a = self.variable(
                "lora",
                "a",
                lambda: nn.initializers.normal(stddev=1.0 / r)(
                    self.make_rng("params"), (kh, kw, in_features, r)
                ),
            ).value
            b = self.variable(
                "lora", "b", lambda: jnp.zeros((1, 1, r, self.features), jnp.float32)
            ).value
            y = y + self.lora.scale * conv(conv(x, a, self.strides), b, (1, 1), "VALID")
        if bias is not None:
            y = y + bias.astype(dtype)
        return y
