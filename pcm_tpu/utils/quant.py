"""Weight-only int8 storage for frozen model weights.

The frozen teacher/VAE/text-encoder weights dominate HBM in the distillation
step (SDXL UNet alone is ~5.1 GB bf16 on a 15.75 GB v5e). Storing them as
symmetric per-output-channel int8 + fp32 scales halves their footprint, which
buys back enough HBM to drop gradient checkpointing (`remat="none"`) on the
1024px step — trading a cheap dequant-multiply per layer for the full remat
recompute. This replaces nothing in the reference (it keeps fp16 weights on
80 GB A800s, `train_pcm_lora_sd15.py:846-852` weight_dtype casts); it is the
TPU-native answer to the 5x smaller HBM budget.

`QTensor` is a pytree that duck-types the small array surface our layers
touch (``.shape``/``.ndim``/``.dtype``/``.astype``/``__jax_array__``), so the
flax modules — both the custom `LoRADense`/`LoRAConv` (which call
``kernel.astype(dtype)``) and stock `nn.Dense` (which goes through
``promote_dtype``/``jnp.asarray``) — consume quantized kernels unchanged.
Dequantization happens at the use site inside the jitted graph, so XLA keeps
the int8 buffer resident in HBM and the bf16 dequant is a transient per-layer
temporary.

Accuracy: per-channel symmetric int8 on conv/matmul kernels is the standard
near-lossless weight-only scheme; biases, norms, and embeddings stay in
bf16/fp32 (see ``default_predicate``).
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class QTensor:
    """Symmetric per-channel int8 weight: ``w ≈ values * scale``.

    ``scale`` broadcasts against ``values`` (kept with singleton dims so the
    dequant is a fused elementwise multiply). ``logical_dtype`` is what the
    layer would have seen (pytree-static).
    """

    values: jnp.ndarray  # int8, original kernel shape
    scale: jnp.ndarray  # f32, broadcastable to values.shape
    logical_dtype: jnp.dtype = flax.struct.field(pytree_node=False, default=jnp.bfloat16)

    @property
    def shape(self):
        return self.values.shape

    @property
    def ndim(self):
        return self.values.ndim

    @property
    def size(self):
        return self.values.size

    @property
    def dtype(self):
        return self.logical_dtype

    def astype(self, dtype):
        # dequantize in f32 then cast once: int8->f32 and the per-channel
        # multiply are exact in f32, the only rounding is the final cast
        return (self.values.astype(jnp.float32) * self.scale).astype(dtype)

    def __jax_array__(self):
        return self.astype(self.logical_dtype)


def quantize(w: jnp.ndarray, axis: int = -1, logical_dtype=jnp.bfloat16) -> QTensor:
    """Per-channel symmetric int8 quantization along ``axis`` (the output-
    feature axis: -1 for both dense ``(in, out)`` and conv ``(H, W, I, O)``
    kernels)."""
    w32 = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=tuple(i for i in range(w32.ndim) if i != axis % w32.ndim), keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return QTensor(values=q, scale=scale, logical_dtype=jnp.dtype(logical_dtype))


def default_predicate(path: tuple, leaf, min_size: int = 65536) -> bool:
    """Quantize matmul/conv kernels only: leaves named ``kernel`` with
    ndim 2 or 4 and ≥``min_size`` elements. Biases, norm scales, embeddings,
    and tiny projections stay full precision."""
    if isinstance(leaf, QTensor) or not hasattr(leaf, "ndim"):
        return False
    name = str(path[-1].key if hasattr(path[-1], "key") else path[-1]) if path else ""
    return name == "kernel" and leaf.ndim in (2, 4) and leaf.size >= min_size


def quantize_tree(
    tree,
    predicate: Optional[Callable] = None,
    logical_dtype=jnp.bfloat16,
    min_size: int = 65536,
):
    """Map a frozen param tree to one with large kernels stored as QTensor.

    ``predicate(path, leaf) -> bool`` selects leaves (default:
    `default_predicate` at ``min_size``). The result drops into any
    ``model.apply`` / bundle call that accepted the original tree.
    """
    pred = predicate or (lambda p, l: default_predicate(p, l, min_size))

    def visit(path, leaf):
        if pred(path, leaf):
            return quantize(leaf, logical_dtype=logical_dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(visit, tree)


def quantize_frozen(frozen: dict, skip: tuple = ("vae",), **kw) -> dict:
    """Quantize a bundle's frozen dict ({"unet"/"mmdit", "vae", "text", ...})
    leaving ``skip``'d sub-trees (default: the VAE — quality-sensitive and
    only ~84M params) at full precision."""
    return {
        k: (v if k in skip else quantize_tree(v, **kw)) for k, v in frozen.items()
    }


def quantized_bytes_saved(tree) -> int:
    """Bytes of HBM saved vs bf16 storage (diagnostic)."""
    saved = 0
    for leaf in jax.tree.leaves(tree, is_leaf=lambda x: isinstance(x, QTensor)):
        if isinstance(leaf, QTensor):
            saved += leaf.values.size - leaf.scale.size * 4  # 2B->1B per elt, plus scales
    return saved
