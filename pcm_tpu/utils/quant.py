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

import contextlib
import contextvars
import functools
import os
from typing import Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np


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


def quantize(w: jnp.ndarray, axis: int = -1, logical_dtype=jnp.bfloat16,
             stacked: bool = False) -> QTensor:
    """Per-channel symmetric int8 quantization along ``axis`` (the output-
    feature axis: -1 for both dense ``(in, out)`` and conv ``(H, W, I, O)``
    kernels). ``stacked`` keeps axis 0 unreduced as well — for scan-stacked
    dense kernels ``(depth, in, out)`` each depth slice gets its own
    per-channel scales (so the per-iteration slice inside lax.scan is exactly
    a standalone QTensor of that block's kernel)."""
    w32 = jnp.asarray(w, jnp.float32)
    keep = {axis % w32.ndim} | ({0} if stacked else set())
    amax = jnp.max(jnp.abs(w32),
                   axis=tuple(i for i in range(w32.ndim) if i not in keep),
                   keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return QTensor(values=q, scale=scale, logical_dtype=jnp.dtype(logical_dtype))


def default_predicate(path: tuple, leaf, min_size: int = 65536) -> bool:
    """Quantize matmul/conv kernels only: leaves named ``kernel`` with
    ndim 2 (dense), 3 (scan-stacked dense) or 4 (conv) and ≥``min_size``
    elements. Biases, norm scales, embeddings, and tiny projections stay
    full precision."""
    if isinstance(leaf, QTensor) or not hasattr(leaf, "ndim"):
        return False
    name = str(path[-1].key if hasattr(path[-1], "key") else path[-1]) if path else ""
    return name == "kernel" and leaf.ndim in (2, 3, 4) and leaf.size >= min_size


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
            return quantize(leaf, logical_dtype=logical_dtype,
                            stacked=(leaf.ndim == 3))
        return leaf

    return jax.tree_util.tree_map_with_path(visit, tree)


def quantize_frozen(frozen: dict, skip: tuple = ("vae",), **kw) -> dict:
    """Quantize a bundle's frozen dict ({"unet"/"mmdit", "vae", "text", ...})
    leaving ``skip``'d sub-trees (default: the VAE — quality-sensitive and
    only ~84M params) at full precision."""
    return {
        k: (v if k in skip else quantize_tree(v, **kw)) for k, v in frozen.items()
    }


# ---------------------------------------------------------------------------
# int8 MXU compute path (activation quantization -> int8 x int8 -> int32 dot)
# ---------------------------------------------------------------------------
#
# Weight-only storage already halves HBM traffic; this goes further and runs
# the matmul itself on the MXU's int8 path (2x the bf16 MACs/cycle on v5e).
# Activations are dynamically quantized — per-row (last-axis amax) for dense,
# per-sample for conv (a 3x3 window mixes neighboring pixels, so per-pixel
# scales would be incorrect) — multiplied back by (act_scale * per-channel
# weight scale) in fp32. Backward is the exact bf16 dequantized linear op
# (straight-through through the activation rounding); frozen weights get no
# gradient. Enable via `int8_matmul()` context or PCM_INT8_MATMUL=1.

_INT8_MATMUL = contextvars.ContextVar("pcm_int8_matmul", default=None)


@contextlib.contextmanager
def int8_matmul(enable: bool = True, which: str = "both"):
    """Trace-scoped switch: QTensor-weighted LoRADense/LoRAConv layers compute
    through the int8 MXU path within this context.

    ``which`` narrows the op class: "dense", "conv", "both", or "fused" —
    the per-class split exists to bisect/deploy the paths independently
    (XLA's int8 dense and conv lowerings perform very differently on some
    backends). "fused" = dense ops and pointwise (1x1, stride-1) convs,
    through the Pallas kernel with in-VMEM per-(row, K-tile) activation
    quantization (`ops/int8_matmul.py`); spatial convs stay on the
    dequantized bf16 path."""
    if which not in ("dense", "conv", "both", "fused"):
        raise ValueError(which)
    if enable and which in ("conv", "both"):
        # Known-broken in full train graphs: XLA schedules the unfused
        # activation-quant HBM pass around spatial int8 convs so poorly that
        # the SDXL step regressed 30x (docs/PERF.md "int8 MXU compute";
        # minimal repro: scripts/repro_int8_conv.py). Kept only for
        # bisection/microbenchmarks — production paths are "dense"/"fused".
        import warnings

        warnings.warn(
            f"int8_matmul(which={which!r}) routes SPATIAL convs through the "
            "unfused int8 path — pathological in full train graphs (30x on "
            "SDXL-1024, docs/PERF.md); use 'dense' or 'fused' for real runs",
            stacklevel=3,
        )
    tok = _INT8_MATMUL.set(which if enable else False)
    try:
        yield
    finally:
        _INT8_MATMUL.reset(tok)


def _int8_mode():
    v = _INT8_MATMUL.get()
    if v is None:
        env = os.environ.get("PCM_INT8_MATMUL", "0")
        v = {"1": "both", "0": False}.get(
            env, env if env in ("dense", "conv", "both", "fused") else False)
    return v


def int8_matmul_enabled(kind: str = "dense") -> bool:
    """Is the int8 MXU path active for op class ``kind`` ("dense"/"conv")?"""
    v = _int8_mode()
    if kind == "dense":
        return v in ("both", "dense", "fused")
    return v in ("both", kind)


def int8_fused_enabled() -> bool:
    return _int8_mode() == "fused"


def _quantize_act(x32: jnp.ndarray, axes) -> tuple:
    amax = jnp.max(jnp.abs(x32), axis=axes, keepdims=True)
    s = jnp.where(amax > 0, amax / 127.0, 1.0)
    xq = jnp.clip(jnp.round(x32 / s), -127, 127).astype(jnp.int8)
    return xq, s


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _qdot(x, values, scale, dtype):
    x32 = x.astype(jnp.float32)
    xq, s = _quantize_act(x32, (x.ndim - 1,))
    y = jax.lax.dot_general(
        xq, values,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    # scale is (1, O) -> broadcasts against (..., O); s is (..., 1)
    return (y.astype(jnp.float32) * s * scale.reshape(-1)).astype(dtype)


def _qdot_fwd(x, values, scale, dtype):
    return _qdot(x, values, scale, dtype), (values, scale)


def _qdot_bwd(dtype, res, g):
    values, scale = res
    w = (values.astype(jnp.float32) * scale).astype(dtype)  # (I, O) dequant
    dx = jax.lax.dot_general(
        g.astype(dtype), w,
        dimension_numbers=(((g.ndim - 1,), (1,)), ((), ())),
    )
    return (dx, np.zeros(values.shape, jax.dtypes.float0), jnp.zeros_like(scale))


_qdot.defvjp(_qdot_fwd, _qdot_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _qdot_fused(x, values, scale, dtype):
    from ..ops.int8_matmul import fused_quantized_dot

    return fused_quantized_dot(x, values, scale, out_dtype=dtype)


def _qdot_fused_fwd(x, values, scale, dtype):
    return _qdot_fused(x, values, scale, dtype), (values, scale)


_qdot_fused.defvjp(_qdot_fused_fwd, _qdot_bwd)  # same exact-bf16 backward


def quantized_dot(x: jnp.ndarray, qt: QTensor, dtype) -> jnp.ndarray:
    """``x @ dequant(qt)`` computed as int8 x int8 -> int32 on the MXU.

    Under ``int8_matmul(which="fused")`` the activation quantization is
    fused into the dot inside VMEM (Pallas, `ops/int8_matmul.py`) instead
    of running as a separate XLA HBM pass."""
    if int8_fused_enabled():
        return _qdot_fused(x, qt.values, qt.scale, jnp.dtype(dtype))
    return _qdot(x, qt.values, qt.scale, jnp.dtype(dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _qconv(x, values, scale, dtype, strides, padding):
    x32 = x.astype(jnp.float32)
    xq, s = _quantize_act(x32, (1, 2, 3))  # per-sample (N,1,1,1)
    y = jax.lax.conv_general_dilated(
        xq, values,
        window_strides=strides,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * s * scale.reshape(-1)).astype(dtype)


def _qconv_fwd(x, values, scale, dtype, strides, padding):
    y = _qconv(x, values, scale, dtype, strides, padding)
    return y, (values, scale, x.shape)


def _qconv_bwd(dtype, strides, padding, res, g):
    values, scale, x_shape = res
    w = (values.astype(jnp.float32) * scale).astype(dtype)

    def f(x_):
        return jax.lax.conv_general_dilated(
            x_, w, window_strides=strides, padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    # conv is linear in x: its vjp is exact and value-independent
    _, vjp = jax.vjp(f, jnp.zeros(x_shape, dtype))
    (dx,) = vjp(g.astype(dtype))
    return (dx, np.zeros(values.shape, jax.dtypes.float0), jnp.zeros_like(scale))


_qconv.defvjp(_qconv_fwd, _qconv_bwd)


def _conv_is_pointwise(values_shape, strides, padding) -> bool:
    """True iff the conv is exactly a per-pixel matmul: 1x1 kernel, stride 1,
    and no padding effect (SAME == VALID for 1x1)."""
    if values_shape[0] != 1 or values_shape[1] != 1:
        return False
    if tuple(strides) != (1, 1):
        return False
    if padding in ("SAME", "VALID"):
        return True
    if isinstance(padding, (tuple, list)):
        return all(tuple(p) == (0, 0) for p in padding)
    return False


def quantized_conv(x, qt: QTensor, dtype, strides=(1, 1), padding="SAME"):
    """NHWC conv with int8 x int8 -> int32 MXU compute (per-sample activation
    scale — correct for any spatial kernel size).

    Under ``int8_matmul(which="fused")`` pointwise (1x1, stride-1) convs are
    lowered to the fused Pallas dot (`ops/int8_matmul.py`) — a 1x1 NHWC/HWIO
    conv is exactly ``x.reshape(-1, I) @ w.reshape(I, O)`` — and all other
    convs fall back to the dequantized bf16 conv (the XLA int8 conv lowering
    is pathological in full train graphs; docs/ROUND2_NOTES.md)."""
    if isinstance(padding, (tuple, list)):
        padding = tuple(tuple(p) for p in padding)
    if int8_fused_enabled():
        if _conv_is_pointwise(qt.values.shape, strides, padding):
            i, o = qt.values.shape[2], qt.values.shape[3]
            return _qdot_fused(x, qt.values.reshape(i, o),
                               qt.scale.reshape(1, o), jnp.dtype(dtype))
        return jax.lax.conv_general_dilated(
            x, qt.astype(dtype), window_strides=tuple(strides), padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    return _qconv(x, qt.values, qt.scale, jnp.dtype(dtype), tuple(strides), padding)


def quantized_bytes_saved(tree) -> int:
    """Bytes of HBM saved vs bf16 storage (diagnostic)."""
    saved = 0
    for leaf in jax.tree.leaves(tree, is_leaf=lambda x: isinstance(x, QTensor)):
        if isinstance(leaf, QTensor):
            saved += leaf.values.size - leaf.scale.size * 4  # 2B->1B per elt, plus scales
    return saved
