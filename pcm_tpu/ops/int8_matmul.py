"""Fused int8 matmul: in-VMEM activation quantization + int8 MXU dot.

The XLA int8 path (`utils/quant.py:_qdot`) is step-time **neutral** on v5e
despite the int8 MXU dot being 2.7x faster than bf16 in isolation: the
dynamic activation quantization (amax reduce + rescale + int8 cast) is an
unfused chain of extra HBM passes that eats the win (measured 2026-08-17,
docs/ROUND2_NOTES.md "int8-matmul verdict").

This kernel removes those passes. Activations are quantized **per
(row, K-tile) inside VMEM** right before the MXU consumes them:

    for k-tile:                      # grid innermost dim, sequential on TPU
        x_t   = X[i-block, k-block]          (bf16, HBM -> VMEM once)
        s_t   = rowmax(|x_t|)/127            (VPU, in-register)
        xq_t  = round(x_t / s_t)  int8
        acc  += (xq_t @ Wq[k,j]) * s_t       (int8 MXU -> int32, f32 acc)
    out[i,j] = acc * w_scale[j]

Per-K-tile scales are strictly finer-grained than `_qdot`'s whole-row
scales, so quantization error is never worse. No x32/xq intermediates ever
touch HBM, and the dot reads int8 weights (half the bf16 bytes).

Backward stays the exact bf16 dequantized linear op (defined at the
`custom_vjp` in utils/quant.py — this module provides forward values only).

Reference hook: the bitsandbytes int8 path the reference can opt into via
8-bit optimizers has no inference/matmul analog; this is the TPU-native
extension of SURVEY.md §2b's quantization row.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import interpret_default, round_up


def _pick_block(dim: int, target: int, quantum: int) -> int:
    """Largest multiple of `quantum` that divides `dim` and is <= target
    (falls back to `dim` itself for small dims)."""
    if dim <= target:
        return dim
    b = (target // quantum) * quantum
    while b >= quantum:
        if dim % b == 0:
            return b
        b -= quantum
    return dim


def _kernel(x_ref, w_ref, ws_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...].astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=1, keepdims=True)  # (bm, 1)
    s = jnp.where(amax > 0, amax / 127.0, 1.0)
    xq = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
    part = jax.lax.dot_general(
        xq, w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    acc_ref[...] += part.astype(jnp.float32) * s

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _done():
        o_ref[...] = (acc_ref[...] * ws_ref[...]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "block_m", "block_n", "block_k",
                              "interpret"),
)
def fused_quantized_dot(
    x: jnp.ndarray,
    values: jnp.ndarray,   # int8 (K, N)
    scale: jnp.ndarray,    # f32 (1, N) per-output-channel weight scale
    out_dtype=jnp.bfloat16,
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 512,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """``x @ dequant(values, scale)`` with per-(row, K-tile) activation
    quantization fused into the int8 MXU dot. Leading dims of ``x`` are
    flattened; K and N must be multiples of 128 (model channel dims are)."""
    if interpret is None:
        interpret = interpret_default()
    *lead, K = x.shape
    Kw, N = values.shape
    assert K == Kw, (x.shape, values.shape)
    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, K)

    bk = _pick_block(K, block_k, 128)
    bn = _pick_block(N, block_n, 128)
    bm = min(block_m, round_up(max(m, 1), 8))
    mp = round_up(max(m, 1), bm)
    if mp != m:
        x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))  # zero rows: s=1, xq=0

    grid = (mp // bm, N // bn, K // bk)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
    )(x2, values, scale.reshape(1, N).astype(jnp.float32))
    return out[:m].reshape(*lead, N)
