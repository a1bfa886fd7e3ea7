"""Fused GEGLU projection kernel: ``geglu(x, W, b) = (x@Wa+ba) * gelu(x@Wb+bb)``.

TPU-native replacement for the GEGLU feed-forward entry in the reference's
diffusers transformer blocks (SURVEY.md §2b). Fusing the gate into the matmul
epilogue avoids ever writing the ``2F``-wide intermediate to HBM — at SDXL
scale that saves ~4 bytes/elem × seq × 2F of round-trip traffic per block.

The kernel is a standard tiled matmul, grid (M/bm, F/bn, K/bk), with *two*
fp32 accumulators (value half and gate half of the (K, 2F) weight, read in
place via two BlockSpec index maps over the SAME array — block sizes are
chosen as divisors of K/F so no padded weight copy is ever materialized) and
the gelu-gate applied at the final K step. Backward recomputes via XLA
matmuls (`jax.vjp` of the oracle) — matmul backward is MXU work XLA already
schedules optimally.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import interpret_default, round_up


def _erf(x):
    # Mosaic has no erf primitive; Abramowitz & Stegun 7.1.26 rational
    # approximation, |abs err| <= 1.5e-7 — exact to bf16/fp32 working precision.
    a1, a2, a3, a4, a5 = 0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    p = 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _geglu_kernel(x_ref, wa_ref, wb_ref, ba_ref, bb_ref, o_ref, acc_a, acc_b, *, nk):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_a[:] = jnp.zeros_like(acc_a)
        acc_b[:] = jnp.zeros_like(acc_b)

    x = x_ref[:]
    acc_a[:] += jnp.dot(x, wa_ref[:], preferred_element_type=jnp.float32)
    acc_b[:] += jnp.dot(x, wb_ref[:], preferred_element_type=jnp.float32)

    @pl.when(ki == nk - 1)
    def _finish():
        a = acc_a[:] + ba_ref[0].astype(jnp.float32)
        b = acc_b[:] + bb_ref[0].astype(jnp.float32)
        o_ref[:] = (a * _gelu_exact(b)).astype(o_ref.dtype)


def _divisor_block(dim: int, cap: int):
    """Largest multiple-of-128 divisor of ``dim`` that is <= cap (None if the
    dim is not lane-aligned). Picking a divisor lets the kernel read the
    weight halves in place via BlockSpec index maps instead of padding a
    host-side split — the split+pad materialized two ~15 MB HLO temps PER
    GEGLU LAYER in the remat'd SDXL train graph (the bs4 OOM dumps were full
    of ``bf16[1536,5120] pad`` buffers from exactly this line)."""
    for c in range(min(cap, dim) - min(cap, dim) % 128, 0, -128):
        if dim % c == 0:
            return c
    return None


def _forward(x, w, b, interpret):
    *lead, k = x.shape
    two_f = w.shape[1]
    f = two_f // 2
    m = int(np.prod(lead))
    xr = x.reshape(m, k)

    bn = _divisor_block(f, 512)
    bk = _divisor_block(k, 512)
    if bn is None or bk is None:
        # lane-unaligned K or F (never hit by the supported model zoo):
        # XLA oracle rather than a padded-weight kernel path
        return geglu_reference(x, w, b)

    bm = min(256, round_up(m, 8))
    m_p = round_up(m, bm)
    xp = jnp.pad(xr, ((0, m_p - m), (0, 0))) if m_p != m else xr
    b2 = b.reshape(1, two_f)
    nj = f // bn  # gate half starts nj blocks into the (K, 2F) weight

    nk = k // bk
    out = pl.pallas_call(
        functools.partial(_geglu_kernel, nk=nk),
        grid=(m_p // bm, nj, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, ki: (i, ki)),
            pl.BlockSpec((bk, bn), lambda i, j, ki: (ki, j)),
            pl.BlockSpec((bk, bn), lambda i, j, ki, _nj=nj: (ki, j + _nj)),
            pl.BlockSpec((1, bn), lambda i, j, ki: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j, ki, _nj=nj: (0, j + _nj)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, ki: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_p, f), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, bn), jnp.float32),
            pltpu.VMEM((bm, bn), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xp, w, w, b2, b2)
    return out[:m].reshape(*lead, f)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _geglu(x, w, b, interpret):
    return _forward(x, w, b, interpret)


def _geglu_fwd(x, w, b, interpret):
    return _forward(x, w, b, interpret), (x, w, b)


def _geglu_bwd(interpret, res, g):
    x, w, b = res
    _, vjp = jax.vjp(lambda x_, w_, b_: geglu_reference(x_, w_, b_), x, w, b)
    return vjp(g)


_geglu.defvjp(_geglu_fwd, _geglu_bwd)


def geglu(
    x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, interpret: Optional[bool] = None
) -> jnp.ndarray:
    """Fused GEGLU: x (..., K), w (K, 2F), b (2F,) -> (..., F)."""
    if interpret is None:
        from .common import force_reference_ops, pallas_elementwise

        if interpret_default() or force_reference_ops() or not pallas_elementwise("geglu"):
            # XLA epilogue fusion wins here on v5e (see common.pallas_elementwise)
            return geglu_reference(x, w, b)
        interpret = False
    return _geglu(x, w, b, interpret)


def geglu_reference(x, w, b):
    """XLA oracle (also the backward path)."""
    h = jnp.dot(x, w, preferred_element_type=jnp.float32) + b.astype(jnp.float32)
    a, gate = jnp.split(h, 2, axis=-1)
    return (a * jax.nn.gelu(gate, approximate=False)).astype(x.dtype)

