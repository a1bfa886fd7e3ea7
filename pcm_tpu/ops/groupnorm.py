"""Fused GroupNorm(+SiLU) Pallas kernel.

TPU-native replacement for the cuDNN GroupNorm+activation pairs inside the
reference's diffusers UNet resnet blocks (SURVEY.md §2b). Channels-last
layout ``(N, ..., C)``; statistics in fp32.

Forward is two Pallas passes (the HBM-traffic minimum for out-of-VMEM inputs
— 2 reads + 1 write):
  1. a reduction kernel producing per-(sample, group) partial sums over
     spatial blocks,
  2. a normalize kernel applying (x - mean) * rstd * gamma + beta and the
     optional SiLU in one fused elementwise pass.

Backward recomputes through the XLA oracle (`jax.vjp` of the reference
implementation) — GroupNorm backward is bandwidth-bound elementwise+reduction
work that XLA fuses well, and under `jax.checkpoint` the recompute happens
anyway.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .common import interpret_default, round_up


def _stats_kernel(x_ref, out_ref, *, valid_rows, bs):
    # Per-channel partial sums; the channel->group fold happens outside the
    # kernel (Mosaic cannot shape-cast the lane dimension into groups).
    si = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)  # (bs, C)
    rows, c = x.shape
    row = si * bs + jax.lax.broadcasted_iota(jnp.int32, (rows, c), 0)
    x = jnp.where(row < valid_rows, x, 0.0)
    s1 = jnp.sum(x, axis=0)  # (C,)
    s2 = jnp.sum(x * x, axis=0)
    out_ref[0, 0] = jnp.stack([s1, s2], axis=0)  # (2, C)


def _norm_kernel(x_ref, mu_ref, rstd_ref, gamma_ref, beta_ref, o_ref, *, act):
    x = x_ref[0].astype(jnp.float32)  # (bs, C)
    y = (x - mu_ref[0]) * rstd_ref[0] * gamma_ref[0] + beta_ref[0]
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _forward(x, gamma, beta, num_groups, eps, act, interpret):
    orig_shape = x.shape
    n, c = x.shape[0], x.shape[-1]
    assert c % num_groups == 0, (c, num_groups)
    s = int(np.prod(orig_shape[1:-1])) if len(orig_shape) > 2 else 1
    xr = x.reshape(n, s, c)

    # Spatial block sized so one (bs, C) tile stays well under VMEM even with
    # double buffering and fp32 intermediates. Prefer a block that DIVIDES s:
    # a non-dividing block forces jnp.pad to round s up, and that pad is a
    # full read+write copy of the activation (80 MB per call at SDXL
    # 4x128x128x640) — a pure HBM-bandwidth tax paid again on every remat
    # recompute. UNet/VAE spatial sizes are power-of-two-rich, so a divisor
    # within ~2x of the budget cap always exists there; lane-odd cases like
    # text seq 77 fall back to the padded path.
    bytes_per_row = c * max(x.dtype.itemsize, 2)
    bs_budget = max(8, (512 * 1024 // bytes_per_row) // 8 * 8)
    cap = min(bs_budget, 1024, s)
    # Only accept a dividing block within 4x of the cap: a floor-less search
    # can land on bs=8 when s is a multiple of 8 with no aligned divisor near
    # the cap (e.g. s = 8*prime from odd resolutions), and a grid of tiny
    # (8, C) tiles is far slower than one whole-tensor pad (round-3 ADVICE).
    floor = max(8, cap // 4)
    bs = next(
        (cand for cand in range(cap - cap % 8, floor - 1, -8) if s % cand == 0),
        None,
    )
    if bs is None:
        bs = min(bs_budget, 1024, round_up(s, 8))
    s_p = round_up(s, bs)
    xp = xr if s_p == s else jnp.pad(xr, ((0, 0), (0, s_p - s), (0, 0)))
    nblocks = s_p // bs

    stats = pl.pallas_call(
        functools.partial(_stats_kernel, valid_rows=s, bs=bs),
        grid=(n, nblocks),
        in_specs=[pl.BlockSpec((1, bs, c), lambda i, j: (i, j, 0))],
        out_specs=pl.BlockSpec((1, 1, 2, c), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, nblocks, 2, c), jnp.float32),
        interpret=interpret,
    )(xp)

    per_channel = jnp.sum(stats, axis=1)  # (N, 2, C)
    tot = jnp.sum(per_channel.reshape(n, 2, num_groups, c // num_groups), axis=-1)  # (N,2,G)
    count = s * (c // num_groups)
    mean = tot[:, 0] / count  # (N, G)
    var = tot[:, 1] / count - mean * mean
    rstd = jax.lax.rsqrt(var + eps)

    cg = c // num_groups
    mean_c = jnp.repeat(mean, cg, axis=1)[:, None, :]  # (N, 1, C)
    rstd_c = jnp.repeat(rstd, cg, axis=1)[:, None, :]
    gamma_c = gamma.astype(jnp.float32)[None, None, :]
    beta_c = beta.astype(jnp.float32)[None, None, :]

    out = pl.pallas_call(
        functools.partial(_norm_kernel, act=act),
        grid=(n, nblocks),
        in_specs=[
            pl.BlockSpec((1, bs, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bs, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((n, s_p, c), x.dtype),
        interpret=interpret,
    )(xp, mean_c, rstd_c, gamma_c, beta_c)
    return out[:, :s, :].reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _group_norm_silu(x, gamma, beta, num_groups, eps, act, interpret):
    return _forward(x, gamma, beta, num_groups, eps, act, interpret)


def _gn_fwd(x, gamma, beta, num_groups, eps, act, interpret):
    return _forward(x, gamma, beta, num_groups, eps, act, interpret), (x, gamma, beta)


def _gn_bwd(num_groups, eps, act, interpret, res, g):
    x, gamma, beta = res
    _, vjp = jax.vjp(
        lambda x_, g_, b_: group_norm_silu_reference(x_, g_, b_, num_groups, eps, act),
        x,
        gamma,
        beta,
    )
    return vjp(g)


_group_norm_silu.defvjp(_gn_fwd, _gn_bwd)


def group_norm_silu(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    num_groups: int = 32,
    eps: float = 1e-5,
    act: Optional[str] = "silu",
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """GroupNorm over channels-last input of any rank >= 2, fused with SiLU.

    ``x``: (N, *spatial, C); ``gamma``/``beta``: (C,).
    """
    if interpret is None:
        from .common import force_reference_ops, pallas_elementwise

        if interpret_default() or force_reference_ops() or (
            not pallas_elementwise("groupnorm") and not _force_pallas_for_size(x.shape)
        ):
            # XLA wins at most UNet shapes on v5e (see common.pallas_elementwise)
            return group_norm_silu_reference(x, gamma, beta, num_groups, eps, act)
        interpret = False
    return _group_norm_silu(x, gamma, beta, num_groups, eps, act, interpret)


def _force_pallas_for_size(shape, threshold_bytes: int = 256 * 1024 * 1024) -> bool:
    """The XLA reference materializes f32 temps of the whole activation; at
    VAE-decoder scale (1024x1024x256 = 1 GiB f32 per sample) that OOMs the
    chip. Tensors whose f32 footprint exceeds ``threshold_bytes`` always take
    the streaming Pallas kernel, even on inference traces where XLA is
    otherwise the faster default (docs/ROUND1_NOTES.md session 2)."""
    return 4 * int(np.prod(shape)) > threshold_bytes


def group_norm_silu_reference(x, gamma, beta, num_groups=32, eps=1e-5, act="silu"):
    """XLA oracle (also the backward path)."""
    orig = x.shape
    n, c = x.shape[0], x.shape[-1]
    xf = x.astype(jnp.float32).reshape(n, -1, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.var(xf, axis=(1, 3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(n, -1, c) * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    return y.reshape(orig).astype(x.dtype)
