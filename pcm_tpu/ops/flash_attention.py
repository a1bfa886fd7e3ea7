"""Pallas TPU flash attention (forward + backward), bf16-friendly.

TPU-native replacement for the reference's xformers memory-efficient attention
(enabled at `train_pcm_lora_sd15.py:947-961`): O(S) memory attention with
online softmax, fp32 accumulation on the MXU, and a FlashAttention-2 style
backward split into a dK/dV kernel and a dQ kernel.

Public API takes the projection layout ``(batch, seq, heads, head_dim)``;
internally tensors are transposed to ``(batch, heads, seq, head_dim)`` so the
last two block dims are the hardware-tiled (sublane, lane) pair. Row statistics
(logsumexp, delta) use ``(batch, heads, seq, 1)`` arrays inside the kernels —
the trailing singleton keeps the block legal and broadcasts for free — but are
stored BETWEEN forward and backward as compact 3-D ``(batch, heads, seq)``
arrays: a trailing-singleton f32 array in HBM is lane-padded 128x by XLA
(measured: 480 KB of lse held as a 60 MB buffer per MMDiT block at 1024px,
OOMing the SD3 adversarial step), so the padded view exists only transiently
inside the fwd/bwd pallas calls.

No masking modes beyond padding are implemented: the diffusion UNet/MMDiT and
CLIP/T5 encoders in this framework use full bidirectional attention.
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

NEG_INF = -1e30


def _block_sizes(sq: int, sk: int, dp: int,
                 block_q: Optional[int] = None, block_k: Optional[int] = None):
    # Defaults measured on v5e with d=64 (scripts/tune_attention.py, fenced
    # timing): at seq 4096 fwd+bwd 1024/1024 beats 512/512 by 26% (4.68 vs
    # 6.30 ms) and fwd by 41%; seq 1024 and SD3-joint 4250 also prefer 1024.
    # 2048-blocks exceed VMEM in the bwd kernels, and wide heads scale every
    # VMEM buffer by dp/128 — the VAE's single 512-dim head (seq 16384) blows
    # the 16MB scoped limit at 1024 blocks, so wide heads keep the measured-
    # safe 512. Overridable per call.
    default = 1024 if dp <= 128 else 512
    bq = min(block_q or default, round_up(sq, 8))
    bk = min(block_k or default, round_up(sk, 128))
    return bq, bk


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr, *, sm_scale, sk, bk):
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * sm_scale
    col = ki * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < sk, s, NEG_INF)

    m_prev = m_scr[:]
    l_prev = l_scr[:]
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    corr = jnp.exp(m_prev - m_cur)
    p = jnp.exp(s - m_cur)
    l_cur = corr * l_prev + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[:] = acc_scr[:] * corr + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_scr[:] = m_cur
    l_scr[:] = l_cur

    @pl.when(ki == nk - 1)
    def _finish():
        l = l_scr[:]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[:] / l_safe).astype(o_ref.dtype)
        lse_ref[0, 0] = m_scr[:] + jnp.log(l_safe)


def _fwd(q, k, v, sm_scale, interpret, block_q=None, block_k=None):
    """q/k/v in (b, h, s, d) layout; returns o (b,h,sq,d), lse (b,h,sq)."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    dp = round_up(d, 128)
    bq, bk = _block_sizes(sq, sk, dp, block_q, block_k)
    sq_p, sk_p = round_up(sq, bq), round_up(sk, bk)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, dp - d)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, sk_p - sk), (0, dp - d)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, sk_p - sk), (0, dp - d)))

    grid = (b, h, sq_p // bq, sk_p // bk)
    kernel = functools.partial(_fwd_kernel, sm_scale=sm_scale, sk=sk, bk=bk)
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, dp), lambda b_, h_, qi, ki: (b_, h_, qi, 0)),
            pl.BlockSpec((1, 1, bk, dp), lambda b_, h_, qi, ki: (b_, h_, ki, 0)),
            pl.BlockSpec((1, 1, bk, dp), lambda b_, h_, qi, ki: (b_, h_, ki, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, dp), lambda b_, h_, qi, ki: (b_, h_, qi, 0)),
            pl.BlockSpec((1, 1, bq, 1), lambda b_, h_, qi, ki: (b_, h_, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sq_p, dp), q.dtype),
            jax.ShapeDtypeStruct((b, h, sq_p, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, dp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp)
    # slice lane 0 -> compact (b, h, sq): the (b, h, sq_p, 1) pallas output is
    # lane-padded 128x in HBM; keeping it as the residual (or letting remat
    # copy it) wastes ~60 MB per attention call at seq 5120
    return o[:, :, :sq, :d], lse[:, :, :sq, 0]


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref, dk_scr, dv_scr,
    *, sm_scale, sq, sk, bq, bk
):
    ki = pl.program_id(2)
    qi = pl.program_id(3)
    nq = pl.num_programs(3)

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0]  # (bq, 1)
    delta = delta_ref[0, 0]  # (bq, 1)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale
    col = ki * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    row = qi * bq + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    p = jnp.exp(s - lse)
    p = jnp.where((col < sk) & (row < sq), p, 0.0)

    dv_scr[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta) * sm_scale
    dk_scr[:] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(qi == nq - 1)
    def _finish():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_scr,
    *, sm_scale, sq, sk, bq, bk
):
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0]
    delta = delta_ref[0, 0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale
    col = ki * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    p = jnp.exp(s - lse)
    p = jnp.where(col < sk, p, 0.0)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta) * sm_scale
    dq_scr[:] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ki == nk - 1)
    def _finish():
        dq_ref[0, 0] = dq_scr[:].astype(dq_ref.dtype)


def _bwd(sm_scale, interpret, block_q, block_k, res, g):
    q, k, v, o, lse = res  # q/k/v/o (b, h, s, d); lse compact (b, h, sq)
    b, h, sq, d = q.shape
    sk = k.shape[2]
    dp = round_up(d, 128)
    bq, bk = _block_sizes(sq, sk, dp, block_q, block_k)
    sq_p, sk_p = round_up(sq, bq), round_up(sk, bk)

    g = g.astype(q.dtype)
    delta = jnp.sum(
        g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    )  # (b, h, sq)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, dp - d)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, sk_p - sk), (0, dp - d)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, sk_p - sk), (0, dp - d)))
    dop = jnp.pad(g, ((0, 0), (0, 0), (0, sq_p - sq), (0, dp - d)))
    # +inf pad drives p -> exp(-inf) = 0 for padded q rows (rows are also
    # masked explicitly in the dkv kernel). The trailing singleton (and its
    # 128x lane padding) is materialized only here, transiently, as the
    # kernels' (1, 1, bq, 1)-blocked inputs.
    lsep = jnp.pad(lse, ((0, 0), (0, 0), (0, sq_p - sq)),
                   constant_values=np.inf)[..., None]
    deltap = jnp.pad(delta, ((0, 0), (0, 0), (0, sq_p - sq)))[..., None]

    def q_spec(seq_block, last):
        return pl.BlockSpec((1, 1, seq_block, last), lambda b_, h_, i, j: (b_, h_, i, 0))

    dkv_in_specs = [
        pl.BlockSpec((1, 1, bq, dp), lambda b_, h_, ki, qi: (b_, h_, qi, 0)),  # q
        pl.BlockSpec((1, 1, bk, dp), lambda b_, h_, ki, qi: (b_, h_, ki, 0)),  # k
        pl.BlockSpec((1, 1, bk, dp), lambda b_, h_, ki, qi: (b_, h_, ki, 0)),  # v
        pl.BlockSpec((1, 1, bq, dp), lambda b_, h_, ki, qi: (b_, h_, qi, 0)),  # do
        pl.BlockSpec((1, 1, bq, 1), lambda b_, h_, ki, qi: (b_, h_, qi, 0)),  # lse
        pl.BlockSpec((1, 1, bq, 1), lambda b_, h_, ki, qi: (b_, h_, qi, 0)),  # delta
    ]
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, sm_scale=sm_scale, sq=sq, sk=sk, bq=bq, bk=bk),
        grid=(b, h, sk_p // bk, sq_p // bq),
        in_specs=dkv_in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, bk, dp), lambda b_, h_, ki, qi: (b_, h_, ki, 0)),
            pl.BlockSpec((1, 1, bk, dp), lambda b_, h_, ki, qi: (b_, h_, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sk_p, dp), k.dtype),
            jax.ShapeDtypeStruct((b, h, sk_p, dp), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, dp), jnp.float32),
            pltpu.VMEM((bk, dp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, dop, lsep, deltap)

    dq_in_specs = [
        pl.BlockSpec((1, 1, bq, dp), lambda b_, h_, qi, ki: (b_, h_, qi, 0)),  # q
        pl.BlockSpec((1, 1, bk, dp), lambda b_, h_, qi, ki: (b_, h_, ki, 0)),  # k
        pl.BlockSpec((1, 1, bk, dp), lambda b_, h_, qi, ki: (b_, h_, ki, 0)),  # v
        pl.BlockSpec((1, 1, bq, dp), lambda b_, h_, qi, ki: (b_, h_, qi, 0)),  # do
        pl.BlockSpec((1, 1, bq, 1), lambda b_, h_, qi, ki: (b_, h_, qi, 0)),  # lse
        pl.BlockSpec((1, 1, bq, 1), lambda b_, h_, qi, ki: (b_, h_, qi, 0)),  # delta
    ]
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, sm_scale=sm_scale, sq=sq, sk=sk, bq=bq, bk=bk),
        grid=(b, h, sq_p // bq, sk_p // bk),
        in_specs=dq_in_specs,
        out_specs=pl.BlockSpec((1, 1, bq, dp), lambda b_, h_, qi, ki: (b_, h_, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_p, dp), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, dp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, dop, lsep, deltap)

    return (
        dq[:, :, :sq, :d],
        dk[:, :, :sk, :d],
        dv[:, :, :sk, :d],
    )


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_attention_bhsd(q, k, v, sm_scale, interpret, block_q=None, block_k=None):
    o, _ = _fwd(q, k, v, sm_scale, interpret, block_q, block_k)
    return o


def _flash_fwd_rule(q, k, v, sm_scale, interpret, block_q=None, block_k=None):
    o, lse = _fwd(q, k, v, sm_scale, interpret, block_q, block_k)
    # Residuals are checkpoint-named so a remat policy can elect to save them
    # ("dots<N>m+fa", ops/common.py): with o+lse resident, the backward's
    # recompute pass DCEs the O(S^2) forward kernel entirely — q/k/v are
    # cheap projection dots it recomputes anyway. Identity when no policy
    # references the names.
    from jax.ad_checkpoint import checkpoint_name

    o = checkpoint_name(o, "fa_out")
    lse = checkpoint_name(lse, "fa_lse")
    return o, (q, k, v, o, lse)


_flash_attention_bhsd.defvjp(_flash_fwd_rule, _bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    sm_scale: Optional[float] = None,
    interpret: Optional[bool] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
) -> jnp.ndarray:
    """Memory-efficient attention over ``(batch, seq, heads, head_dim)``.

    fp32 softmax/accumulation regardless of input dtype; returns ``q.dtype``.
    """
    if sm_scale is None:
        sm_scale = 1.0 / float(np.sqrt(q.shape[-1]))
    if interpret is None:
        from .common import force_reference_ops

        if interpret_default() or force_reference_ops():
            # No TPU: use the XLA oracle (fast) instead of the slow Pallas
            # interpreter. Kernel tests opt into interpret=True explicitly.
            return attention_reference(q, k, v, sm_scale)
        interpret = False
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    o = _flash_attention_bhsd(qt, kt, vt, sm_scale, interpret, block_q, block_k)
    return jnp.transpose(o, (0, 2, 1, 3))


def attention_reference(q, k, v, sm_scale=None):
    """Plain XLA attention — correctness oracle and small-shape fallback."""
    if sm_scale is None:
        sm_scale = 1.0 / float(np.sqrt(q.shape[-1]))
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32))
    p = jax.nn.softmax(s * sm_scale, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32)).astype(q.dtype)
