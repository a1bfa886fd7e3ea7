"""Pallas TPU flash attention (forward + backward), bf16-friendly.

TPU-native replacement for the reference's xformers memory-efficient attention
(enabled at `train_pcm_lora_sd15.py:947-961`): O(S) memory attention with
online softmax, fp32 accumulation on the MXU, and a FlashAttention-2 style
backward split into a dK/dV kernel and a dQ kernel.

Public API takes the projection layout ``(batch, seq, heads, head_dim)``;
internally tensors are transposed to ``(batch, heads, seq, head_dim)`` so the
last two block dims are the hardware-tiled (sublane, lane) pair.

d=64 efficiency notes (all models here use head_dim 64 except the VAE):
- Tensors are fed to the kernels UNPADDED. Blocks span the full head_dim and
  partial edge blocks along seq are handled by Mosaic (out-of-bounds reads are
  masked in-kernel; out-of-bounds writes are dropped). The previous
  implementation `jnp.pad`-ed head_dim 64 -> 128 and seq up to the block
  multiple in HBM, which cost pad/slice kernels plus 2x HBM read traffic on
  every operand; the MXU time is identical either way (Mosaic lane-pads
  in-register), so the padding was pure memory-bandwidth waste.
- The per-block padding masks (iota + compare + select over the full bq x bk
  score block) are compiled out entirely when the block size divides the
  sequence length -- the SDXL/SD1.5 self-attention shapes (4096, 1024, 256)
  all divide, so they pay zero mask overhead.
- Block sizes are chosen to minimize edge-block waste: SD3's joint seq 4250
  used to round up to 5120 (1.45x the useful score FLOPs); bq=1088/bk=512
  rounds to 4352 (1.049x). See `_block_sizes`.
- Softmax runs in the exp2 domain: `exp(s*scale - m)` is computed as
  `exp2(s*alpha - m2)` with `alpha = scale*log2(e)` folded into the single
  post-matmul multiply (the VPU computes exp via exp2 + a multiply anyway, so
  this deletes one full bq x bk multiply pass per block). The saved
  logsumexp residual is therefore BASE-2 (`m2 + log2(l)`); it is consumed
  only by the backward kernels here, which expect that convention.

Row statistics (logsumexp, delta) use ``(batch, heads, seq, 1)`` arrays inside
the kernels -- the trailing singleton keeps the block legal and broadcasts for
free -- but are stored BETWEEN forward and backward as compact 3-D
``(batch, heads, seq)`` arrays: a trailing-singleton f32 array in HBM is
lane-padded 128x by XLA (measured: 480 KB of lse held as a 60 MB buffer per
MMDiT block at 1024px, OOMing the SD3 adversarial step), so the padded view
exists only transiently inside the fwd/bwd pallas calls.

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
LOG2E = 1.4426950408889634  # log2(e): exp(x) == exp2(x * LOG2E)


def _pick_block(s: int, cands, fallback_mult: int) -> int:
    """Smallest-padding block from `cands`, largest block on ties.

    For s below the smallest candidate the whole sequence is one block
    (rounded to the tiling multiple). Measured on v5e (tune_attention.py):
    1024-blocks beat 512 by ~26% fwd+bwd at seq 4096 when padding is equal,
    but edge-block waste dominates when it isn't -- seq 4250 @ 1024 pads to
    5120 (+45% score FLOPs) vs 4352 (+4.9%) with the picks below.
    """
    if s <= min(cands):
        return round_up(s, fallback_mult)
    best = None
    for c in cands:
        padded = ((s + c - 1) // c) * c
        key = (padded, -c)
        if best is None or key < best[1]:
            best = (c, key)
    return best[0]


def _block_sizes(sq: int, sk: int, d: int,
                 block_q: Optional[int] = None, block_k: Optional[int] = None):
    # Wide heads (the VAE's single 512-dim head, seq 16384) scale every VMEM
    # buffer by d/128 and blow the 16MB scoped limit at 1024 blocks, so they
    # keep the measured-safe 512 cap. Overridable per call.
    if d > 128:
        q_cands, k_cands = (512,), (512,)
    else:
        # bq is a sublane dim (mult of 16 for bf16); bk is the score block's
        # lane dim (mult of 128). 1088 exists for seq 4250 -> 4352.
        q_cands = (1024, 1088, 896, 768, 640, 512)
        k_cands = (1024, 896, 768, 640, 512)
    bq = block_q or _pick_block(sq, q_cands, 16)
    bk = block_k or _pick_block(sk, k_cands, 128)
    return min(bq, round_up(sq, 16)), min(bk, round_up(sk, 128))


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
                *, alpha, sk, bk, mask_k):
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
    if mask_k:
        # Edge k-blocks read out-of-bounds garbage (possibly NaN/Inf bit
        # patterns): the score mask alone is not enough because the PV matmul
        # contracts over bk and 0 * NaN = NaN — zero the garbage v rows too.
        vrow = ki * bk + jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
        v = jnp.where(vrow < sk, v, 0)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * alpha  # base-2 domain: exp(s*scale) == exp2(s*alpha)
    if mask_k:
        col = ki * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < sk, s, NEG_INF)

    m_prev = m_scr[:]
    l_prev = l_scr[:]
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    corr = jnp.exp2(m_prev - m_cur)
    p = jnp.exp2(s - m_cur)
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
        # base-2 logsumexp (consumed only by _bwd below)
        lse_ref[0, 0] = m_scr[:] + jnp.log2(l_safe)


def _fwd(q, k, v, sm_scale, interpret, block_q=None, block_k=None):
    """q/k/v in (b, h, s, d) layout; returns o (b,h,sq,d), lse2 (b,h,sq)."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    bq, bk = _block_sizes(sq, sk, d, block_q, block_k)

    grid = (b, h, pl.cdiv(sq, bq), pl.cdiv(sk, bk))
    kernel = functools.partial(
        _fwd_kernel, alpha=sm_scale * LOG2E, sk=sk, bk=bk, mask_k=(sk % bk != 0)
    )
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda b_, h_, qi, ki: (b_, h_, qi, 0)),
            pl.BlockSpec((1, 1, bk, d), lambda b_, h_, qi, ki: (b_, h_, ki, 0)),
            pl.BlockSpec((1, 1, bk, d), lambda b_, h_, qi, ki: (b_, h_, ki, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda b_, h_, qi, ki: (b_, h_, qi, 0)),
            pl.BlockSpec((1, 1, bq, 1), lambda b_, h_, qi, ki: (b_, h_, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, sq, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v)
    # lane 0 -> compact (b, h, sq): a trailing-singleton f32 residual in HBM is
    # lane-padded 128x by XLA (~60 MB per attention call at seq 5120)
    return o, lse[..., 0]


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref, dk_scr, dv_scr,
    *, alpha, sm_scale, sq, bq, mask_q
):
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
    lse = lse_ref[0, 0]  # (bq, 1), base-2
    delta = delta_ref[0, 0]  # (bq, 1)
    if mask_q:
        # Edge q-blocks carry garbage q/do/lse/delta rows. dv/dk contract
        # over bq, so garbage q/do rows must be zeroed at load (0 * NaN = NaN
        # in the dot) AND p/ds zeroed below (garbage lse can drive exp2 to
        # inf, and 0-row * inf-p = NaN). Garbage k-COLS only pollute dk/dv
        # rows beyond sk, which are dropped on write-back — no col mask.
        qrow = (qi * bq + jax.lax.broadcasted_iota(jnp.int32, q.shape, 0)) < sq
        q = jnp.where(qrow, q, 0)
        do = jnp.where(qrow, do, 0)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * alpha
    p = jnp.exp2(s - lse)
    ds = p * (dp_minus_delta(do, v, delta)) * sm_scale
    if mask_q:
        row = (qi * bq + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)) < sq
        p = jnp.where(row, p, 0.0)
        ds = jnp.where(row, ds, 0.0)

    dv_scr[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dk_scr[:] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(qi == nq - 1)
    def _finish():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def dp_minus_delta(do, v, delta):
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    return dp - delta


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_scr,
    *, alpha, sm_scale, sk, bk, mask_k
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
    if mask_k:
        # Edge k-blocks carry garbage k/v rows. dq contracts over bk, so
        # garbage k rows are zeroed at load (0 * NaN = NaN in the dot); the
        # ds col mask below kills the garbage-dp (from garbage v) columns.
        krow = (ki * bk + jax.lax.broadcasted_iota(jnp.int32, k.shape, 0)) < sk
        k = jnp.where(krow, k, 0)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * alpha
    p = jnp.exp2(s - lse)
    ds = p * (dp_minus_delta(do, v, delta)) * sm_scale
    if mask_k:
        col = (ki * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)) < sk
        ds = jnp.where(col, ds, 0.0)

    dq_scr[:] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ki == nk - 1)
    def _finish():
        dq_ref[0, 0] = dq_scr[:].astype(dq_ref.dtype)


def _bwd(sm_scale, interpret, block_q, block_k, res, g):
    q, k, v, o, lse = res  # q/k/v/o (b, h, s, d); lse compact (b, h, sq), base-2
    b, h, sq, d = q.shape
    sk = k.shape[2]
    bq, bk = _block_sizes(sq, sk, d, block_q, block_k)
    alpha = sm_scale * LOG2E

    g = g.astype(q.dtype)
    delta = jnp.sum(
        g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    )  # (b, h, sq)

    # The trailing singleton (and its 128x lane padding) is materialized only
    # here, transiently, as the kernels' (1, 1, bq, 1)-blocked inputs.
    lsep = lse[..., None]
    deltap = delta[..., None]

    mask_q = sq % bq != 0
    mask_k = sk % bk != 0

    dkv_in_specs = [
        pl.BlockSpec((1, 1, bq, d), lambda b_, h_, ki, qi: (b_, h_, qi, 0)),  # q
        pl.BlockSpec((1, 1, bk, d), lambda b_, h_, ki, qi: (b_, h_, ki, 0)),  # k
        pl.BlockSpec((1, 1, bk, d), lambda b_, h_, ki, qi: (b_, h_, ki, 0)),  # v
        pl.BlockSpec((1, 1, bq, d), lambda b_, h_, ki, qi: (b_, h_, qi, 0)),  # do
        pl.BlockSpec((1, 1, bq, 1), lambda b_, h_, ki, qi: (b_, h_, qi, 0)),  # lse
        pl.BlockSpec((1, 1, bq, 1), lambda b_, h_, ki, qi: (b_, h_, qi, 0)),  # delta
    ]
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, alpha=alpha, sm_scale=sm_scale,
                          sq=sq, bq=bq, mask_q=mask_q),
        grid=(b, h, pl.cdiv(sk, bk), pl.cdiv(sq, bq)),
        in_specs=dkv_in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, bk, d), lambda b_, h_, ki, qi: (b_, h_, ki, 0)),
            pl.BlockSpec((1, 1, bk, d), lambda b_, h_, ki, qi: (b_, h_, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sk, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, sk, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, g, lsep, deltap)

    dq_in_specs = [
        pl.BlockSpec((1, 1, bq, d), lambda b_, h_, qi, ki: (b_, h_, qi, 0)),  # q
        pl.BlockSpec((1, 1, bk, d), lambda b_, h_, qi, ki: (b_, h_, ki, 0)),  # k
        pl.BlockSpec((1, 1, bk, d), lambda b_, h_, qi, ki: (b_, h_, ki, 0)),  # v
        pl.BlockSpec((1, 1, bq, d), lambda b_, h_, qi, ki: (b_, h_, qi, 0)),  # do
        pl.BlockSpec((1, 1, bq, 1), lambda b_, h_, qi, ki: (b_, h_, qi, 0)),  # lse
        pl.BlockSpec((1, 1, bq, 1), lambda b_, h_, qi, ki: (b_, h_, qi, 0)),  # delta
    ]
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, alpha=alpha, sm_scale=sm_scale,
                          sk=sk, bk=bk, mask_k=mask_k),
        grid=(b, h, pl.cdiv(sq, bq), pl.cdiv(sk, bk)),
        in_specs=dq_in_specs,
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda b_, h_, qi, ki: (b_, h_, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, g, lsep, deltap)

    return dq, dk, dv


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
