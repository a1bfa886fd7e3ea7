"""Prodigy — parameter-free Adam-type optimizer (D-adaptation family).

TPU-native optax implementation of the ``prodigyopt.Prodigy`` optimizer the
reference SD3 trainers offer via ``--optimizer prodigy``
(`train_pcm_lora_sd3.py:1120-1145`; flags at `:464-500`). The reference warns
to keep ``lr≈1.0`` with Prodigy (`:1131-1134`) — same here.

Implements Algorithm 3 of "Prodigy: An Expeditiously Adaptive Parameter-Free
Learner" (arXiv:2306.06101) with the prodigyopt package's extensions, all as
traced scalar state inside one jittable `optax.GradientTransformation`:

  m_k   = beta1·m_{k-1} + (1-beta1)·d_k·g_k
  v_k   = beta2·v_{k-1} + (1-beta2)·d_k²·g_k²
  r_k   = beta3·r_{k-1} + (d_k/d_0)·dlr_k·⟨g_k, x_0 - x_k⟩
  s_k   = beta3·s_{k-1} + (d_k/d_0)·(d_k if safeguard_warmup else dlr_k)·g_k
  d̂     = d_coef · r_k / ‖s_k‖₁
  d_{k+1} = max(d_k, min(d̂, growth_rate·d_k))          (kept if ‖s_k‖₁ = 0)
  x_{k+1} = x_k - dlr_k · m_k / (sqrt(v_k) + d_k·eps)  [- dlr_k·wd·x_k decoupled]

with dlr_k = d_k·lr·bias_correction_k and beta3 defaulting to sqrt(beta2).
The distance estimate d is a single fp32 scalar shared across the whole tree
(prodigyopt accumulates numerator/denominator across all param groups the
same way); under a data mesh every device sees identical averaged grads, so d
stays replicated with no extra collective.

Memory: keeps x_0 (initial params) plus Adam moments and s — 4 extra trees.
Fine for LoRA-sized trainables (the only thing we optimize, SURVEY.md §2 #18).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class ProdigyState(NamedTuple):
    count: jnp.ndarray  # int32 scalar, completed steps
    exp_avg: Any
    exp_avg_sq: Any
    s: Any
    p0: Any  # initial params x_0
    d: jnp.ndarray  # fp32 scalar distance estimate
    d_numerator: jnp.ndarray  # fp32 scalar running numerator r


def prodigy(
    learning_rate: float = 1.0,
    betas: tuple = (0.9, 0.999),
    beta3: Optional[float] = None,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    d0: float = 1e-6,
    d_coef: float = 1.0,
    growth_rate: float = float("inf"),
    use_bias_correction: bool = False,
    safeguard_warmup: bool = False,
) -> optax.GradientTransformation:
    """Build the Prodigy transformation. Defaults mirror ``prodigyopt.Prodigy``
    and the reference flag defaults (`train_pcm_lora_sd3.py:464-500`:
    beta3=None→sqrt(beta2), decoupled weight decay, bias correction off,
    safeguard_warmup off). Weight decay is decoupled (``--prodigy_decouple``
    default True); the coupled variant is intentionally unsupported."""
    beta1, beta2 = betas
    # host-side constant (jnp here would touch the accelerator backend at
    # optimizer-construction time)
    b3 = float(beta3) if beta3 is not None else float(beta2) ** 0.5

    def init_fn(params):
        zeros = lambda t: jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32), t)
        return ProdigyState(
            count=jnp.zeros((), jnp.int32),
            exp_avg=zeros(params),
            exp_avg_sq=zeros(params),
            s=zeros(params),
            p0=jax.tree.map(lambda p: p.astype(jnp.float32), params),
            d=jnp.asarray(d0, jnp.float32),
            d_numerator=jnp.zeros((), jnp.float32),
        )

    def update_fn(grads, state: ProdigyState, params=None):
        if params is None:
            raise ValueError("prodigy requires params")
        k = state.count + 1
        d = state.d
        grads32 = jax.tree.map(lambda g: g.astype(jnp.float32), grads)

        if use_bias_correction:
            bc = jnp.sqrt(1.0 - beta2 ** k.astype(jnp.float32)) / (
                1.0 - beta1 ** k.astype(jnp.float32)
            )
        else:
            bc = jnp.asarray(1.0, jnp.float32)
        dlr = d * learning_rate * bc

        # ⟨g, x0 - x⟩ summed over the whole tree
        dot = sum(
            jnp.sum(g * (p0 - p.astype(jnp.float32)))
            for g, p0, p in zip(
                jax.tree.leaves(grads32), jax.tree.leaves(state.p0), jax.tree.leaves(params)
            )
        )
        d_numerator = b3 * state.d_numerator + (d / d0) * dlr * dot

        exp_avg = jax.tree.map(
            lambda m, g: beta1 * m + (1.0 - beta1) * d * g, state.exp_avg, grads32
        )
        exp_avg_sq = jax.tree.map(
            lambda v, g: beta2 * v + (1.0 - beta2) * d * d * g * g,
            state.exp_avg_sq,
            grads32,
        )
        s_scale = (d / d0) * (d if safeguard_warmup else dlr)
        s = jax.tree.map(lambda s_, g: b3 * s_ + s_scale * g, state.s, grads32)
        d_denom = sum(jnp.sum(jnp.abs(l)) for l in jax.tree.leaves(s))

        d_hat = d_coef * d_numerator / jnp.where(d_denom > 0.0, d_denom, 1.0)
        new_d = jnp.where(
            d_denom > 0.0, jnp.maximum(d, jnp.minimum(d_hat, d * growth_rate)), d
        )

        def upd(m, v, p):
            u = -dlr * m / (jnp.sqrt(v) + d * eps)
            if weight_decay:
                u = u - dlr * weight_decay * p.astype(jnp.float32)
            return u.astype(p.dtype)

        updates = jax.tree.map(upd, exp_avg, exp_avg_sq, params)
        return updates, ProdigyState(
            count=k, exp_avg=exp_avg, exp_avg_sq=exp_avg_sq, s=s, p0=state.p0,
            d=new_d, d_numerator=d_numerator,
        )

    return optax.GradientTransformationExtraArgs(init_fn, update_fn)


def prodigy_d(opt_state) -> Optional[jnp.ndarray]:
    """Extract the current distance estimate ``d`` from a (possibly chained)
    optimizer state — the one Prodigy number worth logging (the reference logs
    only lr; with Prodigy the effective lr is ``lr·d``)."""
    for leaf_state in jax.tree.leaves(
        opt_state, is_leaf=lambda s: isinstance(s, ProdigyState)
    ):
        if isinstance(leaf_state, ProdigyState):
            return leaf_state.d
    return None
