"""Blockwise 8-bit AdamW — TPU-native replacement for bitsandbytes AdamW8bit
(the reference's optional optimizer, `train_pcm_lora_sd15.py:972-982`,
SURVEY.md §2b).

Both Adam moments are stored as int8 with per-block fp32 absmax scales
(block size 2048, matching bnb's layout); update math runs in fp32 after
dequantization. Implemented as a pure optax GradientTransformation so it
drops into `make_optimizer`-style chains.
"""

from __future__ import annotations

from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax

BLOCK = 2048


class _Q8(NamedTuple):
    values: jnp.ndarray  # int8, padded flat (N_pad,)
    scales: jnp.ndarray  # fp32 (N_pad / BLOCK,)


def _quantize(x: jnp.ndarray) -> _Q8:
    flat = x.astype(jnp.float32).reshape(-1)
    n = flat.shape[0]
    pad = (-n) % BLOCK
    flat = jnp.pad(flat, (0, pad)).reshape(-1, BLOCK)
    absmax = jnp.max(jnp.abs(flat), axis=1, keepdims=True)
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    q = jnp.clip(jnp.round(flat / scale), -127, 127).astype(jnp.int8)
    return _Q8(q.reshape(-1), scale[:, 0])


def _quantize_log(x: jnp.ndarray) -> _Q8:
    """Log-domain blockwise quantization for the (non-negative) second moment:
    linear int8 over log2(nu) handles nu's orders-of-magnitude dynamic range
    (linear absmax would zero small entries and blow up 1/sqrt(nu)).
    Scales pack (min, range) per block."""
    flat = x.astype(jnp.float32).reshape(-1)
    n = flat.shape[0]
    pad = (-n) % BLOCK
    flat = jnp.pad(flat, (0, pad)).reshape(-1, BLOCK)
    logx = jnp.log2(jnp.maximum(flat, 1e-30))
    lo = jnp.min(logx, axis=1, keepdims=True)
    hi = jnp.max(logx, axis=1, keepdims=True)
    rng = jnp.maximum(hi - lo, 1e-6)
    q = jnp.clip(jnp.round((logx - lo) / rng * 254.0) - 127.0, -127, 127).astype(jnp.int8)
    scales = jnp.concatenate([lo, rng], axis=1)  # (blocks, 2)
    return _Q8(q.reshape(-1), scales)


def _dequantize_log(q: _Q8, shape) -> jnp.ndarray:
    lo = q.scales[:, :1]
    rng = q.scales[:, 1:]
    logx = (q.values.astype(jnp.float32).reshape(-1, BLOCK) + 127.0) / 254.0 * rng + lo
    vals = jnp.exp2(logx)
    vals = jnp.where(q.values.reshape(-1, BLOCK) == -127, 0.0, vals)
    n = 1
    for d in shape:
        n *= int(d)
    return vals.reshape(-1)[:n].reshape(shape)


def _dequantize(q: _Q8, shape) -> jnp.ndarray:
    vals = q.values.astype(jnp.float32).reshape(-1, BLOCK) * q.scales[:, None]
    n = 1
    for d in shape:
        n *= int(d)
    return vals.reshape(-1)[:n].reshape(shape)


class ScaleByAdam8bitState(NamedTuple):
    count: jnp.ndarray
    mu: chex.ArrayTree  # tree of _Q8
    nu: chex.ArrayTree  # tree of _Q8


def scale_by_adam_8bit(
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8
) -> optax.GradientTransformation:
    def init_fn(params):
        mu = jax.tree.map(lambda p: _quantize(jnp.zeros_like(p, jnp.float32)), params)
        nu = jax.tree.map(lambda p: _quantize_log(jnp.zeros_like(p, jnp.float32)), params)
        return ScaleByAdam8bitState(jnp.zeros((), jnp.int32), mu, nu)

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1

        def upd(g, mu_q, nu_q):
            g = g.astype(jnp.float32)
            mu = _dequantize(mu_q, g.shape) * b1 + (1 - b1) * g
            nu = _dequantize_log(nu_q, g.shape) * b2 + (1 - b2) * g * g
            mu_hat = mu / (1 - b1**count)
            nu_hat = nu / (1 - b2**count)
            step = mu_hat / (jnp.sqrt(nu_hat) + eps)
            return step, _quantize(mu), _quantize_log(nu)

        is_q8 = lambda x: isinstance(x, _Q8)
        flat_u, treedef = jax.tree.flatten(updates)
        flat_mu = jax.tree.flatten(state.mu, is_leaf=is_q8)[0]
        flat_nu = jax.tree.flatten(state.nu, is_leaf=is_q8)[0]
        out = [upd(g, m, n) for g, m, n in zip(flat_u, flat_mu, flat_nu)]
        steps = treedef.unflatten([o[0] for o in out])
        mu = treedef.unflatten([o[1] for o in out])
        nu = treedef.unflatten([o[2] for o in out])
        return steps, ScaleByAdam8bitState(count, mu, nu)

    return optax.GradientTransformation(init_fn, update_fn)


def adamw8bit(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    max_grad_norm: float | None = 1.0,
) -> optax.GradientTransformation:
    chain = []
    if max_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(scale_by_adam_8bit(b1, b2, eps))
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*chain)
