"""8-bit AdamW vs fp32 AdamW closeness on a small quadratic problem."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pcm_tpu.train.optim8bit import adamw8bit


def test_adamw8bit_tracks_fp32_adam():
    rng = np.random.RandomState(0)
    target = jnp.asarray(rng.randn(4, 2500), jnp.float32)  # non-multiple of block
    params8 = {"w": jnp.zeros_like(target)}
    params32 = {"w": jnp.zeros_like(target)}

    tx8 = adamw8bit(1e-1, max_grad_norm=None)
    tx32 = optax.adamw(1e-1)
    s8 = tx8.init(params8)
    s32 = tx32.init(params32)

    def loss(p):
        return jnp.mean((p["w"] - target) ** 2)

    @jax.jit
    def step(p8, s8, p32, s32):
        g8 = jax.grad(loss)(p8)
        u8, s8 = tx8.update(g8, s8, p8)
        p8 = optax.apply_updates(p8, u8)
        g32 = jax.grad(loss)(p32)
        u32, s32 = tx32.update(g32, s32, p32)
        p32 = optax.apply_updates(p32, u32)
        return p8, s8, p32, s32

    for _ in range(50):
        params8, s8, params32, s32 = step(params8, s8, params32, s32)

    l8, l32 = float(loss(params8)), float(loss(params32))
    # both optimizers make strong progress and stay close
    assert l8 < 0.2 * float(jnp.mean(target**2))
    assert abs(l8 - l32) / max(l32, 1e-8) < 0.25

    # int8 state actually is int8
    from pcm_tpu.train.optim8bit import _Q8

    q8s = [
        x
        for x in jax.tree.flatten(s8, is_leaf=lambda x: isinstance(x, _Q8))[0]
        if isinstance(x, _Q8)
    ]
    assert q8s and all(q.values.dtype == jnp.int8 for q in q8s)
