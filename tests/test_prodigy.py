"""Prodigy optimizer: recurrence goldens vs a NumPy re-derivation, the
parameter-free convergence property, and make_optimizer wiring.

Mirrors the reference's prodigyopt option for SD3 (`train_pcm_lora_sd3.py:
1120-1145`): lr stays 1.0 and the optimizer adapts the step size d itself.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pcm_tpu.train.prodigy import prodigy
from pcm_tpu.train.state import TrainState, make_optimizer


def _numpy_prodigy(grads_seq, params0, lr=1.0, beta1=0.9, beta2=0.999,
                   eps=1e-8, d0=1e-6, wd=0.0):
    """Straight-line NumPy transcription of the documented recurrences."""
    b3 = np.sqrt(beta2)
    p = {k: v.copy() for k, v in params0.items()}
    x0 = {k: v.copy() for k, v in params0.items()}
    m = {k: np.zeros_like(v) for k, v in params0.items()}
    v = {k: np.zeros_like(vv) for k, vv in params0.items()}
    s = {k: np.zeros_like(vv) for k, vv in params0.items()}
    d, r = d0, 0.0
    out = []
    for grads in grads_seq:
        dlr = d * lr
        dot = sum(float(np.sum(grads[k] * (x0[k] - p[k]))) for k in p)
        r = b3 * r + (d / d0) * dlr * dot
        for k in p:
            m[k] = beta1 * m[k] + (1 - beta1) * d * grads[k]
            v[k] = beta2 * v[k] + (1 - beta2) * d * d * grads[k] ** 2
            s[k] = b3 * s[k] + (d / d0) * dlr * grads[k]
        denom = sum(float(np.sum(np.abs(s[k]))) for k in p)
        d_hat = r / denom if denom > 0 else d
        d = max(d, d_hat) if denom > 0 else d
        for k in p:
            p[k] = p[k] - dlr * m[k] / (np.sqrt(v[k]) + (dlr / lr) * eps) - dlr * wd * p[k]
        out.append({k: vv.copy() for k, vv in p.items()})
    return out, d


def test_prodigy_matches_numpy_reference():
    rng = np.random.RandomState(0)
    params = {"a": rng.randn(3, 4).astype(np.float32),
              "b": rng.randn(7).astype(np.float32)}
    grads_seq = [
        {k: rng.randn(*v.shape).astype(np.float32) for k, v in params.items()}
        for _ in range(8)
    ]
    ref_traj, ref_d = _numpy_prodigy(grads_seq, params)

    tx = prodigy(1.0)
    p = {k: jnp.asarray(v) for k, v in params.items()}
    state = tx.init(p)
    upd = jax.jit(tx.update)
    for i, g in enumerate(grads_seq):
        u, state = upd({k: jnp.asarray(v) for k, v in g.items()}, state, p)
        p = optax.apply_updates(p, u)
        for k in p:
            np.testing.assert_allclose(np.asarray(p[k]), ref_traj[i][k],
                                       rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(float(state.d), ref_d, rtol=1e-4)


def test_prodigy_is_parameter_free_on_quadratic():
    # far-from-optimum quadratic; lr=1 and tiny d0 still converge because d
    # grows to the distance scale
    target = jnp.asarray(np.linspace(-3, 3, 64), jnp.float32)
    p = {"w": jnp.zeros_like(target)}
    tx = prodigy(1.0)
    state = tx.init(p)

    def loss(p):
        return 0.5 * jnp.mean((p["w"] - target) ** 2)

    @jax.jit
    def step(p, state):
        g = jax.grad(loss)(p)
        u, state = tx.update(g, state, p)
        return optax.apply_updates(p, u), state

    l0 = float(loss(p))
    for _ in range(60):
        p, state = step(p, state)
    assert float(state.d) > 100 * 1e-6  # d grew well beyond d0
    assert float(loss(p)) < 0.05 * l0


def test_make_optimizer_prodigy_wiring():
    tx = make_optimizer(1.0, optimizer="prodigy", max_grad_norm=1.0)
    p = {"w": jnp.ones((4, 4), jnp.float32)}
    state = TrainState.create(p, tx)
    g = {"w": jnp.full((4, 4), 0.5, jnp.float32)}
    u, opt_state = jax.jit(tx.update)(g, state.opt_state, p)
    new_p = optax.apply_updates(p, u)
    assert jnp.all(jnp.isfinite(new_p["w"]))
    assert float(jnp.max(jnp.abs(new_p["w"] - p["w"]))) > 0


def test_prodigy_d_extraction():
    from pcm_tpu.train.prodigy import prodigy_d

    tx = make_optimizer(1.0, optimizer="prodigy")
    p = {"w": jnp.ones((4,), jnp.float32)}
    state = tx.init(p)
    d = prodigy_d(state)
    assert d is not None and abs(float(d) - 1e-6) < 1e-9
    assert prodigy_d(optax.adam(1e-3).init(p)) is None
