"""Weight-only int8 frozen weights (utils/quant.py): QTensor transparency
through every layer kind, quantization accuracy, and a full tiny distill step
running off a quantized frozen tree."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from pcm_tpu.utils.quant import (
    QTensor,
    default_predicate,
    quantize,
    quantize_frozen,
    quantize_tree,
)


def test_quantize_roundtrip_per_channel():
    rng = np.random.RandomState(0)
    # wildly different per-channel magnitudes — per-tensor scales would fail
    w = rng.randn(64, 8).astype(np.float32) * np.logspace(-3, 2, 8)
    q = quantize(jnp.asarray(w))
    assert q.values.dtype == jnp.int8 and q.scale.shape == (1, 8)
    deq = np.asarray(q.astype(jnp.float32))
    rel = np.max(np.abs(deq - w) / (np.max(np.abs(w), axis=0, keepdims=True)))
    assert rel < 1 / 127 + 1e-6  # one quantization step per channel


def test_predicate_selects_kernels_only():
    tree = {
        "kernel": jnp.zeros((512, 512)),          # quantize
        "bias": jnp.zeros((512,)),                # keep
        "embedding": jnp.zeros((1000, 512)),      # keep (not named kernel)
        "norm": {"scale": jnp.zeros((512,))},     # keep
        "small": {"kernel": jnp.zeros((8, 8))},   # keep (< min_size)
    }
    q = quantize_tree(tree)
    assert isinstance(q["kernel"], QTensor)
    assert not isinstance(q["bias"], QTensor)
    assert not isinstance(q["embedding"], QTensor)
    assert not isinstance(q["norm"]["scale"], QTensor)
    assert not isinstance(q["small"]["kernel"], QTensor)


def test_quantize_frozen_skips_vae():
    frozen = {
        "unet": {"kernel": jnp.ones((300, 300))},
        "vae": {"kernel": jnp.ones((300, 300))},
    }
    q = quantize_frozen(frozen)
    assert isinstance(q["unet"]["kernel"], QTensor)
    assert not isinstance(q["vae"]["kernel"], QTensor)


@pytest.mark.slow
def test_distill_step_runs_with_int8_frozen():
    from tests.test_distill_step import _sd15_batch, _sd15_setup

    bundle, frozen, state, step = _sd15_setup()
    batch = _sd15_batch()
    rng = jax.random.PRNGKey(0)

    qfrozen = quantize_frozen(frozen, min_size=0)
    n_q = sum(
        isinstance(l, QTensor)
        for l in jax.tree.leaves(qfrozen, is_leaf=lambda l: isinstance(l, QTensor))
    )
    assert n_q > 10  # the tiny UNet + text kernels actually got quantized

    jstep = jax.jit(step)
    state_b, m_b = jstep(state, frozen, batch, rng)
    state_q, m_q = jstep(state, qfrozen, batch, rng)
    # same batch/rng: losses agree to int8-weight tolerance, params move
    assert np.isfinite(float(m_q["loss"]))
    assert abs(float(m_q["loss"]) - float(m_b["loss"])) < 0.25 * abs(float(m_b["loss"])) + 1e-3
    moved = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state_q.params, state.params
    )
    assert max(jax.tree.leaves(moved)) > 0


def test_quantize_stacked_per_depth_scales():
    """Scan-stacked dense kernels (depth, in, out) quantize with per-(depth,
    out) scales — each depth slice must equal the standalone quantization of
    that block's 2-D kernel (so the per-iteration slice inside lax.scan is
    exactly the unstacked QTensor)."""
    import numpy as np

    from pcm_tpu.utils.quant import default_predicate, quantize

    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(3, 16, 8) * np.asarray([0.1, 1.0, 10.0])[:, None, None],
                    jnp.float32)
    qs = quantize(w, stacked=True)
    assert qs.scale.shape == (3, 1, 8)
    for d in range(3):
        q2 = quantize(w[d])
        np.testing.assert_array_equal(np.asarray(qs.values[d]), np.asarray(q2.values))
        np.testing.assert_allclose(np.asarray(qs.scale[d]), np.asarray(q2.scale))

    # predicate accepts the stacked layout
    class P:
        key = "kernel"

    assert default_predicate((P(),), jnp.zeros((3, 512, 512)))
