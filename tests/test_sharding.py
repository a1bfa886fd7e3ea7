"""Sharding-layer tests on the 8-virtual-device CPU mesh."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from pcm_tpu.parallel.mesh import (
    batch_sharding,
    fsdp_sharding,
    make_mesh,
    replicate,
    shard_batch,
    shard_fsdp,
)


def test_mesh_shapes():
    mesh = make_mesh(data=4, fsdp=2)
    assert dict(mesh.shape) == {"data": 4, "fsdp": 2}
    mesh = make_mesh()  # all devices on data
    assert mesh.shape["data"] == 8 and mesh.shape["fsdp"] == 1


def test_shard_batch_and_replicate():
    mesh = make_mesh(data=8)
    batch = {"x": jnp.arange(16.0).reshape(16, 1)}
    sb = shard_batch(batch, mesh)
    assert sb["x"].sharding.spec == batch_sharding(mesh).spec
    # each device holds 2 rows
    assert len(sb["x"].addressable_shards) == 8
    assert sb["x"].addressable_shards[0].data.shape == (2, 1)

    tree = {"w": jnp.ones((4, 4))}
    rt = replicate(tree, mesh)
    assert rt["w"].addressable_shards[0].data.shape == (4, 4)


def test_fsdp_sharding_picks_divisible_axis():
    mesh = make_mesh(data=4, fsdp=2)
    tree = {
        "big": jnp.ones((640, 512)),   # shard axis 0 (largest, divisible)
        "odd": jnp.ones((641, 3)),     # nothing divisible -> replicated
        "tiny": jnp.ones((4,)),        # below min_size -> replicated
    }
    specs = fsdp_sharding(mesh, tree, min_size=2**10)
    assert specs["big"].spec == jax.sharding.PartitionSpec("fsdp", None)
    assert specs["odd"].spec == jax.sharding.PartitionSpec()
    assert specs["tiny"].spec == jax.sharding.PartitionSpec()

    st = shard_fsdp(tree, mesh, min_size=2**10)
    assert st["big"].addressable_shards[0].data.shape[0] == 320


def test_fsdp_matmul_correctness():
    """A matmul with FSDP-sharded weights equals the unsharded result (XLA
    all-gathers automatically under jit)."""
    mesh = make_mesh(data=4, fsdp=2)
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(256, 128), jnp.float32)
    x = jnp.asarray(rng.randn(16, 256), jnp.float32)
    expect = x @ w
    ws = shard_fsdp({"w": w}, mesh, min_size=2**10)["w"]
    xs = shard_batch(x, mesh)
    out = jax.jit(lambda a, b: a @ b)(xs, ws)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_fsdp_sharded_qtensor_distill_step():
    """int8 frozen weights (utils/quant.py QTensor) compose with FSDP
    sharding: values shard over 'fsdp', scales replicate, and the tiny SD1.5
    distill step runs on a (data=4, fsdp=2) mesh."""
    from pcm_tpu.utils.quant import QTensor, quantize_frozen
    from tests.test_distill_step import _sd15_batch, _sd15_setup

    bundle, frozen, state, step = _sd15_setup()
    qfrozen = quantize_frozen(frozen, min_size=1024)
    mesh = make_mesh(data=4, fsdp=2)
    qfrozen_s = shard_fsdp(qfrozen, mesh, min_size=1024)
    state_s = replicate(state, mesh)
    batch = shard_batch(_sd15_batch(8), mesh)

    # at least one QTensor's int8 values actually got split over fsdp
    qts = [
        l for l in jax.tree.leaves(
            qfrozen_s, is_leaf=lambda l: isinstance(l, QTensor))
        if isinstance(l, QTensor)
    ]
    assert qts
    assert any(
        not s.is_fully_replicated
        for q in qts
        for s in [q.values.sharding]
    )

    new_state, metrics = jax.jit(step)(state_s, qfrozen_s, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_fsdp_sharded_int8_matmul_distill_step():
    """The int8-MXU compute path (activation quant + int8 dot, utils/quant.py
    `int8_matmul`) composes with FSDP-sharded QTensor weights on the mesh and
    matches the dequantized bf16 path's loss closely."""
    from pcm_tpu.utils.quant import int8_matmul, quantize_frozen
    from tests.test_distill_step import _sd15_batch, _sd15_setup

    bundle, frozen, state, step = _sd15_setup()
    qfrozen = quantize_frozen(frozen, min_size=1024)
    mesh = make_mesh(data=4, fsdp=2)
    qfrozen_s = shard_fsdp(qfrozen, mesh, min_size=1024)
    state_s = replicate(state, mesh)
    batch = shard_batch(_sd15_batch(8), mesh)
    rng = jax.random.PRNGKey(0)

    _, m_ref = jax.jit(step)(state_s, qfrozen_s, batch, rng)
    with int8_matmul():
        _, m_i8 = jax.jit(step).lower(state_s, qfrozen_s, batch, rng).compile()(
            state_s, qfrozen_s, batch, rng
        )
    ref, i8 = float(m_ref["loss"]), float(m_i8["loss"])
    assert np.isfinite(i8)
    assert abs(i8 - ref) / max(abs(ref), 1e-8) < 0.05, (ref, i8)
