"""Tests for the disk pytree cache that makes bench.py's init fast.

This path is load-bearing for the driver benchmark (round-1 post-mortem:
1607 s of host init timed out the run) — a silent regression here would
re-break the round gate, so round-trip fidelity and the rebuild-on-corruption
fallback get explicit coverage.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcm_tpu.utils.treecache import load_or_build, load_tree, save_tree


def _tree():
    return {
        "dense": {"kernel": np.arange(12, dtype=np.float32).reshape(3, 4)},
        "emb": jnp.asarray(np.random.RandomState(0).randn(5, 2), jnp.bfloat16),
        "step": np.int32(7),
    }


def _assert_trees_equal(a, b):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    for x, y in zip(la, lb):
        assert str(np.asarray(x).dtype) == str(np.asarray(y).dtype)
        np.testing.assert_array_equal(
            np.asarray(x, np.float32), np.asarray(y, np.float32)
        )


def test_save_load_roundtrip(tmp_path):
    d = str(tmp_path / "cache")
    tree = _tree()
    save_tree(d, tree)
    out = load_tree(d)
    _assert_trees_equal(tree, out)
    # memmapped leaves feed device_put directly
    assert isinstance(np.asarray(out["dense"]["kernel"]), np.ndarray)


def test_qtensor_leaves_roundtrip(tmp_path):
    """int8 QTensor leaves (the bench.py int8-weights tree) survive the cache."""
    from pcm_tpu.utils.quant import quantize

    q = quantize(jnp.asarray(np.random.RandomState(1).randn(16, 8), jnp.bfloat16))
    d = str(tmp_path / "qcache")
    save_tree(d, {"w": q})
    out = load_tree(d)["w"]
    np.testing.assert_array_equal(np.asarray(out.values), np.asarray(q.values))
    np.testing.assert_allclose(
        np.asarray(out.scale, np.float32), np.asarray(q.scale, np.float32)
    )


def test_load_or_build_hit_miss_and_corruption(tmp_path):
    d = str(tmp_path / "c")
    calls = []

    def build():
        calls.append(1)
        return _tree()

    t1 = load_or_build(d, build, verbose=False)  # miss -> build + save
    t2 = load_or_build(d, build, verbose=False)  # hit -> no build
    assert len(calls) == 1
    _assert_trees_equal(t1, t2)

    # corrupt the metadata: must fall back to a rebuild, not crash
    with open(os.path.join(d, "meta.pkl"), "wb") as f:
        f.write(b"garbage")
    t3 = load_or_build(d, build, verbose=False)
    assert len(calls) == 2
    _assert_trees_equal(t1, t3)


def test_format_version_mismatch_rebuilds(tmp_path, monkeypatch):
    import pcm_tpu.utils.treecache as tc

    d = str(tmp_path / "v")
    save_tree(d, _tree())
    monkeypatch.setattr(tc, "_FORMAT_VERSION", 2)
    with pytest.raises(ValueError):
        load_tree(d)
    built = tc.load_or_build(d, _tree, verbose=False)  # version mismatch -> rebuild
    _assert_trees_equal(built, _tree())
