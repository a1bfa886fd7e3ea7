"""On-device benchmark weight init (utils/deviceinit.py) mirrors the host
init_frozen_fast fill rules: same treedef, shapes, dtypes, and the same
ones/zeros placement (norm scales, biases, LoRA-B). Values differ (independent
per-leaf fold_in streams vs one sequential host rng) by design — only the
synthetic benchmark loss depends on them."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcm_tpu.configs.families import sd15_bundle
from pcm_tpu.train.bundles import init_frozen_fast
from pcm_tpu.utils.deviceinit import build_device_init


@pytest.fixture(scope="module")
def bundle():
    return sd15_bundle(lora_rank=4, tiny=True)


def _flat(tree):
    return jax.tree_util.tree_flatten_with_path(tree)


@pytest.mark.slow  # quick-tier budget: see docs/PERF.md 'Test suite budget'
def test_structure_matches_host_init(bundle):
    hf, hl = init_frozen_fast(bundle, seed=0)
    gen = build_device_init(bundle)
    df, dl = jax.jit(gen)(jax.random.PRNGKey(0))

    for (host, dev) in ((hf, df), (hl, dl)):
        (hleaves, htd), (dleaves, dtd) = _flat(host), _flat(dev)
        assert htd == dtd
        for (hp, ha), (dp, da) in zip(hleaves, dleaves):
            assert hp == dp
            assert np.asarray(ha).shape == da.shape, jax.tree_util.keystr(hp)
            assert np.asarray(ha).dtype == da.dtype, jax.tree_util.keystr(hp)
            # ones/zeros rules (scale/bias/LoRA-B) must agree exactly
            h = np.asarray(ha, np.float32)
            d = np.asarray(da, np.float32)
            if (h == 1).all() or (h == 0).all():
                np.testing.assert_array_equal(h, d, err_msg=jax.tree_util.keystr(hp))


@pytest.mark.slow  # quick-tier budget: see docs/PERF.md 'Test suite budget'
def test_normal_leaves_have_fan_in_scale(bundle):
    gen = build_device_init(bundle)
    frozen, _ = jax.jit(gen)(jax.random.PRNGKey(0))
    checked = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(frozen)[0]:
        arr = np.asarray(leaf, np.float32)
        if arr.ndim < 2 or arr.size < 4096 or (arr == 0).all() or (arr == 1).all():
            continue
        fan_in = int(np.prod(arr.shape[:-1]))
        np.testing.assert_allclose(arr.std(), fan_in ** -0.5, rtol=0.15,
                                   err_msg=jax.tree_util.keystr(path))
        checked += 1
    assert checked >= 5


@pytest.mark.slow  # quick-tier budget: see docs/PERF.md 'Test suite budget'
def test_int8_variant_quantizes_frozen(bundle):
    from pcm_tpu.utils.quant import QTensor

    gen = build_device_init(bundle, weights="int8")
    frozen, lora = jax.jit(gen)(jax.random.PRNGKey(0))
    q = [x for x in jax.tree_util.tree_leaves(
        frozen, is_leaf=lambda x: isinstance(x, QTensor)) if isinstance(x, QTensor)]
    assert q, "int8 init produced no QTensors"
    # lora masters stay fp32
    assert all(l.dtype == jnp.float32 for l in jax.tree_util.tree_leaves(lora))
