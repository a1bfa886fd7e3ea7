"""Shape/grad/feature-capture tests for the diffusion backbones (tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcm_tpu.lora.layers import LoRASpec
from pcm_tpu.models.unet import (
    TINY_SDXL_CONFIG,
    TINY_UNET_CONFIG,
    UNet2DCondition,
)
from pcm_tpu.models.vae import TINY_VAE_CONFIG, AutoencoderKL

SD15_LORA_TARGETS = (
    "to_q", "to_k", "to_v", "to_out_0", "proj_in", "proj_out",
    "net_0_proj", "net_2", "conv1", "conv2", "conv_shortcut",
    "downsamplers_0/conv", "upsamplers_0/conv", "time_emb_proj",
)


@pytest.fixture(scope="module")
def tiny_unet():
    lora = LoRASpec(rank=4, targets=SD15_LORA_TARGETS)
    m = UNet2DCondition(TINY_UNET_CONFIG, lora=lora)
    x = jnp.ones((2, 16, 16, 4))
    t = jnp.asarray([10.0, 500.0])
    ctx = jnp.ones((2, 7, 32))
    vars_ = m.init(jax.random.PRNGKey(0), x, t, ctx)
    return m, vars_, (x, t, ctx)


def test_unet_forward_and_features(tiny_unet):
    m, vars_, (x, t, ctx) = tiny_unet
    out, feats = m.apply(vars_, x, t, ctx, mutable=["features"])
    assert out.shape == (2, 16, 16, 4)
    f = feats["features"]
    assert set(f.keys()) == {"down_0", "down_1", "mid", "up_0", "up_1"}


def test_unet_guidance_scale_conditioning():
    """LCM-style timestep_cond input (ref guidance_scale_embedding,
    `train_pcm_lora_sd15.py:211-237`): enabled via time_cond_proj_dim, it must
    change the output; a zero embedding must not."""
    import dataclasses

    from pcm_tpu.core.schedule import guidance_scale_embedding

    cfg = dataclasses.replace(TINY_UNET_CONFIG, time_cond_proj_dim=8)
    m = UNet2DCondition(cfg)
    x = jnp.ones((2, 16, 16, 4))
    t = jnp.asarray([10.0, 500.0])
    ctx = jnp.ones((2, 7, 32))
    w_emb = guidance_scale_embedding(jnp.asarray([4.0, 7.5]), 8)
    assert w_emb.shape == (2, 8)
    vars_ = m.init(jax.random.PRNGKey(0), x, t, ctx, timestep_cond=w_emb)
    out_w = m.apply(vars_, x, t, ctx, timestep_cond=w_emb)
    out_0 = m.apply(vars_, x, t, ctx, timestep_cond=jnp.zeros((2, 8)))
    out_none = m.apply(vars_, x, t, ctx)
    assert float(jnp.max(jnp.abs(out_w - out_0))) > 1e-6
    np.testing.assert_allclose(np.asarray(out_0), np.asarray(out_none), rtol=1e-5, atol=1e-5)


@pytest.mark.slow  # quick-tier budget: see docs/PERF.md 'Test suite budget'
def test_unet_lora_grads_nonzero_and_base_frozen(tiny_unet):
    m, vars_, (x, t, ctx) = tiny_unet

    def loss(lora_tree):
        return jnp.sum(m.apply({"params": vars_["params"], "lora": lora_tree}, x, t, ctx) ** 2)

    g = jax.grad(loss)(vars_["lora"])
    total = sum(float(jnp.sum(jnp.abs(v))) for v in jax.tree.leaves(g))
    assert total > 0
    # with zero-init B, dL/dA = x^T(dy B^T) = 0 but every B must receive grad
    for p, v in jax.tree_util.tree_leaves_with_path(g):
        s = float(jnp.sum(jnp.abs(v)))
        key = jax.tree_util.keystr(p)
        if key.endswith("['b']"):
            assert s > 0, f"zero grad for {key}"
        else:
            assert s == 0, f"unexpected nonzero A grad at init for {key}"


@pytest.mark.slow  # quick-tier budget: see docs/PERF.md 'Test suite budget'
def test_unet_remat_policy_equivalence(tiny_unet):
    """remat (any policy) must not change outputs or grads vs no remat."""
    m, vars_, (x, t, ctx) = tiny_unet

    def make(remat, policy, levels=None):
        mm = UNet2DCondition(
            TINY_UNET_CONFIG, lora=m.lora, remat=remat, remat_policy=policy,
            remat_levels=levels,
        )

        def loss(lora_params):
            out = mm.apply({"params": vars_["params"], "lora": lora_params}, x, t, ctx)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        return jax.jit(jax.value_and_grad(loss))

    base_l, base_g = make(False, None)(vars_["lora"])
    for policy, levels in (
        (None, None), ("dots", None), ("dots_small", None), (None, (True, False)),
    ):
        l, g = make(True, policy, levels)(vars_["lora"])
        np.testing.assert_allclose(float(l), float(base_l), rtol=1e-5)
        # recompute reorders fp reductions; tolerance covers fusion jitter
        # (observed flake: 1/128 grad elements at rel 7.6e-3 on the CPU
        # backend when recompute changes which ops fuse)
        for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(base_g)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-2, atol=1e-4)


@pytest.mark.slow  # quick-tier budget: see docs/PERF.md 'Test suite budget'
def test_unet_remat_block_granularity_equivalence(tiny_unet):
    """Per-transformer-block checkpointing ("block" granularity) must be
    param-structure-compatible with module granularity and change neither
    outputs nor grads — it only moves the remat boundary (models/unet.py)."""
    m, vars_, (x, t, ctx) = tiny_unet

    def make(gran, policy="dots_small"):
        mm = UNet2DCondition(
            TINY_UNET_CONFIG, lora=m.lora, remat=True, remat_policy=policy,
            remat_granularity=gran,
        )

        def loss(lora_params):
            out = mm.apply({"params": vars_["params"], "lora": lora_params}, x, t, ctx)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        return jax.jit(jax.value_and_grad(loss))

    base_l, base_g = make("module")(vars_["lora"])
    for policy in (None, "dots_small", "dots8m"):
        l, g = make("block", policy)(vars_["lora"])
        np.testing.assert_allclose(float(l), float(base_l), rtol=1e-5)
        # recompute reorders fp reductions; tolerance covers fusion jitter
        # (observed flake: 1/128 grad elements at rel 7.6e-3 on the CPU
        # backend when recompute changes which ops fuse)
        for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(base_g)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-2, atol=1e-4)


def test_unet_teacher_student_share_params(tiny_unet):
    m, vars_, (x, t, ctx) = tiny_unet
    out_student = m.apply(vars_, x, t, ctx)
    teacher = UNet2DCondition(TINY_UNET_CONFIG)
    out_teacher = teacher.apply({"params": vars_["params"]}, x, t, ctx)
    # B factors start at zero -> identical outputs (up to fused/unfused gelu path)
    np.testing.assert_allclose(
        np.asarray(out_teacher), np.asarray(out_student), rtol=1e-4, atol=1e-4
    )


def test_sdxl_unet_conditioning():
    m = UNet2DCondition(TINY_SDXL_CONFIG)
    x = jnp.ones((2, 16, 16, 4))
    t = jnp.asarray([10.0, 500.0])
    ctx = jnp.ones((2, 7, 32))
    added = {"text_embeds": jnp.ones((2, 32)), "time_ids": jnp.ones((2, 6))}
    vars_ = m.init(jax.random.PRNGKey(0), x, t, ctx, added)
    out = m.apply(vars_, x, t, ctx, added)
    assert out.shape == (2, 16, 16, 4)
    # micro-conditioning must influence the output
    added2 = {"text_embeds": 2.0 + jnp.ones((2, 32)), "time_ids": jnp.ones((2, 6))}
    out2 = m.apply(vars_, x, t, ctx, added2)
    assert float(jnp.max(jnp.abs(out - out2))) > 1e-6


def test_vae_encode_chunked_matches_per_sample():
    """_encode_chunked(chunk=1) == encoding each sample with its split key —
    the memory-bounding path used at 1024px bs>=2 (docs/PERF.md)."""
    from pcm_tpu.train.bundles import _encode_chunked

    m = AutoencoderKL(TINY_VAE_CONFIG)
    x = jnp.asarray(np.random.RandomState(0).rand(4, 32, 32, 3), jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x[:1])
    rng = jax.random.PRNGKey(7)
    chunked = _encode_chunked(m, vars_["params"], x, rng, chunk=1)
    keys = jax.random.split(rng, 4)
    direct = jnp.concatenate([
        m.apply(vars_, x[i : i + 1], keys[i], method=AutoencoderKL.encode)
        for i in range(4)
    ])
    # same math, but lax.map fuses differently than eager per-sample calls
    np.testing.assert_allclose(
        np.asarray(chunked), np.asarray(direct), rtol=1e-5, atol=1e-6
    )
    # chunk >= batch (and 0/None) short-circuits to the single-call path
    whole = _encode_chunked(m, vars_["params"], x, rng, chunk=0)
    np.testing.assert_array_equal(
        np.asarray(whole),
        np.asarray(m.apply(vars_, x, rng, method=AutoencoderKL.encode)),
    )
    # ragged batch: head map (one chunk of 3) + unchunked tail of 1, matching
    # the reference's ragged last VAE slice (sd15 train:1128-1133)
    ragged = _encode_chunked(m, vars_["params"], x, rng, chunk=3)
    k2 = jax.random.split(rng, 2)
    direct_ragged = jnp.concatenate([
        m.apply(vars_, x[:3], k2[0], method=AutoencoderKL.encode),
        m.apply(vars_, x[3:], k2[1], method=AutoencoderKL.encode),
    ])
    np.testing.assert_allclose(
        np.asarray(ragged), np.asarray(direct_ragged), rtol=1e-5, atol=1e-6
    )


def test_vae_encode_chunked_shards_interleaves():
    """With shards=S the chunk is per-shard: each map iteration encodes one
    sample from EVERY shard's slice (so no data-parallel device idles), and
    the output lands back in original batch order."""
    from pcm_tpu.train.bundles import _encode_chunked

    m = AutoencoderKL(TINY_VAE_CONFIG)
    x = jnp.asarray(np.random.RandomState(1).rand(4, 32, 32, 3), jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x[:1])
    rng = jax.random.PRNGKey(3)
    out = _encode_chunked(m, vars_["params"], x, rng, chunk=1, shards=2)
    # iteration i encodes original indices [i, per+i] = [i, 2+i] together
    keys = jax.random.split(rng, 2)
    rows = [
        m.apply(vars_, jnp.stack([x[i], x[2 + i]]), keys[i],
                method=AutoencoderKL.encode)
        for i in range(2)
    ]
    direct = jnp.stack([rows[0][0], rows[1][0], rows[0][1], rows[1][1]])
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(direct), rtol=1e-5, atol=1e-6
    )
    # batch not alignable with the shard count -> global-chunk fallback
    x3 = x[:3]
    fb = _encode_chunked(m, vars_["params"], x3, rng, chunk=1, shards=2)
    np.testing.assert_allclose(
        np.asarray(fb),
        np.asarray(_encode_chunked(m, vars_["params"], x3, rng, chunk=2)),
        rtol=1e-5, atol=1e-6,
    )


def test_vae_roundtrip_shapes():
    m = AutoencoderKL(TINY_VAE_CONFIG)
    x = jnp.ones((1, 32, 32, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    z = m.apply(vars_, x, method=AutoencoderKL.encode)
    assert z.shape == (1, 16, 16, 4)
    # stochastic sample differs from mode
    z2 = m.apply(vars_, x, jax.random.PRNGKey(1), method=AutoencoderKL.encode)
    assert float(jnp.max(jnp.abs(z - z2))) > 0
    rec = m.apply(vars_, z, method=AutoencoderKL.decode)
    assert rec.shape == (1, 32, 32, 3)


def test_mmdit_forward_features_lora():
    from pcm_tpu.models.mmdit import (
        MMDiT,
        SD3_ADV_LORA_TARGETS,
        TINY_MMDIT_CONFIG,
    )

    lora = LoRASpec(rank=4, targets=SD3_ADV_LORA_TARGETS)
    m = MMDiT(TINY_MMDIT_CONFIG, lora=lora)
    x = jnp.ones((2, 16, 16, 4))
    t = jnp.asarray([10.0, 700.0])
    ctx = jnp.ones((2, 10, 32))
    pooled = jnp.ones((2, 32))
    vars_ = m.init(jax.random.PRNGKey(0), x, t, ctx, pooled)
    out, feats = m.apply(vars_, x, t, ctx, pooled, mutable=["features"])
    assert out.shape == (2, 16, 16, 4)
    assert set(feats["features"].keys()) == {"block_0", "block_1"}
    # image-token features: (N, (H/p)*(W/p), inner)
    assert feats["features"]["block_0"][0].shape == (2, 64, 32)

    def loss(l):
        return jnp.sum(m.apply({"params": vars_["params"], "lora": l}, x, t, ctx, pooled) ** 2)

    g = jax.grad(loss)(vars_["lora"])
    n_checked = 0
    for p, v in jax.tree_util.tree_leaves_with_path(g):
        key = jax.tree_util.keystr(p)
        if not key.endswith("['b']"):
            continue
        # the final (context_pre_only) block discards the context attention
        # output, so its add_q_proj is structurally dead — same as diffusers
        if "transformer_blocks_1" in key and "add_q_proj" in key:
            continue
        n_checked += 1
        assert float(jnp.sum(jnp.abs(v))) > 0, f"zero grad for {key}"
    assert n_checked > 10


def test_unet_scan_blocks_equivalence():
    """scan_blocks (lax.scan over each Transformer2D's block stack) must
    reproduce the unrolled forward and LoRA grads exactly, given the
    unrolled params restacked into the scan layout
    (`transformer_blocks_{i}/...` -> `blocks_scan/block/...` with a leading
    depth axis). The scan layout exists to shrink the SDXL-1024 step's MLIR
    below the axon compile helper's kill threshold (docs/ROUND5_NOTES.md)."""
    import dataclasses

    from flax import traverse_util

    from pcm_tpu.models.unet import TINY_SDXL_CONFIG

    cfg = dataclasses.replace(TINY_SDXL_CONFIG, transformer_depth=(2, 3))
    lora = LoRASpec(rank=2, alpha=4.0, targets=("to_q", "to_v", "net_0_proj"))
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4), jnp.float32)
    t = jnp.asarray([10.0, 500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 32), jnp.float32)
    added = {
        "text_embeds": jnp.zeros((2, 32), jnp.float32),
        "time_ids": jnp.zeros((2, 6), jnp.float32),
    }

    base = UNet2DCondition(cfg, lora=lora)
    bvars = base.init(rng, x, t, ctx, added_cond=added)
    scanned = UNet2DCondition(cfg, lora=lora, scan_blocks=True)
    svars = scanned.init(rng, x, t, ctx, added_cond=added)

    def restack(base_tree, scan_tree):
        flat_b = traverse_util.flatten_dict(base_tree)
        flat_s = traverse_util.flatten_dict(scan_tree)
        out = {}
        for path in flat_s:
            if "blocks_scan" in path:
                i = path.index("blocks_scan")
                depth = flat_s[path].shape[0]
                stacked = [
                    flat_b[path[:i] + (f"transformer_blocks_{d}",) + path[i + 2:]]
                    for d in range(depth)
                ]
                out[path] = jnp.stack(stacked)
            else:
                out[path] = flat_b[path]
        return traverse_util.unflatten_dict(out)

    sparams = restack(bvars["params"], svars["params"])
    slora = restack(bvars["lora"], svars["lora"])

    def loss(mod, variables, lora_params):
        out = mod.apply(
            {"params": variables, "lora": lora_params}, x, t, ctx, added_cond=added
        )
        return jnp.sum(out.astype(jnp.float32) ** 2)

    bl, bg = jax.jit(lambda lp: jax.value_and_grad(
        lambda q: loss(base, bvars["params"], q))(lp))(bvars["lora"])
    sl, sg = jax.jit(lambda lp: jax.value_and_grad(
        lambda q: loss(scanned, sparams, q))(lp))(slora)

    np.testing.assert_allclose(float(sl), float(bl), rtol=1e-5)
    # compare grads leaf-by-leaf through the same restack mapping
    sg_expected = restack(bg, sg)
    for a, b in zip(jax.tree.leaves(sg_expected), jax.tree.leaves(sg)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-2, atol=1e-4)

    # remat inside the scan body must not change anything either
    scanned_r = UNet2DCondition(
        cfg, lora=lora, scan_blocks=True, remat=True, remat_policy="dots_small"
    )
    rl, rg = jax.jit(lambda lp: jax.value_and_grad(
        lambda q: loss(scanned_r, sparams, q))(lp))(slora)
    np.testing.assert_allclose(float(rl), float(bl), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(rg), jax.tree.leaves(sg)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-2, atol=1e-4)
