"""Adversarial (hinge-GAN) distillation step tests on tiny models."""

import dataclasses

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from pcm_tpu.core import make_ddpm_schedule, make_flow_schedule
from pcm_tpu.lora.layers import LoRASpec
from pcm_tpu.models.clip import CLIPTextConfig
from pcm_tpu.models.mmdit import SD3_LORA_TARGETS, TINY_MMDIT_CONFIG
from pcm_tpu.models.t5 import TINY_T5_CONFIG
from pcm_tpu.models.unet import TINY_UNET_CONFIG
from pcm_tpu.models.vae import TINY_VAE_CONFIG
from pcm_tpu.train.adv import (
    AdvConfig,
    Discriminator,
    DiscriminatorConfig,
    build_ddim_adv_steps,
    build_flow_adv_steps,
    init_discriminator,
)
from pcm_tpu.train.bundles import SD15Bundle, SD3Bundle, SD_UNET_LORA_TARGETS
from pcm_tpu.train.distill import DistillConfig
from pcm_tpu.train.state import TrainState, make_optimizer

IMG = 32


@pytest.mark.slow
def test_sd15_adv_steps():
    text_cfg = CLIPTextConfig(
        vocab_size=1000, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, projection_dim=None,
    )
    bundle = SD15Bundle(
        unet_cfg=TINY_UNET_CONFIG, vae_cfg=TINY_VAE_CONFIG, text_cfg=text_cfg,
        lora=LoRASpec(rank=4, targets=SD_UNET_LORA_TARGETS), dtype=jnp.float32,
    )
    frozen, lora = bundle.init(jax.random.PRNGKey(0), IMG)

    # tiny UNet has 2 levels -> taps down_0, down_1, mid, up_0, up_1
    disc_cfg = DiscriminatorConfig(
        taps=("down_0", "down_1", "mid", "up_0", "up_1"), num_h_per_head=2, kernel=3
    )
    disc = Discriminator(disc_cfg)
    rng = np.random.RandomState(0)
    bsz = 2
    batch = {
        "pixel_values": jnp.asarray(rng.rand(bsz, IMG, IMG, 3) * 2 - 1, jnp.float32),
        "input_ids": jnp.asarray(rng.randint(1, 999, size=(bsz, 16))),
        "uncond_embeds": jnp.zeros((bsz, 16, 32)),
    }
    cond = bundle.encode_prompts(frozen, batch["input_ids"])
    d_params = init_discriminator(disc, bundle, frozen, jax.random.PRNGKey(2), 16, cond)

    tx_g = make_optimizer(1e-3)
    tx_d = make_optimizer(1e-3, b1=0.0)  # ref disc Adam beta=(0, 0.999)
    g_state = TrainState.create(lora, tx_g)
    d_state = TrainState.create(d_params, tx_d)
    cfg = DistillConfig(num_solver_steps=10, multiphase=2)
    g_step, d_step = build_ddim_adv_steps(
        bundle, make_ddpm_schedule(), cfg, AdvConfig(0.1), disc, tx_g, tx_d
    )

    d_state2, dm = jax.jit(d_step)(g_state, d_state, frozen, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(dm["d_loss"]))
    moved = [
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree.leaves(d_state.params), jax.tree.leaves(d_state2.params))
    ]
    assert max(moved) > 0

    g_state2, gm = jax.jit(g_step)(g_state, d_state2, frozen, batch, jax.random.PRNGKey(1))
    for k in ("loss", "loss_cm", "g_loss"):
        assert np.isfinite(float(gm[k])), k
    moved = [
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree.leaves(g_state.params), jax.tree.leaves(g_state2.params))
    ]
    assert max(moved) > 0


def test_sd15_adv_steps_cached_latents():
    """Adv G/D steps off a cached-latents batch with the VAE/text towers
    DROPPED from the frozen tree (empty subtrees) — the bench.py / train-CLI
    cached-latents production path. encode() must branch on the batch keys
    and the traced steps must never touch frozen['vae']/['text']."""
    text_cfg = CLIPTextConfig(
        vocab_size=1000, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, projection_dim=None,
    )
    bundle = SD15Bundle(
        unet_cfg=TINY_UNET_CONFIG, vae_cfg=TINY_VAE_CONFIG, text_cfg=text_cfg,
        lora=LoRASpec(rank=4, targets=SD_UNET_LORA_TARGETS), dtype=jnp.float32,
    )
    frozen, lora = bundle.init(jax.random.PRNGKey(0), IMG)

    disc_cfg = DiscriminatorConfig(
        taps=("down_0", "down_1", "mid", "up_0", "up_1"), num_h_per_head=2, kernel=3
    )
    disc = Discriminator(disc_cfg)
    rng = np.random.RandomState(0)
    bsz = 2
    ids = jnp.asarray(rng.randint(1, 999, size=(bsz, 16)))
    cond = bundle.encode_prompts(frozen, ids)
    d_params = init_discriminator(disc, bundle, frozen, jax.random.PRNGKey(2), IMG // 2, cond)

    batch = {
        "latents": jnp.asarray(
            rng.randn(bsz, IMG // 2, IMG // 2, TINY_UNET_CONFIG.in_channels),
            jnp.float32,
        ),
        "prompt_embeds": cond["prompt_embeds"],
        "uncond_embeds": jnp.zeros((bsz, 16, 32)),
    }
    frozen_cached = dict(frozen)
    frozen_cached["vae"] = ()
    frozen_cached["text"] = ()

    tx_g = make_optimizer(1e-3)
    tx_d = make_optimizer(1e-3, b1=0.0)
    g_state = TrainState.create(lora, tx_g)
    d_state = TrainState.create(d_params, tx_d)
    cfg = DistillConfig(num_solver_steps=10, multiphase=2)
    g_step, d_step = build_ddim_adv_steps(
        bundle, make_ddpm_schedule(), cfg, AdvConfig(0.1), disc, tx_g, tx_d
    )

    d_state2, dm = jax.jit(d_step)(g_state, d_state, frozen_cached, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(dm["d_loss"]))
    g_state2, gm = jax.jit(g_step)(g_state, d_state2, frozen_cached, batch, jax.random.PRNGKey(1))
    for k in ("loss", "loss_cm", "g_loss"):
        assert np.isfinite(float(gm[k])), k
    moved = [
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree.leaves(g_state.params), jax.tree.leaves(g_state2.params))
    ]
    assert max(moved) > 0

    # identical math to the full-tree call: cached keys shadow the encoders,
    # so the dropped towers change nothing
    d_ref, dm_ref = jax.jit(d_step)(g_state, d_state, frozen, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(dm_ref["d_loss"]), float(dm["d_loss"]), rtol=1e-6)


@pytest.mark.slow
def test_sd3_adv_steps():
    clip_sd3 = CLIPTextConfig(
        vocab_size=1000, hidden_size=16, num_layers=2, num_heads=2,
        intermediate_size=32, projection_dim=16,
    )
    t5_cfg = dataclasses.replace(TINY_T5_CONFIG, d_model=32, d_kv=8, d_ff=64)
    bundle = SD3Bundle(
        mmdit_cfg=TINY_MMDIT_CONFIG, vae_cfg=TINY_VAE_CONFIG,
        text_cfg=clip_sd3, text2_cfg=clip_sd3, t5_cfg=t5_cfg,
        lora=LoRASpec(rank=4, targets=SD3_LORA_TARGETS), dtype=jnp.float32,
    )
    frozen, lora = bundle.init(jax.random.PRNGKey(0), IMG, seq_len=8)

    disc_cfg = DiscriminatorConfig(taps=("block_0", "block_1"), num_h_per_head=1, kernel=1)
    disc = Discriminator(disc_cfg)
    rng = np.random.RandomState(0)
    bsz = 2
    batch = {
        "pixel_values": jnp.asarray(rng.rand(bsz, IMG, IMG, 3) * 2 - 1, jnp.float32),
        "input_ids": jnp.asarray(rng.randint(1, 999, size=(bsz, 8))),
        "input_ids_2": jnp.asarray(rng.randint(1, 999, size=(bsz, 8))),
        "input_ids_3": jnp.asarray(rng.randint(0, 999, size=(bsz, 8))),
        "uncond_embeds": jnp.zeros((bsz, 16, 32)),
        "uncond_pooled": jnp.zeros((bsz, 32)),
    }
    cond = bundle.encode_prompts(
        frozen, batch["input_ids"], batch["input_ids_2"], batch["input_ids_3"]
    )
    d_params = init_discriminator(disc, bundle, frozen, jax.random.PRNGKey(2), 16, cond)

    tx_g = make_optimizer(1e-3)
    tx_d = make_optimizer(1e-3, b1=0.0)
    g_state = TrainState.create(lora, tx_g)
    d_state = TrainState.create(d_params, tx_d)
    cfg = DistillConfig(num_solver_steps=10, multiphase=2, fixed_w=3.0)
    g_step, d_step = build_flow_adv_steps(
        bundle, make_flow_schedule(shift=3.0), cfg, AdvConfig(0.1), disc, tx_g, tx_d
    )

    d_state2, dm = jax.jit(d_step)(g_state, d_state, frozen, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(dm["d_loss"]))
    g_state2, gm = jax.jit(g_step)(g_state, d_state2, frozen, batch, jax.random.PRNGKey(1))
    for k in ("loss", "loss_cm", "g_loss"):
        assert np.isfinite(float(gm[k])), k


@pytest.mark.slow
def test_sdxl_adv_steps_stop_after_mid():
    """SDXL adversarial: down+mid-only discriminator taps trigger the UNet's
    stop_after_mid early-exit feature mode (`discriminator_sdxl.py:311`
    returns before the up blocks); dual text encoders + time_ids threaded
    through both D and G steps."""
    from pcm_tpu.models.unet import TINY_SDXL_CONFIG
    from pcm_tpu.train.bundles import SDXLBundle

    text_cfg = CLIPTextConfig(
        vocab_size=1000, hidden_size=16, num_layers=2, num_heads=2,
        intermediate_size=32, projection_dim=None,
    )
    text2_cfg = CLIPTextConfig(
        vocab_size=1000, hidden_size=16, num_layers=2, num_heads=2,
        intermediate_size=32, projection_dim=32,
    )
    bundle = SDXLBundle(
        unet_cfg=TINY_SDXL_CONFIG, vae_cfg=TINY_VAE_CONFIG,
        text_cfg=text_cfg, text2_cfg=text2_cfg,
        lora=LoRASpec(rank=4, targets=SD_UNET_LORA_TARGETS), dtype=jnp.float32,
    )
    frozen, lora = bundle.init(jax.random.PRNGKey(0), IMG, seq_len=16)

    disc_cfg = DiscriminatorConfig(
        taps=("down_0", "down_1", "mid"), num_h_per_head=1, kernel=1
    )
    disc = Discriminator(disc_cfg)
    rng = np.random.RandomState(0)
    bsz = 2
    batch = {
        "pixel_values": jnp.asarray(rng.rand(bsz, IMG, IMG, 3) * 2 - 1, jnp.float32),
        "input_ids": jnp.asarray(rng.randint(1, 999, size=(bsz, 16))),
        "input_ids_2": jnp.asarray(rng.randint(1, 999, size=(bsz, 16))),
        "time_ids": jnp.tile(
            jnp.asarray([[IMG, IMG, 0, 0, IMG, IMG]], jnp.float32), (bsz, 1)
        ),
    }
    cond = bundle.encode_prompts(
        frozen, batch["input_ids"], batch["input_ids_2"], batch["time_ids"]
    )
    d_params = init_discriminator(disc, bundle, frozen, jax.random.PRNGKey(2), 16, cond)

    tx_g = make_optimizer(1e-3)
    tx_d = make_optimizer(1e-3, b1=0.0)
    g_state = TrainState.create(lora, tx_g)
    d_state = TrainState.create(d_params, tx_d)
    cfg = DistillConfig(num_solver_steps=10, multiphase=4, w_min=6, w_max=7)
    g_step, d_step = build_ddim_adv_steps(
        bundle, make_ddpm_schedule(), cfg, AdvConfig(0.1), disc, tx_g, tx_d
    )

    d_state2, dm = jax.jit(d_step)(g_state, d_state, frozen, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(dm["d_loss"]))
    g_state2, gm = jax.jit(g_step)(g_state, d_state2, frozen, batch, jax.random.PRNGKey(1))
    for k in ("loss", "loss_cm", "g_loss"):
        assert np.isfinite(float(gm[k])), k
    moved = [
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree.leaves(g_state.params), jax.tree.leaves(g_state2.params))
    ]
    assert max(moved) > 0


@pytest.mark.slow
def test_disc_init_from_eval_shape_matches_real_forward():
    """bench.py --mode adv initializes discriminator heads from an
    eval_shape feature pass (no real teacher forward); param tree must match
    init_discriminator's real-forward structure exactly."""
    text_cfg = CLIPTextConfig(
        vocab_size=1000, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, projection_dim=None,
    )
    bundle = SD15Bundle(
        unet_cfg=TINY_UNET_CONFIG, vae_cfg=TINY_VAE_CONFIG, text_cfg=text_cfg,
        lora=LoRASpec(rank=4, targets=SD_UNET_LORA_TARGETS), dtype=jnp.float32,
    )
    frozen, _ = bundle.init(jax.random.PRNGKey(0), IMG)
    disc_cfg = DiscriminatorConfig(
        taps=("down_0", "down_1", "mid", "up_0", "up_1"), num_h_per_head=2, kernel=3
    )
    disc = Discriminator(disc_cfg)
    cond = bundle.encode_prompts(frozen, jnp.ones((1, 16), jnp.int32))
    real = init_discriminator(disc, bundle, frozen, jax.random.PRNGKey(2), 16, cond)

    feat_shapes = jax.eval_shape(
        lambda: bundle.teacher_features(
            frozen, jnp.zeros((1, 16, 16, 4), jnp.float32), jnp.zeros((1,)), cond
        )
    )
    feats0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), feat_shapes)
    from_shapes = jax.jit(disc.init)(jax.random.PRNGKey(2), feats0)["params"]

    assert jax.tree_util.tree_structure(real) == jax.tree_util.tree_structure(from_shapes)
    for a, b in zip(jax.tree.leaves(real), jax.tree.leaves(from_shapes)):
        assert a.shape == b.shape and a.dtype == b.dtype


@pytest.mark.slow
def test_split_d_matches_monolithic_d_step():
    """build_ddim_adv_d_split (two small graphs) must produce bit-identical
    D updates to build_ddim_adv_steps' monolithic d_step for the same rng."""
    from pcm_tpu.train.adv import build_ddim_adv_d_split

    text_cfg = CLIPTextConfig(
        vocab_size=1000, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, projection_dim=None,
    )
    bundle = SD15Bundle(
        unet_cfg=TINY_UNET_CONFIG, vae_cfg=TINY_VAE_CONFIG, text_cfg=text_cfg,
        lora=LoRASpec(rank=4, targets=SD_UNET_LORA_TARGETS), dtype=jnp.float32,
    )
    frozen, lora = bundle.init(jax.random.PRNGKey(0), IMG)
    disc_cfg = DiscriminatorConfig(
        taps=("down_0", "down_1", "mid"), num_h_per_head=1, kernel=1
    )
    disc = Discriminator(disc_cfg)
    rng = np.random.RandomState(0)
    bsz = 2
    batch = {
        "pixel_values": jnp.asarray(rng.rand(bsz, IMG, IMG, 3) * 2 - 1, jnp.float32),
        "input_ids": jnp.asarray(rng.randint(1, 999, size=(bsz, 16))),
        "uncond_embeds": jnp.zeros((bsz, 16, 32)),
    }
    cond = bundle.encode_prompts(frozen, batch["input_ids"])
    d_params = init_discriminator(disc, bundle, frozen, jax.random.PRNGKey(2), 16, cond)
    tx_g = make_optimizer(1e-3)
    tx_d = make_optimizer(1e-3, b1=0.0)
    g_state = TrainState.create(lora, tx_g)
    d_state = TrainState.create(d_params, tx_d)
    cfg = DistillConfig(num_solver_steps=10, multiphase=2)

    _, d_step = build_ddim_adv_steps(
        bundle, make_ddpm_schedule(), cfg, AdvConfig(0.1), disc, tx_g, tx_d
    )
    feats_fn, update_fn = build_ddim_adv_d_split(
        bundle, make_ddpm_schedule(), cfg, AdvConfig(0.1), disc, tx_d
    )

    key = jax.random.PRNGKey(5)
    mono_state, mono_m = jax.jit(d_step)(g_state, d_state, frozen, batch, key)
    ff, rf = jax.jit(feats_fn)(g_state, d_state, frozen, batch, key)
    split_state, split_m = jax.jit(update_fn)(d_state, ff, rf)

    np.testing.assert_allclose(
        float(mono_m["d_loss"]), float(split_m["d_loss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(mono_state.params), jax.tree.leaves(split_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


@pytest.mark.slow  # quick-tier budget: see docs/PERF.md 'Test suite budget'
def test_pair_features_matches_two_passes():
    """_pair_features (one 2B frozen-teacher forward over [fake; real]) must
    return the same features as two separate B forwards — per-sample ops only."""
    from pcm_tpu.train.adv import _pair_features

    text_cfg = CLIPTextConfig(
        vocab_size=1000, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, projection_dim=None,
    )
    bundle = SD15Bundle(
        unet_cfg=TINY_UNET_CONFIG, vae_cfg=TINY_VAE_CONFIG, text_cfg=text_cfg,
        lora=LoRASpec(rank=4, targets=SD_UNET_LORA_TARGETS), dtype=jnp.float32,
    )
    frozen, _ = bundle.init(jax.random.PRNGKey(0), IMG)
    cond = bundle.encode_prompts(
        frozen, jnp.asarray(np.random.RandomState(0).randint(1, 999, size=(2, 16)))
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    fake = jax.random.normal(k1, (2, 16, 16, 4), jnp.float32)
    real = jax.random.normal(k2, (2, 16, 16, 4), jnp.float32)
    adv_t = jnp.asarray([100.0, 700.0])

    ff, rf = _pair_features(bundle, frozen, fake, real, adv_t, cond)
    ff_ref = bundle.teacher_features(frozen, fake, adv_t, cond)
    rf_ref = bundle.teacher_features(frozen, real, adv_t, cond)
    for k in ff_ref:
        np.testing.assert_allclose(
            np.asarray(ff[k]), np.asarray(ff_ref[k]), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(rf[k]), np.asarray(rf_ref[k]), rtol=1e-5, atol=1e-5)


@pytest.mark.slow  # quick-tier budget: see docs/PERF.md 'Test suite budget'
def test_flow_split_d_matches_monolithic_d_step():
    """build_flow_adv_d_split must produce bit-identical D updates to
    build_flow_adv_steps' monolithic d_step for the same rng (SD3 family)."""
    from pcm_tpu.train.adv import build_flow_adv_d_split

    clip_sd3 = CLIPTextConfig(
        vocab_size=1000, hidden_size=16, num_layers=2, num_heads=2,
        intermediate_size=32, projection_dim=16,
    )
    t5_cfg = dataclasses.replace(TINY_T5_CONFIG, d_model=32, d_kv=8, d_ff=64)
    bundle = SD3Bundle(
        mmdit_cfg=TINY_MMDIT_CONFIG, vae_cfg=TINY_VAE_CONFIG,
        text_cfg=clip_sd3, text2_cfg=clip_sd3, t5_cfg=t5_cfg,
        lora=LoRASpec(rank=4, targets=SD3_LORA_TARGETS), dtype=jnp.float32,
    )
    frozen, lora = bundle.init(jax.random.PRNGKey(0), IMG, seq_len=8)
    disc_cfg = DiscriminatorConfig(taps=("block_0", "block_1"), num_h_per_head=1, kernel=1)
    disc = Discriminator(disc_cfg)
    rng = np.random.RandomState(0)
    bsz = 2
    batch = {
        "pixel_values": jnp.asarray(rng.rand(bsz, IMG, IMG, 3) * 2 - 1, jnp.float32),
        "input_ids": jnp.asarray(rng.randint(1, 999, size=(bsz, 8))),
        "input_ids_2": jnp.asarray(rng.randint(1, 999, size=(bsz, 8))),
        "input_ids_3": jnp.asarray(rng.randint(0, 999, size=(bsz, 8))),
        "uncond_embeds": jnp.zeros((bsz, 16, 32)),
        "uncond_pooled": jnp.zeros((bsz, 32)),
    }
    cond = bundle.encode_prompts(
        frozen, batch["input_ids"], batch["input_ids_2"], batch["input_ids_3"]
    )
    d_params = init_discriminator(disc, bundle, frozen, jax.random.PRNGKey(2), 16, cond)
    tx_g = make_optimizer(1e-3)
    tx_d = make_optimizer(1e-3, b1=0.0)
    g_state = TrainState.create(lora, tx_g)
    d_state = TrainState.create(d_params, tx_d)
    cfg = DistillConfig(num_solver_steps=10, multiphase=2, fixed_w=3.0)

    _, d_step = build_flow_adv_steps(
        bundle, make_flow_schedule(shift=3.0), cfg, AdvConfig(0.1), disc, tx_g, tx_d
    )
    feats_fn, update_fn = build_flow_adv_d_split(
        bundle, make_flow_schedule(shift=3.0), cfg, AdvConfig(0.1), disc, tx_d
    )

    key = jax.random.PRNGKey(5)
    mono_state, mono_m = jax.jit(d_step)(g_state, d_state, frozen, batch, key)
    ff, rf = jax.jit(feats_fn)(g_state, d_state, frozen, batch, key)
    split_state, split_m = jax.jit(update_fn)(d_state, ff, rf)

    np.testing.assert_allclose(
        float(mono_m["d_loss"]), float(split_m["d_loss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(mono_state.params), jax.tree.leaves(split_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_feature_match_loss():
    """Reference match_loss semantics: mean MSE across taps, zero for
    identical features, no gradient through the real branch."""
    import jax

    from pcm_tpu.train.adv import feature_match_loss

    rng = np.random.RandomState(0)
    fake = {"a": jnp.asarray(rng.randn(2, 4, 4, 8), jnp.float32),
            "b": jnp.asarray(rng.randn(2, 4, 4, 8), jnp.float32)}
    same = feature_match_loss(fake, fake)
    np.testing.assert_allclose(float(same), 0.0, atol=1e-7)

    real = jax.tree.map(lambda x: x + 1.0, fake)
    loss = feature_match_loss(fake, real)
    np.testing.assert_allclose(float(loss), 1.0, rtol=1e-5)

    # real branch is stop-grad: d(loss)/d(real) == 0, d/d(fake) nonzero
    g_fake = jax.grad(lambda f: feature_match_loss(f, real))(fake)
    assert float(jnp.abs(g_fake["a"]).max()) > 0
    g_real = jax.grad(lambda r: feature_match_loss(fake, r))(real)
    assert float(jnp.abs(g_real["a"]).max()) == 0.0


def _tiny_sd15_adv_fixture():
    text_cfg = CLIPTextConfig(
        vocab_size=1000, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, projection_dim=None,
    )
    bundle = SD15Bundle(
        unet_cfg=TINY_UNET_CONFIG, vae_cfg=TINY_VAE_CONFIG, text_cfg=text_cfg,
        lora=LoRASpec(rank=4, targets=SD_UNET_LORA_TARGETS), dtype=jnp.float32,
    )
    frozen, lora = bundle.init(jax.random.PRNGKey(0), IMG)
    disc_cfg = DiscriminatorConfig(
        taps=("down_0", "down_1", "mid"), num_h_per_head=1, kernel=1
    )
    disc = Discriminator(disc_cfg)
    rng = np.random.RandomState(0)
    bsz = 2
    ids = jnp.asarray(rng.randint(1, 999, size=(bsz, 16)))
    cond = bundle.encode_prompts(frozen, ids)
    batch = {
        "latents": jnp.asarray(
            rng.randn(bsz, IMG // 2, IMG // 2, TINY_UNET_CONFIG.in_channels),
            jnp.float32,
        ),
        "prompt_embeds": cond["prompt_embeds"],
        "uncond_embeds": jnp.zeros((bsz, 16, 32)),
    }
    d_params = init_discriminator(disc, bundle, frozen, jax.random.PRNGKey(2), IMG // 2, cond)
    tx_g = make_optimizer(1e-3)
    tx_d = make_optimizer(1e-3, b1=0.0)
    g_state = TrainState.create(lora, tx_g)
    d_state = TrainState.create(d_params, tx_d)
    cfg = DistillConfig(num_solver_steps=10, multiphase=2)
    return bundle, frozen, batch, disc, g_state, d_state, tx_g, tx_d, cfg


def test_fused_pair_g_update_matches_unfused_g_step():
    """The fused pair's G update must match build_ddim_adv_steps' g_step for
    the same key/batch: the fused step's d_loss term sees stop_grad(fake
    features), so NO discriminator-loss gradient may leak into the LoRA, and
    the rng stream is aligned with g_step's draw order by construction."""
    from pcm_tpu.train.adv import build_ddim_adv_fused_pair

    bundle, frozen, batch, disc, g_state, d_state, tx_g, tx_d, cfg = (
        _tiny_sd15_adv_fixture()
    )
    sched = make_ddpm_schedule()
    g_step, _ = build_ddim_adv_steps(
        bundle, sched, cfg, AdvConfig(0.1), disc, tx_g, tx_d
    )
    pair = build_ddim_adv_fused_pair(
        bundle, sched, cfg, AdvConfig(0.1), disc, tx_g, tx_d
    )

    key = jax.random.PRNGKey(5)
    g_ref, gm = jax.jit(g_step)(g_state, d_state, frozen, batch, key)
    g_fused, d_fused, pm = jax.jit(pair)(g_state, d_state, frozen, batch, key)

    np.testing.assert_allclose(float(gm["loss"]), float(pm["loss"]), rtol=1e-6)
    np.testing.assert_allclose(float(gm["loss_cm"]), float(pm["loss_cm"]), rtol=1e-6)
    np.testing.assert_allclose(float(gm["g_loss"]), float(pm["g_loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_ref.params), jax.tree.leaves(g_fused.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)
    # and the D heads moved
    moved = [
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree.leaves(d_state.params), jax.tree.leaves(d_fused.params))
    ]
    assert max(moved) > 0


def test_fused_pair_d_update_matches_dp_only_oracle():
    """The fused pair's D gradients must equal a directly-computed
    d(hinge_d_loss)/d(heads) with features held fixed — i.e. the joint
    backward's stop-gradient walls reproduce the unfused d_step's math given
    the same draws (the unfused step itself folds a different rng stream, so
    the oracle replays the fused draw order through the public pieces)."""
    from pcm_tpu.core.losses import hinge_d_loss
    from pcm_tpu.train.adv import build_ddim_adv_fused_pair
    from pcm_tpu.train.distill import ddim_model_pred, ddim_prepare
    from pcm_tpu.core.solver import PhasedDDIMSolver, phase_boundaries
    from pcm_tpu.train.state import TrainState as TS

    import optax

    bundle, frozen, batch, disc, g_state, d_state, tx_g, _, cfg = (
        _tiny_sd15_adv_fixture()
    )
    # SGD for the D update: post-update params are LINEAR in the gradients,
    # so the comparison tolerance is meaningful. (Adam with b1=0 makes the
    # first update -lr*sign(g): epsilon-level grad noise flips signs.)
    tx_d = optax.sgd(1e-3)
    d_state = TrainState.create(d_state.params, tx_d)
    sched = make_ddpm_schedule()
    pair = build_ddim_adv_fused_pair(
        bundle, sched, cfg, AdvConfig(0.1), disc, tx_g, tx_d
    )
    key = jax.random.PRNGKey(5)
    _, d_fused, pm = jax.jit(pair)(g_state, d_state, frozen, batch, key)

    # oracle: replay the fused step's draw order
    solver = PhasedDDIMSolver.create(sched, cfg.num_solver_steps)
    boundaries = jnp.asarray(phase_boundaries(cfg.num_solver_steps, cfg.multiphase))
    r = jax.random.fold_in(key, g_state.step)
    r, r_adv = jax.random.split(r)
    parts = ddim_prepare(
        bundle, sched, solver, boundaries, cfg, frozen, g_state.params, batch, r
    )
    r_t, r_fake, r_real = jax.random.split(r_adv, 3)
    span = sched.num_train_timesteps // cfg.multiphase
    bsz = parts["end_t"].shape[0]
    adv_t = jnp.minimum(
        parts["end_t"] + jax.random.randint(r_t, (bsz,), 0, span),
        sched.num_train_timesteps - 1,
    )
    eps_fake = jax.random.normal(r_fake, parts["latents"].shape, parts["latents"].dtype)
    eps_real = jax.random.normal(r_real, parts["latents"].shape, parts["latents"].dtype)
    model_pred = ddim_model_pred(bundle, sched, solver, cfg, frozen, g_state.params, parts)
    fake = sched.noise_travel(model_pred, eps_fake, parts["end_t"], adv_t)
    real = sched.noise_travel(parts["target"], eps_real, parts["end_t"], adv_t)
    # down+mid-only taps -> the fused builder runs with stop_after_mid=True
    fake_feats = bundle.teacher_features(frozen, fake, adv_t, parts["cond"], stop_after_mid=True)
    real_feats = bundle.teacher_features(frozen, real, adv_t, parts["cond"], stop_after_mid=True)

    def d_loss_fn(dp):
        return hinge_d_loss(
            disc.apply({"params": dp}, fake_feats),
            disc.apply({"params": dp}, real_feats),
        )

    d_loss, d_grads = jax.jit(jax.value_and_grad(d_loss_fn))(d_state.params)
    np.testing.assert_allclose(float(d_loss), float(pm["d_loss"]), rtol=1e-5)
    from pcm_tpu.train.distill import _apply_updates

    d_oracle = _apply_updates(d_state, d_grads, tx_d)
    for a, b in zip(jax.tree.leaves(d_oracle.params), jax.tree.leaves(d_fused.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_flow_fused_pair_matches_unfused_g_step():
    """SD3 fused pair: G update equivalence with build_flow_adv_steps'
    g_step (same rng stream), D heads move, metrics finite."""
    from pcm_tpu.train.adv import build_flow_adv_fused_pair

    clip_sd3 = CLIPTextConfig(
        vocab_size=1000, hidden_size=16, num_layers=2, num_heads=2,
        intermediate_size=32, projection_dim=16,
    )
    t5_cfg = dataclasses.replace(TINY_T5_CONFIG, d_model=32, d_kv=8, d_ff=64)
    bundle = SD3Bundle(
        mmdit_cfg=TINY_MMDIT_CONFIG, vae_cfg=TINY_VAE_CONFIG,
        text_cfg=clip_sd3, text2_cfg=clip_sd3, t5_cfg=t5_cfg,
        lora=LoRASpec(rank=4, targets=SD3_LORA_TARGETS), dtype=jnp.float32,
    )
    frozen, lora = bundle.init(jax.random.PRNGKey(0), IMG, seq_len=8)
    disc_cfg = DiscriminatorConfig(taps=("block_0", "block_1"), num_h_per_head=1, kernel=1)
    disc = Discriminator(disc_cfg)
    rng = np.random.RandomState(0)
    bsz = 2
    batch = {
        "pixel_values": jnp.asarray(rng.rand(bsz, IMG, IMG, 3) * 2 - 1, jnp.float32),
        "input_ids": jnp.asarray(rng.randint(1, 999, size=(bsz, 8))),
        "input_ids_2": jnp.asarray(rng.randint(1, 999, size=(bsz, 8))),
        "input_ids_3": jnp.asarray(rng.randint(0, 999, size=(bsz, 8))),
        "uncond_embeds": jnp.zeros((bsz, 16, 32)),
        "uncond_pooled": jnp.zeros((bsz, 32)),
    }
    cond = bundle.encode_prompts(
        frozen, batch["input_ids"], batch["input_ids_2"], batch["input_ids_3"]
    )
    d_params = init_discriminator(disc, bundle, frozen, jax.random.PRNGKey(2), 16, cond)
    tx_g = make_optimizer(1e-3)
    tx_d = make_optimizer(1e-3, b1=0.0)
    g_state = TrainState.create(lora, tx_g)
    d_state = TrainState.create(d_params, tx_d)
    cfg = DistillConfig(num_solver_steps=10, multiphase=2, fixed_w=3.0)
    sched = make_flow_schedule(shift=3.0)

    g_step, _ = build_flow_adv_steps(
        bundle, sched, cfg, AdvConfig(0.1), disc, tx_g, tx_d
    )
    pair = build_flow_adv_fused_pair(
        bundle, sched, cfg, AdvConfig(0.1), disc, tx_g, tx_d
    )
    key = jax.random.PRNGKey(5)
    g_ref, gm = jax.jit(g_step)(g_state, d_state, frozen, batch, key)
    g_fused, d_fused, pm = jax.jit(pair)(g_state, d_state, frozen, batch, key)

    np.testing.assert_allclose(float(gm["loss"]), float(pm["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g_ref.params), jax.tree.leaves(g_fused.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)
    for k in ("d_loss", "g_loss", "loss_cm"):
        assert np.isfinite(float(pm[k])), k
    moved = [
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree.leaves(d_state.params), jax.tree.leaves(d_fused.params))
    ]
    assert max(moved) > 0
