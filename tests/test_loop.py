"""Integration test: dataset -> DataLoader -> Trainer loop -> checkpoint,
resume, kohya export — on tiny models with a synthetic on-disk dataset."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcm_tpu.core import make_ddpm_schedule
from pcm_tpu.data.dataset import DataLoader, ImageFolderDataset, make_collate
from pcm_tpu.data.tokenizer import HashTokenizer
from pcm_tpu.lora.layers import LoRASpec
from pcm_tpu.models.clip import CLIPTextConfig
from pcm_tpu.models.unet import TINY_UNET_CONFIG
from pcm_tpu.models.vae import TINY_VAE_CONFIG
from pcm_tpu.train.bundles import SD15Bundle, SD_UNET_LORA_TARGETS
from pcm_tpu.train.distill import DistillConfig, build_ddim_distill_step
from pcm_tpu.train.loop import LoopConfig, Trainer
from pcm_tpu.train.state import TrainState, make_optimizer

IMG = 32


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    for i in range(8):
        arr = (rng.rand(48, 40, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"img_{i}.png")
        (d / f"img_{i}.txt").write_text(f"a photo number {i}")
    # one corrupt file to exercise the retry path
    (d / "bad.png").write_bytes(b"not an image")
    return str(d)


def test_dataset_and_loader(image_dir):
    ds = ImageFolderDataset(image_dir, resolution=IMG, crop="center")
    assert len(ds) == 9  # includes the corrupt file
    s = ds.get(0)
    assert s["pixel_values"].shape == (IMG, IMG, 3)
    assert -1.0 <= s["pixel_values"].min() and s["pixel_values"].max() <= 1.0
    # corrupt file index retries into a valid sample
    bad_idx = [i for i, f in enumerate(ds.files) if "bad" in f][0]
    s2 = ds.get(bad_idx)
    assert s2["pixel_values"].shape == (IMG, IMG, 3)

    tok = HashTokenizer(vocab_size=1000, max_length=16, quiet=True)
    loader = DataLoader(ds, 4, make_collate({"input_ids": tok}, IMG), num_workers=2)
    it = iter(loader)
    b = next(it)
    assert b["pixel_values"].shape == (4, IMG, IMG, 3)
    assert b["input_ids"].shape == (4, 16)
    assert b["input_ids"].max() < 1000


def test_sdxl_collate_time_ids(image_dir):
    ds = ImageFolderDataset(image_dir, resolution=IMG, crop="random")
    tok = HashTokenizer(vocab_size=1000, max_length=16, quiet=True)
    collate = make_collate({"input_ids": tok, "input_ids_2": tok}, IMG, sdxl=True)
    b = collate([ds.get(0), ds.get(1)])
    assert b["time_ids"].shape == (2, 6)
    # [orig_h, orig_w, c_top, c_left, res, res]
    assert (b["time_ids"][:, 4:] == IMG).all()


@pytest.mark.slow
def test_trainer_checkpoint_resume_and_kohya_export(image_dir, tmp_path):
    text_cfg = CLIPTextConfig(
        vocab_size=1000, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, projection_dim=None,
    )
    bundle = SD15Bundle(
        unet_cfg=TINY_UNET_CONFIG, vae_cfg=TINY_VAE_CONFIG, text_cfg=text_cfg,
        lora=LoRASpec(rank=4, alpha=8.0, targets=SD_UNET_LORA_TARGETS), dtype=jnp.float32,
    )
    frozen, lora = bundle.init(jax.random.PRNGKey(0), IMG)
    tx = make_optimizer(1e-3)
    cfg = DistillConfig(num_solver_steps=10, multiphase=2)
    step_fn = build_ddim_distill_step(bundle, make_ddpm_schedule(), cfg, tx)

    ds = ImageFolderDataset(image_dir, resolution=IMG)
    tok = HashTokenizer(vocab_size=1000, max_length=16, quiet=True)
    loader = DataLoader(ds, 2, make_collate({"input_ids": tok}, IMG), num_workers=2)

    uncond = bundle.encode_prompts(frozen, jnp.asarray(tok(["", ""])))

    def extra(b):
        b["uncond_embeds"] = uncond["prompt_embeds"]
        return b

    out_dir = str(tmp_path / "run")
    loop_cfg = LoopConfig(
        output_dir=out_dir, max_train_steps=4, checkpointing_steps=2,
        validation_steps=1000, log_every=2,
    )
    trainer = Trainer(loop_cfg, frozen, TrainState.create(lora, tx), step_fn=step_fn)
    g_state, _ = trainer.run(iter(loader), extra)
    assert int(g_state.step) == 4
    trainer.ckpt.close()

    # kohya exports written
    exports = glob.glob(os.path.join(out_dir, "pcm_lora_*.safetensors"))
    assert exports
    from safetensors.numpy import load_file

    sd = load_file(sorted(exports)[-1])
    downs = [k for k in sd if k.endswith("lora_down.weight")]
    assert downs and any("to_q" in k for k in downs)
    assert all(k.startswith("lora_unet_") for k in downs)
    alphas = [k for k in sd if k.endswith(".alpha")]
    assert alphas and float(sd[alphas[0]]) == 8.0

    # resume continues from the saved step
    trainer2 = Trainer(loop_cfg, frozen, TrainState.create(lora, tx), step_fn=step_fn)
    assert trainer2.global_step == 4
    trainer2.ckpt.close()

    # metrics jsonl written
    assert os.path.exists(os.path.join(out_dir, "metrics.jsonl"))


def _dummy_lora():
    return {"blk": {"to_q": {"a": jnp.zeros((8, 2)), "b": jnp.zeros((2, 8))}}}


def test_trainer_nonfinite_loss_guard(tmp_path):
    """abort_on_nonfinite fails fast (at a log boundary) instead of training
    on into garbage — failure-detection the reference lacks (SURVEY §5)."""
    import itertools

    tx = make_optimizer(1e-3)
    state = TrainState.create(_dummy_lora(), tx)

    def step_fn(state, frozen, batch, rng):
        return state.replace(step=state.step + 1), {"loss": jnp.float32(np.nan)}

    loop_cfg = LoopConfig(
        output_dir=str(tmp_path / "nan_run"), max_train_steps=10,
        checkpointing_steps=1000, validation_steps=1000, log_every=2,
    )
    trainer = Trainer(loop_cfg, {}, state, step_fn=step_fn)
    with pytest.raises(FloatingPointError, match="non-finite loss at step 2"):
        trainer.run(itertools.repeat({"x": np.zeros((1,), np.float32)}))
    trainer.ckpt.close()

    # the guard is opt-out for debugging runs
    loop_cfg2 = LoopConfig(
        output_dir=str(tmp_path / "nan_run2"), max_train_steps=4,
        checkpointing_steps=1000, validation_steps=1000, log_every=2,
        abort_on_nonfinite=False,
    )
    trainer2 = Trainer(loop_cfg2, {}, TrainState.create(_dummy_lora(), tx),
                       step_fn=step_fn)
    g_state, _ = trainer2.run(itertools.repeat({"x": np.zeros((1,), np.float32)}))
    assert int(g_state.step) == 4
    trainer2.ckpt.close()


def test_trainer_zero_checkpointing_and_validation_steps(tmp_path):
    """checkpointing_steps=0 / validation_steps=0 mean 'never', not
    ZeroDivisionError (hit by smoke runs that disable both)."""
    import itertools

    tx = make_optimizer(1e-3)
    state = TrainState.create(_dummy_lora(), tx)

    def step_fn(state, frozen, batch, rng):
        return state.replace(step=state.step + 1), {"loss": jnp.float32(0.1)}

    loop_cfg = LoopConfig(
        output_dir=str(tmp_path / "nockpt_run"), max_train_steps=3,
        checkpointing_steps=0, validation_steps=0, log_every=1,
    )
    trainer = Trainer(loop_cfg, {}, state, step_fn=step_fn)
    trainer.validation_fn = lambda *a: pytest.fail("validation must not run")
    g_state, _ = trainer.run(itertools.repeat({"x": np.zeros((1,), np.float32)}))
    assert int(g_state.step) == 3
    trainer.ckpt.close()


def test_trainer_preemption_sigterm(tmp_path):
    """SIGTERM mid-run (a TPU-pod preemption) checkpoints the in-flight step
    and returns cleanly; a fresh Trainer resumes at that exact step. The
    reference has no equivalent — a preempted run replays from the last
    periodic checkpoint."""
    import signal

    tx = make_optimizer(1e-3)

    def step_fn(state, frozen, batch, rng):
        return state.replace(step=state.step + 1), {"loss": jnp.float32(0.1)}

    def batches():
        n = 0
        while True:
            n += 1
            if n == 4:  # host-side, so it actually fires (step_fn is jitted)
                os.kill(os.getpid(), signal.SIGTERM)
            yield {"x": np.zeros((1,), np.float32)}

    prev = signal.getsignal(signal.SIGTERM)
    loop_cfg = LoopConfig(
        output_dir=str(tmp_path / "preempt_run"), max_train_steps=1000,
        checkpointing_steps=10_000, validation_steps=10_000, log_every=1000,
    )
    trainer = Trainer(loop_cfg, {}, TrainState.create(_dummy_lora(), tx),
                      step_fn=step_fn)
    g_state, _ = trainer.run(batches(), prefetch=1)
    stop_step = trainer.global_step
    trainer.ckpt.close()
    assert 1 <= stop_step < 1000
    assert int(g_state.step) == stop_step
    assert signal.getsignal(signal.SIGTERM) is prev  # handler restored

    trainer2 = Trainer(loop_cfg, {}, TrainState.create(_dummy_lora(), tx),
                       step_fn=step_fn)
    assert trainer2.global_step == stop_step
    trainer2.ckpt.close()


def test_trainer_request_stop_off_main_thread(tmp_path):
    """request_stop() from a worker thread (no signal machinery) also stops
    and checkpoints — the programmatic path for embedding harnesses."""
    import threading

    tx = make_optimizer(1e-3)
    trainer_box = {}

    def step_fn(state, frozen, batch, rng):
        return state.replace(step=state.step + 1), {"loss": jnp.float32(0.1)}

    def batches():
        n = 0
        while True:
            n += 1
            if n == 3:
                threading.Thread(
                    target=trainer_box["t"].request_stop).start()
            yield {"x": np.zeros((1,), np.float32)}

    loop_cfg = LoopConfig(
        output_dir=str(tmp_path / "stop_run"), max_train_steps=1000,
        checkpointing_steps=10_000, validation_steps=10_000, log_every=1000,
    )
    trainer = Trainer(loop_cfg, {}, TrainState.create(_dummy_lora(), tx),
                      step_fn=step_fn)
    trainer_box["t"] = trainer
    g_state, _ = trainer.run(batches(), prefetch=1)
    trainer.ckpt.close()
    assert 1 <= trainer.global_step < 1000


def test_resume_replaces_leaves_on_template_sharding(tmp_path):
    """Resume must land restored leaves on the TEMPLATE's devices. On the
    remote-TPU backend orbax restored params to host CPU while the fresh
    state's scalars sat on the chip, and the first jitted step died with
    "incompatible devices" (.cache/logs/trainrun_leg2.out). Simulated here
    with two virtual CPU devices: checkpoint written from device 0, fresh
    template committed to device 1 — the resumed state must be on device 1."""
    import itertools

    tx = make_optimizer(1e-3)
    dev0, dev1 = jax.devices()[0], jax.devices()[1]

    def step_fn(state, frozen, batch, rng):
        return state.replace(step=state.step + 1), {"loss": jnp.float32(0.1)}

    loop_cfg = LoopConfig(
        output_dir=str(tmp_path / "placement_run"), max_train_steps=2,
        checkpointing_steps=2, validation_steps=1000, log_every=1000,
    )
    state0 = jax.device_put(TrainState.create(_dummy_lora(), tx), dev0)
    trainer = Trainer(loop_cfg, {}, state0, step_fn=step_fn)
    trainer.run(itertools.repeat({"x": np.zeros((1,), np.float32)}))
    trainer.ckpt.close()

    template = jax.device_put(TrainState.create(_dummy_lora(), tx), dev1)
    trainer2 = Trainer(loop_cfg, {}, template, step_fn=step_fn)
    assert trainer2.global_step == 2
    for leaf in jax.tree.leaves(trainer2.g_state):
        assert leaf.sharding.device_set == {dev1}, leaf.sharding
    # and the restored values are the checkpoint's, not the template's
    assert int(trainer2.g_state.step) == 2
    trainer2.ckpt.close()

    # The real trainrun failure mode: an UNCOMMITTED template (host-init
    # params that the first jitted step auto-transfers). Orbax restores
    # committed-cpu leaves, which a TPU-backend jit refuses to move; resume
    # must demote them back to movable host arrays.
    tmpl3 = TrainState.create(_dummy_lora(), tx)  # uncommitted default-device
    trainer3 = Trainer(loop_cfg, {}, tmpl3, step_fn=step_fn)
    assert trainer3.global_step == 2
    for leaf in jax.tree.leaves(trainer3.g_state):
        assert isinstance(leaf, np.ndarray) or not getattr(leaf, "_committed", True), leaf
    assert int(trainer3.g_state.step) == 2
    trainer3.ckpt.close()


def test_kohya_roundtrip():
    from pcm_tpu.lora.kohya import from_kohya_state_dict, to_kohya_state_dict

    rng = np.random.RandomState(0)
    tree = {
        "down_blocks_0_attentions_0": {
            "transformer_blocks_0": {
                "attn1": {
                    "to_q": {"a": rng.randn(32, 4).astype(np.float32),
                             "b": rng.randn(4, 32).astype(np.float32)}
                }
            },
            "proj_in": {"a": rng.randn(1, 1, 32, 4).astype(np.float32),
                        "b": rng.randn(1, 1, 4, 32).astype(np.float32)},
        }
    }
    sd = to_kohya_state_dict(tree, alpha=8.0)
    assert "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q.lora_down.weight" in sd
    assert sd["lora_unet_down_blocks_0_attentions_0_proj_in.lora_down.weight"].shape == (4, 32, 1, 1)
    back, alpha = from_kohya_state_dict(sd, tree, rank=4)
    assert alpha == 8.0
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(back)):
        np.testing.assert_allclose(a, b, rtol=1e-6)


@pytest.mark.slow
def test_trainer_split_d_adv(image_dir, tmp_path):
    """Trainer accepts (g_step, feats_fn, update_fn) — split-D adversarial
    mode — and alternates G/D exactly like the monolithic pair."""
    from pcm_tpu.train.adv import (
        AdvConfig,
        Discriminator,
        DiscriminatorConfig,
        build_ddim_adv_d_split,
        build_ddim_adv_steps,
        init_discriminator,
    )

    text_cfg = CLIPTextConfig(
        vocab_size=1000, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, projection_dim=None,
    )
    bundle = SD15Bundle(
        unet_cfg=TINY_UNET_CONFIG, vae_cfg=TINY_VAE_CONFIG, text_cfg=text_cfg,
        lora=LoRASpec(rank=4, alpha=8.0, targets=SD_UNET_LORA_TARGETS), dtype=jnp.float32,
    )
    frozen, lora = bundle.init(jax.random.PRNGKey(0), IMG)
    tx_g = make_optimizer(1e-3)
    tx_d = make_optimizer(1e-3, b1=0.0)
    cfg = DistillConfig(num_solver_steps=10, multiphase=2)
    disc_cfg = DiscriminatorConfig(taps=("down_0", "down_1", "mid"), num_h_per_head=1)
    disc = Discriminator(disc_cfg)
    tok = HashTokenizer(vocab_size=1000, max_length=16, quiet=True)
    cond = bundle.encode_prompts(frozen, jnp.asarray(tok([""])))
    d_params = init_discriminator(disc, bundle, frozen, jax.random.PRNGKey(2), IMG // 8, cond)

    adv_cfg = AdvConfig(0.1)
    g_step, _ = build_ddim_adv_steps(
        bundle, make_ddpm_schedule(), cfg, adv_cfg, disc, tx_g, tx_d
    )
    feats_fn, update_fn = build_ddim_adv_d_split(
        bundle, make_ddpm_schedule(), cfg, adv_cfg, disc, tx_d
    )

    ds = ImageFolderDataset(image_dir, resolution=IMG)
    loader = DataLoader(ds, 2, make_collate({"input_ids": tok}, IMG), num_workers=2)
    uncond = bundle.encode_prompts(frozen, jnp.asarray(tok(["", ""])))

    def extra(b):
        b["uncond_embeds"] = uncond["prompt_embeds"]
        return b

    loop_cfg = LoopConfig(
        output_dir=str(tmp_path / "run_split"), max_train_steps=4,
        checkpointing_steps=1000, validation_steps=1000, log_every=2,
    )
    trainer = Trainer(
        loop_cfg, frozen, TrainState.create(lora, tx_g),
        adv_steps=(g_step, feats_fn, update_fn),
        d_state=TrainState.create(d_params, tx_d),
    )
    g_state, d_state = trainer.run(iter(loader), extra)
    trainer.ckpt.close()
    # both sides actually trained (G on odd parity, D on even)
    assert int(g_state.step) >= 1 and int(d_state.step) >= 1


def test_trainer_fused_pair_adv(image_dir, tmp_path):
    """Trainer accepts pair_step= (fused D+G adversarial mode): each batch
    advances global_step by 2 (reference parity counting) and trains both
    players."""
    from pcm_tpu.train.adv import (
        AdvConfig,
        Discriminator,
        DiscriminatorConfig,
        build_ddim_adv_fused_pair,
        init_discriminator,
    )

    text_cfg = CLIPTextConfig(
        vocab_size=1000, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, projection_dim=None,
    )
    bundle = SD15Bundle(
        unet_cfg=TINY_UNET_CONFIG, vae_cfg=TINY_VAE_CONFIG, text_cfg=text_cfg,
        lora=LoRASpec(rank=4, alpha=8.0, targets=SD_UNET_LORA_TARGETS), dtype=jnp.float32,
    )
    frozen, lora = bundle.init(jax.random.PRNGKey(0), IMG)
    tx_g = make_optimizer(1e-3)
    tx_d = make_optimizer(1e-3, b1=0.0)
    cfg = DistillConfig(num_solver_steps=10, multiphase=2)
    disc_cfg = DiscriminatorConfig(taps=("down_0", "down_1", "mid"), num_h_per_head=1)
    disc = Discriminator(disc_cfg)
    tok = HashTokenizer(vocab_size=1000, max_length=16, quiet=True)
    cond = bundle.encode_prompts(frozen, jnp.asarray(tok([""])))
    d_params = init_discriminator(disc, bundle, frozen, jax.random.PRNGKey(2), IMG // 8, cond)

    pair = build_ddim_adv_fused_pair(
        bundle, make_ddpm_schedule(), cfg, AdvConfig(0.1), disc, tx_g, tx_d
    )

    ds = ImageFolderDataset(image_dir, resolution=IMG)
    loader = DataLoader(ds, 2, make_collate({"input_ids": tok}, IMG), num_workers=2)
    uncond = bundle.encode_prompts(frozen, jnp.asarray(tok(["", ""])))

    def extra(b):
        b["uncond_embeds"] = uncond["prompt_embeds"]
        return b

    loop_cfg = LoopConfig(
        output_dir=str(tmp_path / "run_fused"), max_train_steps=4,
        checkpointing_steps=1000, validation_steps=1000, log_every=2,
    )
    trainer = Trainer(
        loop_cfg, frozen, TrainState.create(lora, tx_g),
        pair_step=pair,
        d_state=TrainState.create(d_params, tx_d),
    )
    g_state, d_state = trainer.run(iter(loader), extra)
    trainer.ckpt.close()
    # 4 global steps = 2 fused pairs = 2 G updates + 2 D updates
    assert trainer.global_step == 4
    assert int(g_state.step) == 2 and int(d_state.step) == 2


def test_kohya_scanned_layout_roundtrip():
    """Scan-stacked lora trees (blocks_scan/block/... with leading depth axis)
    must export to the SAME unrolled kohya names as the unrolled layout, and
    import back into a scanned template losslessly — checkpoints are
    layout-independent on disk."""
    import numpy as np

    from pcm_tpu.lora.kohya import from_kohya_state_dict, to_kohya_state_dict

    rng = np.random.RandomState(0)
    D, IN, R, OUT = 3, 8, 2, 8
    a = rng.randn(D, IN, R).astype(np.float32)
    b = rng.randn(D, R, OUT).astype(np.float32)
    pa = rng.randn(IN, R).astype(np.float32)
    pb = rng.randn(R, OUT).astype(np.float32)
    scanned = {"down_blocks_1": {"attentions_0": {
        "blocks_scan": {"block": {"attn1": {"to_q": {"a": a, "b": b}}}},
        "proj_in": {"a": pa, "b": pb},
    }}}
    unrolled = {"down_blocks_1": {"attentions_0": {
        **{f"transformer_blocks_{d}": {"attn1": {"to_q": {"a": a[d], "b": b[d]}}}
           for d in range(D)},
        "proj_in": {"a": pa, "b": pb},
    }}}

    sd_s = to_kohya_state_dict(scanned, alpha=8.0)
    sd_u = to_kohya_state_dict(unrolled, alpha=8.0)
    assert sorted(sd_s) == sorted(sd_u)
    for k in sd_u:
        np.testing.assert_array_equal(sd_s[k], sd_u[k])
    assert any("transformer_blocks_2" in k for k in sd_s)

    back, alpha = from_kohya_state_dict(sd_s, scanned, rank=R)
    assert alpha == 8.0
    np.testing.assert_allclose(
        np.asarray(back["down_blocks_1"]["attentions_0"]["blocks_scan"]["block"]["attn1"]["to_q"]["a"]), a, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(back["down_blocks_1"]["attentions_0"]["proj_in"]["b"]), pb, rtol=1e-6)
