"""End-to-end distillation train-step tests on tiny models (CPU), including
data-parallel execution over the 8-virtual-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcm_tpu.core import make_ddpm_schedule, make_flow_schedule
from pcm_tpu.lora.layers import LoRASpec
from pcm_tpu.models.clip import CLIPTextConfig
from pcm_tpu.models.mmdit import SD3_LORA_TARGETS, TINY_MMDIT_CONFIG
from pcm_tpu.models.t5 import TINY_T5_CONFIG
from pcm_tpu.models.unet import TINY_UNET_CONFIG
from pcm_tpu.models.vae import TINY_VAE_CONFIG
from pcm_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from pcm_tpu.train.bundles import SD15Bundle, SD3Bundle, SD_UNET_LORA_TARGETS
from pcm_tpu.train.distill import (
    DistillConfig,
    build_ddim_distill_step,
    build_flow_distill_step,
)
from pcm_tpu.train.state import TrainState, make_optimizer

IMG = 32  # 4x4 latents with the /8 VAE


def _sd15_setup(dtype=jnp.float32):
    # CLIP hidden width must equal the UNet cross-attention dim (32)
    text_cfg = CLIPTextConfig(
        vocab_size=1000, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, projection_dim=None,
    )
    bundle = SD15Bundle(
        unet_cfg=TINY_UNET_CONFIG,
        vae_cfg=TINY_VAE_CONFIG,
        text_cfg=text_cfg,
        lora=LoRASpec(rank=4, targets=SD_UNET_LORA_TARGETS),
        dtype=dtype,
    )
    frozen, lora = bundle.init(jax.random.PRNGKey(0), IMG)
    tx = make_optimizer(1e-3)
    state = TrainState.create(lora, tx)
    cfg = DistillConfig(num_solver_steps=10, multiphase=2, w_min=4, w_max=5)
    step = build_ddim_distill_step(bundle, make_ddpm_schedule(), cfg, tx)
    return bundle, frozen, state, step


def _sd15_batch(bsz=4):
    rng = np.random.RandomState(0)
    return {
        "pixel_values": jnp.asarray(rng.rand(bsz, IMG, IMG, 3) * 2 - 1, jnp.float32),
        "input_ids": jnp.asarray(rng.randint(1, 999, size=(bsz, 16))),
        "uncond_embeds": jnp.zeros((bsz, 16, 32)),
    }


@pytest.mark.slow
def test_sd15_distill_step_runs_and_updates():
    bundle, frozen, state, step = _sd15_setup()
    batch = _sd15_batch()
    jstep = jax.jit(step)
    state2, metrics = jstep(state, frozen, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1
    # B params must have moved
    moved = [
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(state2.params))
    ]
    assert max(moved) > 0

    # loss decreases over a handful of steps on a fixed batch
    losses = []
    s = state
    for i in range(8):
        s, m = jstep(s, frozen, batch, jax.random.PRNGKey(2))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()


@pytest.mark.slow
def test_sd15_distill_step_data_parallel():
    bundle, frozen, state, step = _sd15_setup()
    mesh = make_mesh(data=8, fsdp=1)
    batch = shard_batch(_sd15_batch(bsz=8), mesh)
    state = replicate(state, mesh)
    frozen = replicate(frozen, mesh)
    jstep = jax.jit(step)
    state2, metrics = jstep(state, frozen, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    # updated state stays replicated across the mesh
    assert state2.params is not None


@pytest.mark.slow
def test_grad_accumulation_matches_manual_average():
    """accumulate_grads == mean over manually-run microbatches (same rngs)."""
    from pcm_tpu.train.distill import accumulate_grads

    bundle, frozen, state, _ = _sd15_setup()
    schedule = make_ddpm_schedule()
    cfg = DistillConfig(num_solver_steps=10, multiphase=2, w_min=4, w_max=5)
    from pcm_tpu.core.losses import consistency_loss
    from pcm_tpu.core.solver import PhasedDDIMSolver, phase_boundaries
    from pcm_tpu.train.distill import ddim_model_pred, ddim_prepare

    solver = PhasedDDIMSolver.create(schedule, cfg.num_solver_steps)
    boundaries = jnp.asarray(phase_boundaries(cfg.num_solver_steps, cfg.multiphase))

    def grad_fn(mb, r):
        parts = ddim_prepare(
            bundle, schedule, solver, boundaries, cfg, frozen, state.params, mb, r
        )

        def loss_fn(lora):
            mp = ddim_model_pred(bundle, schedule, solver, cfg, frozen, lora, parts)
            return consistency_loss(mp, parts["target"], cfg.loss_type, cfg.huber_c)

        return jax.value_and_grad(loss_fn)(state.params)

    batch = _sd15_batch(bsz=4)
    rng = jax.random.PRNGKey(3)
    accum = 2
    loss_acc, grads_acc = jax.jit(lambda b, r: accumulate_grads(grad_fn, b, r, accum))(batch, rng)

    # manual: interleaved microbatches, per-microbatch rng split, averaged
    rngs = jax.random.split(rng, accum)
    outs = [grad_fn(jax.tree.map(lambda x: x[a::accum], batch), rngs[a]) for a in range(accum)]
    loss_ref = np.mean([float(o[0]) for o in outs])
    grads_ref = jax.tree.map(lambda *g: sum(g) / accum, *[o[1] for o in outs])

    np.testing.assert_allclose(float(loss_acc), loss_ref, rtol=2e-5)
    for a, b in zip(jax.tree.leaves(grads_acc), jax.tree.leaves(grads_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6)


@pytest.mark.slow
def test_grad_accum_step_runs_data_parallel():
    """Full accumulating step over the 8-device mesh (accum=2, global batch 16)."""
    bundle, frozen, state, _ = _sd15_setup()
    tx = make_optimizer(1e-3)
    cfg = DistillConfig(num_solver_steps=10, multiphase=2, w_min=4, w_max=5)
    step = build_ddim_distill_step(bundle, make_ddpm_schedule(), cfg, tx, grad_accum_steps=2)
    mesh = make_mesh(data=8, fsdp=1)
    batch = shard_batch(_sd15_batch(bsz=16), mesh)
    state = replicate(state, mesh)
    frozen_r = replicate(frozen, mesh)
    state2, metrics = jax.jit(step)(state, frozen_r, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1


@pytest.mark.slow
def test_cached_latents_dataset_and_step(tmp_path):
    """CachedLatentsDataset round-trip + a distill step fed by cached batches
    (the bundle's encode must skip VAE/text when latents/prompt_embeds are
    present and produce the identical step given identical tensors)."""
    from pcm_tpu.data.dataset import CachedLatentsDataset, cached_collate

    bundle, frozen, state, _ = _sd15_setup()
    schedule = make_ddpm_schedule()
    batch = _sd15_batch(bsz=4)

    # reference encode (VAE + CLIP) on the raw batch
    latents, cond, _ = bundle.encode(frozen, batch, jax.random.PRNGKey(9))

    # write two npz shards of 2 samples each
    for si in range(2):
        np.savez(
            tmp_path / f"shard_{si:05d}.npz",
            latents=np.asarray(latents[2 * si : 2 * si + 2]),
            prompt_embeds=np.asarray(cond["prompt_embeds"][2 * si : 2 * si + 2]),
        )
    ds = CachedLatentsDataset(str(tmp_path))
    assert len(ds) == 4
    cached_batch = cached_collate([ds.get(i) for i in range(4)])
    np.testing.assert_allclose(cached_batch["latents"], np.asarray(latents))

    # encode() with cached keys returns them untouched (no VAE/text call)
    cached_batch = {k: jnp.asarray(v) for k, v in cached_batch.items()}
    cached_batch["uncond_embeds"] = batch["uncond_embeds"]
    lat2, cond2, _ = bundle.encode(frozen, cached_batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(lat2), np.asarray(latents))
    np.testing.assert_allclose(
        np.asarray(cond2["prompt_embeds"]), np.asarray(cond["prompt_embeds"])
    )

    # a full distill step runs off the cached batch
    tx = make_optimizer(1e-3)
    cfg = DistillConfig(num_solver_steps=10, multiphase=2, w_min=4, w_max=5)
    step = build_ddim_distill_step(bundle, schedule, cfg, tx)
    state2, metrics = jax.jit(step)(state, frozen, cached_batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1


@pytest.mark.slow
def test_sd3_flow_distill_step():
    # 2x CLIP hidden (12+12=24) pads to joint dim 32; pooled 16+16=32; T5 d_model = 32
    clip_sd3 = CLIPTextConfig(
        vocab_size=1000, hidden_size=16, num_layers=2, num_heads=2,
        intermediate_size=32, projection_dim=16,
    )
    import dataclasses as _dc

    t5_cfg = _dc.replace(TINY_T5_CONFIG, d_model=32, d_kv=8, d_ff=64)
    bundle = SD3Bundle(
        mmdit_cfg=TINY_MMDIT_CONFIG,
        vae_cfg=TINY_VAE_CONFIG,
        text_cfg=clip_sd3,
        text2_cfg=clip_sd3,
        t5_cfg=t5_cfg,
        lora=LoRASpec(rank=4, targets=SD3_LORA_TARGETS),
        dtype=jnp.float32,
    )
    frozen, lora = bundle.init(jax.random.PRNGKey(0), IMG, seq_len=8)
    tx = make_optimizer(1e-3)
    state = TrainState.create(lora, tx)
    cfg = DistillConfig(num_solver_steps=10, multiphase=2, fixed_w=3.0)
    step = build_flow_distill_step(bundle, make_flow_schedule(shift=3.0), cfg, tx)

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
    state2, metrics = jax.jit(step)(state, frozen, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    moved = [
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(state2.params))
    ]
    assert max(moved) > 0


@pytest.mark.slow
def test_sdxl_distill_step_runs_and_updates():
    """SDXL path: dual text encoders, pooled te2 + time_ids micro-conditioning
    (`train_pcm_lora_sdxl_adv.py:1093-1131`) through the fused step."""
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
    tx = make_optimizer(1e-3)
    state = TrainState.create(lora, tx)
    cfg = DistillConfig(num_solver_steps=10, multiphase=4, w_min=6, w_max=7)
    step = build_ddim_distill_step(bundle, make_ddpm_schedule(), cfg, tx)

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
    new_state, metrics = jax.jit(step)(state, frozen, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1
    moved = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), new_state.params, state.params
    )
    assert max(jax.tree.leaves(moved)) > 0


@pytest.mark.slow
def test_distill_step_fused_int8_matmul():
    """The full tiny distill step traces and runs with the FUSED int8 path
    (Pallas in-VMEM activation quant, ops/int8_matmul.py) on quantized
    frozen weights, and the loss tracks the dequantized-bf16 reference."""
    from pcm_tpu.utils.quant import int8_matmul, quantize_frozen

    bundle, frozen, state, step = _sd15_setup()
    qfrozen = quantize_frozen(frozen, min_size=1024)
    batch = _sd15_batch()
    rng = jax.random.PRNGKey(0)

    _, m_ref = jax.jit(step)(state, qfrozen, batch, rng)
    with int8_matmul(which="fused"):
        _, m_fused = jax.jit(step).lower(state, qfrozen, batch, rng).compile()(
            state, qfrozen, batch, rng
        )
    ref, fused = float(m_ref["loss"]), float(m_fused["loss"])
    assert np.isfinite(fused)
    assert abs(fused - ref) / max(abs(ref), 1e-8) < 0.05, (ref, fused)


def test_distill_step_scoped_int8_no_grad_fwd():
    """`DistillConfig.int8_no_grad_fwd` scopes int8 MXU compute to the CFG
    teacher + stop-grad target forwards (the surgical variant of the global
    int8_matmul context): the step runs, the loss tracks the bf16 reference,
    and the student's gradient path stays exact — grads must match a run
    where ONLY the no-grad forwards changed (same trace, flag off, identical
    seed) within quantization-noise tolerance of the target."""
    import dataclasses

    from pcm_tpu.core import make_ddpm_schedule
    from pcm_tpu.train.distill import build_ddim_distill_step
    from pcm_tpu.train.state import make_optimizer
    from pcm_tpu.utils.quant import quantize_frozen

    bundle, frozen, state, step = _sd15_setup()
    qfrozen = quantize_frozen(frozen, min_size=1024)
    batch = _sd15_batch()
    rng = jax.random.PRNGKey(0)

    _, m_ref = jax.jit(step)(state, qfrozen, batch, rng)

    cfg = DistillConfig(num_solver_steps=10, multiphase=2, w_min=4, w_max=5,
                        int8_no_grad_fwd=True)
    tx = make_optimizer(1e-3)
    step_q = build_ddim_distill_step(bundle, make_ddpm_schedule(), cfg, tx)
    _, m_q = jax.jit(step_q)(state, qfrozen, batch, rng)

    ref, q = float(m_ref["loss"]), float(m_q["loss"])
    assert np.isfinite(q)
    # activation-quant noise perturbs the distillation target only; the tiny
    # random model amplifies relative deltas, so the gate is loose but real
    assert abs(q - ref) / max(abs(ref), 1e-8) < 0.10, (ref, q)
