"""The phased-consistency distillation train step — one fused XLA program.

Student forward (grad, LoRA), CFG teacher forward (cond+uncond batched into a
single pass), stop-grad target forward (same LoRA params), solver jumps,
loss, grads, optimizer update: all inside one jit. Semantics mirror the
reference hot loops (`train_pcm_lora_sd15.py:1115-1301` for the DDIM/epsilon
family, `train_pcm_lora_sd3.py:1263-1392` for flow matching), with the
per-sample python loops replaced by vectorized gathers.

The shared ``*_prepare`` stages also feed the adversarial steps in `adv.py`
(which add latent-GAN real/fake construction on top, mirroring
`train_pcm_lora_sd15_adv.py` / `train_pcm_lora_sd3_adv.py`).

Data parallelism: run the returned step under `jax.jit` with a batch sharded
over the mesh 'data' axis and replicated state — XLA inserts the gradient
all-reduce over ICI (the NCCL/DDP replacement, SURVEY.md §2c).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.losses import cfg_combine, consistency_loss
from ..core.schedule import DDPMSchedule, FlowSchedule
from ..core.solver import (
    PhasedDDIMSolver,
    PhasedEulerSolver,
    boundary_scalings,
    phase_boundaries,
)
from .state import TrainState


@dataclasses.dataclass(frozen=True)
class DistillConfig:
    num_solver_steps: int = 50
    multiphase: int = 4
    w_min: float = 4.0
    w_max: float = 5.0
    fixed_w: Optional[float] = None  # SD3 uses fixed w=3
    not_apply_cfg_solver: bool = False
    loss_type: str = "huber"
    huber_c: float = 0.001
    # Run the gradient-free forwards (CFG teacher + stop-grad target) with
    # int8 MXU compute (utils/quant.py int8_matmul "dense": frozen QTensor
    # dots as int8xint8->int32, convs/LoRA stay bf16). Scoped so the
    # differentiated student forward keeps exact bf16 math — the surgical
    # variant of the global `--int8-matmul dense` switch. Numerics: adds
    # activation-quant noise to the distillation target only; measure loss
    # parity before defaulting (docs/PERF.md "int8 MXU compute").
    int8_no_grad_fwd: bool = False


def _merge_cond(cond, uncond):
    return jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=0), cond, uncond)


def _no_grad_fwd_ctx(cfg: DistillConfig):
    """Trace-time dispatch context for the gradient-free forwards (see
    ``DistillConfig.int8_no_grad_fwd``). Identity unless enabled."""
    if cfg.int8_no_grad_fwd:
        from ..utils.quant import int8_matmul

        return int8_matmul(True, "dense")
    import contextlib

    return contextlib.nullcontext()


def _sample_w(cfg: DistillConfig, rng, bsz, dtype):
    if cfg.fixed_w is not None:
        return jnp.full((bsz,), cfg.fixed_w, dtype)
    return jax.random.uniform(rng, (bsz,), dtype, cfg.w_min, cfg.w_max)


def _grad_norm(grads):
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in jax.tree.leaves(grads))
    )


def _apply_updates(state: TrainState, grads, tx) -> TrainState:
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = jax.tree.map(lambda p, u: p + u, state.params, updates)
    return state.replace(step=state.step + 1, params=params, opt_state=opt_state)


def accumulate_grads(grad_fn, batch, rng, accum: int):
    """Gradient accumulation: split ``batch`` into ``accum`` microbatches along
    axis 0, run ``grad_fn(microbatch, rng_i)`` under ``lax.scan``, and average
    the full (aux, grads) output tree.

    TPU-native replacement for the reference's ``accelerator.accumulate``
    context (`train_pcm_lora_sd15.py:1117`, SURVEY.md §2c): one optimizer step
    per ``accum`` microbatches at 1/accum the activation memory. Each
    microbatch draws fresh noise/timesteps from its own fold of ``rng``, same
    as the reference's per-forward sampling.
    """
    if accum <= 1:
        return grad_fn(batch, rng)

    def split(x):
        if x.shape[0] % accum:
            raise ValueError(
                f"batch axis {x.shape[0]} not divisible by grad_accum_steps={accum}"
            )
        # interleaved split (microbatch a = rows a::accum): under a
        # data-sharded mesh each device's contiguous rows land in its own
        # shard of every microbatch, so the split needs no collective
        # (a contiguous reshape would re-shard each microbatch across devices)
        return jnp.swapaxes(x.reshape((x.shape[0] // accum, accum) + x.shape[1:]), 0, 1)

    micro = jax.tree.map(split, batch)
    rngs = jax.random.split(rng, accum)
    first = jax.tree.map(lambda x: x[0], micro)
    zero = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), jax.eval_shape(grad_fn, first, rngs[0])
    )

    def body(carry, inp):
        mb, r = inp
        return jax.tree.map(lambda a, o: a + o, carry, grad_fn(mb, r)), None

    total, _ = jax.lax.scan(body, zero, (micro, rngs))
    return jax.tree.map(lambda t: t / accum, total)


# ---------------------------------------------------------------------------
# epsilon / DDIM family (SD1.5, SDXL)
# ---------------------------------------------------------------------------


def ddim_prepare(
    bundle, schedule: DDPMSchedule, solver: PhasedDDIMSolver, boundaries, cfg: DistillConfig,
    frozen, lora, batch, rng,
) -> Dict[str, Any]:
    """Everything up to (and including) the stop-grad target: noising, CFG
    teacher ODE step, target network jump. ``lora`` = current student LoRA."""
    r_vae, r_noise, r_idx, r_w = jax.random.split(rng, 4)
    latents, cond, uncond = bundle.encode(frozen, batch, r_vae)
    bsz = latents.shape[0]
    noise = jax.random.normal(r_noise, latents.shape, latents.dtype)

    index = jax.random.randint(r_idx, (bsz,), 0, cfg.num_solver_steps)
    start_t = solver.timesteps[index]
    topk = schedule.num_train_timesteps // cfg.num_solver_steps
    t_prev = jnp.maximum(start_t - topk, 0)
    noisy = schedule.add_noise(latents, noise, start_t)
    w = _sample_w(cfg, r_w, bsz, jnp.float32)

    with _no_grad_fwd_ctx(cfg):
        if cfg.not_apply_cfg_solver:
            teacher_out = bundle.teacher(frozen, noisy, start_t, cond)
            cond_out = uncond_out = teacher_out
        else:
            both = bundle.teacher(
                frozen,
                jnp.concatenate([noisy, noisy], axis=0),
                jnp.concatenate([start_t, start_t], axis=0),
                _merge_cond(cond, uncond),
            )
            cond_out, uncond_out = jnp.split(both, 2, axis=0)
    cond_x0 = schedule.predicted_origin(cond_out, start_t, noisy)
    uncond_x0 = schedule.predicted_origin(uncond_out, start_t, noisy)
    pred_x0 = cfg_combine(cond_x0, uncond_x0, w)
    pred_noise = cfg_combine(cond_out, uncond_out, w)
    x_prev = jax.lax.stop_gradient(solver.ddim_step(pred_x0, pred_noise, index))

    with _no_grad_fwd_ctx(cfg):
        target_out = bundle.student(frozen, lora, x_prev, t_prev, cond)
    t_x0 = schedule.predicted_origin(target_out, t_prev, x_prev)
    target_jump, end_t = solver.multiphase_pred(t_x0, target_out, index, cfg.multiphase)
    c_skip, c_out = boundary_scalings(index, boundaries, latents.ndim)
    target = jax.lax.stop_gradient(c_skip * x_prev + c_out * target_jump)

    return dict(
        latents=latents, noise=noise, index=index, start_t=start_t, t_prev=t_prev,
        noisy=noisy, w=w, cond=cond, uncond=uncond, x_prev=x_prev, target=target,
        end_t=end_t,
    )


def ddim_model_pred(bundle, schedule, solver, cfg, frozen, lora, parts):
    """Online student prediction (differentiable w.r.t. ``lora``)."""
    noise_pred = bundle.student(frozen, lora, parts["noisy"], parts["start_t"], parts["cond"])
    px0 = schedule.predicted_origin(noise_pred, parts["start_t"], parts["noisy"])
    model_pred, _ = solver.multiphase_pred(px0, noise_pred, parts["index"], cfg.multiphase)
    # online boundary scalings are c_skip=0, c_out=1 (ref :256-259)
    return model_pred


def build_ddim_distill_step(
    bundle, schedule: DDPMSchedule, cfg: DistillConfig, tx, grad_accum_steps: int = 1
) -> Callable:
    """Epsilon-space (SD1.5/SDXL) consistency-only distillation step."""
    solver = PhasedDDIMSolver.create(schedule, cfg.num_solver_steps)
    boundaries = jnp.asarray(phase_boundaries(cfg.num_solver_steps, cfg.multiphase))

    def step(state: TrainState, frozen, batch, rng) -> Tuple[TrainState, dict]:
        rng = jax.random.fold_in(rng, state.step)

        def grad_fn(mb, r):
            parts = ddim_prepare(
                bundle, schedule, solver, boundaries, cfg, frozen, state.params, mb, r
            )

            def loss_fn(lora):
                model_pred = ddim_model_pred(bundle, schedule, solver, cfg, frozen, lora, parts)
                return consistency_loss(model_pred, parts["target"], cfg.loss_type, cfg.huber_c)

            return jax.value_and_grad(loss_fn)(state.params)

        loss, grads = accumulate_grads(grad_fn, batch, rng, grad_accum_steps)
        new_state = _apply_updates(state, grads, tx)
        return new_state, {"loss": loss, "grad_norm": _grad_norm(grads)}

    return step


# ---------------------------------------------------------------------------
# flow-matching family (SD3)
# ---------------------------------------------------------------------------


def flow_prepare(
    bundle, schedule: FlowSchedule, solver: PhasedEulerSolver, cfg: DistillConfig,
    frozen, lora, batch, rng,
) -> Dict[str, Any]:
    r_vae, r_noise, r_idx, r_w = jax.random.split(rng, 4)
    latents, cond, uncond = bundle.encode(frozen, batch, r_vae)
    bsz = latents.shape[0]
    noise = jax.random.normal(r_noise, latents.shape, latents.dtype)

    index = jax.random.randint(r_idx, (bsz,), 0, cfg.num_solver_steps)
    sigmas = solver.sigmas[index]
    sigmas_prev = solver.sigmas_prev[index]
    timesteps = sigmas * schedule.num_train_timesteps
    timesteps_prev = sigmas_prev * schedule.num_train_timesteps
    noisy = schedule.add_noise(latents, noise, sigmas)
    w = _sample_w(cfg, r_w, bsz, jnp.float32)

    with _no_grad_fwd_ctx(cfg):
        if cfg.not_apply_cfg_solver:
            teacher_out = bundle.teacher(frozen, noisy, timesteps, cond)
            cond_out = uncond_out = teacher_out
        else:
            both = bundle.teacher(
                frozen,
                jnp.concatenate([noisy, noisy], axis=0),
                jnp.concatenate([timesteps, timesteps], axis=0),
                _merge_cond(cond, uncond),
            )
            cond_out, uncond_out = jnp.split(both, 2, axis=0)
    teacher_v = cfg_combine(cond_out, uncond_out, w)
    x_prev = jax.lax.stop_gradient(solver.euler_step(noisy, teacher_v, index))

    with _no_grad_fwd_ctx(cfg):
        target_out = bundle.student(frozen, lora, x_prev, timesteps_prev, cond)
    target, end_index = solver.multiphase_pred(
        x_prev, target_out, index, cfg.multiphase, is_target=True
    )
    target = jax.lax.stop_gradient(target)

    return dict(
        latents=latents, noise=noise, index=index, timesteps=timesteps,
        timesteps_prev=timesteps_prev, noisy=noisy, w=w, cond=cond, uncond=uncond,
        x_prev=x_prev, target=target, end_index=end_index,
    )


def flow_model_pred(bundle, schedule, solver, cfg, frozen, lora, parts):
    v_pred = bundle.student(frozen, lora, parts["noisy"], parts["timesteps"], parts["cond"])
    model_pred, _ = solver.multiphase_pred(
        parts["noisy"], v_pred, parts["index"], cfg.multiphase, is_target=False
    )
    return model_pred


def build_flow_distill_step(
    bundle, schedule: FlowSchedule, cfg: DistillConfig, tx, grad_accum_steps: int = 1
) -> Callable:
    """Flow-matching (SD3) consistency-only distillation step."""
    solver = PhasedEulerSolver.create(schedule, cfg.num_solver_steps)

    def step(state: TrainState, frozen, batch, rng) -> Tuple[TrainState, dict]:
        rng = jax.random.fold_in(rng, state.step)

        def grad_fn(mb, r):
            parts = flow_prepare(bundle, schedule, solver, cfg, frozen, state.params, mb, r)

            def loss_fn(lora):
                model_pred = flow_model_pred(bundle, schedule, solver, cfg, frozen, lora, parts)
                return consistency_loss(model_pred, parts["target"], cfg.loss_type, cfg.huber_c)

            return jax.value_and_grad(loss_fn)(state.params)

        loss, grads = accumulate_grads(grad_fn, batch, rng, grad_accum_steps)
        new_state = _apply_updates(state, grads, tx)
        return new_state, {"loss": loss, "grad_norm": _grad_norm(grads)}

    return step
