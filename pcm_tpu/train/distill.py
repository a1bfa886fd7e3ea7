"""The phased-consistency distillation train step — one fused XLA program.

Student forward (grad, LoRA), CFG teacher forward (cond+uncond batched into a
single pass), stop-grad target forward (same LoRA params), solver jumps,
loss, grads, optimizer update: all inside one jit. Semantics mirror the
reference hot loops (`train_pcm_lora_sd15.py:1115-1301` for the DDIM/epsilon
family, `train_pcm_lora_sd3.py:1263-1392` for flow matching), with the
per-sample python loops replaced by vectorized gathers.

Data parallelism: run the returned step under `jax.jit` with a batch sharded
over the mesh 'data' axis and replicated state — XLA inserts the gradient
all-reduce over ICI (the NCCL/DDP replacement, SURVEY.md §2c).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

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


def _merge_cond(cond, uncond):
    return jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=0), cond, uncond)


def _sample_w(cfg: DistillConfig, rng, bsz, dtype):
    if cfg.fixed_w is not None:
        return jnp.full((bsz,), cfg.fixed_w, dtype)
    return jax.random.uniform(rng, (bsz,), dtype, cfg.w_min, cfg.w_max)


def build_ddim_distill_step(
    bundle, schedule: DDPMSchedule, cfg: DistillConfig, tx
) -> Callable:
    """Epsilon-space (SD1.5/SDXL) distillation step."""
    solver = PhasedDDIMSolver.create(schedule, cfg.num_solver_steps)
    boundaries = jnp.asarray(phase_boundaries(cfg.num_solver_steps, cfg.multiphase))
    topk = schedule.num_train_timesteps // cfg.num_solver_steps

    def step(state: TrainState, frozen, batch, rng) -> Tuple[TrainState, dict]:
        r_vae, r_noise, r_idx, r_w = jax.random.split(jax.random.fold_in(rng, state.step), 4)
        latents, cond, uncond = bundle.encode(frozen, batch, r_vae)
        bsz = latents.shape[0]
        noise = jax.random.normal(r_noise, latents.shape, latents.dtype)

        index = jax.random.randint(r_idx, (bsz,), 0, cfg.num_solver_steps)
        start_t = solver.timesteps[index]
        t_prev = jnp.maximum(start_t - topk, 0)
        noisy = schedule.add_noise(latents, noise, start_t)
        w = _sample_w(cfg, r_w, bsz, jnp.float32)

        # ---- CFG teacher (one fused 2B forward) -------------------------
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

        # ---- stop-grad self-teacher target ------------------------------
        target_out = bundle.student(frozen, state.params, x_prev, t_prev, cond)
        t_x0 = schedule.predicted_origin(target_out, t_prev, x_prev)
        target_jump, _ = solver.multiphase_pred(t_x0, target_out, index, cfg.multiphase)
        c_skip, c_out = boundary_scalings(index, boundaries, latents.ndim)
        target = jax.lax.stop_gradient(c_skip * x_prev + c_out * target_jump)

        # ---- online student + loss + update -----------------------------
        def loss_fn(lora):
            noise_pred = bundle.student(frozen, lora, noisy, start_t, cond)
            px0 = schedule.predicted_origin(noise_pred, start_t, noisy)
            model_pred, _ = solver.multiphase_pred(px0, noise_pred, index, cfg.multiphase)
            # online boundary scalings are c_skip=0, c_out=1 (ref :256-259)
            return consistency_loss(model_pred, target, cfg.loss_type, cfg.huber_c)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params, opt_state=opt_state)
        gnorm = jnp.sqrt(
            sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in jax.tree.leaves(grads))
        )
        return new_state, {"loss": loss, "grad_norm": gnorm}

    return step


def build_flow_distill_step(
    bundle, schedule: FlowSchedule, cfg: DistillConfig, tx
) -> Callable:
    """Flow-matching (SD3) distillation step."""
    solver = PhasedEulerSolver.create(schedule, cfg.num_solver_steps)

    def step(state: TrainState, frozen, batch, rng) -> Tuple[TrainState, dict]:
        r_vae, r_noise, r_idx, r_w = jax.random.split(jax.random.fold_in(rng, state.step), 4)
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

        target_out = bundle.student(frozen, state.params, x_prev, timesteps_prev, cond)
        target, _ = solver.multiphase_pred(
            x_prev, target_out, index, cfg.multiphase, is_target=True
        )
        target = jax.lax.stop_gradient(target)

        def loss_fn(lora):
            v_pred = bundle.student(frozen, lora, noisy, timesteps, cond)
            model_pred, _ = solver.multiphase_pred(
                noisy, v_pred, index, cfg.multiphase, is_target=False
            )
            return consistency_loss(model_pred, target, cfg.loss_type, cfg.huber_c)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params, opt_state=opt_state)
        gnorm = jnp.sqrt(
            sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in jax.tree.leaves(grads))
        )
        return new_state, {"loss": loss, "grad_norm": gnorm}

    return step
