"""Phased ODE solvers — the heart of phased consistency distillation.

A PCM student maps any point on the PF-ODE trajectory to the *start of its
phase* (the largest "boundary" grid point at or below it). These solvers hold
the discretized solver grid (50/40/100 points out of 1000 training steps) and
implement, fully vectorized over the batch:

  * one discrete solver step (DDIM for epsilon-space, Euler for flow space),
  * the phased multi-boundary step used to build both the online prediction
    and the stop-grad target,
  * the boundary-condition scalings c_skip/c_out.

Semantics re-derived from reference `train_pcm_lora_sd15.py:250-341`
(`DDIMSolver`, `scalings_for_boundary_conditions_*`) and
`train_pcm_lora_sd3.py:160-226` (`EulerSolver`). The reference's per-sample
mask/flip/argmax boundary search (`train_pcm_lora_sd15.py:329-335`) becomes a
`searchsorted` gather, which is identical on sorted boundary grids and maps to
a single XLA gather.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .schedule import DDPMSchedule, FlowSchedule, _bcast


def solver_grid(num_train_timesteps: int, num_solver_steps: int) -> np.ndarray:
    """The PCM solver grid: ``(arange(1, S+1) * (T // S)) - 1`` (leading-free).

    e.g. T=1000, S=50 -> [19, 39, ..., 999].
    """
    step_ratio = num_train_timesteps // num_solver_steps
    return (np.arange(1, num_solver_steps + 1) * step_ratio).round().astype(np.int64) - 1


def phase_boundaries(num_solver_steps: int, multiphase: int) -> np.ndarray:
    """Indices (into the solver grid) of phase starts: floor-linspace, no endpoint.

    e.g. S=50, multiphase=4 -> [0, 12, 25, 37].
    """
    idx = np.linspace(0, num_solver_steps, num=multiphase, endpoint=False)
    return np.floor(idx).astype(np.int64)


def last_boundary_at_or_below(index: jnp.ndarray, boundaries: jnp.ndarray) -> jnp.ndarray:
    """For each sample index, the largest boundary <= index (boundaries sorted asc,
    boundaries[0] == 0)."""
    pos = jnp.searchsorted(boundaries, index, side="right") - 1
    return boundaries[pos]


def boundary_scalings(
    index: jnp.ndarray, boundaries: jnp.ndarray, ndim: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Target-network boundary conditions: c_skip = [index is exactly a boundary],
    c_out = 1 - c_skip.  (Online network uses c_skip=0, c_out=1 and needs no
    helper.)  Semantics of reference `train_pcm_lora_sd15.py:250-259`."""
    c_skip = (index[:, None] == boundaries[None, :]).any(axis=-1).astype(jnp.float32)
    c_out = 1.0 - c_skip
    return _bcast(c_skip, ndim), _bcast(c_out, ndim)


@dataclasses.dataclass(frozen=True)
class PhasedDDIMSolver:
    """Epsilon-space phased solver over a discrete DDIM grid.

    All tables have shape ``(S,)`` where S = num_solver_steps. ``timesteps[i]``
    is the training timestep of grid point i; ``*_prev`` tables are shifted one
    grid point toward t=0 (with element 0 clamped to training timestep 0).
    """

    timesteps: jnp.ndarray  # int32 (S,)
    timesteps_prev: jnp.ndarray  # int32 (S,)
    alpha_cumprods: jnp.ndarray  # f32 (S,)
    alpha_cumprods_prev: jnp.ndarray  # f32 (S,)

    @classmethod
    def create(
        cls, schedule: DDPMSchedule, num_solver_steps: int = 50
    ) -> "PhasedDDIMSolver":
        grid = solver_grid(schedule.num_train_timesteps, num_solver_steps)
        ac = np.asarray(schedule.alphas_cumprod)
        grid_prev = np.concatenate([[0], grid[:-1]])
        ac_prev = np.concatenate([[ac[0]], ac[grid[:-1]]])
        return cls(
            timesteps=jnp.asarray(grid, jnp.int32),
            timesteps_prev=jnp.asarray(grid_prev, jnp.int32),
            alpha_cumprods=jnp.asarray(ac[grid], jnp.float32),
            alpha_cumprods_prev=jnp.asarray(ac_prev, jnp.float32),
        )

    @property
    def num_steps(self) -> int:
        return int(self.timesteps.shape[0])

    def ddim_step(
        self, pred_x0: jnp.ndarray, pred_noise: jnp.ndarray, index: jnp.ndarray
    ) -> jnp.ndarray:
        """One DDIM step from grid point ``index`` to the previous grid point."""
        a_prev = _bcast(self.alpha_cumprods_prev[index], pred_x0.ndim)
        return jnp.sqrt(a_prev) * pred_x0 + jnp.sqrt(1.0 - a_prev) * pred_noise

    def multiphase_pred(
        self,
        pred_x0: jnp.ndarray,
        pred_noise: jnp.ndarray,
        index: jnp.ndarray,
        multiphase: int,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Jump from grid point ``index`` to the start of its phase.

        Returns (x at phase start, training timestep of phase start).
        """
        boundaries = jnp.asarray(phase_boundaries(self.num_steps, multiphase))
        b = last_boundary_at_or_below(index, boundaries)
        a_prev = _bcast(self.alpha_cumprods_prev[b], pred_x0.ndim)
        x_prev = jnp.sqrt(a_prev) * pred_x0 + jnp.sqrt(1.0 - a_prev) * pred_noise
        return x_prev, self.timesteps_prev[b]


@dataclasses.dataclass(frozen=True)
class PhasedEulerSolver:
    """Flow-space phased solver (SD3): Euler steps on the shifted sigma grid.

    The model prediction is the flow velocity v ≈ eps - x0; a step from sigma
    to sigma' is ``x' = x + (sigma' - sigma) * v``.
    """

    timesteps: jnp.ndarray  # int32 (S,) indices into the 1000-step table
    timesteps_prev: jnp.ndarray  # int32 (S,)
    sigmas: jnp.ndarray  # f32 (S,)
    sigmas_prev: jnp.ndarray  # f32 (S,)

    @classmethod
    def create(
        cls, schedule: FlowSchedule, num_solver_steps: int = 100
    ) -> "PhasedEulerSolver":
        grid = solver_grid(schedule.num_train_timesteps, num_solver_steps)
        sig = np.asarray(schedule.sigmas)
        grid_prev = np.concatenate([[0], grid[:-1]])
        sig_prev = np.concatenate([[sig[0]], sig[grid[:-1]]])
        return cls(
            timesteps=jnp.asarray(grid, jnp.int32),
            timesteps_prev=jnp.asarray(grid_prev, jnp.int32),
            sigmas=jnp.asarray(sig[grid], jnp.float32),
            sigmas_prev=jnp.asarray(sig_prev, jnp.float32),
        )

    @property
    def num_steps(self) -> int:
        return int(self.timesteps.shape[0])

    def euler_step(
        self, sample: jnp.ndarray, velocity: jnp.ndarray, index: jnp.ndarray
    ) -> jnp.ndarray:
        sigma = _bcast(self.sigmas[index], sample.ndim)
        sigma_prev = _bcast(self.sigmas_prev[index], sample.ndim)
        return sample + (sigma_prev - sigma) * velocity

    def multiphase_pred(
        self,
        sample: jnp.ndarray,
        velocity: jnp.ndarray,
        index: jnp.ndarray,
        multiphase: int,
        is_target: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Euler jump from grid point ``index`` to the start of its phase.

        ``is_target=True`` means ``sample`` sits at the *previous* grid point
        (sigma_prev[index]) rather than at sigma[index] — used when computing
        the stop-grad target from x_prev (reference
        `train_pcm_lora_sd3.py:217-220`).
        """
        boundaries = jnp.asarray(phase_boundaries(self.num_steps, multiphase))
        b = last_boundary_at_or_below(index, boundaries)
        src = self.sigmas_prev[index] if is_target else self.sigmas[index]
        sigma = _bcast(src, sample.ndim)
        sigma_end = _bcast(self.sigmas_prev[b], sample.ndim)
        x_prev = sample + (sigma_end - sigma) * velocity
        return x_prev, b
