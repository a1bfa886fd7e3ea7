"""PCM flow-matching inference schedulers (SD3 students).

Deterministic + stochastic variants with the shifted-sigma PCM grid,
re-derived from reference `pcm_fm_deterministic_scheduler.py` /
`pcm_fm_stochastic_scheduler.py`: the inference sigmas subsample the
``pcm_timesteps``-point training grid with the same floor-linspace boundary
rule used at training time, so k-step inference lands exactly on the k phase
boundaries.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.schedule import FlowSchedule
from ..core.solver import phase_boundaries, solver_grid


def pcm_fm_sigmas(
    schedule: FlowSchedule, pcm_timesteps: int, num_inference_steps: int
) -> np.ndarray:
    """Descending inference sigmas: the phase-boundary subsample of the PCM
    solver grid, with a terminal 0 appended."""
    grid = solver_grid(schedule.num_train_timesteps, pcm_timesteps)
    sig = np.asarray(schedule.sigmas)[grid]  # ascending, (S,)
    desc = sig[::-1]  # descending over grid points
    idx = phase_boundaries(pcm_timesteps, num_inference_steps)
    sigmas = desc[idx]
    return np.concatenate([sigmas, [0.0]]).astype(np.float32)


@dataclasses.dataclass(frozen=True)
class PCMFMSampler:
    """``stochastic=False``: Euler step  x' = x + (x - x0_pred)/sigma * dsigma.
    ``stochastic=True``: full denoise + fresh-noise renoise ("a clearer LCM",
    reference README.md:26)."""

    sigmas: jnp.ndarray  # (S+1,) descending with terminal 0
    num_train_timesteps: int
    stochastic: bool = False

    @classmethod
    def create(
        cls,
        schedule: FlowSchedule,
        num_inference_steps: int,
        pcm_timesteps: int = 50,
        stochastic: bool = False,
    ) -> "PCMFMSampler":
        return cls(
            sigmas=jnp.asarray(pcm_fm_sigmas(schedule, pcm_timesteps, num_inference_steps)),
            num_train_timesteps=schedule.num_train_timesteps,
            stochastic=stochastic,
        )

    @property
    def num_steps(self) -> int:
        return int(self.sigmas.shape[0]) - 1

    @property
    def timesteps(self) -> jnp.ndarray:
        return self.sigmas[:-1] * self.num_train_timesteps

    def scale_noise(self, sample: jnp.ndarray, noise: jnp.ndarray, i: int = 0) -> jnp.ndarray:
        sigma = self.sigmas[i]
        return sigma * noise + (1.0 - sigma) * sample

    def step(
        self,
        model_output: jnp.ndarray,
        i: int,
        sample: jnp.ndarray,
        rng: jax.Array = None,
    ) -> jnp.ndarray:
        x = sample.astype(jnp.float32)
        v = model_output.astype(jnp.float32)
        sigma = self.sigmas[i]
        sigma_next = self.sigmas[i + 1]
        denoised = x - v * sigma
        if self.stochastic:
            noise = jax.random.normal(rng, x.shape, jnp.float32)
            prev = (1.0 - sigma_next) * denoised + sigma_next * noise
        else:
            prev = x + (x - denoised) / sigma * (sigma_next - sigma)
        return prev.astype(sample.dtype)
