"""Trailing-DDIM and TCD inference schedulers (epsilon-space students).

The PCM-correct DDIM config is trailing spacing with ``clip_sample=False``
and ``set_alpha_to_one=False`` — flagged "important" in the reference
(`train_pcm_lora_sd15.py:129-141`). The TCD variant (used by the reference
demo, `demo/app.py:83-89`) denoises fully to a boundary then stochastically
re-noises by ``gamma``.

Functional, jit-friendly: schedulers are frozen tables + pure step functions;
the sampling loop lives in `pipeline.py`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.schedule import DDPMSchedule, _bcast


def trailing_timesteps(num_train_timesteps: int, num_inference_steps: int) -> np.ndarray:
    """Descending timesteps by the 'trailing' rule (Table 2, arXiv:2305.08891)."""
    step_ratio = num_train_timesteps / num_inference_steps
    ts = np.round(np.arange(num_train_timesteps, 0, -step_ratio)).astype(np.int64) - 1
    return ts


@dataclasses.dataclass(frozen=True)
class DDIMSampler:
    """Deterministic DDIM over trailing timesteps."""

    schedule: DDPMSchedule
    timesteps: jnp.ndarray  # descending (S,)
    alphas: jnp.ndarray  # (S,) alpha_cumprod at timesteps
    alphas_prev: jnp.ndarray  # (S,) alpha_cumprod at next (lower) timestep;
    # last entry = alphas_cumprod[0]  (set_alpha_to_one=False)

    @classmethod
    def create(cls, schedule: DDPMSchedule, num_inference_steps: int) -> "DDIMSampler":
        ts = trailing_timesteps(schedule.num_train_timesteps, num_inference_steps)
        ac = np.asarray(schedule.alphas_cumprod)
        alphas = ac[ts]
        alphas_prev = np.concatenate([ac[ts[1:]], [ac[0]]])
        return cls(
            schedule=schedule,
            timesteps=jnp.asarray(ts, jnp.int32),
            alphas=jnp.asarray(alphas, jnp.float32),
            alphas_prev=jnp.asarray(alphas_prev, jnp.float32),
        )

    @property
    def num_steps(self) -> int:
        return int(self.timesteps.shape[0])

    def step(
        self, model_output: jnp.ndarray, i: int, sample: jnp.ndarray,
        rng: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """One DDIM step at position ``i`` in the descending schedule
        (``rng`` unused — deterministic sampler, uniform signature)."""
        a_t = _bcast(self.alphas[i], sample.ndim)
        a_prev = _bcast(self.alphas_prev[i], sample.ndim)
        x = sample.astype(jnp.float32)
        eps = model_output.astype(jnp.float32)
        if self.schedule.prediction_type == "v_prediction":
            x0 = jnp.sqrt(a_t) * x - jnp.sqrt(1 - a_t) * eps
            eps = jnp.sqrt(a_t) * eps + jnp.sqrt(1 - a_t) * x
        else:
            x0 = (x - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
        prev = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1 - a_prev) * eps
        return prev.astype(sample.dtype)


@dataclasses.dataclass(frozen=True)
class TCDSampler:
    """Trajectory-consistency sampling: DDIM to ``s=(1-gamma)t_prev`` then
    re-noise to ``t_prev`` with fresh noise (gamma=0 -> plain DDIM)."""

    schedule: DDPMSchedule
    timesteps: jnp.ndarray
    alphas: jnp.ndarray
    alphas_prev: jnp.ndarray
    alphas_s: jnp.ndarray  # alpha at s = (1-gamma)*t_prev
    gamma: float

    @classmethod
    def create(
        cls, schedule: DDPMSchedule, num_inference_steps: int, gamma: float = 0.3
    ) -> "TCDSampler":
        ts = trailing_timesteps(schedule.num_train_timesteps, num_inference_steps)
        ac = np.asarray(schedule.alphas_cumprod)
        ts_prev = np.concatenate([ts[1:], [0]])
        ts_s = np.floor((1.0 - gamma) * ts_prev).astype(np.int64)
        return cls(
            schedule=schedule,
            timesteps=jnp.asarray(ts, jnp.int32),
            alphas=jnp.asarray(ac[ts], jnp.float32),
            alphas_prev=jnp.asarray(np.concatenate([ac[ts[1:]], [ac[0]]]), jnp.float32),
            alphas_s=jnp.asarray(ac[ts_s], jnp.float32),
            gamma=gamma,
        )

    @property
    def num_steps(self) -> int:
        return int(self.timesteps.shape[0])

    def step(
        self, model_output: jnp.ndarray, i: int, sample: jnp.ndarray, rng: jax.Array
    ) -> jnp.ndarray:
        a_t = _bcast(self.alphas[i], sample.ndim)
        a_prev = _bcast(self.alphas_prev[i], sample.ndim)
        a_s = _bcast(self.alphas_s[i], sample.ndim)
        x = sample.astype(jnp.float32)
        eps = model_output.astype(jnp.float32)
        if self.schedule.prediction_type == "v_prediction":
            x0 = jnp.sqrt(a_t) * x - jnp.sqrt(1 - a_t) * eps
            eps = jnp.sqrt(a_t) * eps + jnp.sqrt(1 - a_t) * x
        else:
            x0 = (x - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
        # deterministic jump to s
        x_s = jnp.sqrt(a_s) * x0 + jnp.sqrt(1 - a_s) * eps
        if self.gamma == 0.0:
            return x_s.astype(sample.dtype)
        # stochastic re-noise from s up to t_prev (alpha ratio), skipped at
        # the final step where t_prev == s == 0
        ratio = a_prev / a_s
        noise = jax.random.normal(rng, x_s.shape, jnp.float32)
        x_prev = jnp.sqrt(ratio) * x_s + jnp.sqrt(jnp.maximum(1 - ratio, 0.0)) * noise
        is_final = i == (self.num_steps - 1)
        out = jnp.where(is_final, x_s, x_prev)
        return out.astype(sample.dtype)
