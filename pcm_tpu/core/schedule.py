"""Noise schedules for diffusion (DDPM) and flow-matching teachers.

Pure-jnp static tables. These replace the reference's scheduler *math*
(diffusers `DDPMScheduler` tables, cf. reference
`code/text_to_image_sd15/scheduling_ddpm_modified.py:183-234`, and
`FlowMatchEulerDiscreteScheduler` shifted sigmas, cf. reference
`code/text_to_image_sd3/pcm_fm_deterministic_scheduler.py:47-58`) as plain
arrays that get baked into a single jitted train step — no scheduler objects
on the hot path.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DDPMSchedule:
    """Static DDPM schedule tables (all shape ``(num_train_timesteps,)``).

    ``alphas_cumprod[t]`` is the cumulative product of (1 - beta) up to and
    including training timestep ``t``. ``sqrt_alphas_cumprod`` /
    ``sqrt_one_minus_alphas_cumprod`` are the alpha/sigma coefficient tables
    used everywhere in PCM (epsilon/v-prediction reconstruction, noising,
    noise-travel).
    """

    num_train_timesteps: int
    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    prediction_type: str = "epsilon"  # or "v_prediction"

    @property
    def sqrt_alphas_cumprod(self) -> jnp.ndarray:
        return jnp.sqrt(self.alphas_cumprod)

    @property
    def sqrt_one_minus_alphas_cumprod(self) -> jnp.ndarray:
        return jnp.sqrt(1.0 - self.alphas_cumprod)

    # ---- forward process -------------------------------------------------

    def add_noise(self, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """q(x_t | x_0): sqrt(a_t) x0 + sqrt(1-a_t) eps, per-sample t."""
        a = _bcast(self.sqrt_alphas_cumprod[t], x0.ndim)
        s = _bcast(self.sqrt_one_minus_alphas_cumprod[t], x0.ndim)
        return a * x0 + s * noise

    def noise_travel(
        self,
        x_cur: jnp.ndarray,
        noise: jnp.ndarray,
        t_cur: jnp.ndarray,
        t_tgt: jnp.ndarray,
    ) -> jnp.ndarray:
        """Re-noise a sample from timestep ``t_cur`` to a later ``t_tgt``.

        Uses the cumulative-alpha ratio r = a_tgt / a_cur so that
        x_tgt = sqrt(r) x_cur + sqrt(1-r) eps has the correct marginal.
        Semantics of reference `scheduling_ddpm_modified.py:526-554`.
        """
        r = self.alphas_cumprod[t_tgt] / self.alphas_cumprod[t_cur]
        a = _bcast(jnp.sqrt(r), x_cur.ndim)
        s = _bcast(jnp.sqrt(1.0 - r), x_cur.ndim)
        return a * x_cur + s * noise

    def velocity(self, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """v-prediction target: sqrt(a_t) eps - sqrt(1-a_t) x0."""
        a = _bcast(self.sqrt_alphas_cumprod[t], x0.ndim)
        s = _bcast(self.sqrt_one_minus_alphas_cumprod[t], x0.ndim)
        return a * noise - s * x0

    def predicted_origin(
        self,
        model_output: jnp.ndarray,
        t: jnp.ndarray,
        sample: jnp.ndarray,
        prediction_type: Optional[str] = None,
    ) -> jnp.ndarray:
        """Recover x0 from an epsilon- or v-prediction at per-sample t.

        Semantics of reference `train_pcm_lora_sd15.py:268-280`.
        """
        pt = prediction_type or self.prediction_type
        a = _bcast(self.sqrt_alphas_cumprod[t], sample.ndim)
        s = _bcast(self.sqrt_one_minus_alphas_cumprod[t], sample.ndim)
        if pt == "epsilon":
            return (sample - s * model_output) / a
        if pt == "v_prediction":
            return a * sample - s * model_output
        raise ValueError(f"unknown prediction_type: {pt}")


def make_ddpm_schedule(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    beta_schedule: str = "scaled_linear",
    prediction_type: str = "epsilon",
) -> DDPMSchedule:
    """Build the DDPM beta/alpha tables (defaults = SD1.x/SDXL convention)."""
    if beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    elif beta_schedule == "scaled_linear":
        betas = (
            np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64)
            ** 2
        )
    elif beta_schedule == "squaredcos_cap_v2":
        # Glide cosine schedule.
        def alpha_bar(u):
            return np.cos((u + 0.008) / 1.008 * np.pi / 2) ** 2

        ts = np.arange(num_train_timesteps, dtype=np.float64)
        betas = np.minimum(
            1.0 - alpha_bar((ts + 1) / num_train_timesteps) / alpha_bar(ts / num_train_timesteps),
            0.999,
        )
    else:
        raise ValueError(f"unknown beta_schedule: {beta_schedule}")
    alphas_cumprod = np.cumprod(1.0 - betas)
    return DDPMSchedule(
        num_train_timesteps=num_train_timesteps,
        betas=jnp.asarray(betas, jnp.float32),
        alphas_cumprod=jnp.asarray(alphas_cumprod, jnp.float32),
        prediction_type=prediction_type,
    )


@dataclasses.dataclass(frozen=True)
class FlowSchedule:
    """Shifted rectified-flow sigma table, ascending in training timestep.

    ``sigmas[t] = shift*s / (1 + (shift-1)*s)`` with ``s = (t+1)/T`` — the
    SD3 convention (reference `pcm_fm_deterministic_scheduler.py:47-58`;
    the trainer feeds the same table reversed-to-ascending into its solver,
    `train_pcm_lora_sd3.py:961-966`). The noising convention is
    ``x_t = sigma*eps + (1-sigma)*x0`` and the model predicts the velocity
    ``v ≈ eps - x0`` so an Euler step is ``x' = x + (sigma' - sigma) * v``.
    """

    num_train_timesteps: int
    shift: float
    sigmas: jnp.ndarray  # (T,) ascending

    def timestep_of_sigma(self, sigma: jnp.ndarray) -> jnp.ndarray:
        return sigma * self.num_train_timesteps

    def add_noise(self, x0: jnp.ndarray, noise: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
        s = _bcast(sigma, x0.ndim)
        return s * noise + (1.0 - s) * x0


def make_flow_schedule(num_train_timesteps: int = 1000, shift: float = 3.0) -> FlowSchedule:
    s = np.arange(1, num_train_timesteps + 1, dtype=np.float64) / num_train_timesteps
    sigmas = shift * s / (1.0 + (shift - 1.0) * s)
    return FlowSchedule(
        num_train_timesteps=num_train_timesteps,
        shift=shift,
        sigmas=jnp.asarray(sigmas, jnp.float32),
    )


def _bcast(x: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Right-pad ``x``'s shape with singleton dims up to ``ndim``."""
    x = jnp.reshape(x, x.shape + (1,) * (ndim - x.ndim)) if x.ndim < ndim else x
    return x


def guidance_scale_embedding(w: jnp.ndarray, embedding_dim: int = 512) -> jnp.ndarray:
    """Sinusoidal CFG-scale embedding (LCM convention, w scaled by 1000).

    Semantics of reference `train_pcm_lora_sd15.py:211-237`.
    """
    assert w.ndim == 1
    w = w.astype(jnp.float32) * 1000.0
    half = embedding_dim // 2
    freqs = jnp.exp(-np.log(10000.0) / (half - 1) * jnp.arange(half, dtype=jnp.float32))
    emb = w[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb
