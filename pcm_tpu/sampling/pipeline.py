"""Few-step text-to-image pipeline for distilled PCM students.

The TPU-native equivalent of the reference's validation/deployment paths
(`log_validation` building a diffusers pipeline with trailing-DDIM,
`train_pcm_lora_sd15.py:120-207`; SD3 with the PCMFM schedulers,
`sd3_test.py`). The whole sampling loop — text encode, k model forwards,
scheduler steps, VAE decode — is one jittable function with a static step
count (the loop is unrolled; k <= 16).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..core.losses import cfg_combine  # noqa: F401 (training-CFG variant)


@dataclasses.dataclass(frozen=True)
class TextToImagePipeline:
    """Family-agnostic sampler driver over a model bundle + scheduler."""

    bundle: Any  # SD15Bundle | SDXLBundle | SD3Bundle
    sampler: Any  # DDIMSampler | TCDSampler | PCMFMSampler

    def generate(
        self,
        frozen: Dict[str, Any],
        lora: Optional[Dict[str, Any]],
        cond: Dict[str, Any],
        uncond: Optional[Dict[str, Any]],
        rng: jax.Array,
        latent_hw: int,
        guidance_scale: float = 1.0,
        decode: bool = True,
        decode_chunk: Optional[int] = None,
        init_latents: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """cond/uncond from ``bundle.encode_prompts``; returns images in
        [-1, 1] (or raw latents with ``decode=False``). ``init_latents``
        replaces the rng-drawn starting noise — serving uses it for
        per-request seed reproducibility independent of batch composition."""
        from ..ops.common import elementwise_impl

        with elementwise_impl("xla"):
            return self._generate(
                frozen, lora, cond, uncond, rng, latent_hw, guidance_scale,
                decode, decode_chunk, init_latents,
            )

    def _generate(
        self,
        frozen: Dict[str, Any],
        lora: Optional[Dict[str, Any]],
        cond: Dict[str, Any],
        uncond: Optional[Dict[str, Any]],
        rng: jax.Array,
        latent_hw: int,
        guidance_scale: float = 1.0,
        decode: bool = True,
        decode_chunk: Optional[int] = None,
        init_latents: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        # inference graphs have no remat, so the faster XLA GEGLU/GroupNorm
        # compile fine here (see ops/common.py:pallas_elementwise)
        bundle = self.bundle
        sampler = self.sampler
        bsz = jax.tree.leaves(cond)[0].shape[0]
        ch = bundle_latent_channels(bundle)
        r_init, r_loop = jax.random.split(rng)
        if init_latents is not None:
            latents = init_latents.astype(jnp.float32)
        else:
            latents = jax.random.normal(
                r_init, (bsz, latent_hw, latent_hw, ch), jnp.float32
            )

        use_cfg = guidance_scale > 1.0 and uncond is not None
        timesteps = sampler.timesteps

        def model_fn(x, t_scalar, c):
            t = jnp.full((x.shape[0],), t_scalar, jnp.float32)
            if lora is None:
                return bundle.teacher(frozen, x, t, c)
            return bundle.student(frozen, lora, x, t, c)

        merged = (
            jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=0), cond, uncond)
            if use_cfg
            else cond
        )

        for i in range(sampler.num_steps):
            t = timesteps[i]
            if use_cfg:
                both = model_fn(jnp.concatenate([latents, latents], axis=0), t, merged)
                c_out, u_out = jnp.split(both, 2, axis=0)
                model_output = u_out + guidance_scale * (c_out - u_out)
            else:
                model_output = model_fn(latents, t, merged)
            r_loop, r_step = jax.random.split(r_loop)
            latents = sampler.step(model_output, i, latents, r_step)

        if not decode:
            return latents
        return bundle.decode_latents(frozen, latents, chunk=decode_chunk)


def bundle_latent_channels(bundle) -> int:
    if hasattr(bundle, "unet_cfg"):
        return bundle.unet_cfg.in_channels
    return bundle.mmdit_cfg.in_channels
