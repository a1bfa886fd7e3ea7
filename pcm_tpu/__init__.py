"""pcm_tpu — a TPU-native phased-consistency-distillation framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
G-U-N/Phased-Consistency-Model (arXiv:2405.18407): phased consistency
distillation of SD1.5/SDXL UNets and SD3's MMDiT into few-step LoRA students,
with CFG-aware teacher ODE solving, optional latent hinge-GAN losses, and
few-step inference schedulers — all built as pure functional JAX with Pallas
kernels on the hot path and `jax.sharding` data/FSDP parallelism over ICI.

Layout:
  core/      schedules, phased solvers, losses (pure jnp math)
  ops/       Pallas TPU kernels (flash attention, fused GroupNorm+SiLU, GEGLU)
  models/    flax modules: UNet (SD1.5/SDXL), MMDiT (SD3), VAE, CLIP, T5
  lora/      LoRA overlays as a flax collection + kohya/diffusers interop
  train/     single jitted distillation step, adversarial step, loops
  sampling/  trailing-DDIM / TCD / PCM flow-matching schedulers + pipeline
  parallel/  mesh + sharding helpers
  data/      image-folder dataset with sidecar captions, host prefetch
"""

__version__ = "0.1.0"
