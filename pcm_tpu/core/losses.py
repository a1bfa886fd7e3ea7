"""Loss functions for phased consistency distillation.

Pure jnp; everything is computed in float32 regardless of input dtype
(mirrors the reference's ``.float()`` casts before its losses,
`train_pcm_lora_sd15.py:1283-1293`, `discriminator_sd15.py:412-434`).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def huber_loss(pred: jnp.ndarray, target: jnp.ndarray, c: float = 0.001) -> jnp.ndarray:
    """Pseudo-huber: mean(sqrt((pred-target)^2 + c^2) - c)."""
    d = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.mean(jnp.sqrt(d * d + c * c) - c)


def l2_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    d = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.mean(d * d)


def consistency_loss(
    pred: jnp.ndarray, target: jnp.ndarray, loss_type: str = "huber", huber_c: float = 0.001
) -> jnp.ndarray:
    if loss_type == "huber":
        return huber_loss(pred, target, huber_c)
    if loss_type == "l2":
        return l2_loss(pred, target)
    raise ValueError(f"unknown loss_type: {loss_type}")


def cfg_combine(cond: jnp.ndarray, uncond: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """LCM-style CFG: cond + w * (cond - uncond), per-sample w broadcast over
    trailing dims."""
    w = jnp.reshape(w, w.shape + (1,) * (cond.ndim - w.ndim))
    return cond + w * (cond - uncond)


def hinge_d_loss(
    fake_logits: Sequence[jnp.ndarray],
    real_logits: Sequence[jnp.ndarray],
    weight: float = 1.0,
) -> jnp.ndarray:
    """Hinge GAN discriminator loss, averaged over heads:
    mean(relu(1 + fake)) + mean(relu(1 - real))."""
    n = len(fake_logits)
    loss = 0.0
    for f, r in zip(fake_logits, real_logits):
        f = f.astype(jnp.float32)
        r = r.astype(jnp.float32)
        loss += (
            jnp.mean(weight * jnp.maximum(f + 1.0, 0.0))
            + jnp.mean(weight * jnp.maximum(1.0 - r, 0.0))
        ) / n
    return loss


def hinge_g_loss(fake_logits: Sequence[jnp.ndarray], weight: float = 1.0) -> jnp.ndarray:
    """Hinge generator loss: mean(relu(1 - fake)) averaged over heads
    (the reference's saturating form, `discriminator_sd15.py:427-434`)."""
    n = len(fake_logits)
    loss = 0.0
    for f in fake_logits:
        loss += jnp.mean(weight * jnp.maximum(1.0 - f.astype(jnp.float32), 0.0)) / n
    return loss


def feature_matching_loss(
    fake_features: Sequence[jnp.ndarray], real_features: Sequence[jnp.ndarray]
) -> jnp.ndarray:
    """MSE between discriminator feature maps (SDXL ``match_loss``,
    `discriminator_sdxl.py:464-486`)."""
    n = len(fake_features)
    loss = 0.0
    for f, r in zip(fake_features, real_features):
        d = f.astype(jnp.float32) - r.astype(jnp.float32)
        loss += jnp.mean(d * d) / n
    return loss
