"""Train state + optimizer construction.

The optimizer differentiates the ``lora`` collection only (and, in the
adversarial path, the discriminator heads) — base model weights are frozen
bf16 constants, so there are no master copies to shard and no loss scaling
(bf16 on TPU needs none, replacing the reference's fp16 GradScaler,
SURVEY.md §2b).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray  # int32 scalar
    params: Any  # trainable tree (lora params, or discriminator heads)
    opt_state: Any

    @classmethod
    def create(cls, params, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params))


def make_optimizer(
    lr: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    max_grad_norm: Optional[float] = 1.0,
    warmup_steps: int = 0,
    total_steps: Optional[int] = None,
    schedule: str = "constant",
    use_8bit: bool = False,
    optimizer: str = "adamw",
) -> optax.GradientTransformation:
    """AdamW + global-norm clipping, mirroring the reference recipes
    (`train_pcm_lora_sd15.py:985-991`, clip at :1298). ``use_8bit`` swaps in
    the blockwise int8-state AdamW (ref ``--use_8bit_adam`` / bnb AdamW8bit,
    `train_pcm_lora_sd15.py:972-982`). ``optimizer="prodigy"`` selects the
    parameter-free Prodigy optimizer the SD3 trainers offer
    (`train_pcm_lora_sd3.py:1120-1145`; keep lr≈1.0 with it, ref :1131)."""
    if optimizer == "prodigy":
        from .prodigy import prodigy

        chain = []
        if max_grad_norm is not None:
            chain.append(optax.clip_by_global_norm(max_grad_norm))
        chain.append(
            prodigy(lr, betas=(b1, b2), eps=eps, weight_decay=weight_decay)
        )
        return optax.chain(*chain)
    if optimizer != "adamw":
        raise ValueError(f"unsupported optimizer {optimizer!r} (adamw|prodigy)")
    if schedule == "constant":
        lr_schedule = optax.join_schedules(
            [optax.linear_schedule(0.0, lr, max(warmup_steps, 1)), optax.constant_schedule(lr)],
            [warmup_steps],
        ) if warmup_steps else lr
    elif schedule == "cosine":
        assert total_steps is not None
        lr_schedule = optax.warmup_cosine_decay_schedule(
            0.0, lr, warmup_steps, total_steps
        )
    else:
        raise ValueError(schedule)
    chain = []
    if max_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    if use_8bit:
        from .optim8bit import scale_by_adam_8bit

        chain.append(scale_by_adam_8bit(b1, b2, eps))
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        chain.append(optax.scale_by_learning_rate(lr_schedule))
    else:
        chain.append(
            optax.adamw(lr_schedule, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay)
        )
    return optax.chain(*chain)
