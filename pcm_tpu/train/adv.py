"""Adversarial consistency training: discriminator heads + alternating steps.

Discriminator = frozen teacher backbone run in feature-capture mode + small
trainable conv heads with hinge losses, mirroring the reference
(`discriminator_sd15.py`: 9 taps (4 down + mid + 4 up), 3x3 heads,
num_h_per_head=4; `discriminator_sdxl.py`: down+mid only, 1x1 heads;
`discriminator_sd3.py`: all 24 MMDiT blocks reshaped to a spatial grid).

The D/G alternation becomes two separately-jitted step functions called on
alternating batches — same effective math as the reference's
``global_step % 2`` branch (`train_pcm_lora_sd15_adv.py:1374-1431`), with
each parity running the full data+teacher pipeline on a fresh batch.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.losses import consistency_loss, hinge_d_loss, hinge_g_loss
from ..core.schedule import DDPMSchedule, FlowSchedule, _bcast
from ..core.solver import PhasedDDIMSolver, PhasedEulerSolver, phase_boundaries
from ..models.normalization import GroupNorm
from .distill import (
    DistillConfig,
    _apply_updates,
    _grad_norm,
    accumulate_grads,
    ddim_model_pred,
    ddim_prepare,
    flow_model_pred,
    flow_prepare,
)
from .state import TrainState


class DiscriminatorHead(nn.Module):
    """conv(+GN32+LeakyReLU) x2 with residual, then 1x1 conv -> 1 logit map.
    (`discriminator_sd15.py:348-368`; SDXL/SD3 use 1x1 convs)."""

    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        k = (self.kernel, self.kernel)
        pad = "SAME" if self.kernel > 1 else "VALID"
        h = nn.Conv(c, k, padding=pad, dtype=self.dtype, name="conv1")(x)
        h = GroupNorm(32, act=None, dtype=self.dtype, name="norm1")(h)
        h = nn.leaky_relu(h, 0.01)
        h2 = nn.Conv(c, k, padding=pad, dtype=self.dtype, name="conv2")(h)
        h2 = GroupNorm(32, act=None, dtype=self.dtype, name="norm2")(h2)
        h2 = nn.leaky_relu(h2, 0.01)
        h = h2 + h
        return nn.Conv(1, (1, 1), padding="VALID", dtype=self.dtype, name="conv_out")(h)


@dataclasses.dataclass(frozen=True)
class DiscriminatorConfig:
    taps: Tuple[str, ...]  # ordered feature keys from the backbone's sow
    num_h_per_head: int = 1
    kernel: int = 1


SD15_DISC_CONFIG = DiscriminatorConfig(
    taps=("down_0", "down_1", "down_2", "down_3", "mid", "up_0", "up_1", "up_2", "up_3"),
    num_h_per_head=4,
    kernel=3,
)
SDXL_DISC_CONFIG = DiscriminatorConfig(
    taps=("down_0", "down_1", "down_2", "mid"), num_h_per_head=1, kernel=1
)
SD3_DISC_CONFIG = DiscriminatorConfig(
    taps=tuple(f"block_{i}" for i in range(24)), num_h_per_head=1, kernel=1
)


class Discriminator(nn.Module):
    """Trainable heads over frozen-backbone features."""

    cfg: DiscriminatorConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray]):
        outputs = []
        for i, tap in enumerate(self.cfg.taps):
            f = features[tap].astype(self.dtype)
            if f.ndim == 3:  # (B, S, C) seq features -> spatial grid
                b, s, c = f.shape
                side = int(round(s**0.5))
                f = f.reshape(b, side, side, c)
            for j in range(self.cfg.num_h_per_head):
                outputs.append(
                    DiscriminatorHead(self.cfg.kernel, self.dtype, name=f"head_{i}_{j}")(f)
                )
        return outputs


def feature_match_loss(fake_feats: Dict[str, jnp.ndarray],
                       real_feats: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Mean-squared feature-matching loss over the discriminator taps,
    stop-gradient on the real branch — the reference's `match_loss` /
    `feature_loss` (`discriminator_sdxl.py:464-486`,
    `discriminator_sd15.py:436-448`; defined on every Discriminator but
    never invoked by any trainer — same optional status here)."""
    taps = sorted(fake_feats)
    per = [
        jnp.mean((fake_feats[k].astype(jnp.float32)
                  - jax.lax.stop_gradient(real_feats[k]).astype(jnp.float32)) ** 2)
        for k in taps
    ]
    return sum(per) / len(per)


@dataclasses.dataclass(frozen=True)
class AdvConfig:
    adv_weight: float = 0.1


# ---------------------------------------------------------------------------
# epsilon / DDIM family adversarial steps
# ---------------------------------------------------------------------------


def _pair_features(bundle, frozen, fake, real, adv_t, cond, **kw):
    """One 2B frozen-teacher feature forward over [fake; real] instead of two
    B forwards. Per-sample ops only (GroupNorm/attention/conv are batch-wise
    independent), so the features are identical to two separate passes — but
    the MXU sees twice the batch (the reference's dual `modified_forward`
    calls, `discriminator_sdxl.py:428-449`, are dispatch-bound at B=1) and the
    traced graph carries ONE teacher forward instead of two (half the jaxpr —
    relieves the axon remote-compiler size pressure on monolithic D graphs)."""
    bsz = fake.shape[0]
    both = jnp.concatenate([fake, real], axis=0)
    t_both = jnp.concatenate([adv_t, adv_t], axis=0)
    cond_both = jax.tree.map(lambda a: jnp.concatenate([a, a], axis=0), cond)
    feats = bundle.teacher_features(frozen, both, t_both, cond_both, **kw)
    fake_feats = jax.tree.map(lambda f: f[:bsz], feats)
    real_feats = jax.tree.map(lambda f: f[bsz:], feats)
    return fake_feats, real_feats


def build_ddim_adv_steps(
    bundle,
    schedule: DDPMSchedule,
    cfg: DistillConfig,
    adv: AdvConfig,
    disc: Discriminator,
    tx_g,
    tx_d,
    grad_accum_steps: int = 1,
) -> Tuple[Callable, Callable]:
    """Returns (g_step, d_step). The training loop alternates them, each on a
    fresh batch, exactly like the reference's step-parity switch."""
    solver = PhasedDDIMSolver.create(schedule, cfg.num_solver_steps)
    boundaries = jnp.asarray(phase_boundaries(cfg.num_solver_steps, cfg.multiphase))

    # SDXL's discriminator taps down+mid only -> skip the up blocks entirely
    stop_after_mid = not any(t.startswith("up") for t in disc.cfg.taps)

    def _sample_adv_t(parts, r_t):
        bsz = parts["end_t"].shape[0]
        span = schedule.num_train_timesteps // cfg.multiphase
        return jnp.minimum(
            parts["end_t"] + jax.random.randint(r_t, (bsz,), 0, span),
            schedule.num_train_timesteps - 1,
        )

    def g_step(g_state: TrainState, d_state: TrainState, frozen, batch, rng):
        rng = jax.random.fold_in(rng, g_state.step)

        def grad_fn(mb, r):
            r, r_adv = jax.random.split(r)
            parts = ddim_prepare(
                bundle, schedule, solver, boundaries, cfg, frozen, g_state.params, mb, r
            )
            r_t, r_fake, _ = jax.random.split(r_adv, 3)
            adv_t = _sample_adv_t(parts, r_t)
            eps_fake = jax.random.normal(r_fake, parts["latents"].shape, parts["latents"].dtype)

            def loss_fn(lora):
                model_pred = ddim_model_pred(bundle, schedule, solver, cfg, frozen, lora, parts)
                cm = consistency_loss(model_pred, parts["target"], cfg.loss_type, cfg.huber_c)
                fake = schedule.noise_travel(model_pred, eps_fake, parts["end_t"], adv_t)
                feats = bundle.teacher_features(
                    frozen, fake, adv_t, parts["cond"], stop_after_mid=stop_after_mid
                )
                logits = disc.apply({"params": d_state.params}, feats)
                g = hinge_g_loss(logits)
                return cm + adv.adv_weight * g, (cm, g)

            return jax.value_and_grad(loss_fn, has_aux=True)(g_state.params)

        (loss, (cm, g)), grads = accumulate_grads(grad_fn, batch, rng, grad_accum_steps)
        new_state = _apply_updates(g_state, grads, tx_g)
        return new_state, {"loss": loss, "loss_cm": cm, "g_loss": g, "grad_norm": _grad_norm(grads)}

    def d_step(g_state: TrainState, d_state: TrainState, frozen, batch, rng):
        rng = jax.random.fold_in(jax.random.fold_in(rng, d_state.step), 7)

        def grad_fn(mb, r):
            r, r_adv = jax.random.split(r)
            parts = ddim_prepare(
                bundle, schedule, solver, boundaries, cfg, frozen, g_state.params, mb, r
            )
            r_t, r_fake, r_real = jax.random.split(r_adv, 3)
            adv_t = _sample_adv_t(parts, r_t)
            model_pred = jax.lax.stop_gradient(
                ddim_model_pred(bundle, schedule, solver, cfg, frozen, g_state.params, parts)
            )
            eps_fake = jax.random.normal(r_fake, parts["latents"].shape, parts["latents"].dtype)
            eps_real = jax.random.normal(r_real, parts["latents"].shape, parts["latents"].dtype)
            fake = schedule.noise_travel(model_pred, eps_fake, parts["end_t"], adv_t)
            real = schedule.noise_travel(parts["target"], eps_real, parts["end_t"], adv_t)
            fake_feats, real_feats = _pair_features(
                bundle, frozen, fake, real, adv_t, parts["cond"],
                stop_after_mid=stop_after_mid,
            )

            def loss_fn(dp):
                fl = disc.apply({"params": dp}, fake_feats)
                rl = disc.apply({"params": dp}, real_feats)
                return hinge_d_loss(fl, rl)

            return jax.value_and_grad(loss_fn)(d_state.params)

        loss, grads = accumulate_grads(grad_fn, batch, rng, grad_accum_steps)
        new_state = _apply_updates(d_state, grads, tx_d)
        return new_state, {"d_loss": loss, "d_grad_norm": _grad_norm(grads)}

    return g_step, d_step


def build_ddim_adv_fused_pair(
    bundle,
    schedule: DDPMSchedule,
    cfg: DistillConfig,
    adv: AdvConfig,
    disc: Discriminator,
    tx_g,
    tx_d,
    grad_accum_steps: int = 1,
) -> Callable:
    """One fused D+G update per batch — the TPU-native adversarial step.

    The reference's parity alternation (`train_pcm_lora_sdxl_adv.py:1482-1532`)
    runs the FULL data + CFG-teacher + target pipeline twice per D/G pair —
    once per parity, each on a fresh batch — purely because eager torch makes
    sharing awkward; the D parity recomputes everything just to renoise its
    outputs. Here one batch's prepare (teacher ODE step + stop-grad target)
    and one differentiable student forward feed BOTH updates, and one joint
    backward produces both gradient sets with `stop_gradient` walls keeping
    the math identical to the alternating steps:

      - d_loss sees stop_grad(fake features) -> no D-loss gradient leaks into
        the LoRA (exactly the unfused d_step, which stop-grads model_pred);
      - g_loss sees stop_grad(D params)      -> no G-loss gradient reaches the
        heads (the unfused g_step updates only LoRA).

    Per pair this saves one full prepare (CFG teacher 2B + target B), one
    student forward, and one B-size feature forward vs the fresh-batch
    alternation (~1/3 of the pair); both updates train on the same batch
    (standard same-batch GAN practice) and are applied simultaneously from
    pre-update params, vs the reference's one-step-stale alternation. Update
    counts per sample are identical; only the data pairing differs, so the
    reference-faithful alternation stays available (`build_ddim_adv_steps`).
    """
    solver = PhasedDDIMSolver.create(schedule, cfg.num_solver_steps)
    boundaries = jnp.asarray(phase_boundaries(cfg.num_solver_steps, cfg.multiphase))
    stop_after_mid = not any(t.startswith("up") for t in disc.cfg.taps)
    span = schedule.num_train_timesteps // cfg.multiphase

    def pair_step(g_state: TrainState, d_state: TrainState, frozen, batch, rng):
        rng = jax.random.fold_in(rng, g_state.step)

        def grad_fn(mb, r):
            r, r_adv = jax.random.split(r)
            parts = ddim_prepare(
                bundle, schedule, solver, boundaries, cfg, frozen, g_state.params, mb, r
            )
            r_t, r_fake, r_real = jax.random.split(r_adv, 3)
            bsz = parts["end_t"].shape[0]
            adv_t = jnp.minimum(
                parts["end_t"] + jax.random.randint(r_t, (bsz,), 0, span),
                schedule.num_train_timesteps - 1,
            )
            eps_fake = jax.random.normal(r_fake, parts["latents"].shape, parts["latents"].dtype)
            eps_real = jax.random.normal(r_real, parts["latents"].shape, parts["latents"].dtype)
            real = schedule.noise_travel(parts["target"], eps_real, parts["end_t"], adv_t)
            # real branch carries no gradients for either player -> outside
            # the differentiated region entirely
            real_feats = bundle.teacher_features(
                frozen, real, adv_t, parts["cond"], stop_after_mid=stop_after_mid
            )

            def loss_fn(lora, dp):
                model_pred = ddim_model_pred(bundle, schedule, solver, cfg, frozen, lora, parts)
                cm = consistency_loss(model_pred, parts["target"], cfg.loss_type, cfg.huber_c)
                fake = schedule.noise_travel(model_pred, eps_fake, parts["end_t"], adv_t)
                fake_feats = bundle.teacher_features(
                    frozen, fake, adv_t, parts["cond"], stop_after_mid=stop_after_mid
                )
                g = hinge_g_loss(
                    disc.apply({"params": jax.lax.stop_gradient(dp)}, fake_feats)
                )
                fake_sg = jax.tree.map(jax.lax.stop_gradient, fake_feats)
                d = hinge_d_loss(
                    disc.apply({"params": dp}, fake_sg),
                    disc.apply({"params": dp}, real_feats),
                )
                return cm + adv.adv_weight * g + d, (cm, g, d)

            (_, aux), grads = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(g_state.params, d_state.params)
            return aux, grads

        (cm, g, d), (g_grads, d_grads) = accumulate_grads(
            grad_fn, batch, rng, grad_accum_steps
        )
        new_g = _apply_updates(g_state, g_grads, tx_g)
        new_d = _apply_updates(d_state, d_grads, tx_d)
        metrics = {
            "loss": cm + adv.adv_weight * g, "loss_cm": cm, "g_loss": g,
            "d_loss": d, "grad_norm": _grad_norm(g_grads),
            "d_grad_norm": _grad_norm(d_grads),
        }
        return new_g, new_d, metrics

    return pair_step


# ---------------------------------------------------------------------------
# flow family (SD3) adversarial steps
# ---------------------------------------------------------------------------


def build_ddim_adv_d_split(
    bundle,
    schedule: DDPMSchedule,
    cfg: DistillConfig,
    adv: AdvConfig,
    disc: Discriminator,
    tx_d,
) -> Tuple[Callable, Callable]:
    """D step as two separately-jitted pieces with identical math to
    `build_ddim_adv_steps`' d_step: (1) the big no-grad feature extraction
    (prepare + stop-grad student pred + 2 frozen-teacher feature forwards),
    (2) the tiny head grad/update. The D backward only touches the conv heads
    — features are constants — so splitting changes nothing numerically while
    each piece is a far smaller XLA program (the monolithic D graph can
    SIGKILL the axon remote compiler; docs/ROUND1_NOTES.md session 3).

    Usage: ``ff, uf = build_ddim_adv_d_split(...)``;
    ``d_state, m = jit(uf)(d_state, *jit(ff)(g_state, d_state, frozen, batch, rng))``.
    """
    solver = PhasedDDIMSolver.create(schedule, cfg.num_solver_steps)
    boundaries = jnp.asarray(phase_boundaries(cfg.num_solver_steps, cfg.multiphase))
    stop_after_mid = not any(t.startswith("up") for t in disc.cfg.taps)
    span = schedule.num_train_timesteps // cfg.multiphase

    def feats_fn(g_state: TrainState, d_state: TrainState, frozen, batch, rng):
        rng = jax.random.fold_in(jax.random.fold_in(rng, d_state.step), 7)
        r, r_adv = jax.random.split(rng)
        parts = ddim_prepare(
            bundle, schedule, solver, boundaries, cfg, frozen, g_state.params, batch, r
        )
        r_t, r_fake, r_real = jax.random.split(r_adv, 3)
        bsz = parts["end_t"].shape[0]
        adv_t = jnp.minimum(
            parts["end_t"] + jax.random.randint(r_t, (bsz,), 0, span),
            schedule.num_train_timesteps - 1,
        )
        model_pred = jax.lax.stop_gradient(
            ddim_model_pred(bundle, schedule, solver, cfg, frozen, g_state.params, parts)
        )
        eps_fake = jax.random.normal(r_fake, parts["latents"].shape, parts["latents"].dtype)
        eps_real = jax.random.normal(r_real, parts["latents"].shape, parts["latents"].dtype)
        fake = schedule.noise_travel(model_pred, eps_fake, parts["end_t"], adv_t)
        real = schedule.noise_travel(parts["target"], eps_real, parts["end_t"], adv_t)
        return _pair_features(
            bundle, frozen, fake, real, adv_t, parts["cond"],
            stop_after_mid=stop_after_mid,
        )

    def update_fn(d_state: TrainState, fake_feats, real_feats):
        def loss_fn(dp):
            fl = disc.apply({"params": dp}, fake_feats)
            rl = disc.apply({"params": dp}, real_feats)
            return hinge_d_loss(fl, rl)

        loss, grads = jax.value_and_grad(loss_fn)(d_state.params)
        new_state = _apply_updates(d_state, grads, tx_d)
        return new_state, {"d_loss": loss, "d_grad_norm": _grad_norm(grads)}

    return feats_fn, update_fn


def _flow_renoise(x, eps, sig_end, sig_adv):
    # flow-space renoise (`train_pcm_lora_sd3_adv.py:1446-1453`)
    return ((1.0 - sig_adv) * x + (sig_adv - sig_end) * eps) / (1.0 - sig_end)


def build_flow_adv_d_split(
    bundle,
    schedule: FlowSchedule,
    cfg: DistillConfig,
    adv: AdvConfig,
    disc: Discriminator,
    tx_d,
) -> Tuple[Callable, Callable]:
    """Flow-family (SD3) analog of `build_ddim_adv_d_split`: the D step as a
    no-grad feature pass + head update, bit-identical to
    `build_flow_adv_steps`' d_step. The SD3 D graph carries two extra frozen
    MMDiT forwards with 24 feature taps each — the same compiler-size
    pressure as SDXL's."""
    solver = PhasedEulerSolver.create(schedule, cfg.num_solver_steps)
    span = cfg.num_solver_steps // cfg.multiphase

    def feats_fn(g_state: TrainState, d_state: TrainState, frozen, batch, rng):
        rng = jax.random.fold_in(jax.random.fold_in(rng, d_state.step), 7)
        r, r_adv = jax.random.split(rng)
        parts = flow_prepare(bundle, schedule, solver, cfg, frozen, g_state.params, batch, r)
        r_t, r_fake, r_real = jax.random.split(r_adv, 3)
        end_index = parts["end_index"]
        bsz = end_index.shape[0]
        adv_index = end_index + jax.random.randint(r_t, (bsz,), 0, span)
        sig_end = _bcast(solver.sigmas_prev[end_index], parts["latents"].ndim)
        sig_adv = _bcast(solver.sigmas_prev[adv_index], parts["latents"].ndim)
        t_adv = solver.sigmas_prev[adv_index] * schedule.num_train_timesteps
        model_pred = jax.lax.stop_gradient(
            flow_model_pred(bundle, schedule, solver, cfg, frozen, g_state.params, parts)
        )
        eps_fake = jax.random.normal(r_fake, parts["latents"].shape, parts["latents"].dtype)
        eps_real = jax.random.normal(r_real, parts["latents"].shape, parts["latents"].dtype)
        fake = _flow_renoise(model_pred, eps_fake, sig_end, sig_adv)
        real = _flow_renoise(parts["target"], eps_real, sig_end, sig_adv)
        return _pair_features(bundle, frozen, fake, real, t_adv, parts["cond"])

    def update_fn(d_state: TrainState, fake_feats, real_feats):
        def loss_fn(dp):
            fl = disc.apply({"params": dp}, fake_feats)
            rl = disc.apply({"params": dp}, real_feats)
            return hinge_d_loss(fl, rl)

        loss, grads = jax.value_and_grad(loss_fn)(d_state.params)
        new_state = _apply_updates(d_state, grads, tx_d)
        return new_state, {"d_loss": loss, "d_grad_norm": _grad_norm(grads)}

    return feats_fn, update_fn


def build_flow_adv_steps(
    bundle,
    schedule: FlowSchedule,
    cfg: DistillConfig,
    adv: AdvConfig,
    disc: Discriminator,
    tx_g,
    tx_d,
    grad_accum_steps: int = 1,
) -> Tuple[Callable, Callable]:
    solver = PhasedEulerSolver.create(schedule, cfg.num_solver_steps)
    span = cfg.num_solver_steps // cfg.multiphase

    def _adv_setup(parts, r_adv):
        r_t, r_fake, r_real = jax.random.split(r_adv, 3)
        end_index = parts["end_index"]
        bsz = end_index.shape[0]
        adv_index = end_index + jax.random.randint(r_t, (bsz,), 0, span)
        sig_end = _bcast(solver.sigmas_prev[end_index], parts["latents"].ndim)
        sig_adv = _bcast(solver.sigmas_prev[adv_index], parts["latents"].ndim)
        t_adv = solver.sigmas_prev[adv_index] * schedule.num_train_timesteps
        return sig_end, sig_adv, t_adv, r_fake, r_real

    _renoise = _flow_renoise

    def g_step(g_state: TrainState, d_state: TrainState, frozen, batch, rng):
        rng = jax.random.fold_in(rng, g_state.step)

        def grad_fn(mb, r):
            r, r_adv = jax.random.split(r)
            parts = flow_prepare(bundle, schedule, solver, cfg, frozen, g_state.params, mb, r)
            sig_end, sig_adv, t_adv, r_fake, _ = _adv_setup(parts, r_adv)
            eps_fake = jax.random.normal(r_fake, parts["latents"].shape, parts["latents"].dtype)

            def loss_fn(lora):
                model_pred = flow_model_pred(bundle, schedule, solver, cfg, frozen, lora, parts)
                cm = consistency_loss(model_pred, parts["target"], cfg.loss_type, cfg.huber_c)
                fake = _renoise(model_pred, eps_fake, sig_end, sig_adv)
                feats = bundle.teacher_features(frozen, fake, t_adv, parts["cond"])
                logits = disc.apply({"params": d_state.params}, feats)
                g = hinge_g_loss(logits)
                return cm + adv.adv_weight * g, (cm, g)

            return jax.value_and_grad(loss_fn, has_aux=True)(g_state.params)

        (loss, (cm, g)), grads = accumulate_grads(grad_fn, batch, rng, grad_accum_steps)
        new_state = _apply_updates(g_state, grads, tx_g)
        return new_state, {"loss": loss, "loss_cm": cm, "g_loss": g, "grad_norm": _grad_norm(grads)}

    def d_step(g_state: TrainState, d_state: TrainState, frozen, batch, rng):
        rng = jax.random.fold_in(jax.random.fold_in(rng, d_state.step), 7)

        def grad_fn(mb, r):
            r, r_adv = jax.random.split(r)
            parts = flow_prepare(bundle, schedule, solver, cfg, frozen, g_state.params, mb, r)
            sig_end, sig_adv, t_adv, r_fake, r_real = _adv_setup(parts, r_adv)
            model_pred = jax.lax.stop_gradient(
                flow_model_pred(bundle, schedule, solver, cfg, frozen, g_state.params, parts)
            )
            eps_fake = jax.random.normal(r_fake, parts["latents"].shape, parts["latents"].dtype)
            eps_real = jax.random.normal(r_real, parts["latents"].shape, parts["latents"].dtype)
            fake = _renoise(model_pred, eps_fake, sig_end, sig_adv)
            real = _renoise(parts["target"], eps_real, sig_end, sig_adv)
            fake_feats, real_feats = _pair_features(
                bundle, frozen, fake, real, t_adv, parts["cond"]
            )

            def loss_fn(dp):
                fl = disc.apply({"params": dp}, fake_feats)
                rl = disc.apply({"params": dp}, real_feats)
                return hinge_d_loss(fl, rl)

            return jax.value_and_grad(loss_fn)(d_state.params)

        loss, grads = accumulate_grads(grad_fn, batch, rng, grad_accum_steps)
        new_state = _apply_updates(d_state, grads, tx_d)
        return new_state, {"d_loss": loss, "d_grad_norm": _grad_norm(grads)}

    return g_step, d_step


def build_flow_adv_fused_pair(
    bundle,
    schedule: FlowSchedule,
    cfg: DistillConfig,
    adv: AdvConfig,
    disc: Discriminator,
    tx_g,
    tx_d,
    grad_accum_steps: int = 1,
) -> Callable:
    """Flow-family (SD3) analog of `build_ddim_adv_fused_pair`: one batch,
    one prepare, one differentiable student forward; joint backward with
    stop-gradient walls yields both the LoRA and the head gradients
    (renoise algebra: `train_pcm_lora_sd3_adv.py:1446-1453`)."""
    solver = PhasedEulerSolver.create(schedule, cfg.num_solver_steps)
    span = cfg.num_solver_steps // cfg.multiphase

    def pair_step(g_state: TrainState, d_state: TrainState, frozen, batch, rng):
        rng = jax.random.fold_in(rng, g_state.step)

        def grad_fn(mb, r):
            r, r_adv = jax.random.split(r)
            parts = flow_prepare(bundle, schedule, solver, cfg, frozen, g_state.params, mb, r)
            r_t, r_fake, r_real = jax.random.split(r_adv, 3)
            end_index = parts["end_index"]
            bsz = end_index.shape[0]
            adv_index = end_index + jax.random.randint(r_t, (bsz,), 0, span)
            sig_end = _bcast(solver.sigmas_prev[end_index], parts["latents"].ndim)
            sig_adv = _bcast(solver.sigmas_prev[adv_index], parts["latents"].ndim)
            t_adv = solver.sigmas_prev[adv_index] * schedule.num_train_timesteps
            eps_fake = jax.random.normal(r_fake, parts["latents"].shape, parts["latents"].dtype)
            eps_real = jax.random.normal(r_real, parts["latents"].shape, parts["latents"].dtype)
            real = _flow_renoise(parts["target"], eps_real, sig_end, sig_adv)
            real_feats = bundle.teacher_features(frozen, real, t_adv, parts["cond"])

            def loss_fn(lora, dp):
                model_pred = flow_model_pred(bundle, schedule, solver, cfg, frozen, lora, parts)
                cm = consistency_loss(model_pred, parts["target"], cfg.loss_type, cfg.huber_c)
                fake = _flow_renoise(model_pred, eps_fake, sig_end, sig_adv)
                fake_feats = bundle.teacher_features(frozen, fake, t_adv, parts["cond"])
                g = hinge_g_loss(
                    disc.apply({"params": jax.lax.stop_gradient(dp)}, fake_feats)
                )
                fake_sg = jax.tree.map(jax.lax.stop_gradient, fake_feats)
                d = hinge_d_loss(
                    disc.apply({"params": dp}, fake_sg),
                    disc.apply({"params": dp}, real_feats),
                )
                return cm + adv.adv_weight * g + d, (cm, g, d)

            (_, aux), grads = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(g_state.params, d_state.params)
            return aux, grads

        (cm, g, d), (g_grads, d_grads) = accumulate_grads(
            grad_fn, batch, rng, grad_accum_steps
        )
        new_g = _apply_updates(g_state, g_grads, tx_g)
        new_d = _apply_updates(d_state, d_grads, tx_d)
        metrics = {
            "loss": cm + adv.adv_weight * g, "loss_cm": cm, "g_loss": g,
            "d_loss": d, "grad_norm": _grad_norm(g_grads),
            "d_grad_norm": _grad_norm(d_grads),
        }
        return new_g, new_d, metrics

    return pair_step


def init_discriminator(disc: Discriminator, bundle, frozen, rng, latent_hw: int, cond):
    """Initialize head params from one feature-extraction pass."""
    ch = bundle.unet_cfg.in_channels if hasattr(bundle, "unet_cfg") else bundle.mmdit_cfg.in_channels
    x = jnp.zeros((1, latent_hw, latent_hw, ch), jnp.float32)
    t = jnp.zeros((1,))
    cond1 = jax.tree.map(lambda a: a[:1], cond)
    feats = bundle.teacher_features(frozen, x, t, cond1)
    return jax.jit(disc.init)(rng, feats)["params"]
