"""Golden tests for the core PCM math.

The oracle is an independent numpy re-implementation of the reference
semantics (DDIMSolver tables / mask-flip-argmax boundary search /
noise_travel ratio algebra from G-U-N/Phased-Consistency-Model,
`train_pcm_lora_sd15.py:250-341`, `scheduling_ddpm_modified.py:500-575`,
`train_pcm_lora_sd3.py:160-226`), evaluated here in float64 numpy.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pcm_tpu.core import (
    boundary_scalings,
    cfg_combine,
    consistency_loss,
    hinge_d_loss,
    hinge_g_loss,
    huber_loss,
    guidance_scale_embedding,
    last_boundary_at_or_below,
    make_ddpm_schedule,
    make_flow_schedule,
    phase_boundaries,
    solver_grid,
    PhasedDDIMSolver,
    PhasedEulerSolver,
)


def ref_ddim_tables(alphas_cumprod, T=1000, S=50):
    """Oracle: reference DDIMSolver.__init__ (train_pcm_lora_sd15.py:289-303)."""
    step_ratio = T // S
    ddim_timesteps = (np.arange(1, S + 1) * step_ratio).round().astype(np.int64) - 1
    ddim_alpha_cumprods = alphas_cumprod[ddim_timesteps]
    ddim_timesteps_prev = np.asarray([0] + ddim_timesteps[:-1].tolist())
    ddim_alpha_cumprods_prev = np.asarray(
        [alphas_cumprod[0]] + alphas_cumprod[ddim_timesteps[:-1]].tolist()
    )
    return ddim_timesteps, ddim_alpha_cumprods, ddim_timesteps_prev, ddim_alpha_cumprods_prev


def ref_boundary_select(index, S, multiphase):
    """Oracle: the mask/flip/argmax search (train_pcm_lora_sd15.py:321-335)."""
    inference_indices = np.floor(np.linspace(0, S, num=multiphase, endpoint=False)).astype(
        np.int64
    )
    out = []
    for i in index:
        valid = inference_indices[inference_indices <= i]
        out.append(valid[-1])
    return np.asarray(out), inference_indices


def test_ddpm_schedule_matches_sd_convention():
    sched = make_ddpm_schedule()
    # SD scaled_linear endpoints
    betas = np.asarray(sched.betas)
    assert betas.shape == (1000,)
    np.testing.assert_allclose(betas[0], 0.00085, rtol=1e-6)
    np.testing.assert_allclose(betas[-1], 0.012, rtol=1e-6)
    ac = np.asarray(sched.alphas_cumprod)
    assert np.all(np.diff(ac) < 0) and 0 < ac[-1] < ac[0] < 1


@pytest.mark.parametrize("S", [50, 40, 100])
def test_solver_grid_and_tables(S):
    sched = make_ddpm_schedule()
    ac = np.asarray(sched.alphas_cumprod, dtype=np.float64)
    t_ref, a_ref, tp_ref, ap_ref = ref_ddim_tables(ac, 1000, S)
    solver = PhasedDDIMSolver.create(sched, S)
    np.testing.assert_array_equal(np.asarray(solver.timesteps), t_ref)
    np.testing.assert_array_equal(np.asarray(solver.timesteps_prev), tp_ref)
    np.testing.assert_allclose(np.asarray(solver.alpha_cumprods), a_ref, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(solver.alpha_cumprods_prev), ap_ref, rtol=1e-6)


@pytest.mark.parametrize("S,multiphase", [(50, 1), (50, 2), (50, 4), (40, 4), (100, 4), (50, 16)])
def test_boundary_selection_matches_reference(S, multiphase):
    rng = np.random.RandomState(0)
    index = rng.randint(0, S, size=(64,))
    b_ref, bounds_ref = ref_boundary_select(index, S, multiphase)
    bounds = phase_boundaries(S, multiphase)
    np.testing.assert_array_equal(bounds, bounds_ref)
    b = last_boundary_at_or_below(jnp.asarray(index), jnp.asarray(bounds))
    np.testing.assert_array_equal(np.asarray(b), b_ref)


def test_boundary_scalings():
    bounds = jnp.asarray(phase_boundaries(50, 4))  # [0, 12, 25, 37]
    index = jnp.asarray([0, 1, 12, 24, 25, 37, 49])
    c_skip, c_out = boundary_scalings(index, bounds, ndim=4)
    assert c_skip.shape == (7, 1, 1, 1)
    np.testing.assert_array_equal(
        np.asarray(c_skip).ravel(), [1, 0, 1, 0, 1, 1, 0]
    )
    np.testing.assert_array_equal(np.asarray(c_out), 1.0 - np.asarray(c_skip))


def test_ddim_multiphase_pred_matches_manual():
    sched = make_ddpm_schedule()
    solver = PhasedDDIMSolver.create(sched, 50)
    rng = np.random.RandomState(1)
    x0 = rng.randn(8, 4, 8, 8).astype(np.float32)
    eps = rng.randn(8, 4, 8, 8).astype(np.float32)
    index = rng.randint(0, 50, size=(8,))
    x_prev, t_end = solver.multiphase_pred(
        jnp.asarray(x0), jnp.asarray(eps), jnp.asarray(index), multiphase=4
    )
    b_ref, _ = ref_boundary_select(index, 50, 4)
    ac_prev = np.asarray(solver.alpha_cumprods_prev, dtype=np.float64)
    expect = (
        np.sqrt(ac_prev[b_ref])[:, None, None, None] * x0
        + np.sqrt(1 - ac_prev[b_ref])[:, None, None, None] * eps
    )
    np.testing.assert_allclose(np.asarray(x_prev), expect, rtol=2e-5, atol=2e-6)
    np.testing.assert_array_equal(
        np.asarray(t_end), np.asarray(solver.timesteps_prev)[b_ref]
    )


def test_predicted_origin_roundtrip():
    """x0 -> add_noise -> predicted_origin(eps) recovers x0 exactly;
    same for v-prediction."""
    sched = make_ddpm_schedule()
    rng = np.random.RandomState(2)
    x0 = jnp.asarray(rng.randn(4, 4, 8, 8), jnp.float32)
    eps = jnp.asarray(rng.randn(4, 4, 8, 8), jnp.float32)
    t = jnp.asarray([0, 100, 500, 999])
    xt = sched.add_noise(x0, eps, t)
    rec = sched.predicted_origin(eps, t, xt, "epsilon")
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), rtol=1e-3, atol=1e-4)
    v = sched.velocity(x0, eps, t)
    rec_v = sched.predicted_origin(v, t, xt, "v_prediction")
    np.testing.assert_allclose(np.asarray(rec_v), np.asarray(x0), rtol=1e-3, atol=1e-4)


def test_noise_travel_marginal():
    """noise_travel(t_cur -> t_tgt) of a q(x_t_cur|x0) sample has the q(x_t_tgt|x0)
    coefficient structure: with shared noise algebraically
    x_tgt = sqrt(a_tgt) x0 + (sqrt(r (1-a_cur)) + ... ) eps-mix; verify the
    ratio algebra against the reference formula directly."""
    sched = make_ddpm_schedule()
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(4, 4, 8, 8), jnp.float32)
    eps = jnp.asarray(rng.randn(4, 4, 8, 8), jnp.float32)
    t_cur = jnp.asarray([10, 100, 300, 600])
    t_tgt = jnp.asarray([50, 400, 700, 900])
    out = sched.noise_travel(x, eps, t_cur, t_tgt)
    ac = np.asarray(sched.alphas_cumprod, dtype=np.float64)
    r = ac[np.asarray(t_tgt)] / ac[np.asarray(t_cur)]
    expect = (
        np.sqrt(r)[:, None, None, None] * np.asarray(x)
        + np.sqrt(1 - r)[:, None, None, None] * np.asarray(eps)
    )
    np.testing.assert_allclose(np.asarray(out), expect, rtol=2e-5, atol=2e-6)


def test_flow_schedule_and_euler_solver():
    fs = make_flow_schedule(1000, shift=3.0)
    sig = np.asarray(fs.sigmas, dtype=np.float64)
    # endpoints: sigma at t=999 is 1.0; sigma at t=0 is shift*(1/1000)/(1+2/1000)
    np.testing.assert_allclose(sig[-1], 1.0, rtol=1e-6)
    s0 = 3.0 * 0.001 / (1 + 2.0 * 0.001)
    np.testing.assert_allclose(sig[0], s0, rtol=1e-6)
    assert np.all(np.diff(sig) > 0)

    solver = PhasedEulerSolver.create(fs, 100)
    assert solver.num_steps == 100
    # euler step math
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(4, 16, 8, 8), jnp.float32)
    v = jnp.asarray(rng.randn(4, 16, 8, 8), jnp.float32)
    idx = jnp.asarray([0, 10, 50, 99])
    out = solver.euler_step(x, v, idx)
    sg = np.asarray(solver.sigmas, np.float64)
    sgp = np.asarray(solver.sigmas_prev, np.float64)
    expect = np.asarray(x) + (sgp - sg)[np.asarray(idx)][:, None, None, None] * np.asarray(v)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=2e-5, atol=2e-6)

    # multiphase, is_target toggles source sigma
    xp, b = solver.multiphase_pred(x, v, idx, multiphase=4, is_target=False)
    b_ref, _ = ref_boundary_select(np.asarray(idx), 100, 4)
    np.testing.assert_array_equal(np.asarray(b), b_ref)
    expect = (
        np.asarray(x)
        + (sgp[b_ref] - sg[np.asarray(idx)])[:, None, None, None] * np.asarray(v)
    )
    np.testing.assert_allclose(np.asarray(xp), expect, rtol=2e-5, atol=2e-6)
    xp_t, _ = solver.multiphase_pred(x, v, idx, multiphase=4, is_target=True)
    expect_t = (
        np.asarray(x)
        + (sgp[b_ref] - sgp[np.asarray(idx)])[:, None, None, None] * np.asarray(v)
    )
    np.testing.assert_allclose(np.asarray(xp_t), expect_t, rtol=2e-5, atol=2e-6)


def test_flow_add_noise():
    fs = make_flow_schedule(1000, shift=3.0)
    x0 = jnp.ones((2, 4, 4, 4))
    eps = jnp.zeros((2, 4, 4, 4))
    sigma = jnp.asarray([0.25, 0.5])
    out = fs.add_noise(x0, eps, sigma)
    np.testing.assert_allclose(np.asarray(out)[0], 0.75, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out)[1], 0.5, rtol=1e-6)


def test_losses():
    rng = np.random.RandomState(5)
    a = jnp.asarray(rng.randn(4, 8), jnp.float32)
    b = jnp.asarray(rng.randn(4, 8), jnp.float32)
    c = 0.001
    h = huber_loss(a, b, c)
    expect = np.mean(np.sqrt((np.asarray(a) - np.asarray(b)) ** 2 + c * c) - c)
    np.testing.assert_allclose(float(h), expect, rtol=1e-5)
    assert float(consistency_loss(a, a, "huber")) == pytest.approx(0.0, abs=1e-7)
    assert float(consistency_loss(a, a, "l2")) == pytest.approx(0.0, abs=1e-7)

    # hinge
    fake = [jnp.asarray([-2.0, 0.0]), jnp.asarray([3.0])]
    real = [jnp.asarray([2.0, 0.5]), jnp.asarray([-1.0])]
    d = hinge_d_loss(fake, real)
    # head1: mean(relu(1+fake))=mean(0,1)=0.5 ; mean(relu(1-real))=mean(0,.5)=0.25
    # head2: relu(1+3)=4 ; relu(1-(-1))=2
    np.testing.assert_allclose(float(d), ((0.5 + 0.25) + (4 + 2)) / 2, rtol=1e-6)
    g = hinge_g_loss(fake)
    # head1 mean(relu(1-fake))=mean(3,1)=2; head2 relu(1-3)=0
    np.testing.assert_allclose(float(g), (2 + 0) / 2, rtol=1e-6)


def test_cfg_combine():
    cond = jnp.ones((2, 3, 4)) * 2.0
    uncond = jnp.ones((2, 3, 4))
    w = jnp.asarray([1.0, 3.0])
    out = cfg_combine(cond, uncond, w)
    np.testing.assert_allclose(np.asarray(out)[0], 3.0)
    np.testing.assert_allclose(np.asarray(out)[1], 5.0)


def test_guidance_scale_embedding():
    w = jnp.asarray([1.0, 7.5])
    emb = guidance_scale_embedding(w, 512)
    assert emb.shape == (2, 512)
    # matches the sinusoid definition
    half = 256
    freqs = np.exp(
        np.float32(-np.log(10000.0) / (half - 1)) * np.arange(half, dtype=np.float32)
    ).astype(np.float32)
    arg = np.float32(1000.0) * freqs
    row = np.concatenate([np.sin(arg), np.cos(arg)])
    np.testing.assert_allclose(np.asarray(emb)[0], row, rtol=1e-2, atol=5e-3)
