"""Sampler golden tests (vs reference semantics re-derived in numpy) and an
end-to-end tiny-pipeline smoke."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcm_tpu.core import make_ddpm_schedule, make_flow_schedule
from pcm_tpu.sampling import (
    DDIMSampler,
    PCMFMSampler,
    TCDSampler,
    TextToImagePipeline,
    pcm_fm_sigmas,
    trailing_timesteps,
)


def test_trailing_timesteps():
    # T=1000, 4 steps -> [999, 749, 499, 249]
    np.testing.assert_array_equal(trailing_timesteps(1000, 4), [999, 749, 499, 249])
    np.testing.assert_array_equal(trailing_timesteps(1000, 1), [999])
    np.testing.assert_array_equal(trailing_timesteps(1000, 2), [999, 499])


def test_pcm_fm_sigma_grid_matches_reference_rule():
    """Re-derivation of pcm_fm_deterministic_scheduler.py:47-58,120-148."""
    sched = make_flow_schedule(1000, shift=3.0)
    for pcm_t, k in [(50, 2), (100, 4), (50, 1), (50, 16)]:
        sig = pcm_fm_sigmas(sched, pcm_t, k)
        assert sig.shape == (k + 1,)
        assert sig[-1] == 0.0
        # oracle
        T = 1000
        full = np.asarray(sched.sigmas)  # ascending over t
        grid = (np.arange(1, pcm_t + 1) * (T // pcm_t)).round().astype(np.int64) - 1
        desc = full[grid][::-1]
        idx = np.floor(np.linspace(0, pcm_t, num=k, endpoint=False)).astype(np.int64)
        np.testing.assert_allclose(sig[:-1], desc[idx], rtol=1e-6)
        assert np.all(np.diff(sig) < 0)  # strictly descending


def test_ddim_step_math():
    sched = make_ddpm_schedule()
    s = DDIMSampler.create(sched, 2)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 4, 4, 4), jnp.float32)
    eps = jnp.asarray(rng.randn(1, 4, 4, 4), jnp.float32)
    out = s.step(eps, 0, x)
    ac = np.asarray(sched.alphas_cumprod, np.float64)
    a_t, a_prev = ac[999], ac[499]
    x0 = (np.asarray(x) - np.sqrt(1 - a_t) * np.asarray(eps)) / np.sqrt(a_t)
    expect = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * np.asarray(eps)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-5)
    # final step lands on alpha_cumprod[0] (set_alpha_to_one=False)
    out2 = s.step(eps, 1, x)
    a_t, a_prev = ac[499], ac[0]
    x0 = (np.asarray(x) - np.sqrt(1 - a_t) * np.asarray(eps)) / np.sqrt(a_t)
    expect2 = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * np.asarray(eps)
    np.testing.assert_allclose(np.asarray(out2), expect2, rtol=1e-4, atol=1e-5)


def test_tcd_gamma_zero_equals_ddim():
    sched = make_ddpm_schedule()
    ddim = DDIMSampler.create(sched, 4)
    tcd = TCDSampler.create(sched, 4, gamma=0.0)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 4, 4, 4), jnp.float32)
    eps = jnp.asarray(rng.randn(2, 4, 4, 4), jnp.float32)
    for i in range(4):
        a = ddim.step(eps, i, x)
        b = tcd.step(eps, i, x, jax.random.PRNGKey(0))
        # gamma=0: TCD jumps to s = t_prev exactly = DDIM target... except the
        # last DDIM step uses alpha[0] while TCD's s-grid floors to t=0
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_pcm_fm_step_det_vs_stoch():
    sched = make_flow_schedule(1000, shift=3.0)
    det = PCMFMSampler.create(sched, 2, pcm_timesteps=50, stochastic=False)
    sto = PCMFMSampler.create(sched, 2, pcm_timesteps=50, stochastic=True)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 4, 4, 16), jnp.float32)
    v = jnp.asarray(rng.randn(1, 4, 4, 16), jnp.float32)
    out = det.step(v, 0, x)
    sig, sig_next = float(det.sigmas[0]), float(det.sigmas[1])
    denoised = np.asarray(x) - np.asarray(v) * sig
    expect = np.asarray(x) + (np.asarray(x) - denoised) / sig * (sig_next - sig)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-5)

    out_s = sto.step(v, 0, x, jax.random.PRNGKey(0))
    assert float(jnp.max(jnp.abs(out_s - out))) > 1e-3  # stochastic differs
    # final stochastic step (sigma_next=0) fully denoises deterministically
    out_last = sto.step(v, 1, x, jax.random.PRNGKey(0))
    denoised = np.asarray(x) - np.asarray(v) * float(sto.sigmas[1])
    np.testing.assert_allclose(np.asarray(out_last), denoised, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_pipeline_end_to_end_tiny():
    from pcm_tpu.lora.layers import LoRASpec
    from pcm_tpu.models.clip import CLIPTextConfig
    from pcm_tpu.models.unet import TINY_UNET_CONFIG
    from pcm_tpu.models.vae import TINY_VAE_CONFIG
    from pcm_tpu.train.bundles import SD15Bundle, SD_UNET_LORA_TARGETS

    text_cfg = CLIPTextConfig(
        vocab_size=1000, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, projection_dim=None,
    )
    bundle = SD15Bundle(
        unet_cfg=TINY_UNET_CONFIG, vae_cfg=TINY_VAE_CONFIG, text_cfg=text_cfg,
        lora=LoRASpec(rank=4, targets=SD_UNET_LORA_TARGETS), dtype=jnp.float32,
    )
    frozen, lora = bundle.init(jax.random.PRNGKey(0), 32)
    sched = make_ddpm_schedule()
    pipe = TextToImagePipeline(bundle, DDIMSampler.create(sched, 2))

    ids = jnp.asarray(np.random.RandomState(0).randint(1, 999, size=(2, 16)))
    cond = bundle.encode_prompts(frozen, ids)
    uncond = bundle.encode_prompts(frozen, jnp.ones_like(ids))

    gen = jax.jit(
        lambda f, l, c, u, r: pipe.generate(f, l, c, u, r, latent_hw=16, guidance_scale=7.5)
    )
    img = gen(frozen, lora, cond, uncond, jax.random.PRNGKey(3))
    assert img.shape == (2, 32, 32, 3)
    assert bool(jnp.all(jnp.isfinite(img)))
    # cfg=1 path (no uncond forward)
    img2 = jax.jit(
        lambda f, l, c, r: pipe.generate(f, l, c, None, r, latent_hw=16, guidance_scale=1.0)
    )(frozen, lora, cond, jax.random.PRNGKey(3))
    assert img2.shape == (2, 32, 32, 3)
    # chunked VAE decode (bounds decoder memory at big batches) is exact
    img3 = jax.jit(
        lambda f, l, c, r: pipe.generate(
            f, l, c, None, r, latent_hw=16, guidance_scale=1.0, decode_chunk=1
        )
    )(frozen, lora, cond, jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(img3), np.asarray(img2), rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_pipeline_data_parallel_mesh():
    """Sharded batch generation over the 8-virtual-device mesh (the
    'multi-host sampling eval' path, BASELINE config #5): per-device results
    must match the unsharded run bit-for-bit up to reduction order."""
    from pcm_tpu.lora.layers import LoRASpec
    from pcm_tpu.models.clip import CLIPTextConfig
    from pcm_tpu.models.unet import TINY_UNET_CONFIG
    from pcm_tpu.models.vae import TINY_VAE_CONFIG
    from pcm_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from pcm_tpu.train.bundles import SD15Bundle, SD_UNET_LORA_TARGETS

    text_cfg = CLIPTextConfig(
        vocab_size=1000, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, projection_dim=None,
    )
    bundle = SD15Bundle(
        unet_cfg=TINY_UNET_CONFIG, vae_cfg=TINY_VAE_CONFIG, text_cfg=text_cfg,
        lora=LoRASpec(rank=4, targets=SD_UNET_LORA_TARGETS), dtype=jnp.float32,
    )
    frozen, lora = bundle.init(jax.random.PRNGKey(0), 32)
    pipe = TextToImagePipeline(bundle, DDIMSampler.create(make_ddpm_schedule(), 2))

    ids = jnp.asarray(np.random.RandomState(0).randint(1, 999, size=(8, 16)))
    cond = bundle.encode_prompts(frozen, ids)

    gen = jax.jit(
        lambda f, l, c, r: pipe.generate(f, l, c, None, r, latent_hw=16, guidance_scale=1.0)
    )
    ref = gen(frozen, lora, cond, jax.random.PRNGKey(3))

    mesh = make_mesh(data=8)
    img = gen(
        replicate(frozen, mesh),
        replicate(lora, mesh),
        shard_batch(cond, mesh),
        jax.random.PRNGKey(3),
    )
    assert img.shape == (8, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref), rtol=2e-3, atol=2e-3)
