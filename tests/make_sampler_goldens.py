"""Generator for tests/fixtures/sampler_goldens.npz (run manually).

VERDICT round-2 #7: no released PCM checkpoints exist in this image, so
end-to-end numerical parity against real weights is environmentally blocked.
These fixtures pin the next-best thing: full k-step sampler TRAJECTORIES
(k in {1,2,4,8,16}) for every inference scheduler, driven by a fixed
analytic "student" and computed by an independent float64 numpy oracle that
re-implements the reference step algebra (trailing-DDIM
`train_pcm_lora_sd15.py:129-141`, TCD `demo/app.py:83-89`, PCM-FM det/stoch
`pcm_fm_*_scheduler.py:226-233`) from the samplers' own tables. Any
regression in the tables or the step math shows up as a trajectory diff.

Usage:  python tests/make_sampler_goldens.py   (rewrites the .npz)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from pcm_tpu.core import make_ddpm_schedule, make_flow_schedule  # noqa: E402
from pcm_tpu.sampling import DDIMSampler, PCMFMSampler, TCDSampler  # noqa: E402

KS = (1, 2, 4, 8, 16)
SHAPE = (1, 4, 8, 8)


def model_eps(x: np.ndarray, t: float, proj: np.ndarray) -> np.ndarray:
    """Deterministic analytic epsilon-student: cheap, seedless, and exactly
    representable in both numpy f64 and jax f32."""
    return 0.25 * x + np.tanh(t / 1000.0) * proj


def model_v_flow(x: np.ndarray, sigma: float, proj: np.ndarray) -> np.ndarray:
    return 0.25 * x + (sigma - 0.5) * proj


def tcd_noise(seed_key, i, shape):
    """Threefry noise exactly as the jax samplers consume it (data, not math
    under test — stored implicitly via the f64 oracle trajectory)."""
    return np.asarray(
        jax.random.normal(jax.random.fold_in(seed_key, i), shape, np.float32),
        np.float64,
    )


def main():
    rng = np.random.RandomState(0)
    x_init = rng.randn(*SHAPE)
    proj = np.random.RandomState(3).randn(*SHAPE)
    key = jax.random.PRNGKey(42)
    ddpm = make_ddpm_schedule()
    flow = make_flow_schedule(shift=3.0)
    out = {"x_init": x_init, "proj": proj}

    for k in KS:
        # --- trailing DDIM, epsilon prediction (f64 oracle) ---
        s = DDIMSampler.create(ddpm, k)
        ts = np.asarray(s.timesteps, np.int64)
        al = np.asarray(s.alphas, np.float64)
        al_prev = np.asarray(s.alphas_prev, np.float64)
        x = x_init.copy()
        traj = [x]
        for i in range(k):
            eps = model_eps(x, float(ts[i]), proj)
            x0 = (x - np.sqrt(1 - al[i]) * eps) / np.sqrt(al[i])
            x = np.sqrt(al_prev[i]) * x0 + np.sqrt(1 - al_prev[i]) * eps
            traj.append(x)
        out[f"ddim_eps_k{k}"] = np.stack(traj)

        # --- TCD gamma=0.3 (stochastic renoise; noise from threefry) ---
        s = TCDSampler.create(ddpm, k, gamma=0.3)
        al = np.asarray(s.alphas, np.float64)
        al_prev = np.asarray(s.alphas_prev, np.float64)
        al_s = np.asarray(s.alphas_s, np.float64)
        x = x_init.copy()
        traj = [x]
        for i in range(k):
            eps = model_eps(x, float(np.asarray(s.timesteps)[i]), proj)
            x0 = (x - np.sqrt(1 - al[i]) * eps) / np.sqrt(al[i])
            x_s = np.sqrt(al_s[i]) * x0 + np.sqrt(1 - al_s[i]) * eps
            if i == k - 1:
                x = x_s
            else:
                ratio = al_prev[i] / al_s[i]
                n = tcd_noise(key, i, SHAPE)
                x = np.sqrt(ratio) * x_s + np.sqrt(max(1 - ratio, 0.0)) * n
            traj.append(x)
        out[f"tcd_k{k}"] = np.stack(traj)

        # --- PCM-FM deterministic / stochastic (shift 3, 100-pt grid) ---
        for stoch in (False, True):
            s = PCMFMSampler.create(flow, k, pcm_timesteps=100, stochastic=stoch)
            sig = np.asarray(s.sigmas, np.float64)
            x = x_init.copy()
            traj = [x]
            for i in range(k):
                v = model_v_flow(x, float(sig[i]), proj)
                denoised = x - v * sig[i]
                if stoch:
                    n = tcd_noise(key, 100 + i, SHAPE)
                    x = (1.0 - sig[i + 1]) * denoised + sig[i + 1] * n
                else:
                    x = x + (x - denoised) / sig[i] * (sig[i + 1] - sig[i])
                traj.append(x)
            out[f"fm_{'stoch' if stoch else 'det'}_k{k}"] = np.stack(traj)

    path = os.path.join(os.path.dirname(__file__), "fixtures", "sampler_goldens.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)
    print(f"wrote {path}: {len(out)} arrays")


if __name__ == "__main__":
    main()
