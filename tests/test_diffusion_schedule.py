"""Diffusion schedule golden tests vs a literal torch/f64 transcription of
the reference math (discretizer/guiders/sampling are pure functions — the
natural test seam per SURVEY §4)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch

from landiff_tpu.config import SamplerConfig
from landiff_tpu.diffusion import samplers, schedule

CFG = SamplerConfig()


def torch_zero_snr_sigmas(n=50, shift_scale=3.0, num_timesteps=1000,
                          linear_start=0.00085, linear_end=0.012):
    betas = torch.linspace(linear_start ** 0.5, linear_end ** 0.5,
                           num_timesteps, dtype=torch.float64) ** 2
    alphas_cumprod = torch.cumprod(1.0 - betas, dim=0).numpy()
    alphas_cumprod = alphas_cumprod / (
        shift_scale + (1 - shift_scale) * alphas_cumprod)
    timesteps = np.linspace(num_timesteps - 1, 0, n,
                            endpoint=False).astype(int)[::-1]
    acs = torch.tensor(alphas_cumprod[timesteps], dtype=torch.float32).sqrt()
    a0, aT = acs[0].clone(), acs[-1].clone()
    acs = (acs - aT) * (a0 / (a0 - aT))
    return torch.flip(acs, (0,)).numpy(), timesteps


def test_zero_snr_sigmas_match():
    got, got_ts = schedule.zero_snr_sigmas(CFG, 50)
    want, want_ts = torch_zero_snr_sigmas()
    np.testing.assert_array_equal(got_ts, want_ts)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
    # ascending: starts at exactly 0 (zero SNR at t=999) up to ~0.97; the
    # sampler appends 1.0 (sampling.py:552-554)
    assert abs(got[0]) < 1e-12 and got[-1] > 0.97


def test_dynamic_cfg_scale_literal():
    # literal reference formula (guiders.py:58-79) incl. negative step_index
    for ts in [999, 519, 19]:
        got = schedule.dynamic_cfg_scale(CFG, ts)
        step = 50 - ts
        want = 1 + 6 * (1 - math.cos(math.pi * (step / 50) ** 5)) / 2
        assert got == want


def test_video_scaling():
    a = np.array([0.9, 0.5, 0.1])
    c_skip, c_out, c_in = schedule.video_scaling(a)
    np.testing.assert_allclose(c_skip, a)
    np.testing.assert_allclose(c_out, -np.sqrt(1 - a ** 2))
    np.testing.assert_allclose(c_in, np.ones(3))


def test_dpmpp_coeffs_match_torch_transcription():
    acs, _ = schedule.zero_snr_sigmas(CFG, 50)
    acs_ext = np.concatenate([acs, [1.0]])
    for i in [1, 10, 48]:
        a, an, ap = acs_ext[i], acs_ext[i + 1], acs_ext[i - 1]
        m1, m2, m3, m4, mn = schedule.dpmpp2m_coeffs(a, an, ap)
        at = torch.tensor(a, dtype=torch.float64)
        ant = torch.tensor(an, dtype=torch.float64)
        apt = torch.tensor(ap, dtype=torch.float64)
        lamb = ((at ** 2 / (1 - at ** 2)) ** 0.5).log()
        lamb_next = ((ant ** 2 / (1 - ant ** 2)) ** 0.5).log()
        lamb_prev = ((apt ** 2 / (1 - apt ** 2)) ** 0.5).log()
        h = lamb_next - lamb
        r = (lamb - lamb_prev) / h
        np.testing.assert_allclose(
            m1, (((1 - ant ** 2) / (1 - at ** 2)) ** 0.5 * (-h).exp()).item(),
            rtol=1e-12)
        np.testing.assert_allclose(m2, ((-2 * h).expm1() * ant).item(),
                                   rtol=1e-12)
        np.testing.assert_allclose(m3, (1 + 1 / (2 * r)).item(), rtol=1e-12)
        np.testing.assert_allclose(m4, (1 / (2 * r)).item(), rtol=1e-12)
        np.testing.assert_allclose(
            mn, ((1 - ant ** 2) ** 0.5 * (1 - (-2 * h).exp()) ** 0.5).item(),
            rtol=1e-10)


def test_sampler_runs_and_recovers_signal():
    """With a perfect denoiser (returns the target), DPM++2M must converge
    to the target; last step returns `denoised` exactly."""
    target = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 3, 4, 4))

    def denoise_fn(x, step):
        return jnp.broadcast_to(target, x.shape)

    cfg = SamplerConfig(num_steps=10)
    x0 = jax.random.normal(jax.random.PRNGKey(1), target.shape)
    out = samplers.vpsde_dpmpp2m_sample(denoise_fn, x0, cfg,
                                        key=jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(target),
                               rtol=1e-5, atol=1e-5)
    out2 = samplers.video_ddim_sample(denoise_fn, x0, cfg,
                                      key=jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(target),
                               rtol=1e-3, atol=1e-3)


def test_fixed_frames_prefix_preserved():
    target = jnp.zeros((1, 4, 2, 4, 4))

    def denoise_fn(x, step):
        return target

    cfg = SamplerConfig(num_steps=6)
    key = jax.random.PRNGKey(4)
    x0 = jax.random.normal(key, (1, 4, 2, 4, 4))
    prefix = x0[:, :2]
    out = samplers.vpsde_dpmpp2m_sample(denoise_fn, x0, cfg,
                                        key=jax.random.PRNGKey(5),
                                        fixed_frames=2)
    np.testing.assert_allclose(np.asarray(out[:, :2]), np.asarray(prefix))
    np.testing.assert_allclose(np.asarray(out[:, 2:]),
                               np.asarray(target[:, 2:]), atol=1e-5)
