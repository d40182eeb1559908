"""Parity tests for the k-diffusion/EDM sampler family and thresholding.

The oracles are straight-line f64 numpy/torch transcriptions of the
reference math (sampling.py:87-535, sampling_utils.py:8-157), written
independently of the scan/table implementation under test."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from landiff_tpu.diffusion import k_samplers as ks
from landiff_tpu.diffusion import thresholding as th

SHAPE = (2, 3, 4, 5)


def sigmas_legacy(n=8):
    # small EDM-style descending grid + trailing zero
    return ks.append_zero(ks_edm(n))


def ks_edm(n):
    ramp = np.linspace(0, 1, n)
    lo, hi = 0.03 ** (1 / 7.0), 10.0 ** (1 / 7.0)
    return (hi + ramp * (lo - hi)) ** 7.0


def denoise_np(x, sigma):
    return x / (1.0 + sigma)


def denoise_jx(x, sigma):
    return x / (1.0 + sigma)


def x0():
    return np.random.default_rng(0).standard_normal(SHAPE)


def to_d(x, sigma, den):
    return (x - den) / sigma


def test_euler_edm_matches_transcription():
    sig = sigmas_legacy()
    n = len(sig) - 1
    x = x0() * np.sqrt(1 + sig[0] ** 2)
    for i in range(n):
        den = denoise_np(x, sig[i])          # gamma=0: sigma_hat == sigma
        d = to_d(x, sig[i], den)
        x = x + (sig[i + 1] - sig[i]) * d
    got = ks.euler_edm_sample(denoise_jx, jnp.asarray(x0()), sig)
    np.testing.assert_allclose(np.asarray(got), x, rtol=2e-4, atol=2e-5)


def test_heun_edm_matches_transcription():
    sig = sigmas_legacy()
    n = len(sig) - 1
    x = x0() * np.sqrt(1 + sig[0] ** 2)
    for i in range(n):
        den = denoise_np(x, sig[i])
        d = to_d(x, sig[i], den)
        dt = sig[i + 1] - sig[i]
        euler = x + dt * d
        if sig[i + 1] > 1e-14:
            den2 = denoise_np(euler, sig[i + 1])
            d2 = to_d(euler, sig[i + 1], den2)
            x = x + (d + d2) / 2.0 * dt
        else:
            x = euler
    got = ks.heun_edm_sample(denoise_jx, jnp.asarray(x0()), sig)
    np.testing.assert_allclose(np.asarray(got), x, rtol=2e-4, atol=2e-5)


def test_euler_edm_churn_changes_result_and_is_finite():
    sig = sigmas_legacy()
    base = ks.euler_edm_sample(denoise_jx, jnp.asarray(x0()), sig,
                               key=jax.random.PRNGKey(1))
    churned = ks.euler_edm_sample(denoise_jx, jnp.asarray(x0()), sig,
                                  key=jax.random.PRNGKey(1), s_churn=4.0)
    assert np.isfinite(np.asarray(churned)).all()
    assert not np.allclose(np.asarray(base), np.asarray(churned))


def test_ddim_matches_transcription_noise_free():
    sig = sigmas_legacy()
    n = len(sig) - 1
    x = x0() * np.sqrt(1 + sig[0] ** 2)
    for i in range(n):
        den = denoise_np(x, sig[i])
        d = to_d(x, sig[i], den)
        x = x + (sig[i + 1] - sig[i]) * d
    got = ks.ddim_sample(denoise_jx, jnp.asarray(x0()), sig, s_noise=0.0)
    np.testing.assert_allclose(np.asarray(got), x, rtol=2e-4, atol=2e-5)


def _ancestral_step_np(sf, st_, eta):
    if not eta:
        return st_, 0.0
    up = min(st_, eta * (st_ ** 2 * (sf ** 2 - st_ ** 2) / sf ** 2) ** 0.5)
    return (st_ ** 2 - up ** 2) ** 0.5, up


def test_euler_ancestral_matches_transcription():
    sig = sigmas_legacy()
    n = len(sig) - 1
    x = x0() * np.sqrt(1 + sig[0] ** 2)
    for i in range(n):
        down, _ = _ancestral_step_np(sig[i], sig[i + 1], 1.0)
        den = denoise_np(x, sig[i])
        d = to_d(x, sig[i], den)
        x = x + (down - sig[i]) * d
        # s_noise=0 -> ancestral noise injection is a no-op
    got = ks.euler_ancestral_sample(denoise_jx, jnp.asarray(x0()), sig,
                                    eta=1.0, s_noise=0.0)
    np.testing.assert_allclose(np.asarray(got), x, rtol=2e-4, atol=2e-5)


def test_dpmpp2s_ancestral_matches_transcription():
    sig = sigmas_legacy()
    n = len(sig) - 1
    x = x0() * np.sqrt(1 + sig[0] ** 2)
    for i in range(n):
        down, _ = _ancestral_step_np(sig[i], sig[i + 1], 1.0)
        den = denoise_np(x, sig[i])
        d = to_d(x, sig[i], den)
        x_euler = x + (down - sig[i]) * d
        if down < 1e-14:
            x = x_euler
        else:
            t, t_next = -np.log(sig[i]), -np.log(down)
            h = t_next - t
            s = t + 0.5 * h
            x2 = (np.exp(-s) / sig[i]) * x - np.expm1(-0.5 * h) * den
            den2 = denoise_np(x2, np.exp(-s))
            x = (down / sig[i]) * x - np.expm1(-h) * den2
    got = ks.dpmpp2s_ancestral_sample(denoise_jx, jnp.asarray(x0()), sig,
                                      eta=1.0, s_noise=0.0)
    np.testing.assert_allclose(np.asarray(got), x, rtol=2e-4, atol=2e-5)


def test_dpmpp2m_matches_transcription():
    sig = sigmas_legacy()
    n = len(sig) - 1
    x = x0() * np.sqrt(1 + sig[0] ** 2)
    old = None
    for i in range(n):
        den = denoise_np(x, sig[i])
        if sig[i + 1] < 1e-14:
            x = den
        else:
            t, t_next = -np.log(sig[i]), -np.log(sig[i + 1])
            h = t_next - t
            m1, m2 = sig[i + 1] / sig[i], np.expm1(-h)
            if old is None:
                x = m1 * x - m2 * den
            else:
                t_prev = -np.log(sig[i - 1])
                r = (t - t_prev) / h
                den_d = (1 + 1 / (2 * r)) * den - (1 / (2 * r)) * old
                x = m1 * x - m2 * den_d
        old = den
    got = ks.dpmpp2m_sample(denoise_jx, jnp.asarray(x0()), sig)
    np.testing.assert_allclose(np.asarray(got), x, rtol=2e-4, atol=2e-5)


def test_sde_dpmpp2m_matches_key_replicated_transcription():
    """The SDE variant injects per-step noise; replicate the exact
    key-splitting sequence to get a deterministic oracle."""
    sig = sigmas_legacy()
    n = len(sig) - 1
    key = jax.random.PRNGKey(7)
    x = np.asarray(x0(), np.float64) * np.sqrt(1 + sig[0] ** 2)
    old = np.zeros_like(x)
    k = key
    for i in range(n):
        k, kn = jax.random.split(k)
        noise_v = np.asarray(
            jax.random.normal(kn, SHAPE, jnp.float32), np.float64)
        den = denoise_np(x, sig[i])
        if sig[i + 1] < 1e-14:
            x = den
        else:
            t, t_next = -np.log(sig[i]), -np.log(sig[i + 1])
            h = t_next - t
            m1 = sig[i + 1] / sig[i] * np.exp(-h)
            m2 = np.expm1(-2 * h)
            mn = sig[i + 1] * np.sqrt(1 - np.exp(-2 * h))
            if i == 0:
                x = m1 * x - m2 * den + mn * noise_v
            else:
                t_prev = -np.log(sig[i - 1])
                r = (t - t_prev) / h
                den_d = (1 + 1 / (2 * r)) * den - (1 / (2 * r)) * old
                x = m1 * x - m2 * den_d + mn * noise_v
        old = den
    got = ks.sde_dpmpp2m_sample(denoise_jx, jnp.asarray(x0()), sig, key=key)
    np.testing.assert_allclose(np.asarray(got), x, rtol=2e-3, atol=2e-4)


def test_lms_coeff_matches_scipy_quad():
    from scipy import integrate

    sig = sigmas_legacy(10)
    for order in (1, 2, 3, 4):
        for i in range(order - 1, 9):
            for j in range(order):
                def fn(tau, i=i, j=j, order=order):
                    prod = 1.0
                    for kk in range(order):
                        if j == kk:
                            continue
                        prod *= (tau - sig[i - kk]) / (sig[i - j] - sig[i - kk])
                    return prod
                want = integrate.quad(fn, sig[i], sig[i + 1], epsrel=1e-4)[0]
                got = ks.linear_multistep_coeff(order, sig, i, j)
                np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-10)


def test_linear_multistep_matches_transcription():
    sig = sigmas_legacy()
    n = len(sig) - 1
    order = 4
    x = x0() * np.sqrt(1 + sig[0] ** 2)
    ds = []
    for i in range(n):
        den = denoise_np(x, sig[i])
        d = to_d(x, sig[i], den)
        ds.append(d)
        if len(ds) > order:
            ds.pop(0)
        cur = min(i + 1, order)
        coeffs = [ks.linear_multistep_coeff(cur, sig, i, j)
                  for j in range(cur)]
        x = x + sum(c * dd for c, dd in zip(coeffs, reversed(ds)))
    got = ks.linear_multistep_sample(denoise_jx, jnp.asarray(x0()), sig,
                                     order=order)
    np.testing.assert_allclose(np.asarray(got), x, rtol=2e-4, atol=2e-5)


def test_sdedit_skips_early_steps_and_matches_transcription():
    sig = sigmas_legacy()
    n = len(sig) - 1
    ratio = 0.5
    start = next(i for i in range(n) if i / n >= ratio)
    rng = np.random.default_rng(3)
    image = rng.standard_normal(SHAPE)
    randn = rng.standard_normal(SHAPE)
    x = image + randn * sig[start]
    for i in range(start, n):
        den = denoise_np(x, sig[i])
        d = to_d(x, sig[i], den)
        x = x + (sig[i + 1] - sig[i]) * d
    got = ks.sdedit_edm_sample(denoise_jx, jnp.asarray(image),
                               jnp.asarray(randn), sig, edit_ratio=ratio)
    np.testing.assert_allclose(np.asarray(got), x, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# thresholding (oracle: torch transcription of sampling_utils.py)


VSHAPE = (2, 3, 4, 5, 6)   # (B, T, C, H, W)


def _pair():
    rng = np.random.default_rng(11)
    return (rng.standard_normal(VSHAPE) * 1.7,
            rng.standard_normal(VSHAPE) * 1.3)


def test_no_and_static_thresholding():
    u, c = _pair()
    want = u + 5.0 * (c - u)
    np.testing.assert_allclose(
        np.asarray(th.no_dynamic_thresholding(jnp.asarray(u), jnp.asarray(c),
                                              5.0)), want,
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(th.static_thresholding(jnp.asarray(u), jnp.asarray(c),
                                          5.0)),
        np.clip(want, -1, 1), rtol=1e-5, atol=1e-5)


def test_dynamic_threshold_quantile_clamp():
    x = torch.tensor(_pair()[0])
    p = 0.95
    n_, t_, c_, h_, w_ = x.shape
    xt = x.permute(0, 2, 1, 3, 4).reshape(n_, c_, -1)
    l, r = xt.quantile(q=torch.tensor([1 - p, p], dtype=x.dtype),
                       dim=-1, keepdim=True)
    s = torch.maximum(-l, r)
    mask = (s > 1).expand(-1, -1, t_ * h_ * w_)
    want = torch.where(mask, xt.clamp(min=-1 * s, max=s), xt)
    want = want.reshape(n_, c_, t_, h_, w_).permute(0, 2, 1, 3, 4).numpy()
    got = np.asarray(th.dynamic_threshold(jnp.asarray(x.numpy()), p))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_dynamic_thresholding2_and_latent():
    x = torch.tensor(_pair()[0] * 3.0)
    s = torch.quantile(x.abs().reshape(x.shape[0], -1), 0.995, dim=1)
    s = torch.maximum(s, torch.ones_like(s)).reshape(-1, 1, 1, 1, 1)
    want = torch.clamp(x, -s, s).numpy()
    got = np.asarray(th.dynamic_thresholding2(jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    # latent thresholding operates on (B, C, L) flattened latents
    x3 = x.reshape(x.shape[0], x.shape[2], -1)
    s2 = torch.quantile(x3.abs(), 0.9995, dim=2)[:, :, None]
    want2 = (torch.clamp(x3, -s2, s2) / s2).numpy()
    got2 = np.asarray(th.latent_dynamic_thresholding(jnp.asarray(x3.numpy())))
    np.testing.assert_allclose(got2, want2, rtol=1e-5, atol=1e-6)


def test_dynamic_thresholding_mean_std_renorm():
    u, c = _pair()
    tu, tc = torch.tensor(u), torch.tensor(c)
    result = tu + 5.0 * (tc - tu)
    want = ((result - result.mean()) / result.std() * tu.std()).numpy()
    got = np.asarray(th.dynamic_thresholding(jnp.asarray(u), jnp.asarray(c),
                                             5.0))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_dynamic_thresholding_v1():
    from einops import rearrange

    u, c = _pair()
    scale_factor = 1.152
    tu, tc = torch.tensor(u), torch.tensor(c)
    result = tu + 5.0 * (tc - tu)
    unscaled = result / scale_factor
    B, T, C, H, W = unscaled.shape
    flat = rearrange(unscaled, "b t c h w -> b c (t h w)")
    means = flat.mean(dim=2).unsqueeze(2)
    recentered = flat - means
    mags = recentered.abs().max()
    normalized = recentered / mags
    s = torch.quantile(normalized.abs(), 0.9995, dim=2)[:, :, None]
    thresholded = torch.clamp(normalized, -s, s) / s
    out = thresholded * mags + means
    want = (rearrange(out, "b c (t h w) -> b t c h w", t=T, h=H, w=W)
            * scale_factor).numpy()
    got = np.asarray(th.dynamic_thresholding_v1(
        jnp.asarray(u), jnp.asarray(c), 5.0, scale_factor=scale_factor))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_dynamic_thresholding_v2():
    from einops import rearrange

    u, c = _pair()
    tu, tc = torch.tensor(u), torch.tensor(c)
    diff = tc - tu
    mim = rearrange(tu + diff * 4.0, "b t c h w -> b c (t h w)")
    cfg = rearrange(tu + diff * 8.0, "b t c h w -> b c (t h w)")
    mim_c = mim - mim.mean(dim=2, keepdim=True)
    cfg_mean = cfg.mean(dim=2, keepdim=True)
    cfg_c = cfg - cfg_mean
    renorm = (cfg_c / cfg_c.std(dim=2, keepdim=True)
              * mim_c.std(dim=2, keepdim=True)) + cfg_mean
    B, T, C, H, W = u.shape
    want = rearrange(renorm, "b c (t h w) -> b t c h w", t=T, h=H,
                     w=W).numpy()
    got = np.asarray(th.dynamic_thresholding_v2(jnp.asarray(u),
                                                jnp.asarray(c), 8.0))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
