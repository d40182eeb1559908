"""Vendored k-diffusion / EDM sampler family in sigma parameterization, as
`lax.scan` loops over host-precomputed f64 coefficient tables.

Reference: sgm/modules/diffusionmodules/sampling.py:87-535 (EDMSampler,
DDIMSampler, AncestralSampler, LinearMultistepSampler, EulerEDMSampler,
HeunEDMSampler, EulerAncestralSampler, DPMPP2SAncestralSampler,
DPMPP2MSampler, SDEDPMPP2MSampler, SdeditEDMSampler) and
sampling_utils.py:122-157 (linear_multistep_coeff, get_ancestral_step, to_d).
These are unused by the shipped LanDiff configs (which use the Video/VPSDE
samplers in samplers.py) but are part of the reference's sampler surface.

denoise_fn contract (sigma-space, unlike the alpha-space samplers.py):
    denoised = denoise_fn(x, sigma) -> fp32 array like x
with `sigma` a scalar f32. CFG/guider combination happens inside denoise_fn
(the reference's guider.prepare_inputs/__call__ pair); the thresholding
combine functions live in `thresholding.py`.

All samplers take `sigmas`: descending noise levels INCLUDING the trailing
zero (the reference's append_zero, i.e. length num_steps+1) — e.g.
`append_zero(schedule.legacy_ddpm_sigmas(cfg))` or
`append_zero(schedule.edm_sigmas(n))`.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def append_zero(sigmas: np.ndarray) -> np.ndarray:
    """sgm util.append_zero: concatenate a trailing 0 noise level."""
    return np.concatenate([np.asarray(sigmas, np.float64), [0.0]])


def _to_d(x, sigma, denoised):
    """to_d (sampling_utils.py:148-149) with a safe denominator (the
    sigma=0 branch is always masked out by the caller)."""
    return (x - denoised) / jnp.maximum(sigma, 1e-20)


def get_ancestral_step(sigma_from, sigma_to, eta: float = 1.0):
    """sampling_utils.py:137-145, computed host-side in f64."""
    if not eta:
        return sigma_to, np.zeros_like(np.asarray(sigma_to, np.float64))
    sigma_from = np.asarray(sigma_from, np.float64)
    sigma_to = np.asarray(sigma_to, np.float64)
    sigma_up = np.minimum(
        sigma_to,
        eta * np.sqrt(sigma_to ** 2 * (sigma_from ** 2 - sigma_to ** 2)
                      / np.maximum(sigma_from ** 2, 1e-300)))
    sigma_down = np.sqrt(np.maximum(sigma_to ** 2 - sigma_up ** 2, 0.0))
    return sigma_down, sigma_up


def linear_multistep_coeff(order: int, t: np.ndarray, i: int, j: int) -> float:
    """LMS coefficient (sampling_utils.py:122-134): integral over
    [t[i], t[i+1]] of the j-th Lagrange basis over nodes t[i-k], k<order.
    The reference integrates numerically (scipy quad); the integrand is a
    polynomial of degree order-1, so we integrate it EXACTLY instead."""
    if order - 1 > i:
        raise ValueError(f"Order {order} too high for step {i}")
    poly = np.polynomial.Polynomial([1.0])
    for k in range(order):
        if j == k:
            continue
        poly = poly * np.polynomial.Polynomial(
            [-t[i - k], 1.0]) / (t[i - j] - t[i - k])
    integ = poly.integ()
    return float(integ(t[i + 1]) - integ(t[i]))


def _prep(x, sigmas):
    """prepare_sampling_loop (sampling.py:46-57): x *= sqrt(1+sigma0^2)."""
    sig = np.asarray(sigmas, np.float64)
    assert sig.ndim == 1 and len(sig) >= 2, sig.shape
    x = x.astype(jnp.float32) * math.sqrt(1.0 + float(sig[0]) ** 2)
    return x, sig, len(sig) - 1


def _f32(a):
    return jnp.asarray(np.asarray(a), jnp.float32)


def euler_edm_sample(denoise_fn: Callable, x, sigmas, *, key=None,
                     s_churn: float = 0.0, s_tmin: float = 0.0,
                     s_tmax: float = float("inf"), s_noise: float = 1.0):
    """EulerEDMSampler (sampling.py:87-135, 255-259)."""
    return _edm_sample(denoise_fn, x, sigmas, key=key, s_churn=s_churn,
                       s_tmin=s_tmin, s_tmax=s_tmax, s_noise=s_noise,
                       heun=False)


def heun_edm_sample(denoise_fn: Callable, x, sigmas, *, key=None,
                    s_churn: float = 0.0, s_tmin: float = 0.0,
                    s_tmax: float = float("inf"), s_noise: float = 1.0):
    """HeunEDMSampler (sampling.py:262-278): Euler step + trapezoidal
    correction with a second network eval (skipped when next_sigma == 0)."""
    return _edm_sample(denoise_fn, x, sigmas, key=key, s_churn=s_churn,
                       s_tmin=s_tmin, s_tmax=s_tmax, s_noise=s_noise,
                       heun=True)


def _edm_sample(denoise_fn, x, sigmas, *, key, s_churn, s_tmin, s_tmax,
                s_noise, heun: bool, start_step: int = 0):
    x, sig, n = _prep(x, sigmas)
    if key is None:
        key = jax.random.PRNGKey(0)
    # reference: s_churn / (num_sigmas - 1) where num_sigmas = len(sigmas)
    gamma = np.where(
        (s_tmin <= sig[:n]) & (sig[:n] <= s_tmax),
        min(s_churn / max(n, 1), 2 ** 0.5 - 1), 0.0)
    sl = slice(start_step, n)
    tab = {
        "sigma": _f32(sig[:n][sl]),
        "sigma_hat": _f32((sig[:n] * (gamma + 1.0))[sl]),
        "next_sigma": _f32(sig[1:][sl]),
        "churn": _f32(np.sqrt(np.maximum(
            (sig[:n] * (gamma + 1.0)) ** 2 - sig[:n] ** 2, 0.0))[sl]),
        "has_churn": jnp.asarray((gamma > 0)[sl]),
        "correct": jnp.asarray((sig[1:][sl] > 1e-14) & heun),
    }

    def body(carry, step):
        x, key = carry
        key, kc = jax.random.split(key)
        eps = jax.random.normal(kc, x.shape, jnp.float32) * s_noise
        x = jnp.where(step["has_churn"], x + eps * step["churn"], x)
        denoised = denoise_fn(x, step["sigma_hat"]).astype(jnp.float32)
        d = _to_d(x, step["sigma_hat"], denoised)
        dt = step["next_sigma"] - step["sigma_hat"]
        euler = x + dt * d

        def correction(euler):
            den2 = denoise_fn(euler, step["next_sigma"]).astype(jnp.float32)
            d2 = _to_d(euler, step["next_sigma"], den2)
            return x + (d + d2) / 2.0 * dt

        if heun:
            x = jax.lax.cond(step["correct"], correction, lambda e: e, euler)
        else:
            x = euler
        return (x, key), None

    (x, _), _ = jax.lax.scan(body, (x, key), tab)
    return x


def sdedit_edm_sample(denoise_fn: Callable, image, randn, sigmas, *,
                      key=None, edit_ratio: float = 0.5, s_churn: float = 0.0,
                      s_tmin: float = 0.0, s_tmax: float = float("inf"),
                      s_noise: float = 1.0):
    """SdeditEDMSampler (sampling.py:492-535): skip steps with
    i/num_steps < edit_ratio; start from image + randn*sigma at the first
    executed step (randn is the UNIT noise, pre-prepare scaling)."""
    sig = np.asarray(sigmas, np.float64)
    n = len(sig) - 1
    start = next((i for i in range(n) if i / n >= edit_ratio), n)
    if start >= n:
        return image.astype(jnp.float32)
    x0 = image.astype(jnp.float32) + randn.astype(jnp.float32) * float(sig[start])
    # undo the _prep scaling so the effective start state is exactly x0
    x0 = x0 / math.sqrt(1.0 + float(sig[0]) ** 2)
    return _edm_sample(denoise_fn, x0, sigmas, key=key, s_churn=s_churn,
                       s_tmin=s_tmin, s_tmax=s_tmax, s_noise=s_noise,
                       heun=False, start_step=start)


def ddim_sample(denoise_fn: Callable, x, sigmas, *, key=None,
                s_noise: float = 0.1):
    """DDIMSampler (sampling.py:138-174): stochastic DDIM in sigma space.

    Latent reference bug (pinned by the direct-execution oracle): the
    reference class is unrunnable as shipped — sampler_step calls
    self.possible_correction_step (sampling.py:153) which only the
    EDMSampler subclasses define, so any call raises AttributeError. This
    port implements the evident intent (identity correction, as in
    EulerEDMSampler)."""
    x, sig, n = _prep(x, sigmas)
    if key is None:
        key = jax.random.PRNGKey(0)
    tab = {
        "sigma": _f32(sig[:n]),
        "next_sigma": _f32(sig[1:]),
        "dt": _f32(sig[1:] * (1 - s_noise ** 2) ** 0.5 - sig[:n]),
    }

    def body(carry, step):
        x, key = carry
        key, kn = jax.random.split(key)
        denoised = denoise_fn(x, step["sigma"]).astype(jnp.float32)
        d = _to_d(x, step["sigma"], denoised)
        noise = jax.random.normal(kn, x.shape, jnp.float32)
        x = x + step["dt"] * d + s_noise * step["next_sigma"] * noise
        return (x, key), None

    (x, _), _ = jax.lax.scan(body, (x, key), tab)
    return x


def euler_ancestral_sample(denoise_fn: Callable, x, sigmas, *, key=None,
                           eta: float = 1.0, s_noise: float = 1.0):
    """EulerAncestralSampler (sampling.py:177-214, 281-288)."""
    x, sig, n = _prep(x, sigmas)
    if key is None:
        key = jax.random.PRNGKey(0)
    down, up = get_ancestral_step(sig[:n], sig[1:], eta=eta)
    tab = {
        "sigma": _f32(sig[:n]),
        "next_pos": jnp.asarray(sig[1:] > 0.0),
        "down": _f32(down),
        "up": _f32(up),
    }

    def body(carry, step):
        x, key = carry
        key, kn = jax.random.split(key)
        denoised = denoise_fn(x, step["sigma"]).astype(jnp.float32)
        d = _to_d(x, step["sigma"], denoised)
        x = x + (step["down"] - step["sigma"]) * d
        noise = jax.random.normal(kn, x.shape, jnp.float32)
        x = jnp.where(step["next_pos"], x + noise * s_noise * step["up"], x)
        return (x, key), None

    (x, _), _ = jax.lax.scan(body, (x, key), tab)
    return x


def dpmpp2s_ancestral_sample(denoise_fn: Callable, x, sigmas, *, key=None,
                             eta: float = 1.0, s_noise: float = 1.0):
    """DPMPP2SAncestralSampler (sampling.py:291-328): one midpoint network
    eval per step (skipped when sigma_down == 0 -> plain ancestral Euler)."""
    x, sig, n = _prep(x, sigmas)
    if key is None:
        key = jax.random.PRNGKey(0)
    down, up = get_ancestral_step(sig[:n], sig[1:], eta=eta)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = -np.log(np.maximum(sig[:n], 1e-300))
        t_next = -np.log(np.maximum(down, 1e-300))
        h = t_next - t
        s = t + 0.5 * h
        sig_s = np.exp(-s)
        m1 = sig_s / sig[:n]
        m2 = np.expm1(-0.5 * h)
        m3 = down / sig[:n]
        m4 = np.expm1(-h)
    second = down > 1e-14
    z = np.zeros(n)
    tab = {
        "sigma": _f32(sig[:n]),
        "next_pos": jnp.asarray(sig[1:] > 0.0),
        "down": _f32(down),
        "up": _f32(up),
        "sig_s": _f32(np.where(second, sig_s, z)),
        "m1": _f32(np.where(second, m1, z)),
        "m2": _f32(np.where(second, m2, z)),
        "m3": _f32(np.where(second, m3, z)),
        "m4": _f32(np.where(second, m4, z)),
        "second": jnp.asarray(second),
    }

    def body(carry, step):
        x, key = carry
        key, kn = jax.random.split(key)
        denoised = denoise_fn(x, step["sigma"]).astype(jnp.float32)
        d = _to_d(x, step["sigma"], denoised)
        x_euler = x + (step["down"] - step["sigma"]) * d

        def second_order(x_euler):
            x2 = step["m1"] * x - step["m2"] * denoised
            denoised2 = denoise_fn(x2, step["sig_s"]).astype(jnp.float32)
            return step["m3"] * x - step["m4"] * denoised2

        x = jax.lax.cond(step["second"], second_order,
                         lambda e: e, x_euler)
        noise = jax.random.normal(kn, x.shape, jnp.float32)
        x = jnp.where(step["next_pos"], x + noise * s_noise * step["up"], x)
        return (x, key), None

    (x, _), _ = jax.lax.scan(body, (x, key), tab)
    return x


def _dpmpp2m_tables(sig, n, *, sde: bool):
    """Shared mult tables for DPMPP2MSampler (sampling.py:331-406) and
    SDEDPMPP2MSampler (:409-489), f64 host math."""
    with np.errstate(divide="ignore", invalid="ignore"):
        t = -np.log(np.maximum(sig[:n], 1e-300))
        t_next = -np.log(np.maximum(sig[1:], 1e-300))
        h = t_next - t
        if sde:
            m1 = sig[1:] / sig[:n] * np.exp(-h)
            m2 = np.expm1(-2.0 * h)
            mn = sig[1:] * np.sqrt(np.maximum(1.0 - np.exp(-2.0 * h), 0.0))
        else:
            m1 = sig[1:] / sig[:n]
            m2 = np.expm1(-h)
            mn = np.zeros(n)
        h_last = np.concatenate([[np.nan], h[:-1]])
        r = h_last / h
        m3 = 1.0 + 1.0 / (2.0 * r)
        m4 = 1.0 / (2.0 * r)
    # first step has no old_denoised; last sigma==0 forces first-order too
    first_order = np.zeros(n, bool)
    first_order[0] = True
    first_order |= sig[1:] < 1e-14
    z = np.zeros(n)
    return {
        "sigma": sig[:n],
        "m1": np.where(sig[1:] >= 1e-14, m1, z),
        "m2": np.where(sig[1:] >= 1e-14, m2, z),
        "m3": np.where(first_order, z, m3),
        "m4": np.where(first_order, z, m4),
        "mn": mn,
        "first_order": first_order,
        "is_last": sig[1:] < 1e-14,
    }


def _dpmpp2m_sample(denoise_fn, x, sigmas, *, key, sde: bool):
    x, sig, n = _prep(x, sigmas)
    if key is None:
        key = jax.random.PRNGKey(0)
    c = _dpmpp2m_tables(sig, n, sde=sde)
    tab = {k: (_f32(v) if v.dtype != bool else jnp.asarray(v))
           for k, v in c.items()}

    def body(carry, step):
        x, old_d, key = carry
        key, kn = jax.random.split(key)
        denoised = denoise_fn(x, step["sigma"]).astype(jnp.float32)
        noise = (jax.random.normal(kn, x.shape, jnp.float32) * step["mn"]
                 if sde else 0.0)
        x_std = step["m1"] * x - step["m2"] * denoised + noise
        denoised_d = step["m3"] * denoised - step["m4"] * old_d
        x_adv = step["m1"] * x - step["m2"] * denoised_d + noise
        x_new = jnp.where(step["first_order"], x_std, x_adv)
        # at sigma_next == 0 both mults vanish; the reference's x_standard
        # degenerates to 0*x - 0*denoised... its m1=0, m2=expm1(-inf)=-1,
        # i.e. x_new = denoised — encode that directly:
        x_new = jnp.where(step["is_last"], denoised, x_new)
        return (x_new, denoised, key), None

    (x, _, _), _ = jax.lax.scan(body, (x, jnp.zeros_like(x), key), tab)
    return x


def dpmpp2m_sample(denoise_fn: Callable, x, sigmas, *, key=None):
    """DPMPP2MSampler (ODE, sampling.py:331-406)."""
    return _dpmpp2m_sample(denoise_fn, x, sigmas, key=key, sde=False)


def sde_dpmpp2m_sample(denoise_fn: Callable, x, sigmas, *, key=None):
    """SDEDPMPP2MSampler (sampling.py:409-489)."""
    return _dpmpp2m_sample(denoise_fn, x, sigmas, key=key, sde=True)


def linear_multistep_sample(denoise_fn: Callable, x, sigmas, *,
                            order: int = 4, key=None):
    """LinearMultistepSampler (sampling.py:217-252): Adams-Bashforth-style
    update with exactly-integrated Lagrange coefficients over the sigma
    grid. The d-history lives in the scan carry as a (order, ...) stack."""
    x, sig, n = _prep(x, sigmas)
    coeff = np.zeros((n, order))
    for i in range(n):
        cur = min(i + 1, order)
        for j in range(cur):
            coeff[i, j] = linear_multistep_coeff(cur, sig, i, j)
    tab = {"sigma": _f32(sig[:n]), "coeff": _f32(coeff)}

    def body(carry, step):
        x, ds = carry            # ds: (order, ...) newest at index 0
        denoised = denoise_fn(x, step["sigma"]).astype(jnp.float32)
        d = _to_d(x, step["sigma"], denoised)
        ds = jnp.concatenate([d[None], ds[:-1]], axis=0)
        # reference: sum(coeff_j * ds_reversed_j) == coeff[j] pairs with the
        # j-th NEWEST d
        upd = jnp.tensordot(step["coeff"], ds, axes=([0], [0]))
        return (x + upd, ds), None

    zeros = jnp.zeros((order,) + x.shape, jnp.float32)
    (x, _), _ = jax.lax.scan(body, (x, zeros), tab)
    return x
