"""CFG-combine / dynamic-thresholding functions.

Reference: sgm/modules/diffusionmodules/sampling_utils.py:8-119. These are
the guider `dyn_thresh` strategies: each takes (uncond, cond, scale) and
returns the combined prediction. Video tensors are (B, T, C, H, W).
All statistics computed in f32 regardless of input dtype.
"""

from __future__ import annotations

import jax.numpy as jnp


def no_dynamic_thresholding(uncond, cond, scale):
    """NoDynamicThresholding (sampling_utils.py:8-13)."""
    return uncond + scale * (cond - uncond)


def static_thresholding(uncond, cond, scale):
    """StaticThresholding (sampling_utils.py:16-20): clamp to [-1, 1]."""
    return jnp.clip(uncond + scale * (cond - uncond), -1.0, 1.0)


def dynamic_threshold(x, p: float = 0.95):
    """dynamic_threshold (sampling_utils.py:23-32): per-(n, c) two-sided
    quantile clamp when the spread exceeds 1."""
    n, t, c, h, w = x.shape
    flat = jnp.transpose(x, (0, 2, 1, 3, 4)).reshape(n, c, t * h * w)
    lo = jnp.quantile(flat, 1 - p, axis=-1, keepdims=True)
    hi = jnp.quantile(flat, p, axis=-1, keepdims=True)
    s = jnp.maximum(-lo, hi)
    clamped = jnp.clip(flat, -s, s)
    flat = jnp.where(s > 1, clamped, flat)
    return jnp.transpose(flat.reshape(n, c, t, h, w), (0, 2, 1, 3, 4))


def dynamic_thresholding2(x0, p: float = 0.995):
    """dynamic_thresholding2 (sampling_utils.py:35-42): per-sample |x|
    quantile clamp (Imagen), floor 1, NO rescale."""
    dt = x0.dtype
    x = x0.astype(jnp.float32)
    s = jnp.quantile(jnp.abs(x).reshape(x.shape[0], -1), p, axis=1)
    s = jnp.maximum(s, 1.0).reshape((-1,) + (1,) * (x.ndim - 1))
    return jnp.clip(x, -s, s).astype(dt)


def latent_dynamic_thresholding(x0, p: float = 0.9995):
    """latent_dynamic_thresholding (sampling_utils.py:45-52): quantile over
    axis 2, clamp AND divide by s. Called on (B, C, L) flattened latents;
    append_dims semantics = trailing singleton dims up to x0.ndim."""
    dt = x0.dtype
    x = x0.astype(jnp.float32)
    s = jnp.quantile(jnp.abs(x), p, axis=2)
    s = s.reshape(s.shape + (1,) * (x.ndim - s.ndim))
    return (jnp.clip(x, -s, s) / s).astype(dt)


def dynamic_thresholding(uncond, cond, scale):
    """DynamicThresholding (sampling_utils.py:65-73): renormalize the CFG
    result to the uncond's global mean/std (torch .std() = ddof 1)."""
    u = uncond.astype(jnp.float32)
    std = u.std(ddof=1)
    result = no_dynamic_thresholding(u, cond.astype(jnp.float32), scale)
    out = (result - result.mean()) / result.std(ddof=1) * std
    return out.astype(uncond.dtype)


def dynamic_thresholding_v1(uncond, cond, scale, *, scale_factor: float):
    """DynamicThresholdingV1 (sampling_utils.py:76-94): unscale, recenter
    per (b, c), normalize by the GLOBAL max magnitude, latent-threshold,
    restore."""
    u = uncond.astype(jnp.float32)
    result = no_dynamic_thresholding(u, cond.astype(jnp.float32), scale)
    b, t, c, h, w = result.shape
    flat = jnp.transpose(result / scale_factor,
                         (0, 2, 1, 3, 4)).reshape(b, c, t * h * w)
    means = flat.mean(axis=2, keepdims=True)
    recentered = flat - means
    magnitudes = jnp.abs(recentered).max()
    thresholded = latent_dynamic_thresholding(recentered / magnitudes)
    flat = thresholded * magnitudes + means
    out = jnp.transpose(flat.reshape(b, c, t, h, w),
                        (0, 2, 1, 3, 4)) * scale_factor
    return out.astype(uncond.dtype)


def dynamic_thresholding_v2(uncond, cond, scale):
    """DynamicThresholdingV2 (sampling_utils.py:97-119): rescale the
    scale-8 CFG direction to the per-(b, c) std of the scale-4 one. `scale`
    is ignored by the reference (hardcoded 4/8) — kept for signature parity."""
    del scale
    u = uncond.astype(jnp.float32)
    diff = cond.astype(jnp.float32) - u
    b, t, c, h, w = u.shape

    def stats(x):
        flat = jnp.transpose(x, (0, 2, 1, 3, 4)).reshape(b, c, t * h * w)
        means = flat.mean(axis=2, keepdims=True)
        centered = flat - means
        return flat, means, centered, centered.std(axis=2, ddof=1,
                                                   keepdims=True)

    _, _, _, mim_std = stats(u + diff * 4.0)
    _, cfg_means, cfg_centered, cfg_std = stats(u + diff * 8.0)
    renorm = cfg_centered / cfg_std * mim_std + cfg_means
    out = jnp.transpose(renorm.reshape(b, c, t, h, w), (0, 2, 1, 3, 4))
    return out.astype(uncond.dtype)
