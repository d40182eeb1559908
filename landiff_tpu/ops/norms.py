"""Normalization and modulation primitives.

fp32 statistics, cast back to input dtype — matching torch norm semantics the
reference relies on (RMSNorm: llm/modules/transformer_blocks.py:22-40;
LayerNorm everywhere; GroupNorm in the VAE: vae_modules/cp_enc_dec.py:476-587;
adaLN modulate: diffusion/dit_video_concat.py:490-664).

These are plain jnp functions — XLA fuses them into surrounding matmuls, so no
Pallas is needed except where fused into attention (see ops/attention.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-5) -> jax.Array:
    """RMSNorm: x * rsqrt(mean(x^2) + eps) * weight, stats in fp32."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    return (out * weight.astype(jnp.float32)).astype(dtype)


def layer_norm(x: jax.Array, weight=None, bias=None, eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the last axis; weight/bias optional
    (elementwise_affine=False in the DiT)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dtype)


def group_norm(x: jax.Array, weight: jax.Array, bias: jax.Array,
               num_groups: int = 32, eps: float = 1e-6,
               channel_axis: int = 1) -> jax.Array:
    """GroupNorm with channels at `channel_axis` (NCHW-style layouts in the
    VAE keep channels at axis 1 of (B, C, T, H, W))."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    xm = jnp.moveaxis(xf, channel_axis, -1)          # (..., C)
    shp = xm.shape
    c = shp[-1]
    g = num_groups
    xg = xm.reshape(shp[:-1] + (g, c // g))
    # stats over all non-batch axes within each group
    red_axes = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
    mean = jnp.mean(xg, axis=red_axes, keepdims=True)
    var = jnp.var(xg, axis=red_axes, keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    xm = xg.reshape(shp)
    xm = xm * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return jnp.moveaxis(xm, -1, channel_axis).astype(dtype)


def modulate(x: jax.Array, shift: jax.Array, scale: jax.Array) -> jax.Array:
    """adaLN modulation: x * (1 + scale) + shift, broadcasting over seq."""
    return x * (1.0 + scale) + shift


def qk_layer_norm(q: jax.Array, k: jax.Array, q_w, q_b, k_w, k_b,
                  eps: float = 1e-5):
    """Per-head-dim LayerNorm on q/k (DiT qk_ln=True,
    dit_video_concat.py AdaLNMixin per-layer query/key LN)."""
    return layer_norm(q, q_w, q_b, eps), layer_norm(k, k_w, k_b, eps)
