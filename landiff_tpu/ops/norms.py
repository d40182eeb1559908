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
    """RMSNorm: x * rsqrt(mean(x^2) + eps) * weight.

    Statistics accumulate in fp32 INSIDE the reduction (XLA fuses the
    upcast into the reduce), but the full tensor is never materialized in
    fp32 — for bf16 activations that halves the HBM traffic and peak
    memory of every norm (critical for the 480p VAE decode)."""
    dtype = x.dtype
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                   keepdims=True)
    scale = jax.lax.rsqrt(var + eps).astype(dtype)
    return x * scale * weight.astype(dtype)


def layer_norm(x: jax.Array, weight=None, bias=None, eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the last axis; weight/bias optional
    (elementwise_affine=False in the DiT). fp32-accumulated statistics,
    input-dtype arithmetic (see rms_norm note)."""
    dtype = x.dtype
    mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
    xc = x - mean.astype(dtype)
    var = jnp.mean(jnp.square(xc.astype(jnp.float32)), axis=-1,
                   keepdims=True)
    out = xc * jax.lax.rsqrt(var + eps).astype(dtype)
    if weight is not None:
        out = out * weight.astype(dtype)
    if bias is not None:
        out = out + bias.astype(dtype)
    return out


def group_norm(x: jax.Array, weight: jax.Array, bias: jax.Array,
               num_groups: int = 32, eps: float = 1e-6,
               channel_axis: int = 1) -> jax.Array:
    """GroupNorm with channels at `channel_axis` (NCHW-style layouts in the
    VAE keep channels at axis 1 of (B, C, T, H, W)). fp32-accumulated
    statistics, input-dtype arithmetic."""
    dtype = x.dtype
    xm = jnp.moveaxis(x, channel_axis, -1)           # (..., C)
    shp = xm.shape
    c = shp[-1]
    g = num_groups
    xg = xm.reshape(shp[:-1] + (g, c // g))
    # stats over all non-batch axes within each group
    red_axes = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
    mean = jnp.mean(xg, axis=red_axes, keepdims=True, dtype=jnp.float32)
    xc = xg - mean.astype(dtype)
    var = jnp.mean(jnp.square(xc.astype(jnp.float32)), axis=red_axes,
                   keepdims=True)
    xg = xc * jax.lax.rsqrt(var + eps).astype(dtype)
    xm = xg.reshape(shp)
    xm = xm * weight.astype(dtype) + bias.astype(dtype)
    return jnp.moveaxis(xm, -1, channel_axis)


def modulate(x: jax.Array, shift: jax.Array, scale: jax.Array) -> jax.Array:
    """adaLN modulation: x * (1 + scale) + shift, broadcasting over seq."""
    return x * (1.0 + scale) + shift


def qk_layer_norm(q: jax.Array, k: jax.Array, q_w, q_b, k_w, k_b,
                  eps: float = 1e-5):
    """Per-head-dim LayerNorm on q/k (DiT qk_ln=True,
    dit_video_concat.py AdaLNMixin per-layer query/key LN)."""
    return layer_norm(q, q_w, q_b, eps), layer_norm(k, k_w, k_b, eps)
