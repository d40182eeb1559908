"""Sinusoidal embeddings (sgm/modules/diffusionmodules/util.py:207-232):
cos-block-then-sin-block layout, freqs exp(-log(max_period)*i/half)."""

from __future__ import annotations

import math

import jax.numpy as jnp


def timestep_embedding(timesteps, dim: int, max_period: float = 10000.0,
                       dtype=jnp.float32):
    """timesteps: (N,) possibly fractional -> (N, dim)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb.astype(dtype)
