"""Lookup-Free Quantization (LFQ).

Reference: sgm/modules/autoencoding/regularizers/lookup_free_quantization.py
(:63-327, vendored from vector-quantize-pytorch / MagViT2). Codes are sign
bits: quantized = sign(x) * codebook_scale per bit dimension; the index is
the big-endian bit pattern (bit i set iff x_i > 0). Training adds a
straight-through estimator, an entropy aux loss (confident per-sample
predictions, diverse codebook usage) and an MSE commit loss.

Functional port: params are a dict (empty when dim == num_codebooks *
log2(codebook_size), else project_in/out linears); inputs are
(B, N, dim) sequences — callers flatten spatial dims.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class LFQConfig:
    codebook_size: int = 65536          # must be a power of 2
    dim: int | None = None              # None -> num_codebooks * log2(K)
    num_codebooks: int = 1
    codebook_scale: float = 1.0
    entropy_loss_weight: float = 0.1
    commitment_loss_weight: float = 0.25
    diversity_gamma: float = 1.0
    inv_temperature: float = 100.0
    frac_per_sample_entropy: float = 1.0

    @property
    def codebook_dim(self) -> int:
        d = math.log2(self.codebook_size)
        assert d.is_integer(), "codebook_size must be a power of 2"
        return int(d)

    @property
    def codebook_dims(self) -> int:
        return self.codebook_dim * self.num_codebooks

    @property
    def effective_dim(self) -> int:
        return self.dim if self.dim is not None else self.codebook_dims

    @property
    def has_projections(self) -> bool:
        return self.effective_dim != self.codebook_dims


def bit_mask(cfg: LFQConfig) -> np.ndarray:
    """Big-endian bit weights (lookup_free_quantization.py:134)."""
    return 2 ** np.arange(cfg.codebook_dim - 1, -1, -1)


def codebook(cfg: LFQConfig) -> np.ndarray:
    """(K, codebook_dim) in {-scale, +scale} (:139-143)."""
    codes = np.arange(cfg.codebook_size)
    bits = ((codes[:, None] & bit_mask(cfg)) != 0).astype(np.float32)
    return bits * cfg.codebook_scale * 2 - cfg.codebook_scale


def init(key, cfg: LFQConfig, dtype=jnp.float32) -> dict:
    if not cfg.has_projections:
        return {}
    d, cd = cfg.effective_dim, cfg.codebook_dims
    k1, k2 = jax.random.split(key)
    s_in, s_out = 1 / math.sqrt(d), 1 / math.sqrt(cd)
    return {
        "in_w": jax.random.uniform(k1, (d, cd), dtype, -s_in, s_in),
        "in_b": jnp.zeros((cd,), dtype),
        "out_w": jax.random.uniform(k2, (cd, d), dtype, -s_out, s_out),
        "out_b": jnp.zeros((d,), dtype),
    }


def _entropy(prob, eps=1e-5):
    return (-prob * jnp.log(jnp.clip(prob, eps))).sum(-1)


def quantize(params, cfg: LFQConfig, x, *, training: bool = False,
             key=None, sample_mask=None):
    """LFQ.forward (:180-327) on (B, N, dim) inputs.

    Returns (out (B, N, dim), indices (B, N, C) int32 [C squeezed when
    num_codebooks == 1], aux_loss scalar, breakdown dict)."""
    x = x.astype(jnp.float32)
    B, N, _ = x.shape
    if cfg.has_projections:
        x = x @ params["in_w"].astype(jnp.float32) + params["in_b"].astype(jnp.float32)
    x = x.reshape(B, N, cfg.num_codebooks, cfg.codebook_dim)
    original = x

    scale = cfg.codebook_scale
    quantized = jnp.where(x > 0, scale, -scale)
    if training:
        x = x + jax.lax.stop_gradient(quantized - x)   # straight-through
    else:
        x = quantized

    mask = jnp.asarray(bit_mask(cfg), jnp.int32)
    indices = ((x > 0).astype(jnp.int32) * mask).sum(-1)   # (B, N, C)

    if training:
        cb = jnp.asarray(codebook(cfg))
        distance = -2.0 * jnp.einsum("bncd,jd->bncj", original, cb)
        prob = jax.nn.softmax(-distance * cfg.inv_temperature, axis=-1)
        prob = prob.reshape(B * N, cfg.num_codebooks, cfg.codebook_size)
        if sample_mask is not None:
            w = jnp.asarray(sample_mask, jnp.float32).reshape(-1)
        else:
            w = jnp.ones((B * N,), jnp.float32)
        if cfg.frac_per_sample_entropy < 1.0:
            assert key is not None, "frac_per_sample_entropy needs a key"
            n_keep = int(B * N * cfg.frac_per_sample_entropy)
            perm = jax.random.permutation(key, B * N)
            keep = jnp.zeros((B * N,)).at[perm[:n_keep]].set(1.0)
            w = w * keep
        denom = jnp.maximum(w.sum(), 1.0)
        per_sample_entropy = (
            _entropy(prob).mean(-1) * w).sum() / denom
        avg_prob = (prob * w[:, None, None]).sum(0) / denom
        codebook_entropy = _entropy(avg_prob).mean()
        entropy_aux = per_sample_entropy - cfg.diversity_gamma * codebook_entropy
        commit = ((original - jax.lax.stop_gradient(quantized)) ** 2)
        if sample_mask is not None:
            wm = jnp.asarray(sample_mask, jnp.float32).reshape(B, N, 1, 1)
            commit = (commit * wm).sum() / jnp.maximum(
                wm.sum() * cfg.num_codebooks * cfg.codebook_dim, 1.0)
        else:
            commit = commit.mean()
    else:
        entropy_aux = per_sample_entropy = codebook_entropy = commit = \
            jnp.float32(0.0)

    out = x.reshape(B, N, cfg.codebook_dims)
    if cfg.has_projections:
        out = out @ params["out_w"].astype(jnp.float32) + params["out_b"].astype(jnp.float32)
    if cfg.num_codebooks == 1:
        indices = indices[..., 0]
    aux = (entropy_aux * cfg.entropy_loss_weight
           + commit * cfg.commitment_loss_weight)
    breakdown = {"per_sample_entropy": per_sample_entropy,
                 "codebook_entropy": codebook_entropy,
                 "commitment": commit}
    return out, indices, aux, breakdown


def indices_to_codes(params, cfg: LFQConfig, indices, project_out=True):
    """LFQ.indices_to_codes (:152-177). indices (..., C) or (...) when
    num_codebooks == 1."""
    if cfg.num_codebooks == 1 and (indices.ndim == 0
                                   or indices.shape[-1] != cfg.num_codebooks):
        indices = indices[..., None]
    mask = jnp.asarray(bit_mask(cfg), jnp.int32)
    bits = ((indices[..., None].astype(jnp.int32) & mask) != 0)
    codes = bits.astype(jnp.float32) * cfg.codebook_scale * 2 - cfg.codebook_scale
    codes = codes.reshape(codes.shape[:-2] + (cfg.codebook_dims,))
    if project_out and cfg.has_projections:
        codes = codes @ params["out_w"].astype(jnp.float32) \
            + params["out_b"].astype(jnp.float32)
    return codes
