"""Rotary position embeddings, TPU-native (sin/cos pairs, no complex64).

Reference semantics: landiff/modules/pos_emb.py
  - apply_rope (:16-46): x viewed as interleaved (re, im) pairs, complex
    multiply by cis(theta) in fp32, cast back.
  - precompute_freqs_cis (:49-70): 1-D table, freqs theta**(-2i/dim).
  - Rope3DPosEmb (:126-311): factorized (t,h,w) table; multiple=16 splits
    head_dim as [t: dim/4 | h: 3*dim/8 | w: 3*dim/8] (in cis channels:
    dim/8 + 3dim/16 + 3dim/16 = dim/2); positions where t==h==w use a
    separate 1-D-style table supporting positions up to one_dim_max_time.

TPU has no complex64 fast path, so tables are (cos, sin) float32 arrays of
shape (..., dim//2) and application is a pair rotation on the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from landiff_tpu.config import Rope1DConfig, Rope3DConfig


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate interleaved pairs of x by the given angles.

    Args:
      x: (..., num_heads, head_dim) query or key.
      cos, sin: (..., head_dim//2) — broadcast over the heads axis.
    Returns:
      rotated x with the same shape/dtype.

    Matches pos_emb.py:32-46: out[2i]   = x[2i]*cos_i - x[2i+1]*sin_i
                              out[2i+1] = x[2i]*sin_i + x[2i+1]*cos_i
    computed in fp32 then cast back to x.dtype.
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    xr = xf[..., 0::2]
    xi = xf[..., 1::2]
    cos = cos[..., None, :].astype(jnp.float32)  # add heads axis
    sin = sin[..., None, :].astype(jnp.float32)
    our = xr * cos - xi * sin
    oui = xr * sin + xi * cos
    out = jnp.stack([our, oui], axis=-1).reshape(x.shape)
    return out.astype(orig_dtype)


def apply_rope_qk(q, k, cos, sin):
    return apply_rope(q, cos, sin), apply_rope(k, cos, sin)


# ---------------------------------------------------------------------------
# 1-D table


@functools.lru_cache(maxsize=8)
def rope_1d_table(cfg: Rope1DConfig) -> tuple[np.ndarray, np.ndarray]:
    """(cos, sin) tables of shape (max_len, dim//2), float32.

    freqs_i = theta**(-2i/dim), angle(t, i) = t * freqs_i
    (pos_emb.py:49-70)."""
    dim, end, theta = cfg.dim, cfg.max_len, cfg.theta_base
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2)[: dim // 2].astype(np.float32) / dim))
    t = np.arange(end, dtype=np.float32)
    angles = np.outer(t, freqs).astype(np.float32)
    return np.cos(angles), np.sin(angles)


# ---------------------------------------------------------------------------
# 3-D factorized table


def _axis_freqs(theta: float, n_cis: int, denom_dim: int) -> np.ndarray:
    """freqs_j = theta**(-2j/denom_dim) for j in [0, n_cis)."""
    r = np.arange(0, 2 * n_cis, 2).astype(np.float32)
    return 1.0 / (theta ** (r / denom_dim))


def _rope3d_angles(cfg: Rope3DConfig, t_pos, h_pos, w_pos) -> np.ndarray:
    """Angles (N, dim//2) for arbitrary integer position arrays.

    multiple=16 layout (pos_emb.py:231-258): concat [t | h | w] blocks with
      t block: dim/8 channels, freqs over denom dim/4
      h,w blocks: 3*dim/16 channels each, freqs over denom 3*dim/8
    multiple=6 layout (pos_emb.py:223-256): interleaved (t,h,w) triples,
      dim/6 bands, freqs theta**(-6i/dim)."""
    dim, theta = cfg.dim, cfg.theta_base
    t_pos = np.asarray(t_pos, dtype=np.float32)
    h_pos = np.asarray(h_pos, dtype=np.float32)
    w_pos = np.asarray(w_pos, dtype=np.float32)
    if cfg.multiple == 16:
        t_dim = dim // 4
        hw_dim = dim // 8 * 3
        t_f = _axis_freqs(theta, t_dim // 2, t_dim)
        hw_f = _axis_freqs(theta, hw_dim // 2, hw_dim)
        t_ang = np.outer(t_pos, t_f)
        h_ang = np.outer(h_pos, hw_f)
        w_ang = np.outer(w_pos, hw_f)
        return np.concatenate([t_ang, h_ang, w_ang], axis=-1).astype(np.float32)
    elif cfg.multiple == 6:
        n = dim // 6
        f = 1.0 / (theta ** (np.arange(0, dim, 6)[:n].astype(np.float32) / dim))
        t_ang = np.outer(t_pos, f)[..., None]
        h_ang = np.outer(h_pos, f)[..., None]
        w_ang = np.outer(w_pos, f)[..., None]
        return np.concatenate([t_ang, h_ang, w_ang], axis=-1).reshape(
            len(t_pos), -1).astype(np.float32)
    raise ValueError(f"multiple must be 6 or 16, got {cfg.multiple}")


@functools.lru_cache(maxsize=8)
def rope_3d_grid_table(cfg: Rope3DConfig) -> tuple[np.ndarray, np.ndarray]:
    """(cos, sin) of shape (max_time, max_height, max_width, dim//2)."""
    T, H, W = cfg.max_time, cfg.max_height, cfg.max_width
    flat = np.arange(T * H * W)
    t_pos = flat // (H * W)
    h_pos = (flat % (H * W)) // W
    w_pos = flat % W
    ang = _rope3d_angles(cfg, t_pos, h_pos, w_pos).reshape(T, H, W, -1)
    return np.cos(ang), np.sin(ang)


@functools.lru_cache(maxsize=8)
def rope_3d_text_table(cfg: Rope3DConfig) -> tuple[np.ndarray, np.ndarray]:
    """1-D-style table for positions where t==h==w (pos_emb.py:163-204):
    shape (one_dim_max_time, dim//2)."""
    p = np.arange(cfg.one_dim_max_time)
    ang = _rope3d_angles(cfg, p, p, p)
    return np.cos(ang), np.sin(ang)


def rope_3d_by_index(
    cfg: Rope3DConfig,
    pos_idx: np.ndarray,
    pos_mask: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Gather (cos, sin) for integer (t,h,w) indices.

    Matches Rope3DPosEmb.get_freqs_cis_by_idx (pos_emb.py:265-311): positions
    with t==h==w route to the text table (supports t >= max_time); masked-out
    positions get identity rotation (cos=1, sin=0).

    Args:
      pos_idx: (..., 3) int array.
      pos_mask: (...) bool array or None (= all True).
    Returns:
      (cos, sin) arrays of shape (..., dim//2), float32. Host-side numpy —
    tables are static per model config, computed once at trace time.
    """
    pos_idx = np.asarray(pos_idx)
    lead = pos_idx.shape[:-1]
    flat = pos_idx.reshape(-1, 3)
    eq = (flat[:, 0] == flat[:, 1]) & (flat[:, 1] == flat[:, 2])
    # Grid lookup can't index t>=max_time; clamp (those rows are overwritten
    # by the text-table path or masked to identity).
    tc = np.clip(flat[:, 0], 0, cfg.max_time - 1)
    hc = np.clip(flat[:, 1], 0, cfg.max_height - 1)
    wc = np.clip(flat[:, 2], 0, cfg.max_width - 1)
    gcos, gsin = rope_3d_grid_table(cfg)
    tcos, tsin = rope_3d_text_table(cfg)
    cos = gcos[tc, hc, wc]
    sin = gsin[tc, hc, wc]
    teq = np.clip(flat[:, 0], 0, cfg.one_dim_max_time - 1)
    cos = np.where(eq[:, None], tcos[teq], cos)
    sin = np.where(eq[:, None], tsin[teq], sin)
    if pos_mask is not None:
        m = np.asarray(pos_mask).reshape(-1, 1)
        cos = np.where(m, cos, 1.0)
        sin = np.where(m, sin, 0.0)
    return (cos.reshape(*lead, -1).astype(np.float32),
            sin.reshape(*lead, -1).astype(np.float32))


# ---------------------------------------------------------------------------
# Index helpers (pos_emb.py:313-419)


def shape_to_index(t: int, h: int, w: int) -> np.ndarray:
    """All (t,h,w) indices of a 3-D grid, row-major: shape (t*h*w, 3)."""
    tt, hh, ww = np.meshgrid(np.arange(t), np.arange(h), np.arange(w),
                             indexing="ij")
    return np.stack([tt, hh, ww], axis=-1).reshape(-1, 3)


def shift_rope_index(rope_index: np.ndarray, shift: int,
                     shift_all: bool = False) -> tuple[np.ndarray, int]:
    """Shift the time column (or all columns) by `shift`; returns the new
    index array and last-time+1 for chaining."""
    out = rope_index.copy()
    if shift_all:
        out = out + shift
    else:
        out[:, 0] += shift
    return out, int(out[-1, 0] + 1)


def len_to_rope_index(n: int) -> np.ndarray:
    """(n, 3) array where row i = [i, i, i] — 'text-like' positions."""
    r = np.arange(n)
    return np.stack([r, r, r], axis=-1)
