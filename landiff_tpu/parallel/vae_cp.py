"""Temporal context-parallel VAE decode: shard_map over the `time` mesh
axis with ppermute halo exchange for the causal convs and psum-gathered
norm statistics.

Reference: the NCCL temporal CP in vae_modules/cp_enc_dec.py — asymmetric
split keeping frame 0 (+ conv halo) on rank 0 (:76-132), isend/irecv halo of
the last kernel-1 frames (:203-246), gathered GroupNorm (:476-488). The
TPU-native layout keeps the FIRST frame replicated on every device (a
"first|rest" pair) and shards only the rest evenly, which makes every
temporal op local:

  - causal conv halo: device 0 takes replicate-pad of the (replicated)
    first frame; device i>0 receives the previous device's tail via
    jax.lax.ppermute — the isend/irecv replacement
  - temporal 2x nearest upsample doubles only "rest" frames (the reference's
    odd-T first-frame-special, Upsample3D :590-633) — pure per-frame
    duplication, hence local to each shard
  - GroupNorm / SpatialNorm statistics: local sums + psum over `time`, with
    the first-frame contribution counted exactly once

Requires (T_latent - 1) % time_axis_size == 0 (e.g. 13 latents on 2/3/4/6/12
devices).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from landiff_tpu.config import VAEConfig
from landiff_tpu.models.vae import _nearest_resize_3d, _swish


def _axis_index(axis):
    return jax.lax.axis_index(axis)


def _halo_from_prev(xr, k: int, x0, axis: str):
    """Last (k-1) frames of the previous device's rest (device 0: replicate
    of the global first frame). xr: (B, c, H, W, C); x0: (B, 1, H, W, C)."""
    n = jax.lax.axis_size(axis)
    tail = xr[:, -(k - 1):]
    prev_tail = jax.lax.ppermute(tail, axis,
                                 [(i, (i + 1) % n) for i in range(n)])
    first_halo = jnp.concatenate([x0] * (k - 1), axis=1)
    is_first = (_axis_index(axis) == 0)
    return jnp.where(is_first, first_halo, prev_tail)


def _conv3d_valid_t(p, x):
    """conv3d with VALID time (input already has the halo), SAME space.
    Decomposed into kt per-frame 2-D convs like models/vae.causal_conv3d
    (the NDHWC depth-3 conv3d lowers to a non-MXU path on TPU)."""
    w = p["w"].astype(x.dtype)
    kt, kh, kw = w.shape[:3]
    B, Tp, H, W, C = x.shape
    T = Tp - (kt - 1)
    out = None
    for i in range(kt):
        xi = x[:, i:i + T].reshape(B * T, H, W, C)
        yi = jax.lax.conv_general_dilated(
            xi, w[i], (1, 1), [(kh // 2, kh // 2), (kw // 2, kw // 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = yi if out is None else out + yi
    out = out.reshape(B, T, *out.shape[1:])
    return out + p["b"].astype(x.dtype)


def causal_conv_cp(p, x0, xr, axis: str):
    """Causal conv3d on the (first, rest) pair. Returns (y0, yr)."""
    k = p["w"].shape[0]
    if k == 1:
        return _conv3d_valid_t(p, x0), _conv3d_valid_t(p, xr)
    # first-frame output: window is [x0]*(k-1) + [x0]
    x0_in = jnp.concatenate([x0] * k, axis=1)
    y0 = _conv3d_valid_t(p, x0_in)
    halo = _halo_from_prev(xr, k, x0, axis)
    yr = _conv3d_valid_t(p, jnp.concatenate([halo, xr], axis=1))
    return y0, yr


def group_norm_cp(w, b, x0, xr, axis: str, num_groups=None, eps=1e-6):
    """GroupNorm over the FULL (first + gathered rest) extent, computed from
    local sums + psum (the reference's gathered ContextParallelGroupNorm)."""
    C = w.shape[0]
    g = min(32, C) if num_groups is None else num_groups
    dtype = xr.dtype

    def stats(x):
        xf = x.astype(jnp.float32)
        xg = xf.reshape(x.shape[0], -1, g, C // g)
        s1 = jnp.sum(xg, axis=(1, 3))
        s2 = jnp.sum(xg * xg, axis=(1, 3))
        cnt = xg.shape[1] * xg.shape[3]
        return s1, s2, cnt

    s1r, s2r, cr = stats(xr)
    s1r = jax.lax.psum(s1r, axis)
    s2r = jax.lax.psum(s2r, axis)
    cr = cr * jax.lax.axis_size(axis)
    s10, s20, c0 = stats(x0)
    s1, s2, cnt = s1r + s10, s2r + s20, cr + c0
    mean = s1 / cnt
    var = s2 / cnt - mean * mean

    def norm(x):
        xf = x.astype(jnp.float32)
        xg = xf.reshape(x.shape[0], -1, g, C // g)
        xg = (xg - mean[:, None, :, None]) * jax.lax.rsqrt(
            var[:, None, :, None] + eps)
        out = xg.reshape(x.shape)
        return (out * w.astype(jnp.float32)
                + b.astype(jnp.float32)).astype(dtype)

    return norm(x0), norm(xr)


def spatial_norm_cp(p, f0, fr, zq0, zqr, axis: str):
    """SpatialNorm3D on the pair: gathered GN(f) * conv_y(zq~) + conv_b."""
    _, _, Hf, Wf, _ = fr.shape
    zq0i = _nearest_resize_3d(zq0, 1, Hf, Wf)
    zqri = _nearest_resize_3d(zqr, fr.shape[1], Hf, Wf)
    n0, nr = group_norm_cp(p["norm_w"], p["norm_b"], f0, fr, axis)
    y0, yr = causal_conv_cp(p["conv_y"], zq0i, zqri, axis)
    b0, br = causal_conv_cp(p["conv_b"], zq0i, zqri, axis)
    return n0 * y0 + b0, nr * yr + br


def resblock_cp(p, x0, xr, zq0, zqr, axis: str):
    h0, hr = spatial_norm_cp(p["norm1"], x0, xr, zq0, zqr, axis)
    h0, hr = causal_conv_cp(p["conv1"], _swish(h0), _swish(hr), axis)
    h0, hr = spatial_norm_cp(p["norm2"], h0, hr, zq0, zqr, axis)
    h0, hr = causal_conv_cp(p["conv2"], _swish(h0), _swish(hr), axis)
    if "nin_w" in p:
        nin = lambda v: jnp.einsum("bthwc,cd->bthwd", v,
                                   p["nin_w"].astype(v.dtype)) \
            + p["nin_b"].astype(v.dtype)
        x0, xr = nin(x0), nin(xr)
    return x0 + h0, xr + hr


def _upsample_cp(p, x0, xr, compress_time: bool):
    B, c, H, W, C = xr.shape
    if compress_time:
        xr = _nearest_resize_3d(xr, c * 2, H * 2, W * 2)
    else:
        xr = _nearest_resize_3d(xr, c, H * 2, W * 2)
    x0 = _nearest_resize_3d(x0, 1, H * 2, W * 2)

    def conv2d(v):
        t = v.shape[1]
        vf = v.reshape(B * t, *v.shape[2:])
        out = jax.lax.conv_general_dilated(
            vf, p["conv_w"].astype(v.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) \
            + p["conv_b"].astype(v.dtype)
        return out.reshape(B, t, *out.shape[1:])

    return conv2d(x0), conv2d(xr)


def decode_cp_local(params, z0, zr, cfg: VAEConfig, axis: str,
                    compute_dtype=jnp.bfloat16):
    """Per-device decoder body (run under shard_map).

    z0: (B, 1, h, w, zc) replicated first latent frame;
    zr: (B, c, h, w, zc) this device's latent shard.
    Returns (y0, yr) output RGB pair (NTHWC)."""
    z0 = z0.astype(compute_dtype)
    zr = zr.astype(compute_dtype)
    zq0, zqr = z0, zr
    n_res = len(cfg.ch_mult)
    h0, hr = causal_conv_cp(params["conv_in"], z0, zr, axis)
    h0, hr = resblock_cp(params["mid1"], h0, hr, zq0, zqr, axis)
    h0, hr = resblock_cp(params["mid2"], h0, hr, zq0, zqr, axis)
    for i_level in reversed(range(n_res)):
        level = params["up"][i_level]
        for blk in level["blocks"]:
            h0, hr = resblock_cp(blk, h0, hr, zq0, zqr, axis)
        if i_level != 0:
            ct = i_level >= n_res - cfg.temporal_compress_level
            h0, hr = _upsample_cp(level["up"], h0, hr, compress_time=ct)
    h0, hr = spatial_norm_cp(params["norm_out"], h0, hr, zq0, zqr, axis)
    h0, hr = causal_conv_cp(params["conv_out"], _swish(h0), _swish(hr), axis)
    return h0, hr


def _gn_plain_cp(p, x0, xr, axis: str):
    return group_norm_cp(p["norm_w"], p["norm_b"], x0, xr, axis)


def resblock_plain_cp(p, x0, xr, axis: str):
    """Encoder resblock (plain GroupNorm, no zq)."""
    h0, hr = _gn_plain_cp(p["norm1"], x0, xr, axis)
    h0, hr = causal_conv_cp(p["conv1"], _swish(h0), _swish(hr), axis)
    h0, hr = _gn_plain_cp(p["norm2"], h0, hr, axis)
    h0, hr = causal_conv_cp(p["conv2"], _swish(h0), _swish(hr), axis)
    if "nin_w" in p:
        nin = lambda v: jnp.einsum("bthwc,cd->bthwd", v,
                                   p["nin_w"].astype(v.dtype)) \
            + p["nin_b"].astype(v.dtype)
        x0, xr = nin(x0), nin(xr)
    return x0 + h0, xr + hr


def _downsample_cp(p, x0, xr, compress_time: bool):
    B = xr.shape[0]
    if compress_time:
        # rest frames avg-pooled in pairs (local: shard sizes stay even);
        # the global-odd-T first frame is x0, kept as-is (DownSample3D
        # :654-663 first-frame split)
        xr = 0.5 * (xr[:, 0::2] + xr[:, 1::2])

    def conv2d(v):
        t = v.shape[1]
        vf = v.reshape(B * t, *v.shape[2:])
        out = jax.lax.conv_general_dilated(
            vf, p["conv_w"].astype(v.dtype), (2, 2), [(0, 1), (0, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) \
            + p["conv_b"].astype(v.dtype)
        return out.reshape(B, t, *out.shape[1:])

    return conv2d(x0), conv2d(xr)


def encode_cp_local(params, x0, xr, cfg: VAEConfig, axis: str,
                    compute_dtype=jnp.bfloat16):
    """Per-device encoder body (training path; encoder uses plain gathered
    GroupNorm, ContextParallelEncoder3D cp_enc_dec.py:785-909)."""
    x0 = x0.astype(compute_dtype)
    xr = xr.astype(compute_dtype)
    n_res = len(cfg.ch_mult)
    h0, hr = causal_conv_cp(params["conv_in"], x0, xr, axis)
    for i, level in enumerate(params["down"]):
        for blk in level["blocks"]:
            h0, hr = resblock_plain_cp(blk, h0, hr, axis)
        if i != n_res - 1:
            h0, hr = _downsample_cp(level["down"], h0, hr,
                                    compress_time=i < cfg.temporal_compress_level)
    h0, hr = resblock_plain_cp(params["mid1"], h0, hr, axis)
    h0, hr = resblock_plain_cp(params["mid2"], h0, hr, axis)
    h0, hr = group_norm_cp(params["norm_out_w"], params["norm_out_b"],
                           h0, hr, axis)
    h0, hr = causal_conv_cp(params["conv_out"], _swish(h0), _swish(hr), axis)
    return h0, hr


def encode_temporal_cp(params, x, cfg: VAEConfig, mesh, *,
                       axis: str = "time", compute_dtype=jnp.bfloat16):
    """Multi-chip temporal-CP encode. x: (B, 3, T, H, W) in [-1,1].
    Returns moments (B, 2z, T', H/8, W/8) gathered."""
    n = mesh.shape[axis]
    xt = x.transpose(0, 2, 3, 4, 1)
    T = xt.shape[1]
    assert (T - 1) % n == 0, (T, n)
    c = (T - 1) // n
    # shards must stay >= 2 frames (conv halo) after every temporal
    # downsample, and pool pairs must stay shard-local
    assert c % (2 ** cfg.temporal_compress_level) == 0, c
    assert c // (2 ** cfg.temporal_compress_level) >= 2, c
    x0 = xt[:, :1]
    xr = xt[:, 1:]

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(None, axis)),
        out_specs=(P(), P(None, axis)),
        check_vma=False)
    def run(x0, xr):
        return encode_cp_local(params, x0, xr, cfg, axis, compute_dtype)

    y0, yr = run(x0, xr)
    out = jnp.concatenate([y0, yr], axis=1)
    return out.transpose(0, 4, 1, 2, 3)


def can_decode_cp(T: int, n: int) -> bool:
    """Whether a T-latent-frame decode can CP-shard over n devices: frames
    past the replicated first one must split evenly with >= kernel-1 = 2
    frames per shard (so each halo spans a single neighbor — same
    constraint as the reference's one-rank irecv, cp_enc_dec.py:228)."""
    return (T - 1) % n == 0 and (T - 1) // n >= 2


def decode_temporal_cp(params, z, cfg: VAEConfig, mesh, *,
                       axis: str = "time", compute_dtype=jnp.bfloat16):
    """Multi-chip temporal-CP decode. z: (B, zc, T, h, w) NCTHW.
    Returns (B, 3, T_out, H, W) fully gathered."""
    n = mesh.shape[axis]
    zt = z.transpose(0, 2, 3, 4, 1)               # NTHWC
    T = zt.shape[1]
    assert (T - 1) % n == 0, (T, n)
    # each shard must hold at least kernel-1 = 2 frames so the halo spans a
    # single neighbor (the reference CP has the same constraint: its irecv
    # buffer is the last k-1 frames of ONE previous rank, cp_enc_dec.py:228)
    assert (T - 1) // n >= 2, f"too many time shards: {(T - 1) // n} < 2"
    z0 = zt[:, :1]
    zr = zt[:, 1:]

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(None, axis)),
        out_specs=(P(), P(None, axis)),
        check_vma=False)
    def run(z0, zr):
        return decode_cp_local(params, z0, zr, cfg, axis, compute_dtype)

    y0, yr = run(z0, zr)
    out = jnp.concatenate([y0, yr], axis=1)       # (B, T_out, H, W, 3)
    return out.transpose(0, 4, 1, 2, 3)
