"""Causal 3-D VAE (CogVideoX class): 8x spatial / 4x temporal compression,
zq-conditioned decoder norms, and chunked streaming decode with the causal
conv cache as an explicit carry.

Reference: landiff/diffusion/vae_modules/cp_enc_dec.py.
  - ContextParallelCausalConv3d (:383-473): temporal pad k-1 causal (first
    chunk: replicate frame 0; later chunks: cached tail of the previous
    padded input), symmetric spatial zero pad
  - SpatialNorm3D (:502-569): GroupNorm(f) * conv_y(zq~) + conv_b(zq~) with
    zq nearest-resized to f's size, first frame interpolated separately
  - Up/DownSample3D (:590-680): 2x nearest / avg-pool with first-frame
    handling when compress_time and odd T
  - Encoder (:785-909): ch 128, mult (1,2,2,4), downsample at levels 0..2,
    temporal compression at levels < log2(4)=2, double_z 32ch output
  - Decoder (:912-1072): mirror with Normalize3D everywhere, zq = z
The reference's python `cache_padding` attribute mutation becomes an explicit
cache pytree (dict keyed by conv path) threaded through the forward, so the
whole streaming decode jits cleanly (SURVEY §7 step 6).

Layout: NTHWC internally; public API uses the reference's (B, C, T, H, W).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from landiff_tpu.config import VAEConfig
from landiff_tpu.ops.norms import group_norm


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _gn(p, name, x, eps=1e-6):
    groups = min(32, p[f"{name}_w"].shape[0])
    return group_norm(x, p[f"{name}_w"], p[f"{name}_b"], num_groups=groups,
                      eps=eps, channel_axis=-1)


# ---------------------------------------------------------------------------
# causal conv3d with streaming cache


# above this many bytes (padded input x taps) the causal conv switches
# from flat shifted-tap convs to a frame-scan (memory-bounded) schedule
_CONV3D_TAP_BYTES = 512 * 1024 * 1024


def causal_conv3d(p, x, cache, path, updates, stream: bool):
    """x: (B, T, H, W, C). p: {"w": (kt,kh,kw,ci,co), "b"}.

    cache: dict or None; cache[path] holds the last (kt-1) PADDED-input
    frames from the previous chunk. `updates` collects new cache entries
    when stream=True.

    The temporal contraction is decomposed into kt per-frame 2-D convs
    summed (out[t] = sum_i conv2d(x[t+i], w[i])): XLA lowers NDHWC depth-3
    conv3d to a non-MXU path on TPU (~0.1 TFLOP/s measured on v5e), while
    the per-frame NHWC convs run as implicit GEMM at full MXU rate."""
    w = p["w"]
    kt, kh, kw = w.shape[:3]
    if kt > 1:
        if cache is not None and path in cache:
            front = cache[path].astype(x.dtype)
        else:
            front = jnp.repeat(x[:, :1], kt - 1, axis=1)
        xp = jnp.concatenate([front, x], axis=1)
    else:
        xp = x
    if stream and kt > 1:
        updates[path] = xp[:, -(kt - 1):]
    pad_h, pad_w = kh // 2, kw // 2
    B, Tp, H, W, C = xp.shape
    T = x.shape[1]

    def conv2d(frames, wi):
        return jax.lax.conv_general_dilated(
            frames, wi.astype(x.dtype), (1, 1),
            [(pad_h, pad_h), (pad_w, pad_w)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    if kt == 1 or xp.nbytes * kt <= _CONV3D_TAP_BYTES:
        # flat taps: kt shifted full-length 2-D convs, summed — maximally
        # parallel but each tap materializes a shifted input copy
        out = None
        for i in range(kt):
            xi = xp[:, i:i + T].reshape(B * T, H, W, C)
            yi = conv2d(xi, w[i])
            out = yi if out is None else out + yi
        out = out.reshape(B, T, *out.shape[1:])
    else:
        # large activations: unrolled per-output-frame taps written into a
        # preallocated buffer via dynamic_update_slice (in-place under
        # XLA). Peak memory ~= input + output + one frame; the flat path's
        # kt shifted full-length copies OOM a 16 GB chip at 480p, a
        # lax.scan stacks (T, ...) then needs a transposed copy (also
        # OOM), and a concatenate of per-frame results doubles the output.
        # T per streaming chunk is small (<= ~9), so the unroll is modest.
        co = w.shape[4]
        out = jnp.zeros((B, T, H, W, co), x.dtype)
        for t in range(T):
            y = None
            for i in range(kt):
                yi = conv2d(xp[:, t + i], w[i])
                y = yi if y is None else y + yi
            out = jax.lax.dynamic_update_slice_in_dim(out, y[:, None], t,
                                                      axis=1)
    return out + p["b"].astype(x.dtype)


def _nearest_resize_3d(x, t, h, w):
    """torch 'nearest' on (B, T, H, W, C): index floor(i * in/out)."""
    B, T, H, W, C = x.shape
    ti = (np.arange(t) * T // t).astype(np.int32)
    hi = (np.arange(h) * H // h).astype(np.int32)
    wi = (np.arange(w) * W // w).astype(np.int32)
    return x[:, ti][:, :, hi][:, :, :, wi]


def _resize_like(zq, Tf, Hf, Wf):
    """Nearest resize with the reference's odd-T first-frame split
    (cp_enc_dec.py:547-560)."""
    if Tf > 1 and Tf % 2 == 1:
        first = _nearest_resize_3d(zq[:, :1], 1, Hf, Wf)
        rest = _nearest_resize_3d(zq[:, 1:], Tf - 1, Hf, Wf)
        return jnp.concatenate([first, rest], axis=1)
    return _nearest_resize_3d(zq, Tf, Hf, Wf)


def spatial_norm3d(p, f, zq, cache, path, updates, stream):
    """SpatialNorm3D (no add_conv in released config). The 1x1x1 conv_y /
    conv_b run at LATENT resolution before the nearest resize — a 1x1 conv
    commutes exactly with nearest-neighbour resizing, saving 64x conv work
    and the full-resolution intermediates (the resize then fuses into the
    elementwise modulation)."""
    Tf, Hf, Wf = f.shape[1:4]
    y_s = causal_conv3d(p["conv_y"], zq, cache, path + ".y", updates, stream)
    b_s = causal_conv3d(p["conv_b"], zq, cache, path + ".b", updates, stream)
    norm_f = _gn(p, "norm", f)
    return norm_f * _resize_like(y_s, Tf, Hf, Wf) + _resize_like(b_s, Tf, Hf,
                                                                 Wf)


def upsample3d(p, x, compress_time: bool):
    B, T, H, W, C = x.shape
    if compress_time and T > 1:
        if T % 2 == 1:
            first = _nearest_resize_3d(x[:, :1], 1, H * 2, W * 2)
            rest = _nearest_resize_3d(x[:, 1:], (T - 1) * 2, H * 2, W * 2)
            x = jnp.concatenate([first, rest], axis=1)
        else:
            x = _nearest_resize_3d(x, T * 2, H * 2, W * 2)
    else:
        x = _nearest_resize_3d(x, T, H * 2, W * 2)
    # 2-D conv applied per frame
    Tn = x.shape[1]
    xf = x.reshape(B * Tn, *x.shape[2:])
    out = jax.lax.conv_general_dilated(
        xf, p["conv_w"].astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["conv_b"].astype(x.dtype)
    return out.reshape(B, Tn, *out.shape[1:])


def downsample3d(p, x, compress_time: bool):
    B, T, H, W, C = x.shape
    if compress_time and T > 1:
        if T % 2 == 1:
            first, rest = x[:, :1], x[:, 1:]
            if rest.shape[1] > 0:
                rest = 0.5 * (rest[:, 0::2] + rest[:, 1::2])
            x = jnp.concatenate([first, rest], axis=1)
        else:
            x = 0.5 * (x[:, 0::2] + x[:, 1::2])
    # asymmetric spatial pad (0,1,0,1) + stride-2 conv per frame
    Tn = x.shape[1]
    xf = x.reshape(B * Tn, *x.shape[2:])
    out = jax.lax.conv_general_dilated(
        xf, p["conv_w"].astype(x.dtype), (2, 2), [(0, 1), (0, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["conv_b"].astype(x.dtype)
    return out.reshape(B, Tn, *out.shape[1:])


def resblock3d(p, x, zq, cache, path, updates, stream):
    h = x
    if zq is not None:
        h = spatial_norm3d(p["norm1"], h, zq, cache, path + ".n1", updates,
                           stream)
    else:
        h = _gn(p["norm1"], "norm", h)
    h = causal_conv3d(p["conv1"], _swish(h), cache, path + ".c1", updates,
                      stream)
    if zq is not None:
        h = spatial_norm3d(p["norm2"], h, zq, cache, path + ".n2", updates,
                           stream)
    else:
        h = _gn(p["norm2"], "norm", h)
    h = causal_conv3d(p["conv2"], _swish(h), cache, path + ".c2", updates,
                      stream)
    if "nin_w" in p:
        x = jnp.einsum("bthwc,cd->bthwd", x, p["nin_w"].astype(x.dtype)) \
            + p["nin_b"].astype(x.dtype)
    return x + h


# ---------------------------------------------------------------------------
# encoder / decoder


def encode(params, x, cfg: VAEConfig, compute_dtype=jnp.bfloat16, *,
           cache=None, stream=False):
    """x: (B, C=3, T, H, W) in [-1, 1] -> moments (B, 2*z, T', H/8, W/8).

    cache/stream: causal-conv tail carry for chunked encode (see
    encode_streaming) — the encoder's temporal convs are the only
    cross-chunk state (DownSample3D's temporal pooling never crosses a
    chunk boundary when chunk lengths are multiples of the temporal
    compression factor). Returns (moments, new_cache) when stream=True."""
    x = x.transpose(0, 2, 3, 4, 1).astype(compute_dtype)  # NTHWC
    upd = {}
    h = causal_conv3d(params["conv_in"], x, cache, "in", upd, stream)
    n_res = len(cfg.ch_mult)
    for i, level in enumerate(params["down"]):
        for j, blk in enumerate(level["blocks"]):
            h = resblock3d(blk, h, None, cache, f"d{i}.{j}", upd, stream)
        if i != n_res - 1:
            h = downsample3d(level["down"], h,
                             compress_time=i < cfg.temporal_compress_level)
    h = resblock3d(params["mid1"], h, None, cache, "m1", upd, stream)
    h = resblock3d(params["mid2"], h, None, cache, "m2", upd, stream)
    h = _gn(params, "norm_out", h)
    h = causal_conv3d(params["conv_out"], _swish(h), cache, "out", upd,
                      stream)
    h = h.transpose(0, 4, 1, 2, 3)  # back to NCTHW
    return (h, upd) if stream else h


def decode(params, z, cfg: VAEConfig, *, cache=None, stream=False,
           compute_dtype=jnp.bfloat16):
    """z: (B, z, T, H', W') latents (already un-scaled). Returns
    ((B, 3, T_out, H, W), new_cache)."""
    z = z.transpose(0, 2, 3, 4, 1).astype(compute_dtype)  # NTHWC
    zq = z
    upd = {}
    n_res = len(cfg.ch_mult)
    h = causal_conv3d(params["conv_in"], z, cache, "in", upd, stream)
    h = resblock3d(params["mid1"], h, zq, cache, "m1", upd, stream)
    h = resblock3d(params["mid2"], h, zq, cache, "m2", upd, stream)
    for i_level in reversed(range(n_res)):
        level = params["up"][i_level]
        for j, blk in enumerate(level["blocks"]):
            h = resblock3d(blk, h, zq, cache, f"u{i_level}.{j}", upd, stream)
        if i_level != 0:
            h = upsample3d(
                level["up"], h,
                compress_time=i_level >= n_res - cfg.temporal_compress_level)
    h = spatial_norm3d(params["norm_out"], h, zq, cache, "no", upd, stream)
    h = causal_conv3d(params["conv_out"], _swish(h), cache, "out", upd,
                      stream)
    return h.transpose(0, 4, 1, 2, 3), (upd if stream else None)


import functools


@functools.partial(jax.jit, static_argnames=("cfg", "stream",
                                             "compute_dtype"),
                   donate_argnums=(3,))
def _decode_jit(params, z, cfg, cache, stream, compute_dtype):
    # the conv cache is consumed and replaced every chunk: donating it
    # avoids double-buffering ~GBs of full-resolution conv tails (the
    # reference parks its cache_padding on CPU for the same reason,
    # cp_enc_dec.py:430-440)
    return decode(params, z, cfg, cache=cache, stream=stream,
                  compute_dtype=compute_dtype)


@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype"))
def _decode_jit_final(params, z, cfg, cache, compute_dtype):
    # LAST chunk: stream=False emits no cache output, so a donated input
    # cache has nothing to alias with and XLA warns "donated buffers were
    # not usable". The cache is still live input state (conv tails read
    # mid-program), so donation could not have saved memory here anyway —
    # use a non-donating program instead of donating into the void.
    return decode(params, z, cfg, cache=cache, stream=False,
                  compute_dtype=compute_dtype)


def decode_streaming(params, z, cfg: VAEConfig, compute_dtype=jnp.bfloat16,
                     first_chunk: int = 3):
    """Serial chunked decode (dif_infer.py:245-271): latent windows
    [0:first_chunk], then pairs; conv caches carried between chunks; cache
    cleared on the last chunk. Each chunk is one jitted program so XLA frees
    intermediates (eager per-op execution holds every temp alive and OOMs
    at 480p); outputs are staged to host per chunk like the reference's
    .cpu() moves (dif_infer.py:269).

    first_chunk: the reference uses 3 (9 output frames in one program);
    first_chunk=1 caps every program at 8 output frames — needed to fit
    480p on a 16GB chip. Output frames are identical through the conv path
    (cache-carried); only per-chunk GroupNorm statistics group differently,
    the same approximation the reference's chunking already makes."""
    import os

    T = z.shape[2]
    outs = []
    cache = None
    first = min(first_chunk, T)
    # tail chunk size: 2 latent frames (8 output frames) like the
    # reference (dif_infer.py:258-266); 1 halves per-program activations
    # when 16 GB is tight
    tail = int(os.environ.get("LANDIFF_VAE_CHUNK", "2"))
    chunks = [(0, first)]
    t = first
    while t < T:
        chunks.append((t, min(t + tail, T)))
        t += tail
    # Chunk OUTPUTS are small (~33 MB each at 480p) — keep them on device
    # and let dispatch stay async; only intermediates needed the per-chunk
    # program split. LANDIFF_VAE_HOST_STAGE=1 restores host staging (the
    # reference's per-chunk .cpu() move, dif_infer.py:269) for machines
    # where even the outputs must leave HBM.
    host_stage = os.environ.get("LANDIFF_VAE_HOST_STAGE", "0") == "1"
    for ci, (a, b) in enumerate(chunks):
        last = ci == len(chunks) - 1
        if last:
            out, cache = _decode_jit_final(params, z[:, :, a:b], cfg,
                                           cache, compute_dtype)
        else:
            out, cache = _decode_jit(params, z[:, :, a:b], cfg, cache,
                                     True, compute_dtype)
        out = out.astype(jnp.float32)
        if host_stage:
            import numpy as np

            out = np.asarray(out)
        outs.append(out)
    return jnp.concatenate([jnp.asarray(o) for o in outs], axis=2)


@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype"),
                   donate_argnums=(3,))
def _encode_jit(params, x, cfg, cache, compute_dtype):
    return encode(params, x, cfg, compute_dtype, cache=cache, stream=True)


@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype"))
def _encode_jit_final(params, x, cfg, cache, compute_dtype):
    # last chunk emits no cache -> nothing to alias a donated input with
    # (same reasoning as _decode_jit_final)
    return encode(params, x, cfg, compute_dtype, cache=cache, stream=False)


def encode_streaming(params, x, cfg: VAEConfig, compute_dtype=jnp.bfloat16,
                     first_chunk: int | None = None):
    """Serial chunked encode with conv-cache carry — the TPU-side answer to
    the reference's whole-clip encoder (cp_enc_dec.py:785-909), which fits
    an 80 GB A100 but needs 22.7 GB of HLO temps at 49f/480p (measured) on
    a 16 GB v5e. Chunk layout mirrors the causal temporal structure: the
    first chunk holds 1 + tf*k frames (odd T at every pooling level -> the
    first-frame pass-through matches the full computation), later chunks
    are multiples of tf = 2**temporal_compress_level so DownSample3D's
    pair-pooling never crosses a chunk boundary. Conv tails carry via the
    causal_conv3d cache (donated between chunks); per-chunk GroupNorm
    statistics are the same approximation the reference's chunked DECODE
    already accepts (dif_infer.py:245-271).

    LANDIFF_VAE_ENC_CHUNK: tail-chunk frames (default 8; must be a
    multiple of tf). Default peak activation is (9, H, W, ch) per program
    (~0.8 GB at 480p) vs (T, H, W, ch) for the full graph."""
    import os

    tf = 2 ** cfg.temporal_compress_level
    T = x.shape[2]
    tail = int(os.environ.get("LANDIFF_VAE_ENC_CHUNK", "8"))
    if tail % tf:
        raise ValueError(f"LANDIFF_VAE_ENC_CHUNK={tail} not a multiple of "
                         f"the temporal compression factor {tf}")
    if first_chunk is None:
        first_chunk = 1 + tail
    if (first_chunk - 1) % tf:
        raise ValueError(f"first_chunk={first_chunk} must be 1 + k*{tf}")
    if (T - 1) % tf:
        raise ValueError(f"T={T} is not 1 + k*{tf} — not a valid causal "
                         "VAE frame count")
    chunks = [(0, min(first_chunk, T))]
    t = chunks[0][1]
    while t < T:
        chunks.append((t, min(t + tail, T)))
        t += tail
    outs = []
    cache = None
    for ci, (a, b) in enumerate(chunks):
        if ci == len(chunks) - 1:
            out = _encode_jit_final(params, x[:, :, a:b], cfg, cache,
                                    compute_dtype)
        else:
            out, cache = _encode_jit(params, x[:, :, a:b], cfg, cache,
                                     compute_dtype)
        outs.append(out)
    return jnp.concatenate(outs, axis=2)


def sample_posterior(moments, key=None):
    """DiagonalGaussian (regularizers.py): moments (B, 2z, ...) -> z.
    key=None -> mode (mean)."""
    mean, logvar = jnp.split(moments, 2, axis=1)
    if key is None:
        return mean
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(key, mean.shape, mean.dtype)


# ---------------------------------------------------------------------------
# init


def _conv3d_init(key, kt, kh, kw, ci, co, dtype):
    k1, = jax.random.split(key, 1)
    fan_in = kt * kh * kw * ci
    std = (1.0 / fan_in) ** 0.5
    return {"w": (jax.random.normal(k1, (kt, kh, kw, ci, co)) * std).astype(dtype),
            "b": jnp.zeros((co,), dtype)}


def _conv2d_init(key, ci, co, dtype):
    std = (1.0 / (9 * ci)) ** 0.5
    return ((jax.random.normal(key, (3, 3, ci, co)) * std).astype(dtype),
            jnp.zeros((co,), dtype))


def _norm_init(c, dtype):
    return {"norm_w": jnp.ones((c,), dtype), "norm_b": jnp.zeros((c,), dtype)}


def _spatial_norm_init(key, c, zq_ch, dtype):
    k1, k2 = jax.random.split(key)
    return {
        **_norm_init(c, dtype),
        "conv_y": _conv3d_init(k1, 1, 1, 1, zq_ch, c, dtype),
        "conv_b": _conv3d_init(k2, 1, 1, 1, zq_ch, c, dtype),
    }


def _resblock_init(key, cin, cout, zq_ch, dtype):
    ks = iter(jax.random.split(key, 5))
    if zq_ch is None:
        n1 = _norm_init(cin, dtype)
        n2 = _norm_init(cout, dtype)
    else:
        n1 = _spatial_norm_init(next(ks), cin, zq_ch, dtype)
        n2 = _spatial_norm_init(next(ks), cout, zq_ch, dtype)
    p = {
        "norm1": n1,
        "conv1": _conv3d_init(next(ks), 3, 3, 3, cin, cout, dtype),
        "norm2": n2,
        "conv2": _conv3d_init(next(ks), 3, 3, 3, cout, cout, dtype),
    }
    if cin != cout:
        std = (1.0 / cin) ** 0.5
        p["nin_w"] = (jax.random.normal(next(ks), (cin, cout)) * std).astype(dtype)
        p["nin_b"] = jnp.zeros((cout,), dtype)
    return p


def init_encoder(key, cfg: VAEConfig, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 64))
    ch = cfg.ch
    in_mult = (1,) + tuple(cfg.ch_mult)
    down = []
    for i in range(len(cfg.ch_mult)):
        cin = ch * in_mult[i]
        cout = ch * cfg.ch_mult[i]
        blocks = []
        c = cin
        for _ in range(cfg.num_res_blocks):
            blocks.append(_resblock_init(next(ks), c, cout, None, dtype))
            c = cout
        level = {"blocks": blocks}
        if i != len(cfg.ch_mult) - 1:
            w, b = _conv2d_init(next(ks), cout, cout, dtype)
            level["down"] = {"conv_w": w, "conv_b": b}
        down.append(level)
    top = ch * cfg.ch_mult[-1]
    zc = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
    return {
        "conv_in": _conv3d_init(next(ks), 3, 3, 3, cfg.in_channels, ch, dtype),
        "down": down,
        "mid1": _resblock_init(next(ks), top, top, None, dtype),
        "mid2": _resblock_init(next(ks), top, top, None, dtype),
        "norm_out_w": jnp.ones((top,), dtype),
        "norm_out_b": jnp.zeros((top,), dtype),
        "conv_out": _conv3d_init(next(ks), 3, 3, 3, top, zc, dtype),
    }


def init_decoder(key, cfg: VAEConfig, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 64))
    ch = cfg.ch
    zq = cfg.z_channels
    top = ch * cfg.ch_mult[-1]
    up = []
    block_in = top
    for i_level in reversed(range(len(cfg.ch_mult))):
        cout = ch * cfg.ch_mult[i_level]
        blocks = []
        c = block_in
        for _ in range(cfg.num_res_blocks + 1):
            blocks.append(_resblock_init(next(ks), c, cout, zq, dtype))
            c = cout
        level = {"blocks": blocks}
        if i_level != 0:
            w, b = _conv2d_init(next(ks), cout, cout, dtype)
            level["up"] = {"conv_w": w, "conv_b": b}
        up.insert(0, level)
        block_in = cout
    return {
        "conv_in": _conv3d_init(next(ks), 3, 3, 3, cfg.z_channels, top, dtype),
        "mid1": _resblock_init(next(ks), top, top, zq, dtype),
        "mid2": _resblock_init(next(ks), top, top, zq, dtype),
        "up": up,
        "norm_out": _spatial_norm_init(next(ks), ch * cfg.ch_mult[0], zq,
                                       dtype),
        "conv_out": _conv3d_init(next(ks), 3, 3, 3, ch * cfg.ch_mult[0],
                                 cfg.out_channels, dtype),
    }


def init(key, cfg: VAEConfig, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {"encoder": init_encoder(k1, cfg, dtype),
            "decoder": init_decoder(k2, cfg, dtype)}
