"""Semantic conditioner: token indices -> Theia-space features (TiTok
decode) -> per-frame VQGAN-style 2x upsampler -> zero-init conv_out -> DiT
latent-space condition.

Reference: landiff/diffusion/semantic_models/condition.py (SemanticCond
:30-137, inference index path :86-110 + :112-137) and
semantic_models/modules/vq_gan_blocks.py Decoder (:480-606) with the
shipped config (yaml): z 768 -> ch 512, ch_mult (0.25, 1), 4 res blocks,
no mid attention, PixelShuffle(2) upsample (conv in/4 -> in), GroupNorm32
eps 1e-6 + swish, conv_out 512*0.25=128 -> 64, then SemanticCond.conv_out
64 -> 16 (zero-init 3x3).

All convs NHWC internally; params channel layouts are HWIO.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from landiff_tpu.config import SemanticCondConfig, TokenizerConfig
from landiff_tpu.models import vq as vq_lib
from landiff_tpu.ops.norms import group_norm


def _conv(p, name, x, stride=1):
    w = p[f"{name}_w"].astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride),
        padding=[(w.shape[0] // 2, w.shape[0] // 2)] * 2 if w.shape[0] > 1
        else "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + p[f"{name}_b"].astype(x.dtype)


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _gn(p, name, x):
    # Normalize: GroupNorm(32, eps=1e-6, affine) on NHWC; tiny test configs
    # have <32 channels, production always has >=128
    groups = min(32, p[f"{name}_w"].shape[0])
    return group_norm(x, p[f"{name}_w"], p[f"{name}_b"], num_groups=groups,
                      eps=1e-6, channel_axis=-1)


def _resnet_block(p, x):
    h = _conv(p, "conv1", _swish(_gn(p, "norm1", x)))
    h = _conv(p, "conv2", _swish(_gn(p, "norm2", h)))
    if "nin_w" in p:
        x = _conv(p, "nin", x)
    return x + h


def _pixel_shuffle(x, r=2):
    """torch.nn.PixelShuffle on NHWC: (B,H,W,C*r*r) -> (B,H*r,W*r,C).
    torch channel order: C_out, r, r (NCHW semantics)."""
    B, H, W, C = x.shape
    c = C // (r * r)
    x = x.reshape(B, H, W, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(B, H * r, W * r, c)


def upsampler_forward(p, z, cfg: SemanticCondConfig):
    """VQGAN Decoder (vq_gan_blocks.py:480-606), shipped config.

    z: (N, h, w, z_channels) NHWC -> (N, 2h, 2w, 64)."""
    h = _conv(p, "conv_in", z)
    h = _resnet_block(p["mid1"], h)
    h = _resnet_block(p["mid2"], h)
    # level 1 (top): blocks then pixelshuffle upsample
    for blk in p["up1"]:
        h = _resnet_block(blk, h)
    h = _pixel_shuffle(h, 2)
    h = _conv(p, "up1_conv", h)
    # level 0: blocks, no upsample
    for blk in p["up0"]:
        h = _resnet_block(blk, h)
    h = _swish(_gn(p, "norm_out", h))
    return _conv(p, "conv_out", h)


def semantic_feature_from_tokens(params, indices, tok_cfg: TokenizerConfig,
                                 cfg: SemanticCondConfig, *,
                                 forward_t: int | None = None,
                                 compute_dtype=jnp.bfloat16):
    """SemanticCond.forward(indexs=...) inference path.

    Args:
      params: {"vq": VideoVQ params, "upsampler": ..., "conv_out_w/b"}
      indices: (B, L) token ids.
    Returns: (B, T, target_dim, 2*gh, 2*gw) — e.g. (B, 13, 16, 60, 90).
    """
    feats = vq_lib.index_to_feature(params["vq"], indices, tok_cfg,
                                    forward_t=forward_t,
                                    compute_dtype=compute_dtype)
    B, T, gh, gw, C = feats.shape
    x = feats.astype(compute_dtype).reshape(B * T, gh, gw, C)
    x = upsampler_forward(params["upsampler"], x, cfg)
    x = _conv(params, "conv_out", x)           # zero-init 64->16
    _, h2, w2, c2 = x.shape
    # NHWC -> reference (B, T, C, H, W)
    return x.reshape(B, T, h2, w2, c2).transpose(0, 1, 4, 2, 3)


def pad_to_square(x, pad_value):
    """Pad (..., H, W, C) NHWC frames square: taller -> pad LEFT columns,
    wider -> pad BOTTOM rows (condition.py:15-27 torchvision pad order)."""
    h, w = x.shape[-3], x.shape[-2]
    if h == w:
        return x
    widths = [(0, 0)] * x.ndim
    if h > w:
        widths[-2] = (h - w, 0)
    else:
        widths[-3] = (0, w - h)
    return jnp.pad(x, widths, constant_values=pad_value)


def semantic_feature_from_video(params, video, tok_cfg: TokenizerConfig,
                                cfg: SemanticCondConfig, *,
                                downsample_factor: int = 16,
                                compute_dtype=jnp.bfloat16,
                                theia_params=None):
    """SemanticCond visual/training path (condition.py:86-110): video in
    [-1,1] (B,T,3,H,W) -> [0,255] uint8 -> pad square -> full VQ
    encode->decode round trip -> crop to H/16 x W/16 -> upsample -> conv_out.
    Requires theia params (frozen, from HF)."""
    v = jnp.clip((video + 1.0) / 2.0, 0.0, 1.0)
    v = jnp.round(v * 255.0).astype(jnp.uint8)
    v = v.transpose(0, 1, 3, 4, 2)                   # (B,T,H,W,3)
    origin_h, origin_w = v.shape[2], v.shape[3]
    target_h = origin_h // downsample_factor
    target_w = origin_w // downsample_factor
    v = pad_to_square(v, 127)
    vq_params = dict(params["vq"])
    if theia_params is not None:
        vq_params["theia"] = theia_params
    _, idx = vq_lib.encode_to_index(vq_params, v, tok_cfg,
                                    compute_dtype=compute_dtype)
    feats = vq_lib.index_to_feature(vq_params, idx, tok_cfg,
                                    forward_t=v.shape[1],
                                    compute_dtype=compute_dtype)
    feats = feats[:, :, :target_h, :target_w]        # crop (condition.py:103)
    B, T, gh, gw, C = feats.shape
    x = feats.astype(compute_dtype).reshape(B * T, gh, gw, C)
    x = upsampler_forward(params["upsampler"], x, cfg)
    x = _conv(params, "conv_out", x)
    _, h2, w2, c2 = x.shape
    return x.reshape(B, T, h2, w2, c2).transpose(0, 1, 4, 2, 3)


# ---------------------------------------------------------------------------
# init


def _init_resblock(key, cin, cout, dtype):
    ks = iter(jax.random.split(key, 3))
    nrm = lambda k, s, std=0.02: (jax.random.normal(k, s) * std).astype(dtype)
    p = {
        "norm1_w": jnp.ones((cin,), dtype), "norm1_b": jnp.zeros((cin,), dtype),
        "conv1_w": nrm(next(ks), (3, 3, cin, cout)),
        "conv1_b": jnp.zeros((cout,), dtype),
        "norm2_w": jnp.ones((cout,), dtype), "norm2_b": jnp.zeros((cout,), dtype),
        "conv2_w": nrm(next(ks), (3, 3, cout, cout)),
        "conv2_b": jnp.zeros((cout,), dtype),
    }
    if cin != cout:
        p["nin_w"] = nrm(next(ks), (1, 1, cin, cout))
        p["nin_b"] = jnp.zeros((cout,), dtype)
    return p


def init_upsampler(key, cfg: SemanticCondConfig, dtype=jnp.float32):
    ch = cfg.upsample_ch
    block_in = int(ch * cfg.ch_mult[-1])       # 512
    block_l0 = int(ch * cfg.ch_mult[0])        # 128
    ks = iter(jax.random.split(key, 2 * cfg.num_res_blocks + 12))
    nrm = lambda k, s, std=0.02: (jax.random.normal(k, s) * std).astype(dtype)
    up1 = []
    cin = block_in
    for _ in range(cfg.num_res_blocks + 1):
        up1.append(_init_resblock(next(ks), cin, block_in, dtype))
        cin = block_in
    up0 = []
    cin = block_in
    for _ in range(cfg.num_res_blocks + 1):
        up0.append(_init_resblock(next(ks), cin, block_l0, dtype))
        cin = block_l0
    return {
        "conv_in_w": nrm(next(ks), (3, 3, cfg.z_channels, block_in)),
        "conv_in_b": jnp.zeros((block_in,), dtype),
        "mid1": _init_resblock(next(ks), block_in, block_in, dtype),
        "mid2": _init_resblock(next(ks), block_in, block_in, dtype),
        "up1": up1,
        "up1_conv_w": nrm(next(ks), (3, 3, block_in // 4, block_in)),
        "up1_conv_b": jnp.zeros((block_in,), dtype),
        "up0": up0,
        "norm_out_w": jnp.ones((block_l0,), dtype),
        "norm_out_b": jnp.zeros((block_l0,), dtype),
        "conv_out_w": nrm(next(ks), (3, 3, block_l0, cfg.up_out_channels)),
        "conv_out_b": jnp.zeros((cfg.up_out_channels,), dtype),
    }


def init(key, tok_cfg: TokenizerConfig, cfg: SemanticCondConfig,
         dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "vq": vq_lib.init(k1, tok_cfg, dtype, with_theia=False),
        "upsampler": init_upsampler(k2, cfg, dtype),
        # zero-init conv_out (condition.py:49-53)
        "conv_out_w": jnp.zeros((3, 3, cfg.up_out_channels, cfg.out_channels),
                                dtype),
        "conv_out_b": jnp.zeros((cfg.out_channels,), dtype),
    }
