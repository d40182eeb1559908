"""Theia feature extractor: a DeiT/ViT-base backbone returning patch-token
features at native resolution.

Reference: landiff/tokenizer/models/feature_extractor/theia_extractor.py and
theia_model.py (DeiT:357-452, handle_feature_output:23-63). LanDiff runs it
with interpolate=True / do_resize=False: 480x720 frames -> 30x45 patch grid,
position embeddings bicubically interpolated from the 14x14 train grid
(a=-0.75 kernel, matching torch F.interpolate bicubic, precomputed on host),
preprocessing (x - 127.5)/127.5 ("yax_processor", theia_model.py:445-452),
CLS token stripped from the output.

Params pytree (HF ViTModel naming convertible, see ckpt/convert.py):
  {"patch_w": (P, P, 3, D), "patch_b": (D,), "cls": (D,), "pos": (1+G, D),
   "blocks": [{"ln0_w","ln0_b","q_w","q_b","k_w","k_b","v_w","v_b",
               "o_w","o_b","ln1_w","ln1_b","fc0_w","fc0_b","fc1_w","fc1_b"}],
   "ln_f_w", "ln_f_b"}
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from landiff_tpu.config import TheiaConfig
from landiff_tpu.ops.attention import mha_reference
from landiff_tpu.ops.norms import layer_norm


# ---------------------------------------------------------------------------
# bicubic interpolation of position embeddings (host-side, cached)


def _cubic_kernel(x, a=-0.75):
    x = np.abs(x)
    return np.where(
        x <= 1, ((a + 2) * x - (a + 3)) * x * x + 1,
        np.where(x < 2, (((x - 5) * x + 8) * x - 4) * a, 0.0))


def _resize_axis_matrix(src: int, dst: int,
                        scale: float | None = None) -> np.ndarray:
    """(dst, src) row-stochastic matrix for torch-style bicubic
    (align_corners=False, half-pixel centers). `scale` overrides the
    source-coordinate step (torch F.interpolate given scale_factor=sf uses
    step 1/sf, not src/dst)."""
    if scale is None:
        scale = src / dst
    out = np.zeros((dst, src), np.float64)
    for i in range(dst):
        center = (i + 0.5) * scale - 0.5
        base = math.floor(center)
        for t in range(-1, 3):
            j = base + t
            w = _cubic_kernel(center - j)
            jc = min(max(j, 0), src - 1)  # replicate border
            out[i, jc] += w
    return out


@functools.lru_cache(maxsize=16)
def interpolate_pos_embed_matrixes(src_h: int, src_w: int, dst_h: int,
                                   dst_w: int, dino_scale: bool = False):
    """dino_scale: the vendored DeiTNoCLS/DeiTReg embeddings interpolate with
    F.interpolate(scale_factor=(h0+0.1)/sqrt(N)) — DINO's +0.1 trick
    (theia_model.py:103-120, 229-270) — whose sampling step is 1/sf, NOT
    src/dst. The plain CLS variant goes through HF ViTModel's size-based
    interpolation instead."""
    sh = src_h / (dst_h + 0.1) if dino_scale else None
    sw = src_w / (dst_w + 0.1) if dino_scale else None
    return (_resize_axis_matrix(src_h, dst_h, sh),
            _resize_axis_matrix(src_w, dst_w, sw))


def interpolate_pos_embed(pos: np.ndarray, dst_h: int, dst_w: int,
                          dino_scale: bool = False) -> np.ndarray:
    """pos: (1+G, D) with CLS first. Returns (1 + dst_h*dst_w, D)."""
    cls_pos, patch_pos = pos[:1], pos[1:]
    g = int(round(math.sqrt(patch_pos.shape[0])))
    assert g * g == patch_pos.shape[0]
    d = patch_pos.shape[-1]
    grid = patch_pos.reshape(g, g, d).astype(np.float64)
    mh, mw = interpolate_pos_embed_matrixes(g, g, dst_h, dst_w, dino_scale)
    grid = np.einsum("hH,Hwd->hwd", mh, grid)
    grid = np.einsum("wW,hWd->hwd", mw, grid)
    return np.concatenate(
        [cls_pos, grid.reshape(dst_h * dst_w, d).astype(pos.dtype)], axis=0)


# ---------------------------------------------------------------------------
# ViT forward


def _vit_block(p, x, cfg: TheiaConfig):
    B, S, D = x.shape
    H = cfg.num_heads
    Dk = D // H
    h = layer_norm(x, p["ln0_w"], p["ln0_b"], cfg.layer_norm_eps)
    q = (h @ p["q_w"].astype(x.dtype) + p["q_b"].astype(x.dtype)).reshape(B, S, H, Dk)
    k = (h @ p["k_w"].astype(x.dtype) + p["k_b"].astype(x.dtype)).reshape(B, S, H, Dk)
    v = (h @ p["v_w"].astype(x.dtype) + p["v_b"].astype(x.dtype)).reshape(B, S, H, Dk)
    attn = mha_reference(q, k, v).reshape(B, S, D)
    x = x + attn @ p["o_w"].astype(x.dtype) + p["o_b"].astype(x.dtype)
    h = layer_norm(x, p["ln1_w"], p["ln1_b"], cfg.layer_norm_eps)
    h = jax.nn.gelu(h @ p["fc0_w"].astype(x.dtype) + p["fc0_b"].astype(x.dtype),
                    approximate=False)
    return x + h @ p["fc1_w"].astype(x.dtype) + p["fc1_b"].astype(x.dtype)


def forward_features(params, images, cfg: TheiaConfig,
                     compute_dtype=jnp.bfloat16):
    """Extract patch features at native resolution.

    Args:
      images: (B, H, W, 3) uint8.
    Returns: (B, h, w, D) features where h=H//patch, w=W//patch (CLS dropped).
    """
    B, H, W, _ = images.shape
    P = cfg.patch_size
    h, w = H // P, W // P
    x = (images.astype(jnp.float32) - 127.5) / 127.5
    x = x.astype(compute_dtype)
    x = jax.lax.conv_general_dilated(
        x, params["patch_w"].astype(compute_dtype), (P, P), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x + params["patch_b"].astype(compute_dtype)
    x = x.reshape(B, h * w, -1)
    # Variants (theia_model.py): DeiTNoCLS (:79-120, 454-543) drops the CLS
    # token (pos table keeps the CLS row unused); DeiTReg (:121-327,
    # 545-634) appends N learned register tokens AFTER the patch tokens
    # with their own learned pos embed (reg_pos_embed concatenated to the
    # interpolated table, :266-270).
    n_reg = cfg.num_register_tokens
    no_cls = cfg.no_cls
    parts = [] if no_cls else [jnp.broadcast_to(
        params["cls"].astype(compute_dtype)[None, None],
        (B, 1, x.shape[-1]))]
    parts.append(x)
    if n_reg:
        reg = jnp.broadcast_to(
            params["reg_token"].astype(compute_dtype)[None],
            (B, n_reg, x.shape[-1]))
        parts.append(reg)
    x = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    src_g = cfg.image_size // P
    if (h, w) == (src_g, src_g):
        pos = np.asarray(params["pos"])
    else:
        # no_cls/reg variants interpolate DINO-style (scale_factor +0.1);
        # the plain variant uses HF's size-based bicubic
        pos = interpolate_pos_embed(np.asarray(params["pos"]), h, w,
                                    dino_scale=no_cls or n_reg > 0)
    if no_cls:
        pos = pos[1:]
    pos = jnp.asarray(pos, compute_dtype)
    if n_reg:
        pos = jnp.concatenate(
            [pos, params["reg_pos"].astype(compute_dtype)], axis=0)
    x = x + pos[None]
    for p in params["blocks"]:
        x = _vit_block(p, x, cfg)
    x = layer_norm(x, params["ln_f_w"], params["ln_f_b"], cfg.layer_norm_eps)
    # handle_feature_output(..., num_discard_tokens=N) (theia_model.py:23-63):
    # strip CLS at the front (when present) and register tokens at the end
    start = 0 if no_cls else 1
    end = x.shape[1] - n_reg
    return x[:, start:end].reshape(B, h, w, -1)


def extract(params, frames, cfg: TheiaConfig, output_shape=None,
            compute_dtype=jnp.bfloat16):
    """TheiaExtractor.forward semantics (theia_extractor.py:46-143):
    frames (..., H, W, 3) uint8 -> (..., out_h, out_w, D), cropped/padded to
    `output_shape` (default cfg.output_grid)."""
    if output_shape is None:
        output_shape = cfg.output_grid
    lead = frames.shape[:-3]
    flat = frames.reshape((-1,) + frames.shape[-3:])
    feats = forward_features(params, flat, cfg, compute_dtype)
    oh, ow = output_shape
    fh, fw = feats.shape[1:3]
    if fh >= oh and fw >= ow:
        feats = feats[:, :oh, :ow]
    else:
        feats = jnp.pad(feats, ((0, 0), (0, max(0, oh - fh)),
                                (0, max(0, ow - fw)), (0, 0)))[:, :oh, :ow]
    return feats.reshape(lead + feats.shape[1:])


def init(key, cfg: TheiaConfig, dtype=jnp.float32):
    D = cfg.hidden_size
    P = cfg.patch_size
    M = int(D * cfg.mlp_ratio)
    G = (cfg.image_size // P) ** 2
    keys = iter(jax.random.split(key, 10 * cfg.num_layers + 4))
    nrm = lambda k, s, std=0.02: (jax.random.normal(k, s) * std).astype(dtype)
    blocks = []
    for _ in range(cfg.num_layers):
        blocks.append({
            "ln0_w": jnp.ones((D,), dtype), "ln0_b": jnp.zeros((D,), dtype),
            "q_w": nrm(next(keys), (D, D)), "q_b": jnp.zeros((D,), dtype),
            "k_w": nrm(next(keys), (D, D)), "k_b": jnp.zeros((D,), dtype),
            "v_w": nrm(next(keys), (D, D)), "v_b": jnp.zeros((D,), dtype),
            "o_w": nrm(next(keys), (D, D)), "o_b": jnp.zeros((D,), dtype),
            "ln1_w": jnp.ones((D,), dtype), "ln1_b": jnp.zeros((D,), dtype),
            "fc0_w": nrm(next(keys), (D, M)), "fc0_b": jnp.zeros((M,), dtype),
            "fc1_w": nrm(next(keys), (M, D)), "fc1_b": jnp.zeros((D,), dtype),
        })
    out = {
        "patch_w": nrm(next(keys), (P, P, 3, D)),
        "patch_b": jnp.zeros((D,), dtype),
        "cls": nrm(next(keys), (D,)),
        "pos": nrm(next(keys), (1 + G, D)),
        "blocks": blocks,
        "ln_f_w": jnp.ones((D,), dtype),
        "ln_f_b": jnp.zeros((D,), dtype),
    }
    if cfg.num_register_tokens:
        # DeiTReg: trunc-normal reg_token + reg_pos_embed (theia_model.py:
        # 209-227)
        out["reg_token"] = nrm(next(keys), (cfg.num_register_tokens, D))
        out["reg_pos"] = nrm(next(keys), (cfg.num_register_tokens, D))
    return out
