"""TiTok video encoder/decoder: query-token aggregation transformer with the
I/P-frame structured attention masks and factorized 3-D RoPE.

Reference: landiff/tokenizer/modules/blocks.py (TiTokEncoder:414-656,
TiTokDecoder:659-976, ResidualAttentionBlock:222-304, MultiheadAttention:
102-219) with tokenizer_cfg.py settings: width 768, 12 layers/heads,
attention bias=False (MLP bias=True), no qk-norm, no cls token, patch_size 1
over 768-channel Theia features on a 30x45 grid, temporal_size 13, latent
tokens 330 I + 74 P/frame, token_size 768, VIDEO_ENCODER/DECODER masks,
3-D rope (dim 64, multiple 16) with time-shifted visual indices and
"text-table" (t==h==w) query indices.

Encoder sequence: [frame patches (T*1350) | latent queries (1218)]
Decoder sequence: [mask tokens (T*1350)   | latent embeds   (1218)]

Params pytree:
  encoder: {"patch_w": (1,1,C,W), "patch_b", "iframe_latent": (330,W),
            "pframe_latent": (74,W), "ln_pre_w/b", "blocks": [...],
            "ln_post_w/b", "proj_w": (W,token_size), "proj_b"}
  decoder: {"embed_w": (token_size,W), "embed_b", "mask_token": (W,),
            "ln_pre_w/b", "blocks": [...], "ln_post_w/b",
            "ffn0_w": (W,2W), "ffn0_b", "ffn1_w": (2W,C_out), "ffn1_b"}
  block: {"ln0_w","ln0_b","wq","wk","wv","wo","ln1_w","ln1_b",
          "fc0_w","fc0_b","fc1_w","fc1_b"}   (attention linears bias-free)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from landiff_tpu.config import TiTokConfig
from landiff_tpu.ops import masks as masks_lib
from landiff_tpu.ops import rope as rope_lib
from landiff_tpu.ops.attention import attention
from landiff_tpu.ops.norms import layer_norm


def _mask_layout(cfg: TiTokConfig, forward_t: int) -> masks_lib.VideoMaskLayout:
    return masks_lib.VideoMaskLayout(
        num_frames=forward_t, tokens_per_frame=cfg.frame_tokens,
        iframe_tokens=cfg.iframe_latent_tokens,
        pframe_tokens=cfg.pframe_latent_tokens)


@functools.lru_cache(maxsize=8)
def _rope_tables(cfg: TiTokConfig, forward_t: int):
    """(cos, sin) of shape (seq, rope_dim/2) for the
    [visual grid | query tokens] layout (blocks.py freqs_cis:548-591).

    Visual tokens: (t, h, w) grid indices (time shift starts at 0).
    Query tokens: positions [i, i, i] starting at t=0 -> text table."""
    visual_idx = rope_lib.shape_to_index(forward_t, cfg.grid_h, cfg.grid_w)
    q_len = cfg.iframe_latent_tokens + (forward_t - 1) * cfg.pframe_latent_tokens
    query_idx = rope_lib.len_to_rope_index(q_len)
    idx = np.concatenate([visual_idx, query_idx], axis=0)
    return rope_lib.rope_3d_by_index(cfg.rope, idx)


def _block(p, x, cos, sin, cfg: TiTokConfig, mask_fn, attn_impl):
    """ResidualAttentionBlock: pre-LN attn + pre-LN MLP(gelu), attention
    linears bias-free, MLP biased (blocks.py:222-304)."""
    B, S, D = x.shape
    H = cfg.num_heads
    Dk = D // H
    dt = x.dtype
    h = layer_norm(x, p["ln0_w"], p["ln0_b"], cfg.norm_eps)
    q = (h @ p["wq"].astype(dt)).reshape(B, S, H, Dk)
    k = (h @ p["wk"].astype(dt)).reshape(B, S, H, Dk)
    v = (h @ p["wv"].astype(dt)).reshape(B, S, H, Dk)
    q = rope_lib.apply_rope(q, cos[None], sin[None])
    k = rope_lib.apply_rope(k, cos[None], sin[None])
    attn = attention(q, k, v, mask_fn=mask_fn, impl=attn_impl)
    x = x + attn.reshape(B, S, D) @ p["wo"].astype(dt)
    h = layer_norm(x, p["ln1_w"], p["ln1_b"], cfg.norm_eps)
    h = jax.nn.gelu(h @ p["fc0_w"].astype(dt) + p["fc0_b"].astype(dt),
                    approximate=False)
    return x + h @ p["fc1_w"].astype(dt) + p["fc1_b"].astype(dt)


def encode(params, features, cfg: TiTokConfig, *, forward_t=None,
           attn_impl="auto", compute_dtype=jnp.bfloat16):
    """TiTokEncoder.forward (blocks.py:593-656).

    Args:
      features: (B, T, h, w, C) normalized Theia features.
    Returns: (B, latent_tokens, token_size) latents (pre-quantizer).
    """
    B, T = features.shape[:2]
    if forward_t is None:
        forward_t = T
    assert T == forward_t
    dt = compute_dtype
    x = features.astype(dt)
    # patch embed: 1x1 conv == per-token linear
    x = x.reshape(B, T * cfg.grid_h * cfg.grid_w, -1)
    x = x @ params["patch_w"].astype(dt) + params["patch_b"].astype(dt)

    latents = [params["iframe_latent"].astype(dt)]
    if forward_t > 1:
        latents.append(jnp.tile(params["pframe_latent"].astype(dt),
                                (forward_t - 1, 1)))
    lat = jnp.concatenate(latents, axis=0)
    lat = jnp.broadcast_to(lat[None], (B,) + lat.shape)
    x = jnp.concatenate([x, lat], axis=1)
    x = layer_norm(x, params["ln_pre_w"], params["ln_pre_b"], cfg.norm_eps)

    cos, sin = _rope_tables(cfg, forward_t)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)
    mask_fn = masks_lib.video_encoder_mask(_mask_layout(cfg, forward_t))
    for p in params["blocks"]:
        x = _block(p, x, cos, sin, cfg, mask_fn, attn_impl)

    visual_len = forward_t * cfg.frame_tokens
    lat = x[:, visual_len:]
    lat = layer_norm(lat, params["ln_post_w"], params["ln_post_b"], cfg.norm_eps)
    return lat @ params["proj_w"].astype(dt) + params["proj_b"].astype(dt)


def decode(params, latents, cfg: TiTokConfig, *, forward_t=None,
           attn_impl="auto", compute_dtype=jnp.bfloat16):
    """TiTokDecoder.forward (blocks.py:906-976).

    Args:
      latents: (B, L, token_size) quantized latents.
    Returns: (B, T, h, w, C_out) reconstructed feature grid.
    """
    B, L, _ = latents.shape
    if forward_t is None:
        forward_t = cfg.temporal_size
    dt = compute_dtype
    x = latents.astype(dt) @ params["embed_w"].astype(dt) + params["embed_b"].astype(dt)
    visual_len = forward_t * cfg.frame_tokens
    mask_tok = jnp.broadcast_to(params["mask_token"].astype(dt)[None, None],
                                (B, visual_len, x.shape[-1]))
    x = jnp.concatenate([mask_tok, x], axis=1)
    x = layer_norm(x, params["ln_pre_w"], params["ln_pre_b"], cfg.norm_eps)

    cos, sin = _rope_tables(cfg, forward_t)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)
    mask_fn = masks_lib.video_decoder_mask(_mask_layout(cfg, forward_t))
    for p in params["blocks"]:
        x = _block(p, x, cos, sin, cfg, mask_fn, attn_impl)

    x = x[:, :visual_len]
    x = layer_norm(x, params["ln_post_w"], params["ln_post_b"], cfg.norm_eps)
    h = jnp.tanh(x @ params["ffn0_w"].astype(dt) + params["ffn0_b"].astype(dt))
    x = h @ params["ffn1_w"].astype(dt) + params["ffn1_b"].astype(dt)
    return x.reshape(B, forward_t, cfg.grid_h, cfg.grid_w, -1)


def _init_block(key, W, mlp, dtype):
    ks = iter(jax.random.split(key, 8))
    nrm = lambda k, s, std: (jax.random.normal(k, s) * std).astype(dtype)
    std = W ** -0.5
    return {
        "ln0_w": jnp.ones((W,), dtype), "ln0_b": jnp.zeros((W,), dtype),
        "wq": nrm(next(ks), (W, W), std), "wk": nrm(next(ks), (W, W), std),
        "wv": nrm(next(ks), (W, W), std), "wo": nrm(next(ks), (W, W), std),
        "ln1_w": jnp.ones((W,), dtype), "ln1_b": jnp.zeros((W,), dtype),
        "fc0_w": nrm(next(ks), (W, mlp), std), "fc0_b": jnp.zeros((mlp,), dtype),
        "fc1_w": nrm(next(ks), (mlp, W), mlp ** -0.5),
        "fc1_b": jnp.zeros((W,), dtype),
    }


def init_encoder(key, cfg: TiTokConfig, in_channels: int, dtype=jnp.float32):
    W = cfg.width
    mlp = int(W * cfg.mlp_ratio)
    ks = iter(jax.random.split(key, cfg.num_layers + 6))
    scale = W ** -0.5
    nrm = lambda k, s, std: (jax.random.normal(k, s) * std).astype(dtype)
    return {
        "patch_w": nrm(next(ks), (in_channels, W), in_channels ** -0.5),
        "patch_b": jnp.zeros((W,), dtype),
        "iframe_latent": nrm(next(ks), (cfg.iframe_latent_tokens, W), scale),
        "pframe_latent": nrm(next(ks), (cfg.pframe_latent_tokens, W), scale),
        "ln_pre_w": jnp.ones((W,), dtype), "ln_pre_b": jnp.zeros((W,), dtype),
        "blocks": [_init_block(next(ks), W, mlp, dtype)
                   for _ in range(cfg.num_layers)],
        "ln_post_w": jnp.ones((W,), dtype), "ln_post_b": jnp.zeros((W,), dtype),
        "proj_w": nrm(next(ks), (W, cfg.token_size), scale),
        "proj_b": jnp.zeros((cfg.token_size,), dtype),
    }


def init_decoder(key, cfg: TiTokConfig, out_channels: int, dtype=jnp.float32):
    W = cfg.width
    mlp = int(W * cfg.mlp_ratio)
    ks = iter(jax.random.split(key, cfg.num_layers + 6))
    scale = W ** -0.5
    nrm = lambda k, s, std: (jax.random.normal(k, s) * std).astype(dtype)
    return {
        "embed_w": nrm(next(ks), (cfg.token_size, W), cfg.token_size ** -0.5),
        "embed_b": jnp.zeros((W,), dtype),
        "mask_token": nrm(next(ks), (W,), scale),
        "ln_pre_w": jnp.ones((W,), dtype), "ln_pre_b": jnp.zeros((W,), dtype),
        "blocks": [_init_block(next(ks), W, mlp, dtype)
                   for _ in range(cfg.num_layers)],
        "ln_post_w": jnp.ones((W,), dtype), "ln_post_b": jnp.zeros((W,), dtype),
        "ffn0_w": nrm(next(ks), (W, 2 * W), scale),
        "ffn0_b": jnp.zeros((2 * W,), dtype),
        "ffn1_w": nrm(next(ks), (2 * W, out_channels), (2 * W) ** -0.5),
        "ffn1_b": jnp.zeros((out_channels,), dtype),
    }
