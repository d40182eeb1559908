"""Vector quantizer + VideoVQ pipeline (Theia -> TiTok -> VQ).

Quantizer re-creates `vector_quantize_pytorch.VectorQuantize(codebook_size=
2048, dim=768, codebook_dim=16, kmeans_init, threshold_ema_dead_code=2)`
(tokenizer_cfg.py:89-95): project_in 768->16, Euclidean nearest-code lookup,
project_out 16->768. Inference = codebook gather + projections; training EMA
/kmeans lives in landiff_tpu/training/vq_train.py.

VideoVQ (tokenizer/models/video_titok_vq.py):
  encode_to_index (:171-202): features -> norm -> TiTok encode -> quantize
  index_to_feature (:250-265): indices -> codebook -> TiTok decode -> denorm
Note the released config passes mean_std_dim but NOT mean_std_path, so
norm/denorm are identity (video_titok_vq.py:224-238 check `mean_std_path is
not None`); we keep the buffers and a flag for parity.

Params pytree:
  {"quant": {"in_w": (dim, cdim), "in_b", "out_w": (cdim, dim), "out_b",
             "codebook": (K, cdim)},
   "encoder": titok encoder params, "decoder": titok decoder params,
   "theia": theia params (frozen), "mean": (C,), "std": (C,)}
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from landiff_tpu.config import TokenizerConfig
from landiff_tpu.models import theia as theia_lib
from landiff_tpu.models import titok as titok_lib


# ---------------------------------------------------------------------------
# quantizer core (fp32, matching `self.quantizer(x.float())`)


def quantize(qp, z):
    """z: (..., dim) fp32. Returns (quantized (..., dim), indices (...))."""
    z = z.astype(jnp.float32)
    zin = z @ qp["in_w"].astype(jnp.float32) + qp["in_b"].astype(jnp.float32)
    cb = qp["codebook"].astype(jnp.float32)          # (K, cdim)
    # ||z - e||^2 = z^2 - 2 z.e + e^2 ; argmin over K
    d = (jnp.sum(zin * zin, -1, keepdims=True)
         - 2.0 * zin @ cb.T + jnp.sum(cb * cb, -1)[None])
    idx = jnp.argmin(d, axis=-1)
    quantized = codes_to_output(qp, idx)
    return quantized, idx


def codes_to_output(qp, indices):
    """VectorQuantize.get_output_from_indices: codebook gather + project_out."""
    cb = qp["codebook"].astype(jnp.float32)
    e = cb[indices]
    return e @ qp["out_w"].astype(jnp.float32) + qp["out_b"].astype(jnp.float32)


def commit_loss(qp, z):
    """Commitment loss (training): mse(project_in(z), sg(nearest code))."""
    z = z.astype(jnp.float32)
    zin = z @ qp["in_w"].astype(jnp.float32) + qp["in_b"].astype(jnp.float32)
    cb = qp["codebook"].astype(jnp.float32)
    d = (jnp.sum(zin * zin, -1, keepdims=True)
         - 2.0 * zin @ cb.T + jnp.sum(cb * cb, -1)[None])
    idx = jnp.argmin(d, axis=-1)
    e = jax.lax.stop_gradient(cb[idx])
    return jnp.mean(jnp.sum((zin - e) ** 2, -1) / zin.shape[-1]), idx


# ---------------------------------------------------------------------------
# FSQ (finite scalar quantization) — the alternative quantizer TowDVQ
# supports (video_titok_vq.py:92-96 isinstance(FSQ) branch), matching
# vector_quantize_pytorch.FSQ semantics.


def fsq_quantize(z, levels: tuple[int, ...]):
    """z: (..., len(levels)) -> (codes in [-1,1], flat indices).

    Even levels use the half-integer offset trick (FSQ paper / vqp impl):
    bound(z) = tanh(z + atanh(offset/half_l)) * half_l - offset."""
    lv = jnp.asarray(levels, jnp.float32)
    half_l = (lv - 1.0) / 2.0
    offset = jnp.where(jnp.asarray(levels) % 2 == 0, 0.5, 0.0)
    shift = jnp.arctanh(offset / half_l)
    bounded = jnp.tanh(z.astype(jnp.float32) + shift) * half_l - offset
    rounded = jnp.round(bounded)
    q = bounded + jax.lax.stop_gradient(rounded - bounded)
    half_w = jnp.asarray([L // 2 for L in levels], jnp.float32)
    digits = (rounded + half_w).astype(jnp.int32)
    basis = jnp.asarray(
        [int(np.prod(levels[:i])) for i in range(len(levels))], jnp.int32)
    idx = jnp.sum(digits * basis, axis=-1)
    return q / half_w, idx


def fsq_indices_to_codes(indices, levels: tuple[int, ...]):
    """FSQ.indices_to_codes: flat index -> normalized code vector."""
    half_w = np.asarray([L // 2 for L in levels], np.float32)
    digits = []
    rem = indices
    for L in levels:
        digits.append(rem % L)
        rem = rem // L
    d = jnp.stack(digits, axis=-1).astype(jnp.float32)
    return (d - half_w) / half_w


# ---------------------------------------------------------------------------
# VideoVQ pipeline


def norm_features(params, feats, use_mean_std: bool = False):
    if not use_mean_std:
        return feats
    return (feats - params["mean"]) / (params["std"] + 1e-8)


def denorm_features(params, feats, use_mean_std: bool = False):
    if not use_mean_std:
        return feats
    return feats * (params["std"] + 1e-8) + params["mean"]


def extract_features(params, video, cfg: TokenizerConfig,
                     compute_dtype=jnp.bfloat16):
    """video: (B, T, H, W, 3) uint8 -> (B, T, gh, gw, C) Theia features."""
    return theia_lib.extract(params["theia"], video, cfg.theia,
                             output_shape=(cfg.titok.grid_h, cfg.titok.grid_w),
                             compute_dtype=compute_dtype)


def encode_features_to_index(params, features, cfg: TokenizerConfig,
                             compute_dtype=jnp.bfloat16,
                             use_mean_std: bool = False):
    """features: (B, T, gh, gw, C) -> (quantized (B,L,dim), indices (B,L))."""
    feats = norm_features(params, features, use_mean_std)
    lat = titok_lib.encode(params["encoder"], feats, cfg.titok,
                           compute_dtype=compute_dtype)
    return quantize(params["quant"], lat)


def encode_to_index(params, video, cfg: TokenizerConfig,
                    compute_dtype=jnp.bfloat16, use_mean_std: bool = False):
    """VideoVQ.encode_to_index: (B,T,H,W,3) uint8 -> (quantized, indices)."""
    feats = extract_features(params, video, cfg, compute_dtype)
    return encode_features_to_index(params, feats, cfg, compute_dtype,
                                    use_mean_std)


def encode_codes(params, video, cfg: TokenizerConfig, *,
                 segment_length: int | None = None,
                 segment_stride: int | None = None,
                 compute_dtype=jnp.bfloat16):
    """SemanticFrozenTokenizer.encode_codes (llm/modules/tokenizer.py:90-102):
    segment the video along time (default 13/13) and encode each segment.
    Returns flat (B, n_segments * latent_tokens) indices."""
    seg_len = segment_length or cfg.segment_length
    seg_stride = segment_stride or cfg.segment_stride
    T = video.shape[1]
    outs = []
    for off in range(0, T, seg_stride):
        seg = video[:, off:off + seg_len]
        _, idx = encode_to_index(params, seg, cfg, compute_dtype)
        outs.append(idx)
    return jnp.concatenate(outs, axis=1)


def index_to_feature(params, indices, cfg: TokenizerConfig, *,
                     forward_t: int | None = None, denormalize: bool = True,
                     compute_dtype=jnp.bfloat16, use_mean_std: bool = False):
    """indices: (B, L) -> (B, T, gh, gw, C) reconstructed Theia features."""
    lat = codes_to_output(params["quant"], indices)
    out = titok_lib.decode(params["decoder"], lat.astype(compute_dtype),
                           cfg.titok, forward_t=forward_t,
                           compute_dtype=compute_dtype)
    if denormalize:
        out = denorm_features(params, out, use_mean_std)
    return out


def init(key, cfg: TokenizerConfig, dtype=jnp.float32, with_theia=True):
    ks = iter(jax.random.split(key, 8))
    q = cfg.vq
    nrm = lambda k, s, std: (jax.random.normal(k, s) * std).astype(dtype)
    params = {
        "quant": {
            "in_w": nrm(next(ks), (q.dim, q.codebook_dim), q.dim ** -0.5),
            "in_b": jnp.zeros((q.codebook_dim,), dtype),
            "out_w": nrm(next(ks), (q.codebook_dim, q.dim),
                         q.codebook_dim ** -0.5),
            "out_b": jnp.zeros((q.dim,), dtype),
            "codebook": nrm(next(ks), (q.codebook_size, q.codebook_dim), 1.0),
        },
        "encoder": titok_lib.init_encoder(next(ks), cfg.titok,
                                          cfg.feature_dim, dtype),
        "decoder": titok_lib.init_decoder(next(ks), cfg.titok,
                                          cfg.feature_dim, dtype),
        "mean": jnp.zeros((cfg.feature_dim,), dtype),
        "std": jnp.ones((cfg.feature_dim,), dtype),
    }
    if with_theia:
        params["theia"] = theia_lib.init(next(ks), cfg.theia, dtype)
    return params
