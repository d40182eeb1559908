"""Stage-1 GPT backbone: Llama-style blocks (RMSNorm + SwiGLU[gelu-tanh])
with fused wqkv, 1-D RoPE, causal attention, LayerNorm+Linear head.

Reference: landiff/llm/models/transformer.py (GPT),
landiff/llm/modules/transformer_blocks.py (LlamaTransformerBlock,
local_kvcache_inference). Config: llm/llm_cfg.py:25-47 — note the SwiGLU
activation is GELU(tanh), not SiLU (llm_cfg.py:31).

Two execution paths, both jit-friendly:
  - `forward`: full-sequence causal (training forward & prefill), replacing
    the reference's unimplemented packed path (transformer.py:55-84 raises
    outside KV mode) with a real one.
  - `decode_step`: single-token step against a preallocated on-HBM KV cache
    updated via dynamic_update_slice — the reference's per-module python
    KVCacheManager (llm/modules/inference.py) becomes an explicit pytree
    carry, so the whole AR loop stays inside one jit.

dtype policy mirrors fwd_dtype=bf16 + fp32 head at sample time
(transformer.py:91-119): blocks run in bf16, norms accumulate fp32.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from landiff_tpu.config import LLMConfig
from landiff_tpu.ops import masks as masks_lib
from landiff_tpu.ops.attention import attention
from landiff_tpu.ops.norms import layer_norm, rms_norm
from landiff_tpu.ops.rope import apply_rope


def gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


class KVCache(NamedTuple):
    """Per-layer stacked KV cache: (L, B, S_max, H, Dk)."""

    k: jax.Array
    v: jax.Array

    @classmethod
    def create(cls, cfg: LLMConfig, batch: int, max_len: int,
               dtype=jnp.bfloat16):
        shape = (cfg.num_layers, batch, max_len, cfg.num_heads, cfg.head_dim)
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def _dot(x, w):
    """x @ w for a plain weight or a weight-only-quantized leaf.

    int8 leaf: {"q": int8 (in, out), "s": (out,)} — w ~= q * s; the
    per-output scale commutes with the matmul, so HBM reads stay int8.
    int4 leaf: {"q4": int8 nibble-packed (in, out/2), "s": (G, out)}
    with G input groups of g = in/G rows each (GPTQ/AWQ-style group-wise
    absmax). The 4-bit values live as packed int8 at the jit boundary —
    an int4-dtype argument trips a relayout recursion in the axon PJRT
    plugin — and are bitcast to int4 INSIDE the program (little-endian:
    byte j -> [col 2j, col 2j+1]), so HBM weight reads stay 4-bit. The
    group scale does NOT commute with the full matmul, so the
    contraction runs per group and the (…, G, out) partials are scaled
    then summed — XLA fuses the int4→bf16 convert into the dot operand
    load (like int8) and the reduce into the scale multiply. Dispatch is
    on the "q4" key: dict keys are static pytree structure under jit
    (a string tag leaf would not be)."""
    if isinstance(w, dict):
        if "q4" in w:
            p, s = w["q4"], w["s"]
            I = p.shape[0]
            q = jax.lax.bitcast_convert_type(p, jnp.int4).reshape(I, -1)
            G, O = s.shape
            g = I // G
            xg = x.reshape(x.shape[:-1] + (G, g))
            part = jnp.einsum("...gi,gio->...go", xg,
                              q.reshape(G, g, O).astype(x.dtype))
            return (part * s.astype(x.dtype)).sum(-2)
        return (x @ w["q"].astype(x.dtype)) * w["s"].astype(x.dtype)
    return x @ w.astype(x.dtype)


def _qkv(p, x, cfg: LLMConfig):
    B, S, D = x.shape
    qkv = _dot(x, p["wqkv"])
    q, k, v = jnp.split(qkv, 3, axis=-1)
    shp = (B, S, cfg.num_heads, cfg.head_dim)
    return q.reshape(shp), k.reshape(shp), v.reshape(shp)


def _mlp(p, x):
    return _dot(gelu_tanh(_dot(x, p["w1"])) * _dot(x, p["w3"]), p["w2"])


def block_forward(p, x, cos, sin, cfg: LLMConfig, attn_impl="auto"):
    """Full-sequence causal block. x: (B, S, D); cos/sin: (S, Dk/2)."""
    h = rms_norm(x, p["norm0"], cfg.norm_eps)
    q, k, v = _qkv(p, h, cfg)
    q, k = apply_rope(q, cos[None], sin[None]), apply_rope(k, cos[None], sin[None])
    attn = attention(q, k, v, mask_fn=masks_lib.causal, impl=attn_impl)
    attn = _dot(attn.reshape(x.shape), p["wo"])
    x = x + attn
    h = rms_norm(x, p["norm1"], cfg.norm_eps)
    return x + _mlp(p, h)


def _bcast_rope(cos, sin):
    """cos/sin (S, Dk/2) -> (1, S, Dk/2); per-row (B, S, Dk/2) passes
    through (left-padded batched decode shifts rope positions per row)."""
    if cos.ndim == 2:
        return cos[None], sin[None]
    return cos, sin


def block_decode(p, x, cos, sin, k_cache, v_cache, pos, cfg: LLMConfig,
                 pad=None):
    """Single-token step. x: (B, 1, D); k_cache/v_cache: (B, S_max, H, Dk);
    pos: scalar index of the current token; pad: optional (B,) left-pad
    lengths (batched decode: cache slots < pad[b] are masked out).
    Returns (x, k_new, v_new)."""
    B, _, D = x.shape
    h = rms_norm(x, p["norm0"], cfg.norm_eps)
    q, k, v = _qkv(p, h, cfg)
    cos, sin = _bcast_rope(cos, sin)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    k_cache = jax.lax.dynamic_update_slice(k_cache, k.astype(k_cache.dtype),
                                           (0, pos, 0, 0))
    v_cache = jax.lax.dynamic_update_slice(v_cache, v.astype(v_cache.dtype),
                                           (0, pos, 0, 0))
    # einsum attention over the cache, masked beyond pos
    # (transformer_blocks.py:169-184 semantics: -finfo.max fill, fp32 softmax)
    scale = 1.0 / math.sqrt(cfg.head_dim)
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                   k_cache.astype(jnp.float32)) * scale
    ks = jnp.arange(k_cache.shape[1])
    valid = (ks <= pos)[None, None, None, :]
    if pad is not None:
        valid = valid & (ks[None, :] >= pad[:, None])[:, None, None, :]
    s = jnp.where(valid, s, -1e30)
    w = jax.nn.softmax(s, axis=-1)
    attn = jnp.einsum("bhqk,bkhd->bqhd", w.astype(v_cache.dtype), v_cache)
    attn = _dot(attn.reshape(B, 1, D).astype(x.dtype), p["wo"])
    x = x + attn
    h = rms_norm(x, p["norm1"], cfg.norm_eps)
    return x + _mlp(p, h), k_cache, v_cache


def forward(params, features, cfg: LLMConfig, cos, sin, *, apply_head=True,
            attn_impl="auto", compute_dtype=jnp.bfloat16):
    """Training/packed forward. features: (B, S, D) embeddings."""
    x = features.astype(compute_dtype)
    for p in params["blocks"]:
        x = block_forward(p, x, cos, sin, cfg, attn_impl)
    x = layer_norm(x, params["ln_f"]["w"], params["ln_f"]["b"])
    if not apply_head:
        return x
    return x @ params["head"].astype(x.dtype)


def prefill(params, features, cache: KVCache, cfg: LLMConfig, cos, sin,
            compute_dtype=jnp.bfloat16, pad=None):
    """Run the prompt through all blocks, filling cache[:, :, :S].

    pad: optional (B,) left-pad lengths for right-aligned batched prompts
    (positions < pad[b] are masked out of the causal attention; their K/V
    lands in the cache but stays masked in every later decode step too).
    cos/sin may be per-row (B, S, Dk/2) to shift rope positions by pad.

    Returns (fp32 logits of the LAST position, updated cache) — matching
    GPT.sample (transformer.py:91-119: fp32 LN + head on last position)."""
    x = features.astype(compute_dtype)
    S = x.shape[1]
    cos, sin = _bcast_rope(cos, sin)
    if pad is None:
        mask = None
        mask_fn = masks_lib.causal
    else:
        qi = jnp.arange(S)[:, None]
        ki = jnp.arange(S)[None, :]
        mask = ((qi >= ki)[None]
                & (ki[None] >= pad[:, None, None]))[:, None]  # (B,1,S,S)
        mask_fn = None
    ks, vs = [], []
    for p in params["blocks"]:
        # compute per-layer K/V on the full prefix, then attend causally
        h = rms_norm(x, p["norm0"], cfg.norm_eps)
        q, k, v = _qkv(p, h, cfg)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn = attention(q, k, v, mask_fn=mask_fn, mask=mask, impl="xla")
        attn = _dot(attn.reshape(x.shape), p["wo"])
        x = x + attn
        h = rms_norm(x, p["norm1"], cfg.norm_eps)
        x = x + _mlp(p, h)
        ks.append(k)
        vs.append(v)
    k_stack = jnp.stack(ks).astype(cache.k.dtype)
    v_stack = jnp.stack(vs).astype(cache.v.dtype)
    cache = KVCache(
        jax.lax.dynamic_update_slice(
            cache.k, k_stack, (0, 0, 0, 0, 0)),
        jax.lax.dynamic_update_slice(
            cache.v, v_stack, (0, 0, 0, 0, 0)))
    logits = _head_last(params, x[:, -1:])
    return logits, cache


def decode_step(params, feature, cache: KVCache, pos, cfg: LLMConfig,
                cos, sin, compute_dtype=jnp.bfloat16, pad=None):
    """One AR step. feature: (B, 1, D) embedding of the token at `pos`;
    cos/sin: (1, Dk/2) rope angles for `pos` — or (B, 1, Dk/2) per-row
    angles with `pad` (B,) for left-padded batches.
    Returns (fp32 logits, cache)."""
    x = feature.astype(compute_dtype)
    new_k, new_v = [], []
    for i, p in enumerate(params["blocks"]):
        x, kc, vc = block_decode(p, x, cos, sin, cache.k[i], cache.v[i], pos,
                                 cfg, pad=pad)
        new_k.append(kc)
        new_v.append(vc)
    cache = KVCache(jnp.stack(new_k), jnp.stack(new_v))
    return _head_last(params, x), cache


def _head_last(params, x_last):
    """fp32 LayerNorm + head on the last position (transformer.py:112-118)."""
    x = x_last[:, -1].astype(jnp.float32)
    x = layer_norm(x, params["ln_f"]["w"], params["ln_f"]["b"])
    return x @ params["head"].astype(jnp.float32)


def quantize_int8(params):
    """Weight-only int8 quantization of the block linears (per-output-
    channel absmax scales). Decode at batch 2 is weights-bandwidth bound
    (PARITY.md) — int8 halves the HBM bytes per step. Norms, embeddings
    and the fp32 sampling head are left untouched."""
    def quant(w):
        a = jnp.asarray(w, jnp.float32)
        s = jnp.max(jnp.abs(a), axis=0) / 127.0
        s = jnp.maximum(s, 1e-8)
        q = jnp.clip(jnp.round(a / s), -127, 127).astype(jnp.int8)
        return {"q": q, "s": s.astype(jnp.bfloat16)}

    out = dict(params)
    out["blocks"] = [
        {k: (quant(v) if k in ("wqkv", "wo", "w1", "w2", "w3") else v)
         for k, v in blk.items()}
        for blk in params["blocks"]]
    return out


def quantize_int4(params, group: int = 128):
    """Weight-only int4 quantization of the block linears, group-wise
    absmax scales over `group` input rows per output channel (the
    GPTQ/AWQ layout; 4-bit needs finer scale granularity than int8's
    per-output-channel). Decode at batch<=2 is weights-bandwidth bound
    (PARITY.md), so int4 halves the int8 HBM bytes/step again. Opt-in
    via LANDIFF_DECODE_INT4 behind its own drift gate
    (tests/test_gpt.py) — NOT part of LANDIFF_FAST unless the measured
    drift clears the same bars as int8. Single-chip only for now: the
    TP sharding rules map int8's (out,) scales, not (G, out).

    Storage is nibble-packed int8 (see _dot): int4-dtype arrays cannot
    cross the jit/device boundary on the axon PJRT plugin (observed
    relayout RecursionError), so byte j of q4 holds columns 2j (low
    nibble) and 2j+1 (high), matching lax.bitcast_convert_type's
    little-endian int8→int4 order."""
    def quant(w):
        a = jnp.asarray(w, jnp.float32)
        I, O = a.shape
        g = group if I % group == 0 else I
        ag = a.reshape(I // g, g, O)
        s = jnp.maximum(jnp.max(jnp.abs(ag), axis=1) / 7.0, 1e-8)
        q = jnp.clip(jnp.round(ag / s[:, None, :]),
                     -7, 7).reshape(I, O).astype(jnp.int8)
        packed = ((q[:, 1::2] << 4) | (q[:, 0::2] & 0x0F)).astype(jnp.int8)
        return {"q4": packed, "s": s.astype(jnp.bfloat16)}

    out = dict(params)
    out["blocks"] = [
        {k: (quant(v) if k in ("wqkv", "wo", "w1", "w2", "w3") else v)
         for k, v in blk.items()}
        for blk in params["blocks"]]
    return out


def init(key, cfg: LLMConfig, dtype=jnp.float32):
    D, M, V = cfg.hidden_size, cfg.mlp_hidden, cfg.vocab_size
    keys = iter(jax.random.split(key, 6 * cfg.num_layers + 2))
    # trunc_normal(std=sqrt(2/fan_in)) for block linears
    # (transformer_blocks.py:81-84); normal(0.02) for head (transformer.py:47)
    tn = lambda k, shape: (jax.random.truncated_normal(k, -2, 2, shape)
                           * math.sqrt(2 / shape[0])).astype(dtype)
    blocks = []
    for _ in range(cfg.num_layers):
        blocks.append({
            "wqkv": tn(next(keys), (D, 3 * D)),
            "wo": tn(next(keys), (D, D)),
            "norm0": jnp.ones((D,), dtype),
            "norm1": jnp.ones((D,), dtype),
            "w1": tn(next(keys), (D, M)),
            "w3": tn(next(keys), (D, M)),
            "w2": tn(next(keys), (M, D)),
        })
    return {
        "blocks": blocks,
        "ln_f": {"w": jnp.ones((D,), dtype), "b": jnp.zeros((D,), dtype)},
        "head": (jax.random.normal(next(keys), (D, V)) * 0.02).astype(dtype),
    }
