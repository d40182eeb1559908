"""T5 encoder (Flan-T5-XXL class) in pure functional JAX.

Replaces the reference's HF `T5EncoderModel` usage (stage 1:
llm/modules/text_encoder.py:137-146; stage 2 FrozenT5Embedder:
sgm/modules/encoders/modules.py:246-295). Architecture matches HF T5 so
pretrained weights convert 1:1 (see ckpt/convert.py):

  - T5LayerNorm: RMS (no mean subtraction), weight only, fp32 stats
  - self-attention WITHOUT 1/sqrt(d) scaling; additive relative position
    bias from a bucketed embedding on layer 0, shared by all layers
  - gated-act FF (wi_0 gelu-new gate * wi_1, then wo)  [flan-t5]

Params pytree layout:
  {"embed": (V, D),
   "blocks": [{"attn": {"q","k","v","o"}, "ln0", "rel_bias"(layer 0),
               "ff": {"wi_0","wi_1","wo"}, "ln1"}, ...],
   "final_ln": (D,)}
All weight matrices stored as (in, out) for x @ W.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from landiff_tpu.config import T5Config


def t5_layer_norm(x, weight, eps=1e-6):
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    return (out * weight.astype(jnp.float32)).astype(dtype)


def gelu_new(x):
    """HF 'gelu_new' (tanh approximation) used by flan-t5."""
    import math

    return 0.5 * x * (1.0 + jnp.tanh(
        math.sqrt(2.0 / math.pi) * (x + 0.044715 * jnp.power(x, 3.0))))


def relative_position_bucket(relative_position, num_buckets=32,
                             max_distance=128):
    """Bidirectional bucketing (HF T5Attention._relative_position_bucket)."""
    num_buckets //= 2
    ret = jnp.where(relative_position > 0, num_buckets, 0)
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact)
        / np.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


def compute_position_bias(rel_bias_table, q_len, kv_len, cfg: T5Config):
    """(1, heads, q_len, kv_len) additive bias."""
    ctx = jnp.arange(q_len)[:, None]
    mem = jnp.arange(kv_len)[None, :]
    buckets = relative_position_bucket(
        mem - ctx, cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance)
    bias = rel_bias_table[buckets]          # (q, kv, heads)
    return bias.transpose(2, 0, 1)[None]    # (1, h, q, kv)


def _attn(x, p, position_bias, attn_mask, cfg: T5Config):
    B, S, _ = x.shape
    H, Dk = cfg.num_heads, cfg.d_kv
    q = (x @ p["q"].astype(x.dtype)).reshape(B, S, H, Dk)
    k = (x @ p["k"].astype(x.dtype)).reshape(B, S, H, Dk)
    v = (x @ p["v"].astype(x.dtype)).reshape(B, S, H, Dk)
    # NOTE: T5 does not scale by 1/sqrt(d_kv)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32)
    s = s + position_bias.astype(jnp.float32)
    if attn_mask is not None:
        s = jnp.where(attn_mask[:, None, None, :], s, -1e30)
    p_attn = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", p_attn, v)
    return out.reshape(B, S, H * Dk) @ p["o"].astype(x.dtype)


def _ff(x, p):
    h = gelu_new(x @ p["wi_0"].astype(x.dtype)) * (x @ p["wi_1"].astype(x.dtype))
    return h @ p["wo"].astype(x.dtype)


def encode(params, input_ids, attn_mask, cfg: T5Config,
           compute_dtype=jnp.bfloat16):
    """T5 encoder forward.

    Args:
      input_ids: (B, S) int32.
      attn_mask: (B, S) bool, True = valid.
    Returns: (B, S, d_model) last hidden state in compute_dtype.
    """
    x = params["embed"][input_ids].astype(compute_dtype)
    S = input_ids.shape[1]
    pos_bias = compute_position_bias(params["blocks"][0]["rel_bias"], S, S, cfg)
    # HF folds the padding mask into the bias once
    for blk in params["blocks"]:
        h = t5_layer_norm(x, blk["ln0"], cfg.layer_norm_eps)
        x = x + _attn(h, blk["attn"], pos_bias, attn_mask, cfg)
        h = t5_layer_norm(x, blk["ln1"], cfg.layer_norm_eps)
        x = x + _ff(h, blk["ff"])
    return t5_layer_norm(x, params["final_ln"], cfg.layer_norm_eps)


def init(key, cfg: T5Config, dtype=jnp.float32):
    """Random init with T5 scaling (for tests; real use loads HF weights)."""
    D, F, H, Dk = cfg.d_model, cfg.d_ff, cfg.num_heads, cfg.d_kv
    inner = H * Dk
    keys = iter(jax.random.split(key, 8 * cfg.num_layers + 4))
    nrm = lambda k, shape, std: (jax.random.normal(k, shape) * std).astype(dtype)
    blocks = []
    for i in range(cfg.num_layers):
        blk = {
            "attn": {
                "q": nrm(next(keys), (D, inner), (D * Dk) ** -0.5),
                "k": nrm(next(keys), (D, inner), D ** -0.5),
                "v": nrm(next(keys), (D, inner), D ** -0.5),
                "o": nrm(next(keys), (inner, D), inner ** -0.5),
            },
            "ln0": jnp.ones((D,), dtype),
            "ff": {
                "wi_0": nrm(next(keys), (D, F), D ** -0.5),
                "wi_1": nrm(next(keys), (D, F), D ** -0.5),
                "wo": nrm(next(keys), (F, D), F ** -0.5),
            },
            "ln1": jnp.ones((D,), dtype),
        }
        if i == 0:
            blk["rel_bias"] = nrm(next(keys),
                                  (cfg.relative_attention_num_buckets, H),
                                  D ** -0.5)
        blocks.append(blk)
    return {
        "embed": nrm(next(keys), (cfg.vocab_size, D), 1.0),
        "blocks": blocks,
        "final_ln": jnp.ones((D,), dtype),
    }


def params_from_hf_state_dict(sd, cfg: T5Config, dtype=jnp.float32):
    """Convert a HF T5EncoderModel state_dict (numpy arrays) to our pytree.

    Accepts keys with or without the leading 'encoder.' prefix; linear
    weights are transposed torch (out,in) -> (in,out)."""

    def get(name):
        for k in (name, "encoder." + name):
            if k in sd:
                return np.asarray(sd[k])
        raise KeyError(name)

    t = lambda name: jnp.asarray(get(name).T, dtype)
    vec = lambda name: jnp.asarray(get(name), dtype)

    blocks = []
    for i in range(cfg.num_layers):
        pre = f"block.{i}.layer."
        blk = {
            "attn": {c: t(pre + f"0.SelfAttention.{c}.weight")
                     for c in ("q", "k", "v", "o")},
            "ln0": vec(pre + "0.layer_norm.weight"),
            "ff": {
                "wi_0": t(pre + "1.DenseReluDense.wi_0.weight"),
                "wi_1": t(pre + "1.DenseReluDense.wi_1.weight"),
                "wo": t(pre + "1.DenseReluDense.wo.weight"),
            },
            "ln1": vec(pre + "1.layer_norm.weight"),
        }
        if i == 0:
            blk["rel_bias"] = jnp.asarray(
                get("block.0.layer.0.SelfAttention."
                    "relative_attention_bias.weight"), dtype)
        blocks.append(blk)
    try:
        embed = get("shared.weight")
    except KeyError:
        embed = get("embed_tokens.weight")
    return {
        "embed": jnp.asarray(embed, dtype),
        "blocks": blocks,
        "final_ln": vec("final_layer_norm.weight"),
    }
