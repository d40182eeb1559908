"""GPT backbone: prefill+decode consistency vs full forward, and parity of
the block math vs an independent torch transcription."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from landiff_tpu.config import LLMConfig, Rope1DConfig
from landiff_tpu.models import gpt
from landiff_tpu.ops.rope import rope_1d_table

CFG = LLMConfig(hidden_size=32, num_layers=2, num_heads=2, mlp_hidden=48,
                codebook_size=16, rope=Rope1DConfig(dim=16, max_len=128))


def test_decode_matches_forward():
    """Teacher-forcing equivalence: prefill(prefix) + N decode steps must give
    the same final-position logits as a full causal forward."""
    key = jax.random.PRNGKey(0)
    params = gpt.init(key, CFG)
    B, S = 1, 10
    feats = jax.random.normal(jax.random.PRNGKey(1), (B, S, CFG.hidden_size))
    cos, sin = rope_1d_table(CFG.rope)
    cos, sin = jnp.asarray(cos[:S]), jnp.asarray(sin[:S])

    # full forward, fp32
    full = gpt.forward(params, feats, CFG, cos, sin, attn_impl="xla",
                       compute_dtype=jnp.float32)

    # prefill 4 + decode 6
    cache = gpt.KVCache.create(CFG, B, S, jnp.float32)
    logits, cache = gpt.prefill(params, feats[:, :4], cache, CFG,
                                cos[:4], sin[:4], compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, 3]),
                               rtol=1e-4, atol=1e-4)
    for pos in range(4, S):
        logits, cache = gpt.decode_step(params, feats[:, pos:pos + 1], cache,
                                        pos, CFG, cos[pos:pos + 1],
                                        sin[pos:pos + 1],
                                        compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(logits),
                                   np.asarray(full[:, pos]),
                                   rtol=1e-4, atol=1e-4, err_msg=f"pos {pos}")


def test_block_matches_torch_transcription():
    """One block vs independent torch math (RMSNorm + fused wqkv + rope +
    causal sdpa + SwiGLU with gelu-tanh)."""
    key = jax.random.PRNGKey(3)
    params = gpt.init(key, CFG)
    p = params["blocks"][0]
    B, S, D = 1, 6, CFG.hidden_size
    H, Dk = CFG.num_heads, CFG.head_dim
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(4), (B, S, D)),
                   np.float32)
    cos_t, sin_t = rope_1d_table(CFG.rope)
    got = np.asarray(gpt.block_forward(
        p, jnp.asarray(x), jnp.asarray(cos_t[:S]), jnp.asarray(sin_t[:S]),
        CFG, attn_impl="xla"))

    xt = torch.from_numpy(x)
    wqkv = torch.from_numpy(np.asarray(p["wqkv"]))
    wo = torch.from_numpy(np.asarray(p["wo"]))

    def rms(v, w):
        return v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + 1e-5) * \
            torch.from_numpy(np.asarray(w))

    h = rms(xt, p["norm0"])
    qkv = h @ wqkv
    q, k, v = qkv.chunk(3, dim=-1)
    q = q.view(B, S, H, Dk)
    k = k.view(B, S, H, Dk)
    v = v.view(B, S, H, Dk)
    # complex rope
    cis = torch.polar(torch.ones(S, Dk // 2),
                      torch.from_numpy(np.arccos(np.clip(cos_t[:S], -1, 1))
                                       * np.sign(np.arcsin(np.clip(sin_t[:S], -1, 1)))))
    # safer: build cis from cos/sin directly
    cis = torch.complex(torch.from_numpy(cos_t[:S].astype(np.float32)),
                        torch.from_numpy(sin_t[:S].astype(np.float32)))
    def rope_t(t):
        tc = torch.view_as_complex(t.float().reshape(B, S, H, Dk // 2, 2))
        out = tc * cis[None, :, None, :]
        return torch.view_as_real(out).reshape(B, S, H, Dk)
    q, k = rope_t(q), rope_t(k)
    attn = torch.nn.functional.scaled_dot_product_attention(
        q.permute(0, 2, 1, 3), k.permute(0, 2, 1, 3), v.permute(0, 2, 1, 3),
        is_causal=True).permute(0, 2, 1, 3).reshape(B, S, D)
    xt = xt + attn @ wo
    h = rms(xt, p["norm1"])
    w1 = torch.from_numpy(np.asarray(p["w1"]))
    w2 = torch.from_numpy(np.asarray(p["w2"]))
    w3 = torch.from_numpy(np.asarray(p["w3"]))
    mlp = (torch.nn.functional.gelu(h @ w1, approximate="tanh") * (h @ w3)) @ w2
    want = (xt + mlp).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_int8_quantized_decode_close_to_full():
    """Weight-only int8 decode: per-output-channel absmax quantization
    keeps single-step logits close to the full-precision path (decode is
    weights-bandwidth bound — int8 halves HBM bytes per step)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from landiff_tpu.config import tiny_test_config
    from landiff_tpu.models import gpt
    from landiff_tpu.ops.rope import rope_1d_table

    cfg = tiny_test_config().llm
    params = gpt.init(jax.random.PRNGKey(0), cfg)
    qparams = gpt.quantize_int8(params)
    assert qparams["blocks"][0]["wqkv"]["q"].dtype == jnp.int8
    # dequantized weights approximate the originals
    blk, qblk = params["blocks"][0], qparams["blocks"][0]
    deq = np.asarray(qblk["wqkv"]["q"], np.float32) \
        * np.asarray(qblk["wqkv"]["s"], np.float32)
    err = np.abs(deq - np.asarray(blk["wqkv"])).max()
    assert err <= np.abs(np.asarray(blk["wqkv"])).max() / 127 + 1e-6

    cos_t, sin_t = rope_1d_table(cfg.rope)
    S = 7
    cos = jnp.asarray(cos_t[:S])
    sin = jnp.asarray(sin_t[:S])
    feats = jax.random.normal(jax.random.PRNGKey(1),
                              (1, S, cfg.hidden_size), jnp.float32) * 0.3
    cache_f = gpt.KVCache.create(cfg, 1, S, jnp.float32)
    cache_q = gpt.KVCache.create(cfg, 1, S, jnp.float32)
    lf, cache_f = gpt.prefill(params, feats[:, :-1], cache_f, cfg,
                              cos[:-1], sin[:-1], compute_dtype=jnp.float32)
    lq, cache_q = gpt.prefill(qparams, feats[:, :-1], cache_q, cfg,
                              cos[:-1], sin[:-1], compute_dtype=jnp.float32)
    lf2, _ = gpt.decode_step(params, feats[:, -1:], cache_f, S - 1, cfg,
                             cos[-1:], sin[-1:], compute_dtype=jnp.float32)
    lq2, _ = gpt.decode_step(qparams, feats[:, -1:], cache_q, S - 1, cfg,
                             cos[-1:], sin[-1:], compute_dtype=jnp.float32)
    # small model, ~1% quant noise per matmul: logits stay close
    np.testing.assert_allclose(np.asarray(lq2), np.asarray(lf2),
                               rtol=0.15, atol=0.05)
    assert np.corrcoef(np.asarray(lq2).ravel(),
                       np.asarray(lf2).ravel())[0, 1] > 0.99

def test_int4_quantized_decode_close_to_full():
    """Weight-only int4 decode (gpt.quantize_int4): group-wise absmax
    scales (g=128 input rows, GPTQ/AWQ layout) keep single-step logits
    close to full precision; the grouped _dot contraction is exact vs an
    explicit dequantize-then-matmul oracle."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from landiff_tpu.config import tiny_test_config
    from landiff_tpu.models import gpt
    from landiff_tpu.ops.rope import rope_1d_table

    cfg = tiny_test_config().llm
    params = gpt.init(jax.random.PRNGKey(0), cfg)
    qparams = gpt.quantize_int4(params, group=8)
    qblk = qparams["blocks"][0]["wqkv"]
    # nibble-packed int8 storage (int4 can't cross the axon jit boundary)
    assert qblk["q4"].dtype == jnp.int8
    G, O = qblk["s"].shape
    I = qblk["q4"].shape[0]
    assert qblk["q4"].shape == (I, O // 2)
    assert I % G == 0 and I // G == 8

    # unpack nibbles on host: byte j -> [col 2j (low), col 2j+1 (high)],
    # arithmetic shifts recover the signed int4 values
    p = np.asarray(qblk["q4"], np.int8)
    qint = np.empty((I, O), np.float32)
    qint[:, 0::2] = (p.astype(np.int8) << 4 >> 4).astype(np.float32)
    qint[:, 1::2] = (p >> 4).astype(np.float32)

    # grouped _dot == dequantize-then-matmul, exactly (f32 path)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 3, I), jnp.float32)
    deq = (qint.reshape(G, I // G, O)
           * np.asarray(qblk["s"], np.float32)[:, None, :]).reshape(I, O)
    got = np.asarray(gpt._dot(x, qblk))
    want = np.asarray(x) @ deq
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    # quantization error bounded by half an int4 step per group, plus
    # the bf16 scale rounding (|q| <= 7 amplifies it to 7*s*2^-8)
    blk = params["blocks"][0]
    err = np.abs(deq - np.asarray(blk["wqkv"])).reshape(G, I // G, O)
    step = np.asarray(qblk["s"], np.float32)[:, None, :]
    assert (err <= (0.5 + 7 / 256) * step + 1e-6).all()

    cos_t, sin_t = rope_1d_table(cfg.rope)
    S = 7
    cos, sin = jnp.asarray(cos_t[:S]), jnp.asarray(sin_t[:S])
    feats = jax.random.normal(jax.random.PRNGKey(1),
                              (1, S, cfg.hidden_size), jnp.float32) * 0.3
    cache_f = gpt.KVCache.create(cfg, 1, S, jnp.float32)
    cache_q = gpt.KVCache.create(cfg, 1, S, jnp.float32)
    _, cache_f = gpt.prefill(params, feats[:, :-1], cache_f, cfg,
                             cos[:-1], sin[:-1], compute_dtype=jnp.float32)
    _, cache_q = gpt.prefill(qparams, feats[:, :-1], cache_q, cfg,
                             cos[:-1], sin[:-1], compute_dtype=jnp.float32)
    lf2, _ = gpt.decode_step(params, feats[:, -1:], cache_f, S - 1, cfg,
                             cos[-1:], sin[-1:], compute_dtype=jnp.float32)
    lq2, _ = gpt.decode_step(qparams, feats[:, -1:], cache_q, S - 1, cfg,
                             cos[-1:], sin[-1:], compute_dtype=jnp.float32)
    # 4-bit on the tiny random-weight model: ~7% relative error per
    # linear (uniform quant noise rms s/sqrt(12) vs weight rms ~4s), so
    # only a loose sanity bar here — production-scale drift is measured
    # on hardware before any adoption decision (PARITY.md)
    assert np.corrcoef(np.asarray(lq2).ravel(),
                       np.asarray(lf2).ravel())[0, 1] > 0.9
