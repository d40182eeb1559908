"""Tokenizer stack: VQ quantizer math vs a torch transcription, TiTok
encode/decode shapes + round-trip, Theia ViT vs HF ViTModel, bicubic
pos-embed interpolation vs torch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from landiff_tpu.config import (TheiaConfig, TiTokConfig, TokenizerConfig,
                                VQConfig, Rope3DConfig, tiny_test_config)
from landiff_tpu.models import theia as theia_lib
from landiff_tpu.models import titok as titok_lib
from landiff_tpu.models import vq as vq_lib

TCFG = tiny_test_config().tokenizer


def test_quantizer_roundtrip_and_argmin():
    key = jax.random.PRNGKey(0)
    params = vq_lib.init(key, TCFG, with_theia=False)
    qp = params["quant"]
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 8, TCFG.vq.dim))
    quantized, idx = vq_lib.quantize(qp, z)
    assert idx.shape == (2, 8)
    assert quantized.shape == z.shape
    # torch transcription of VectorQuantize inference
    zt = torch.from_numpy(np.asarray(z))
    inw = torch.from_numpy(np.asarray(qp["in_w"]))
    inb = torch.from_numpy(np.asarray(qp["in_b"]))
    cb = torch.from_numpy(np.asarray(qp["codebook"]))
    zin = zt @ inw + inb
    d = torch.cdist(zin.reshape(-1, zin.shape[-1]), cb) ** 2
    want_idx = d.argmin(-1).reshape(2, 8)
    np.testing.assert_array_equal(np.asarray(idx), want_idx.numpy())
    want_q = cb[want_idx] @ torch.from_numpy(np.asarray(qp["out_w"])) + \
        torch.from_numpy(np.asarray(qp["out_b"]))
    np.testing.assert_allclose(np.asarray(quantized), want_q.numpy(),
                               rtol=1e-4, atol=1e-4)
    # codes_to_output consistency
    np.testing.assert_allclose(
        np.asarray(vq_lib.codes_to_output(qp, idx)), np.asarray(quantized),
        rtol=1e-6, atol=1e-6)


def test_titok_encode_decode_shapes():
    key = jax.random.PRNGKey(0)
    t = TCFG.titok
    enc = titok_lib.init_encoder(key, t, TCFG.feature_dim)
    dec = titok_lib.init_decoder(jax.random.PRNGKey(1), t, TCFG.feature_dim)
    B, T = 2, t.temporal_size
    feats = jax.random.normal(jax.random.PRNGKey(2),
                              (B, T, t.grid_h, t.grid_w, TCFG.feature_dim))
    lat = titok_lib.encode(enc, feats, t, compute_dtype=jnp.float32)
    assert lat.shape == (B, t.latent_tokens, t.token_size)
    rec = titok_lib.decode(dec, lat, t, compute_dtype=jnp.float32)
    assert rec.shape == (B, T, t.grid_h, t.grid_w, TCFG.feature_dim)
    assert not np.isnan(np.asarray(rec)).any()


def test_videovq_roundtrip_determinism():
    """encode->decode->re-encode gives identical indices (the natural
    self-consistency check without pretrained weights)."""
    key = jax.random.PRNGKey(0)
    params = vq_lib.init(key, TCFG, with_theia=False)
    t = TCFG.titok
    feats = jax.random.normal(jax.random.PRNGKey(3),
                              (1, t.temporal_size, t.grid_h, t.grid_w,
                               TCFG.feature_dim))
    q1, idx1 = vq_lib.encode_features_to_index(params, feats, TCFG,
                                               compute_dtype=jnp.float32)
    q2, idx2 = vq_lib.encode_features_to_index(params, feats, TCFG,
                                               compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(idx1), np.asarray(idx2))
    rec = vq_lib.index_to_feature(params, idx1, TCFG,
                                  compute_dtype=jnp.float32)
    assert rec.shape == feats.shape


def test_bicubic_pos_interp_matches_torch():
    rng = np.random.default_rng(0)
    pos = rng.standard_normal((1 + 16, 8)).astype(np.float32)  # 4x4 grid
    got = theia_lib.interpolate_pos_embed(pos, 6, 9)
    grid = torch.from_numpy(pos[1:].reshape(1, 4, 4, 8).transpose(0, 3, 1, 2))
    want = torch.nn.functional.interpolate(
        grid, size=(6, 9), mode="bicubic", align_corners=False)
    want = want.permute(0, 2, 3, 1).reshape(54, 8).numpy()
    np.testing.assert_allclose(got[1:], want, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(got[0], pos[0])


def test_theia_matches_hf_vit():
    from transformers import ViTConfig, ViTModel

    cfg = TheiaConfig(image_size=32, patch_size=8, hidden_size=24,
                      num_layers=2, num_heads=2, mlp_ratio=2.0,
                      output_grid=(4, 4))
    hf_cfg = ViTConfig(hidden_size=24, num_hidden_layers=2,
                       num_attention_heads=2, intermediate_size=48,
                       image_size=32, patch_size=8, layer_norm_eps=1e-6,
                       hidden_dropout_prob=0.0,
                       attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    hf = ViTModel(hf_cfg, add_pooling_layer=False).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    params = {
        "patch_w": jnp.asarray(
            sd["embeddings.patch_embeddings.projection.weight"].transpose(2, 3, 1, 0)),
        "patch_b": jnp.asarray(sd["embeddings.patch_embeddings.projection.bias"]),
        "cls": jnp.asarray(sd["embeddings.cls_token"][0, 0]),
        "pos": jnp.asarray(sd["embeddings.position_embeddings"][0]),
        "blocks": [],
        "ln_f_w": jnp.asarray(sd["layernorm.weight"]),
        "ln_f_b": jnp.asarray(sd["layernorm.bias"]),
    }
    for i in range(2):
        pre = f"encoder.layer.{i}."
        params["blocks"].append({
            "ln0_w": jnp.asarray(sd[pre + "layernorm_before.weight"]),
            "ln0_b": jnp.asarray(sd[pre + "layernorm_before.bias"]),
            "q_w": jnp.asarray(sd[pre + "attention.attention.query.weight"].T),
            "q_b": jnp.asarray(sd[pre + "attention.attention.query.bias"]),
            "k_w": jnp.asarray(sd[pre + "attention.attention.key.weight"].T),
            "k_b": jnp.asarray(sd[pre + "attention.attention.key.bias"]),
            "v_w": jnp.asarray(sd[pre + "attention.attention.value.weight"].T),
            "v_b": jnp.asarray(sd[pre + "attention.attention.value.bias"]),
            "o_w": jnp.asarray(sd[pre + "attention.output.dense.weight"].T),
            "o_b": jnp.asarray(sd[pre + "attention.output.dense.bias"]),
            "ln1_w": jnp.asarray(sd[pre + "layernorm_after.weight"]),
            "ln1_b": jnp.asarray(sd[pre + "layernorm_after.bias"]),
            "fc0_w": jnp.asarray(sd[pre + "intermediate.dense.weight"].T),
            "fc0_b": jnp.asarray(sd[pre + "intermediate.dense.bias"]),
            "fc1_w": jnp.asarray(sd[pre + "output.dense.weight"].T),
            "fc1_b": jnp.asarray(sd[pre + "output.dense.bias"]),
        })

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(1, 32, 32, 3)).astype(np.uint8)
    got = np.asarray(theia_lib.forward_features(
        params, jnp.asarray(img), cfg, compute_dtype=jnp.float32))

    xt = torch.from_numpy(((img.astype(np.float32) - 127.5) / 127.5)
                          .transpose(0, 3, 1, 2))
    with torch.no_grad():
        want = hf(pixel_values=xt).last_hidden_state.numpy()
    np.testing.assert_allclose(got.reshape(1, 16, 24), want[:, 1:],
                               rtol=2e-4, atol=2e-4)


def test_theia_interpolated_resolution_runs():
    cfg = TheiaConfig(image_size=32, patch_size=8, hidden_size=24,
                      num_layers=1, num_heads=2, mlp_ratio=2.0,
                      output_grid=(5, 7))
    params = theia_lib.init(jax.random.PRNGKey(0), cfg)
    img = jnp.zeros((1, 2, 48, 64, 3), jnp.uint8)  # (B, T, H, W, C)
    feats = theia_lib.extract(params, img, cfg, compute_dtype=jnp.float32)
    assert feats.shape == (1, 2, 5, 7, 24)


def test_theia_register_tokens():
    """DeiTReg variant (theia_model.py:121-327, 545-634): N register tokens
    appended after the patches with their own pos embed, stripped from the
    output together with CLS — output shape is unchanged, but the extra
    attended tokens change the features."""
    base = TheiaConfig(image_size=32, patch_size=8, hidden_size=24,
                       num_layers=2, num_heads=2, mlp_ratio=2.0)
    reg = TheiaConfig(image_size=32, patch_size=8, hidden_size=24,
                      num_layers=2, num_heads=2, mlp_ratio=2.0,
                      num_register_tokens=7)
    p_reg = theia_lib.init(jax.random.PRNGKey(0), reg)
    assert p_reg["reg_token"].shape == (7, 24)
    assert p_reg["reg_pos"].shape == (7, 24)
    img = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (2, 32, 32, 3)), jnp.uint8)
    out_reg = theia_lib.forward_features(p_reg, img, reg,
                                         compute_dtype=jnp.float32)
    assert out_reg.shape == (2, 4, 4, 24)

    # same weights without the register tokens -> different features
    p_base = {k: v for k, v in p_reg.items()
              if k not in ("reg_token", "reg_pos")}
    out_base = theia_lib.forward_features(p_base, img, base,
                                          compute_dtype=jnp.float32)
    assert out_base.shape == out_reg.shape
    assert not np.allclose(np.asarray(out_base), np.asarray(out_reg))

    # interpolated (non-square) resolution also carries the reg pos embed
    img2 = jnp.zeros((1, 48, 64, 3), jnp.uint8)
    out2 = theia_lib.forward_features(p_reg, img2, reg,
                                      compute_dtype=jnp.float32)
    assert out2.shape == (1, 6, 8, 24)


def test_theia_no_cls_variant():
    """DeiTNoCLS (theia_model.py:79-120, 454-543): no CLS token; pos table
    CLS row unused; output is the full patch grid with nothing stripped."""
    cfg = TheiaConfig(image_size=32, patch_size=8, hidden_size=24,
                      num_layers=2, num_heads=2, mlp_ratio=2.0, no_cls=True)
    base = TheiaConfig(image_size=32, patch_size=8, hidden_size=24,
                       num_layers=2, num_heads=2, mlp_ratio=2.0)
    p = theia_lib.init(jax.random.PRNGKey(0), cfg)
    img = jnp.asarray(
        np.random.default_rng(1).integers(0, 255, (2, 32, 32, 3)), jnp.uint8)
    out = theia_lib.forward_features(p, img, cfg, compute_dtype=jnp.float32)
    assert out.shape == (2, 4, 4, 24)
    out_cls = theia_lib.forward_features(p, img, base,
                                         compute_dtype=jnp.float32)
    assert not np.allclose(np.asarray(out), np.asarray(out_cls))
    # interpolated resolution path
    out2 = theia_lib.forward_features(p, jnp.zeros((1, 48, 64, 3), jnp.uint8),
                                      cfg, compute_dtype=jnp.float32)
    assert out2.shape == (1, 6, 8, 24)
