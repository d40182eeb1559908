"""Direct-execution parity oracles.

Unlike tests/test_torch_parity_blocks.py (torch *transcriptions* of the
reference math), this module imports the ACTUAL reference modules from
/root/reference (pure-torch subset that needs no sat / vector-quantize /
pytorch_lightning) and asserts our JAX implementations — with weights mapped
through the real ckpt/convert.py converters — against their real forward
passes. A shared misreading of the reference sources cannot pass here.

Oracles covered (reference file -> ours):
  landiff/modules/pos_emb.py (Rope1D/3D, apply_rope, index helpers)
      -> landiff_tpu/ops/rope.py
  landiff/llm/modules/transformer_blocks.py + llm/models/transformer.py
      (GPT.sample prefill + KV decode under KVCacheManager)
      -> landiff_tpu/models/gpt.py (via ckpt.convert.convert_llm)
  landiff/tokenizer/modules/blocks.py (TiTokEncoder/Decoder, TORCH sdpa)
      + flex_attention_mask.py (VideoEncoder/DecoderMask via create_mask)
      -> landiff_tpu/models/titok.py + ops/masks.py (via convert_tokenizer)
  landiff/tokenizer/models/feature_extractor/theia_model.py
      (ViTModelNoCLS / ViTModelReg vendored backbones, translator heads)
      -> landiff_tpu/models/theia.py / theia_translate.py
  landiff/diffusion/semantic_models/modules/vq_gan_blocks.py (Decoder,
      pixelshuffle upsample, no mid attention)
      -> landiff_tpu/models/semantic_cond.py (via convert_semantic_cond)

All comparisons run f32 at tiny shapes (fwd_dtype=f32 disables the
reference's maybe_autocast, so its forward is exact f32 too).
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

# conftest sets LANDIFF_SKIP_INIT=1, which makes the reference package skip
# its checkpoint bootstrap at import (landiff/__init__.py:14-29).
pos_emb = pytest.importorskip("landiff.modules.pos_emb")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from landiff_tpu.config import (LLMConfig, Rope1DConfig, Rope3DConfig,  # noqa: E402
                                tiny_test_config)
from landiff_tpu.ckpt import convert  # noqa: E402
from landiff_tpu.ops import rope as rope_lib  # noqa: E402


def sd_numpy(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


# ---------------------------------------------------------------------------
# RoPE (pos_emb.py:16-419 vs ops/rope.py)


def test_rope1d_table_matches_reference():
    cfg = Rope1DConfig(dim=32, max_len=64)
    cis = pos_emb.precompute_freqs_cis(dim=32, end=64, max_seq_length=64)
    cos, sin = rope_lib.rope_1d_table(cfg)
    np.testing.assert_allclose(cos, cis.real.numpy(), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(sin, cis.imag.numpy(), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("multiple,dim", [(16, 32), (6, 24)])
def test_rope3d_tables_match_reference(multiple, dim):
    ref = pos_emb.Rope3DPosEmb(dim=dim, max_time=4, max_height=3, max_width=5,
                               one_dim_max_time=16, multiple=multiple,
                               device="cpu")
    grid_cis, text_cis = ref.precomputed_freqs_cis
    cfg = Rope3DConfig(dim=dim, max_time=4, max_height=3, max_width=5,
                       one_dim_max_time=16, multiple=multiple)
    gcos, gsin = rope_lib.rope_3d_grid_table(cfg)
    tcos, tsin = rope_lib.rope_3d_text_table(cfg)
    np.testing.assert_allclose(gcos, grid_cis.real.numpy(), rtol=1e-6,
                               atol=1e-6)
    np.testing.assert_allclose(gsin, grid_cis.imag.numpy(), rtol=1e-6,
                               atol=1e-6)
    np.testing.assert_allclose(tcos, text_cis.real.numpy(), rtol=1e-6,
                               atol=1e-6)
    np.testing.assert_allclose(tsin, text_cis.imag.numpy(), rtol=1e-6,
                               atol=1e-6)


def test_rope3d_by_idx_matches_reference():
    """get_freqs_cis_by_idx (pos_emb.py:265-311): mixed grid positions,
    t==h==w text positions beyond max_time, and masked-out rows."""
    ref = pos_emb.Rope3DPosEmb(dim=32, max_time=4, max_height=3, max_width=5,
                               one_dim_max_time=16, multiple=16, device="cpu")
    idx = np.array([[[0, 0, 0], [1, 2, 3], [2, 2, 2], [9, 9, 9]],
                    [[3, 1, 4], [5, 5, 5], [0, 1, 2], [7, 7, 7]]])
    mask = np.array([[True, True, True, True],
                     [True, True, False, True]])
    want = ref.get_freqs_cis_by_idx(torch.from_numpy(idx).long(),
                                    torch.from_numpy(mask))
    cfg = Rope3DConfig(dim=32, max_time=4, max_height=3, max_width=5,
                       one_dim_max_time=16, multiple=16)
    cos, sin = rope_lib.rope_3d_by_index(cfg, idx, mask)
    np.testing.assert_allclose(cos, want.real.numpy(), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(sin, want.imag.numpy(), rtol=1e-6, atol=1e-6)


def test_apply_rope_matches_reference():
    rng = np.random.default_rng(0)
    B, S, H, D = 2, 5, 3, 16
    q = rng.standard_normal((B, S, H, D)).astype(np.float32)
    k = rng.standard_normal((B, S, H, D)).astype(np.float32)
    cis = pos_emb.precompute_freqs_cis(dim=D, end=S)  # (S, D/2)
    cis_b = cis[None].expand(B, S, D // 2)
    want_q, want_k = pos_emb.apply_rope(torch.from_numpy(q),
                                        torch.from_numpy(k), cis_b)
    cos = jnp.asarray(cis.real.numpy())[None]
    sin = jnp.asarray(cis.imag.numpy())[None]
    got_q = rope_lib.apply_rope(jnp.asarray(q), cos, sin)
    got_k = rope_lib.apply_rope(jnp.asarray(k), cos, sin)
    np.testing.assert_allclose(np.asarray(got_q), want_q.numpy(), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_k), want_k.numpy(), rtol=1e-5,
                               atol=1e-5)


def test_rope_index_helpers_match_reference():
    want = pos_emb.Rope3DPosEmb.shape_to_index(2, 3, 4, torch.device("cpu"))
    np.testing.assert_array_equal(rope_lib.shape_to_index(2, 3, 4),
                                  want.numpy())
    base = pos_emb.Rope3DPosEmb.shape_to_index(2, 2, 2, torch.device("cpu"))
    for shift_all in (False, True):
        want_idx, want_shift = pos_emb.Rope3DPosEmb.shift_rope_index(
            base, 3, shift_all=shift_all)
        got_idx, got_shift = rope_lib.shift_rope_index(base.numpy(), 3,
                                                       shift_all=shift_all)
        np.testing.assert_array_equal(got_idx, want_idx.numpy())
        assert got_shift == want_shift
    np.testing.assert_array_equal(
        rope_lib.len_to_rope_index(5),
        pos_emb.Rope3DPosEmb.len_to_rope_index(5, torch.device("cpu")).numpy())


# ---------------------------------------------------------------------------
# GPT prefill + KV decode (transformer.py:91-119,
# transformer_blocks.py:128-187 vs models/gpt.py via convert_llm)


def _build_ref_gpt(cfg: LLMConfig, seed=0):
    from landiff.llm.models.transformer import GPT
    from landiff.llm.modules.transformer_blocks import LlamaTransformerBlock

    torch.manual_seed(seed)
    blocks = [
        LlamaTransformerBlock(cfg.num_heads, cfg.hidden_size, cfg.mlp_hidden,
                              activation=torch.nn.GELU(approximate="tanh"))
        for _ in range(cfg.num_layers)
    ]
    rope = pos_emb.Rope1DPosEmb(dim=cfg.head_dim, max_len=cfg.rope.max_len,
                                device="cpu")
    return GPT(cfg.vocab_size, cfg.hidden_size, blocks, causal=True,
               fwd_dtype=torch.float32, rope=rope).eval()


def _gpt_params_via_converter(gpt, cfg: LLMConfig):
    """Map the real GPT state_dict through convert_llm exactly as the real
    checkpoint path does (fabricating the non-GPT Semantic1DLM keys the
    converter also consumes)."""
    sd = {f"transformer.{k}": v for k, v in sd_numpy(gpt).items()}
    rng = np.random.default_rng(0)
    D = cfg.hidden_size
    sd["visual_embedding_model.tok_emb_code.weight"] = (
        rng.standard_normal((cfg.vocab_size, D)).astype(np.float32))
    sd["cond_model.embeddings.fc0.weight"] = (
        rng.standard_normal((D, 32)).astype(np.float32))
    sd["cond_model.embeddings.fc0.bias"] = np.zeros(D, np.float32)
    sd["cond_model.embeddings.fc1.weight"] = (
        rng.standard_normal((D, D)).astype(np.float32))
    sd["cond_model.embeddings.fc1.bias"] = np.zeros(D, np.float32)
    sd["cond_model.null_text_embedding"] = np.zeros(D, np.float32)
    tree = convert.convert_llm(sd, cfg.num_layers)
    return jax.tree.map(jnp.asarray, tree["gpt"])


def test_gpt_prefill_and_decode_match_reference():
    from landiff.llm.modules.inference import KVCacheManager

    from landiff_tpu.models import gpt as gpt_lib

    cfg = tiny_test_config().llm
    ref = _build_ref_gpt(cfg)
    params = _gpt_params_via_converter(ref, cfg)

    rng = np.random.default_rng(1)
    B, S_pre, n_decode = 2, 7, 4
    S_total = S_pre + n_decode
    feats = rng.standard_normal((B, S_total, cfg.hidden_size)).astype(
        np.float32) * 0.5

    cis = ref.rope.precomputed_freqs_cis  # (max_len, hd/2) complex
    ref_logits = []
    with KVCacheManager(ref):
        with torch.no_grad():
            x = torch.from_numpy(feats[:, :S_pre])
            fc = cis[:S_pre][None].expand(B, S_pre, -1)
            ref_logits.append(ref.sample(x, freqs_cis=fc).numpy())
            for t in range(S_pre, S_total):
                x = torch.from_numpy(feats[:, t:t + 1])
                fc = cis[t:t + 1][None].expand(B, 1, -1)
                ref_logits.append(ref.sample(x, freqs_cis=fc).numpy())

    cos, sin = rope_lib.rope_1d_table(cfg.rope)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)
    cache = gpt_lib.KVCache.create(cfg, B, S_total, dtype=jnp.float32)
    logits, cache = gpt_lib.prefill(params, jnp.asarray(feats[:, :S_pre]),
                                    cache, cfg, cos[:S_pre], sin[:S_pre],
                                    compute_dtype=jnp.float32)
    got_logits = [np.asarray(logits)]
    for t in range(S_pre, S_total):
        logits, cache = gpt_lib.decode_step(
            params, jnp.asarray(feats[:, t:t + 1]), cache, t, cfg,
            cos[t:t + 1], sin[t:t + 1], compute_dtype=jnp.float32)
        got_logits.append(np.asarray(logits))

    for i, (got, want) in enumerate(zip(got_logits, ref_logits)):
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4,
                                   err_msg=f"step {i}")


def test_gpt_full_forward_matches_reference_decode():
    """Our training-path full-sequence forward (gpt.forward, which the
    reference never implemented — transformer_blocks.py:218-219 raises)
    must equal the reference's OWN prefill logits position-by-position:
    teacher-forcing equivalence of causal attention."""
    from landiff.llm.modules.inference import KVCacheManager

    from landiff_tpu.models import gpt as gpt_lib

    cfg = tiny_test_config().llm
    ref = _build_ref_gpt(cfg, seed=3)
    params = _gpt_params_via_converter(ref, cfg)

    rng = np.random.default_rng(2)
    B, S = 2, 6
    feats = rng.standard_normal((B, S, cfg.hidden_size)).astype(
        np.float32) * 0.5
    cis = ref.rope.precomputed_freqs_cis
    want = []
    with KVCacheManager(ref):
        with torch.no_grad():
            x = torch.from_numpy(feats[:, :1])
            want.append(ref.sample(
                x, freqs_cis=cis[:1][None].expand(B, 1, -1)).numpy())
            for t in range(1, S):
                x = torch.from_numpy(feats[:, t:t + 1])
                want.append(ref.sample(
                    x, freqs_cis=cis[t:t + 1][None].expand(B, 1, -1)).numpy())
    want = np.stack(want, axis=1)  # (B, S, V)

    cos, sin = rope_lib.rope_1d_table(cfg.rope)
    got = gpt_lib.forward(params, jnp.asarray(feats), cfg,
                          jnp.asarray(cos[:S]), jnp.asarray(sin[:S]),
                          compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               rtol=3e-4, atol=3e-4)


# ---------------------------------------------------------------------------
# TiTok encoder/decoder (blocks.py:414-976, TORCH sdpa impl) + flex masks
# (flex_attention_mask.py:36-335) vs models/titok.py + ops/masks.py


@pytest.fixture
def fixed_create_mask(monkeypatch):
    """torch 2.13 classifies mask_mod vs score_mod by __code__.co_argcount,
    which counts `self` on bound methods — the reference's VideoEncoderMask
    (written for torch 2.5, where signature inspection skipped `self`) gets
    misread as a score_mod and crashes. Wrap every mod_fn in a plain 4-arg
    lambda so the REAL reference mask logic still runs unmodified."""
    import torch.nn.attention.flex_attention as flex_mod

    real = flex_mod.create_mask

    def fixed(mod_fn, B, H, Q_LEN, KV_LEN, device=None):
        return real(lambda b, h, q, kv: mod_fn(b, h, q, kv),
                    B, H, Q_LEN, KV_LEN, device)

    monkeypatch.setattr(flex_mod, "create_mask", fixed)


def _titok_modules():
    from landiff.tokenizer.modules import blocks as ref_blocks

    t = tiny_test_config().tokenizer.titok
    rope = pos_emb.Rope3DPosEmb(
        dim=t.rope.dim, max_time=t.rope.max_time, max_height=t.rope.max_height,
        max_width=t.rope.max_width, one_dim_max_time=t.rope.one_dim_max_time,
        multiple=16, device="cpu")
    common = dict(
        image_size=(t.grid_h, t.grid_w), image_channels=32, patch_size=1,
        model_size="small", width=t.width, num_layers=t.num_layers,
        num_heads=t.num_heads, num_latent_tokens=t.latent_tokens,
        token_size=t.token_size, qk_norm=False, causal=False, bias=False,
        use_cls_token=False, rope_layer=rope,
        positional_embedding_type=ref_blocks.PositionalEmbedingType.ROPE_3D,
        attention_imp=ref_blocks.AttentionImp.TORCH,
        temporal_size=t.temporal_size, PFrame_tokens=t.pframe_latent_tokens)
    torch.manual_seed(0)
    enc = ref_blocks.TiTokEncoder(
        attention_mask_type=ref_blocks.AttentionMaskType.VIDEO_ENCODER_MASK,
        inside_latent_tokens=True, **common).eval()
    dec = ref_blocks.TiTokDecoder(
        attention_mask_type=ref_blocks.AttentionMaskType.VIDEO_DECODER_MASK,
        output_channels=32, **common).eval()
    return enc, dec, t


def _titok_params(enc, dec, t):
    sd = {f"encoder.{k}": v for k, v in sd_numpy(enc).items()}
    sd.update({f"decoder.{k}": v for k, v in sd_numpy(dec).items()})
    rng = np.random.default_rng(0)
    cd = 4
    sd["quantizer.project_in.weight"] = rng.standard_normal(
        (cd, t.token_size)).astype(np.float32)
    sd["quantizer.project_in.bias"] = np.zeros(cd, np.float32)
    sd["quantizer.project_out.weight"] = rng.standard_normal(
        (t.token_size, cd)).astype(np.float32)
    sd["quantizer.project_out.bias"] = np.zeros(t.token_size, np.float32)
    sd["quantizer._codebook.embed"] = rng.standard_normal(
        (1, 8, cd)).astype(np.float32)
    sd["mean"] = np.zeros(32, np.float32)
    sd["std"] = np.ones(32, np.float32)
    tree = convert.convert_tokenizer(sd)
    return jax.tree.map(jnp.asarray, tree)


@pytest.mark.parametrize("forward_t", [1, 2, 3])
def test_titok_encoder_matches_reference(forward_t, fixed_create_mask):
    from landiff_tpu.models import titok as titok_lib

    enc, dec, t = _titok_modules()
    params = _titok_params(enc, dec, t)
    rng = np.random.default_rng(forward_t)
    B = 2
    feats = rng.standard_normal(
        (B, forward_t, t.grid_h, t.grid_w, 32)).astype(np.float32)
    # reference wants (b, t, c, h, w); forward_T=1 also accepts 4-D
    xt = torch.from_numpy(feats.transpose(0, 1, 4, 2, 3))
    with torch.no_grad():
        want = enc(xt, forward_T=forward_t).numpy()  # (B, TS, 1, L)
    got = titok_lib.encode(params["encoder"], jnp.asarray(feats), t,
                           forward_t=forward_t, compute_dtype=jnp.float32,
                           attn_impl="xla")
    np.testing.assert_allclose(
        np.asarray(got), want[:, :, 0].transpose(0, 2, 1),
        rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("forward_t", [1, 2, 3])
def test_titok_decoder_matches_reference(forward_t, fixed_create_mask):
    from landiff_tpu.models import titok as titok_lib

    enc, dec, t = _titok_modules()
    params = _titok_params(enc, dec, t)
    L = t.iframe_latent_tokens + (forward_t - 1) * t.pframe_latent_tokens
    rng = np.random.default_rng(10 + forward_t)
    B = 2
    lat = rng.standard_normal((B, L, t.token_size)).astype(np.float32)
    zt = torch.from_numpy(lat.transpose(0, 2, 1)[:, :, None, :])  # N C 1 L
    with torch.no_grad():
        want = dec(zt, forward_T=forward_t).numpy()
    if forward_t == 1:  # reference returns (N*T, C, h, w) when T == 1
        want = want[:, None]
    got = titok_lib.decode(params["decoder"], jnp.asarray(lat), t,
                           forward_t=forward_t, compute_dtype=jnp.float32,
                           attn_impl="xla")
    np.testing.assert_allclose(
        np.asarray(got), want.transpose(0, 1, 3, 4, 2),
        rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("forward_t", [1, 2, 3])
def test_flex_masks_match_reference(forward_t, fixed_create_mask):
    """VideoEncoderMask/VideoDecoderMask evaluated through the REAL
    torch create_mask vs our mask-spec algebra (ops/masks.py)."""
    from landiff.tokenizer.modules import flex_attention_mask as fam
    from torch.nn.attention.flex_attention import create_mask

    from landiff_tpu.ops import masks as masks_lib

    t = tiny_test_config().tokenizer.titok
    layout = masks_lib.VideoMaskLayout(
        num_frames=forward_t, tokens_per_frame=t.frame_tokens,
        iframe_tokens=t.iframe_latent_tokens,
        pframe_tokens=t.pframe_latent_tokens)
    for ref_cls, ours in ((fam.VideoEncoderMask,
                           masks_lib.video_encoder_mask(layout)),
                          (fam.VideoDecoderMask,
                           masks_lib.video_decoder_mask(layout))):
        mask_fn = ref_cls(num_frames=forward_t,
                          tokens_per_frame=t.frame_tokens,
                          IFrame_tokens=t.iframe_latent_tokens,
                          PFrame_tokens=t.pframe_latent_tokens)
        S = mask_fn.seq_len
        want = create_mask(mask_fn, B=None, H=None, Q_LEN=S,
                           KV_LEN=S).numpy()[0, 0]
        got = masks_lib.materialize(ours, S, S)
        np.testing.assert_array_equal(got, want, err_msg=ref_cls.__name__)


# ---------------------------------------------------------------------------
# Vendored Theia ViT backbones (theia_model.py:79-356) vs models/theia.py —
# incl. the DINO-style scale_factor(+0.1) position-embedding interpolation
# the NoCLS/Reg variants use (different numerics from HF size-based interp).


def _vit_hf_config():
    from transformers import ViTConfig

    return ViTConfig(hidden_size=24, num_hidden_layers=2,
                     num_attention_heads=2, intermediate_size=48,
                     image_size=32, patch_size=8, layer_norm_eps=1e-6,
                     hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)


def _theia_cfg(**kw):
    from landiff_tpu.config import TheiaConfig

    return TheiaConfig(image_size=32, patch_size=8, hidden_size=24,
                       num_layers=2, num_heads=2, mlp_ratio=2.0, **kw)


@pytest.mark.parametrize("res", [(32, 32), (48, 64)])
def test_vendored_vit_nocls_matches(res):
    from landiff.tokenizer.models.feature_extractor import theia_model

    from landiff_tpu.models import theia as theia_lib

    torch.manual_seed(0)
    ref = theia_model.ViTModelNoCLS(_vit_hf_config(),
                                    add_pooling_layer=False).eval()
    params = jax.tree.map(jnp.asarray,
                          convert.convert_theia(sd_numpy(ref), num_layers=2))
    cfg = _theia_cfg(no_cls=True)
    H, W = res
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (2, H, W, 3)).astype(np.uint8)
    xt = torch.from_numpy(((img.astype(np.float32) - 127.5) / 127.5)
                          .transpose(0, 3, 1, 2))
    # native square resolution without the interpolate flag (the flag at
    # native res would return the full (1+N) pos table — upstream NoCLS
    # only ever runs interpolated at non-native/non-square sizes)
    interp = res != (32, 32)
    with torch.no_grad():
        want = ref(pixel_values=xt,
                   interpolate_pos_encoding=interp).last_hidden_state.numpy()
    got = np.asarray(theia_lib.forward_features(
        params, jnp.asarray(img), cfg, compute_dtype=jnp.float32))
    h, w = H // 8, W // 8
    np.testing.assert_allclose(got.reshape(2, h * w, 24), want,
                               rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("res", [(32, 32), (48, 64)])
def test_vendored_vit_reg_matches(res):
    from landiff.tokenizer.models.feature_extractor import theia_model

    from landiff_tpu.models import theia as theia_lib

    n_reg = 3
    torch.manual_seed(1)
    ref = theia_model.ViTModelReg(_vit_hf_config(), add_pooling_layer=False,
                                  num_reg_tokens=n_reg).eval()
    params = jax.tree.map(jnp.asarray,
                          convert.convert_theia(sd_numpy(ref), num_layers=2))
    cfg = _theia_cfg(num_register_tokens=n_reg)
    H, W = res
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (2, H, W, 3)).astype(np.uint8)
    xt = torch.from_numpy(((img.astype(np.float32) - 127.5) / 127.5)
                          .transpose(0, 3, 1, 2))
    interp = res != (32, 32)
    with torch.no_grad():
        want = ref(pixel_values=xt,
                   interpolate_pos_encoding=interp).last_hidden_state.numpy()
    got = np.asarray(theia_lib.forward_features(
        params, jnp.asarray(img), cfg, compute_dtype=jnp.float32))
    h, w = H // 8, W // 8
    # handle_feature_output strips CLS (front) + registers (tail)
    # (theia_model.py:23-63) — exactly what forward_features returns
    np.testing.assert_allclose(got.reshape(2, h * w, 24),
                               want[:, 1:1 + h * w], rtol=5e-4, atol=5e-4)


# ---------------------------------------------------------------------------
# Theia translator heads (theia_model.py:686-1310) vs theia_translate.py


def _from_torch_head(head_t, mine):
    """Rebuild my head pytree with the torch head's weights, walking my
    stack structure against the adapter Sequential in order."""
    import torch.nn as nn

    def ln_chw(m):
        return {"g": jnp.asarray(m.weight.detach().numpy().transpose(1, 2, 0)),
                "b": jnp.asarray(m.bias.detach().numpy().transpose(1, 2, 0))}

    def conv(m):
        if isinstance(m, nn.ConvTranspose2d):
            w = m.weight.detach().numpy().transpose(2, 3, 0, 1)
        else:
            w = m.weight.detach().numpy().transpose(2, 3, 1, 0)
        return {"w": jnp.asarray(w), "b": jnp.asarray(m.bias.detach().numpy())}

    def lin(m):
        return {"w": jnp.asarray(m.weight.detach().numpy().T),
                "b": jnp.asarray(m.bias.detach().numpy())}

    out = dict(mine)
    if mine["kind"] == "linear":
        out["lin"] = lin(head_t.adapter[0])
        return out
    if mine["kind"] == "mlp":
        lins = [m for m in head_t.adapter if isinstance(m, nn.Linear)]
        out["layers"] = [lin(m) for m in lins]
        return out
    mods = [m for m in head_t.adapter
            if isinstance(m, (nn.LayerNorm, nn.Conv2d, nn.ConvTranspose2d,
                              nn.Linear))]
    it = iter(mods)
    stack = []
    for item in mine["stack"]:
        m = next(it)
        if item[0] == "ln":
            assert isinstance(m, nn.LayerNorm)
            stack.append(("ln", ln_chw(m)))
        else:
            assert isinstance(m, (nn.Conv2d, nn.ConvTranspose2d))
            stack.append((item[0], conv(m), item[2]))
    out["stack"] = stack
    out["out"] = lin(next(it))
    if "pad" in mine:
        pad_conv = conv(head_t.pad[1])
        out["pad"] = pad_conv
    return out


@pytest.mark.parametrize("source,target", [
    ((6, 16, 16), (5, 16, 16)),   # same-size conv stack
    ((6, 16, 16), (5, 64, 64)),   # transposed-conv upsample stack
    ((6, 64, 64), (5, 16, 16)),   # strided downsample stack
    ((6, 14, 14), (5, 7, 7)),     # 14 -> 7
    ((6, 14, 14), (5, 64, 64)),   # pad 14->16 then upsample
])
def test_light_conv_head_matches_reference(source, target):
    from landiff.tokenizer.models.feature_extractor import theia_model

    from landiff_tpu.models import theia_translate as tt

    torch.manual_seed(0)
    ref = theia_model.LightConvAdapterHead(
        source_size=source, target_size=target, hidden_size_factor=1.0).eval()
    mine = tt.light_conv_head_init(jax.random.PRNGKey(0), source, target)
    mine = _from_torch_head(ref, mine)
    rng = np.random.default_rng(0)
    n = source[1] * source[2]
    x = rng.standard_normal((2, 1 + n, source[0])).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(tt.head_forward(mine, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_mlp_and_linear_translators_match_reference():
    from landiff.tokenizer.models.feature_extractor import theia_model

    from landiff_tpu.models import theia_translate as tt

    torch.manual_seed(1)
    backbone = (8, 4, 4)
    # MLP translator: LN+Linear backbone adapter then MLP heads
    ref = theia_model.MLPFeatureTranslator(
        backbone_feature_size=backbone,
        target_feature_sizes={"sam": (6, 8, 8)},
        translator_hidden_size=16, translator_n_layer=3).eval()
    mine = tt.init_translator(jax.random.PRNGKey(0), backbone,
                              {"sam": (6, 8, 8)}, kind="mlp", hidden_size=16,
                              n_layer=3)
    mine["adapter_ln"] = {
        "g": jnp.asarray(ref.backbone_adapter[0].weight.detach().numpy()),
        "b": jnp.asarray(ref.backbone_adapter[0].bias.detach().numpy())}
    mine["adapter_lin"] = {
        "w": jnp.asarray(ref.backbone_adapter[1].weight.detach().numpy().T),
        "b": jnp.asarray(ref.backbone_adapter[1].bias.detach().numpy())}
    mine["heads"]["sam"] = _from_torch_head(ref.translator_heads["sam"],
                                            mine["heads"]["sam"])
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 1 + 16, 8)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x))["sam"].numpy()
    got = np.asarray(tt.translate(mine, jnp.asarray(x))["sam"])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    # LightConv translator with a "_cls" linear head (identity adapter)
    torch.manual_seed(2)
    backbone2 = (6, 16, 16)
    ref2 = theia_model.LightConvFeatureTranslator(
        backbone_feature_size=backbone2,
        target_feature_sizes={"clip_cls": (7, 1, 1)}).eval()
    mine2 = tt.init_translator(jax.random.PRNGKey(1), backbone2,
                               {"clip_cls": (7, 1, 1)}, kind="light_conv")
    mine2["heads"]["clip_cls"] = _from_torch_head(
        ref2.translator_heads["clip_cls"], mine2["heads"]["clip_cls"])
    x2 = rng.standard_normal((2, 1 + 256, 6)).astype(np.float32)
    with torch.no_grad():
        want2 = ref2(torch.from_numpy(x2))["clip_cls"].numpy()
    got2 = np.asarray(tt.translate(mine2, jnp.asarray(x2))["clip_cls"])
    np.testing.assert_allclose(got2, want2, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# VQGAN upsample Decoder (vq_gan_blocks.py:480-606, pixelshuffle, no mid
# attention — the shipped semantic-conditioner config) vs
# models/semantic_cond.upsampler_forward via convert_semantic_cond's
# resblock/key mapping.


def test_vqgan_decoder_matches_reference():
    from landiff.diffusion.semantic_models.modules import vq_gan_blocks

    from landiff_tpu.config import SemanticCondConfig
    from landiff_tpu.models import semantic_cond as sc

    torch.manual_seed(0)
    # GroupNorm is hard-coded to 32 groups (vq_gan_blocks.py:35-39), so the
    # smallest faithful config is ch=128, ch_mult (0.25, 1) -> 32/128 chans
    ref = vq_gan_blocks.Decoder(
        ch=128, out_ch=5, ch_mult=(0.25, 1.0), num_res_blocks=1,
        attn_resolutions=(), in_channels=12, resolution=16, z_channels=12,
        use_mid_attention=False, upsample_type="pixelshuffle").eval()
    cfg = SemanticCondConfig(z_channels=12, upsample_ch=128,
                             ch_mult=(0.25, 1.0), num_res_blocks=1,
                             up_out_channels=5)
    sd = {f"upsample_model.{k}": v for k, v in sd_numpy(ref).items()}
    up = {
        "conv_in_w": convert._conv2d(sd, "upsample_model.conv_in.weight"),
        "conv_in_b": sd["upsample_model.conv_in.bias"],
        "mid1": convert._vq_resblock(sd, "upsample_model.mid.block_1."),
        "mid2": convert._vq_resblock(sd, "upsample_model.mid.block_2."),
        "up1": [convert._vq_resblock(sd, f"upsample_model.up.1.block.{i}.")
                for i in range(cfg.num_res_blocks + 1)],
        "up1_conv_w": convert._conv2d(
            sd, "upsample_model.up.1.upsample.conv.weight"),
        "up1_conv_b": sd["upsample_model.up.1.upsample.conv.bias"],
        "up0": [convert._vq_resblock(sd, f"upsample_model.up.0.block.{i}.")
                for i in range(cfg.num_res_blocks + 1)],
        "norm_out_w": sd["upsample_model.norm_out.weight"],
        "norm_out_b": sd["upsample_model.norm_out.bias"],
        "conv_out_w": convert._conv2d(sd, "upsample_model.conv_out.weight"),
        "conv_out_b": sd["upsample_model.conv_out.bias"],
    }
    up = jax.tree.map(jnp.asarray, up)
    rng = np.random.default_rng(0)
    z = rng.standard_normal((2, 4, 6, 12)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(z.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(sc.upsampler_forward(up, jnp.asarray(z), cfg))
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1),
                               rtol=3e-4, atol=3e-4)


# ---------------------------------------------------------------------------
# Live manifest verification: instantiate the importable reference modules
# at FULL production size on torch's meta device (shape-only, no memory) and
# diff real state_dict() key/shape inventories against ckpt/manifests.py.


def _diff_manifest(sd, manifest, subset_prefixes):
    """Compare the real state_dict against the manifest subset under the
    given prefixes; returns (missing, extra, shape_mismatches)."""
    man = {k: v for k, v in manifest.items()
           if any(k.startswith(p) for p in subset_prefixes)}
    got = {k: tuple(v.shape) for k, v in sd.items()}
    missing = sorted(set(man) - set(got))
    extra = sorted(set(got) - set(man))
    mismatch = sorted((k, got[k], tuple(man[k]))
                      for k in set(man) & set(got)
                      if got[k] != tuple(man[k]))
    return missing, extra, mismatch


def test_manifest_gpt_vs_live_reference():
    from landiff.llm.models.transformer import GPT
    from landiff.llm.modules.transformer_blocks import LlamaTransformerBlock

    from landiff_tpu.ckpt import manifests
    from landiff_tpu.config import LLMConfig

    cfg = LLMConfig()  # full production dims (24L x 2048, mlp 11008)
    with torch.device("meta"):
        blocks = [LlamaTransformerBlock(cfg.num_heads, cfg.hidden_size,
                                        cfg.mlp_hidden)
                  for _ in range(cfg.num_layers)]
        gpt = GPT(cfg.vocab_size, cfg.hidden_size, blocks, causal=True,
                  fwd_dtype=torch.bfloat16,
                  rope=pos_emb.Rope1DPosEmb(dim=cfg.head_dim,
                                            max_len=cfg.rope.max_len,
                                            device="meta"))
    sd = {f"transformer.{k}": v for k, v in gpt.state_dict().items()}
    manifest = manifests.llm_safetensors(cfg)
    missing, extra, mismatch = _diff_manifest(sd, manifest, ("transformer.",))
    assert not missing and not extra and not mismatch, (missing, extra,
                                                        mismatch)


def test_manifest_titok_vs_live_reference():
    from landiff.tokenizer.modules import blocks as ref_blocks

    from landiff_tpu.ckpt import manifests
    from landiff_tpu.config import TokenizerConfig

    tok = TokenizerConfig()  # production: width 768, 12L, 1218 latents
    t = tok.titok
    with torch.device("meta"):
        rope = pos_emb.Rope3DPosEmb(
            dim=t.rope.dim, max_time=t.rope.max_time,
            max_height=t.rope.max_height, max_width=t.rope.max_width,
            one_dim_max_time=t.rope.one_dim_max_time, multiple=16,
            device="meta")
        common = dict(
            image_size=(t.grid_h, t.grid_w), image_channels=tok.feature_dim,
            patch_size=1, model_size="base", width=t.width,
            num_layers=t.num_layers, num_heads=t.num_heads,
            num_latent_tokens=t.latent_tokens, token_size=t.token_size,
            qk_norm=False, causal=False, bias=False, use_cls_token=False,
            rope_layer=rope,
            positional_embedding_type=(
                ref_blocks.PositionalEmbedingType.ROPE_3D),
            attention_imp=ref_blocks.AttentionImp.TORCH,
            temporal_size=t.temporal_size,
            PFrame_tokens=t.pframe_latent_tokens)
        enc = ref_blocks.TiTokEncoder(
            attention_mask_type=(
                ref_blocks.AttentionMaskType.VIDEO_ENCODER_MASK),
            inside_latent_tokens=True, **common)
        dec = ref_blocks.TiTokDecoder(
            attention_mask_type=(
                ref_blocks.AttentionMaskType.VIDEO_DECODER_MASK),
            output_channels=tok.feature_dim, **common)
    sd = {f"encoder.{k}": v for k, v in enc.state_dict().items()}
    sd.update({f"decoder.{k}": v for k, v in dec.state_dict().items()})
    manifest = manifests.tokenizer_safetensors(tok)
    missing, extra, mismatch = _diff_manifest(sd, manifest,
                                              ("encoder.", "decoder."))
    assert not missing and not extra and not mismatch, (missing, extra,
                                                        mismatch)


def test_manifest_vqgan_upsampler_vs_live_reference():
    from landiff.diffusion.semantic_models.modules import vq_gan_blocks

    from landiff_tpu.ckpt import manifests
    from landiff_tpu.config import LanDiffConfig

    cfg = LanDiffConfig()
    sc = cfg.semantic_cond  # production: z 768, ch 512, mult (.25, 1), nrb 4
    with torch.device("meta"):
        dec = vq_gan_blocks.Decoder(
            ch=sc.upsample_ch, out_ch=sc.up_out_channels,
            ch_mult=tuple(sc.ch_mult), num_res_blocks=sc.num_res_blocks,
            attn_resolutions=(), in_channels=cfg.tokenizer.feature_dim,
            resolution=64, z_channels=sc.z_channels, use_mid_attention=False,
            upsample_type="pixelshuffle")
    sd = {f"upsample_model.{k}": v for k, v in dec.state_dict().items()}
    manifest = manifests.semantic_conditioner(sc, cfg.tokenizer)
    missing, extra, mismatch = _diff_manifest(sd, manifest,
                                              ("upsample_model.",))
    assert not missing and not extra and not mismatch, (missing, extra,
                                                        mismatch)
