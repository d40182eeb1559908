"""Checkpoint converter: synthetic reference-style state dicts -> our
pytrees; verify tree structure + shapes match init() exactly, and numerics
survive the transposes (linear round-trip spot checks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from landiff_tpu.ckpt import convert
from landiff_tpu.config import tiny_test_config
from landiff_tpu.models import dit as dit_lib
from landiff_tpu.models import gpt as gpt_lib
from landiff_tpu.models import lm as lm_lib
from landiff_tpu.models import semantic_cond as sc_lib
from landiff_tpu.models import vae as vae_lib
from landiff_tpu.models import vq as vq_lib

CFG = tiny_test_config()
RNG = np.random.default_rng(0)


def _rand(*shape):
    return RNG.standard_normal(shape).astype(np.float32)


def assert_tree_match(got, want, path=""):
    """Same structure, same shapes."""
    if isinstance(want, dict):
        assert isinstance(got, dict), path
        assert set(got) == set(want), (path, set(got) ^ set(want))
        for k in want:
            assert_tree_match(got[k], want[k], f"{path}/{k}")
    elif isinstance(want, (list, tuple)):
        assert len(got) == len(want), path
        for i, (g, w) in enumerate(zip(got, want)):
            assert_tree_match(g, w, f"{path}/{i}")
    else:
        assert np.asarray(got).shape == np.asarray(want).shape, \
            (path, np.asarray(got).shape, np.asarray(want).shape)


def synth_llm_sd(cfg):
    D, M, V = cfg.llm.hidden_size, cfg.llm.mlp_hidden, cfg.llm.vocab_size
    sd = {}
    for i in range(cfg.llm.num_layers):
        p = f"transformer.blocks.{i}."
        sd[p + "wqkv.weight"] = _rand(3 * D, D)
        sd[p + "wo.weight"] = _rand(D, D)
        sd[p + "norm0.weight"] = _rand(D)
        sd[p + "norm1.weight"] = _rand(D)
        sd[p + "mlp.w1.weight"] = _rand(M, D)
        sd[p + "mlp.w2.weight"] = _rand(D, M)
        sd[p + "mlp.w3.weight"] = _rand(M, D)
    sd["transformer.layer_norm.weight"] = _rand(D)
    sd["transformer.layer_norm.bias"] = _rand(D)
    sd["transformer.head.weight"] = _rand(V, D)
    sd["visual_embedding_model.tok_emb_code.weight"] = _rand(V, D)
    t5d = 24
    sd["cond_model.embeddings.fc0.weight"] = _rand(D, t5d)
    sd["cond_model.embeddings.fc0.bias"] = _rand(D)
    sd["cond_model.embeddings.fc1.weight"] = _rand(D, D)
    sd["cond_model.embeddings.fc1.bias"] = _rand(D)
    sd["cond_model.null_text_embedding"] = _rand(D)
    for key in ("frames", "motion_score"):
        p = f"micro_condition.mlps.{key}."
        sd[p + "0.weight"] = _rand(512, cfg.llm.micro_cond_embed_dim)
        sd[p + "0.bias"] = _rand(512)
        sd[p + "2.weight"] = _rand(D, 512)
        sd[p + "2.bias"] = _rand(D)
    return sd, t5d


def test_convert_llm_matches_init_tree():
    sd, t5d = synth_llm_sd(CFG)
    got = convert.convert_llm(sd, CFG.llm.num_layers)
    want = lm_lib.init(jax.random.PRNGKey(0), CFG.llm, t5_dim=t5d)
    assert_tree_match(got, want)
    # numerics: head logits identical to torch x @ W.T
    x = _rand(2, CFG.llm.hidden_size)
    np.testing.assert_allclose(
        x @ np.asarray(got["gpt"]["head"]),
        x @ sd["transformer.head.weight"].T, rtol=1e-4, atol=1e-5)


def synth_titok_sd(cfg):
    t = cfg.titok
    W, TS, C = t.width, t.token_size, cfg.feature_dim
    sd = {}
    sd["encoder.patch_embed.weight"] = _rand(W, C, 1, 1)
    sd["encoder.patch_embed.bias"] = _rand(W)
    sd["encoder.IFrame_latent_tokens"] = _rand(t.iframe_latent_tokens, W)
    sd["encoder.PFrame_latent_tokens"] = _rand(t.pframe_latent_tokens, W)
    for side, n in (("encoder", t.num_layers), ("decoder", t.num_layers)):
        sd[f"{side}.ln_pre.weight"] = _rand(W)
        sd[f"{side}.ln_pre.bias"] = _rand(W)
        sd[f"{side}.ln_post.weight"] = _rand(W)
        sd[f"{side}.ln_post.bias"] = _rand(W)
        for i in range(n):
            p = f"{side}.transformer.{i}."
            for nm in ("wq", "wk", "wv", "wo"):
                sd[p + f"attn.{nm}.weight"] = _rand(W, W)
            sd[p + "ln_1.weight"] = _rand(W)
            sd[p + "ln_1.bias"] = _rand(W)
            sd[p + "ln_2.weight"] = _rand(W)
            sd[p + "ln_2.bias"] = _rand(W)
            sd[p + "mlp.c_fc.weight"] = _rand(4 * W, W)
            sd[p + "mlp.c_fc.bias"] = _rand(4 * W)
            sd[p + "mlp.c_proj.weight"] = _rand(W, 4 * W)
            sd[p + "mlp.c_proj.bias"] = _rand(W)
    sd["encoder.proj_out.weight"] = _rand(TS, W)
    sd["encoder.proj_out.bias"] = _rand(TS)
    sd["decoder.decoder_embed.weight"] = _rand(W, TS)
    sd["decoder.decoder_embed.bias"] = _rand(W)
    sd["decoder.mask_token"] = _rand(1, 1, W)
    sd["decoder.ffn.0.weight"] = _rand(2 * W, W)
    sd["decoder.ffn.0.bias"] = _rand(2 * W)
    sd["decoder.ffn.2.weight"] = _rand(C, 2 * W)
    sd["decoder.ffn.2.bias"] = _rand(C)
    q = cfg.vq
    sd["quantizer.project_in.weight"] = _rand(q.codebook_dim, q.dim)
    sd["quantizer.project_in.bias"] = _rand(q.codebook_dim)
    sd["quantizer.project_out.weight"] = _rand(q.dim, q.codebook_dim)
    sd["quantizer.project_out.bias"] = _rand(q.dim)
    sd["quantizer._codebook.embed"] = _rand(1, q.codebook_size, q.codebook_dim)
    sd["mean"] = _rand(C)
    sd["std"] = np.abs(_rand(C)) + 0.5
    return sd


def test_convert_tokenizer_matches_init_tree():
    sd = synth_titok_sd(CFG.tokenizer)
    got = convert.convert_tokenizer(sd)
    want = vq_lib.init(jax.random.PRNGKey(0), CFG.tokenizer, with_theia=False)
    assert_tree_match(got, want)


def synth_dit_sd(cfg, num_layers, control):
    D, TE, P = cfg.hidden_size, cfg.time_embed_dim, cfg.patch_size
    Dk = cfg.head_dim
    sd = {}
    sd["mixins.patch_embed.proj.weight"] = _rand(D, cfg.in_channels, P, P)
    sd["mixins.patch_embed.proj.bias"] = _rand(D)
    sd["mixins.patch_embed.text_proj.weight"] = _rand(D, cfg.text_dim)
    sd["mixins.patch_embed.text_proj.bias"] = _rand(D)
    sd["time_embed.0.weight"] = _rand(TE, D)
    sd["time_embed.0.bias"] = _rand(TE)
    sd["time_embed.2.weight"] = _rand(TE, TE)
    sd["time_embed.2.bias"] = _rand(TE)
    for i in range(num_layers):
        lp = f"transformer.layers.{i}."
        sd[f"mixins.adaln_layer.adaLN_modulations.{i}.1.weight"] = _rand(12 * D, TE)
        sd[f"mixins.adaln_layer.adaLN_modulations.{i}.1.bias"] = _rand(12 * D)
        sd[f"mixins.adaln_layer.query_layernorm_list.{i}.weight"] = _rand(Dk)
        sd[f"mixins.adaln_layer.query_layernorm_list.{i}.bias"] = _rand(Dk)
        sd[f"mixins.adaln_layer.key_layernorm_list.{i}.weight"] = _rand(Dk)
        sd[f"mixins.adaln_layer.key_layernorm_list.{i}.bias"] = _rand(Dk)
        if control:
            sd[f"mixins.adaln_layer.zero_linears.{i}.weight"] = _rand(D, D)
        sd[lp + "input_layernorm.weight"] = _rand(D)
        sd[lp + "input_layernorm.bias"] = _rand(D)
        sd[lp + "attention.query_key_value.weight"] = _rand(3 * D, D)
        sd[lp + "attention.query_key_value.bias"] = _rand(3 * D)
        sd[lp + "attention.dense.weight"] = _rand(D, D)
        sd[lp + "attention.dense.bias"] = _rand(D)
        sd[lp + "post_attention_layernorm.weight"] = _rand(D)
        sd[lp + "post_attention_layernorm.bias"] = _rand(D)
        sd[lp + "mlp.dense_h_to_4h.weight"] = _rand(4 * D, D)
        sd[lp + "mlp.dense_h_to_4h.bias"] = _rand(4 * D)
        sd[lp + "mlp.dense_4h_to_h.weight"] = _rand(D, 4 * D)
        sd[lp + "mlp.dense_4h_to_h.bias"] = _rand(D)
    sd["transformer.final_layernorm.weight"] = _rand(D)
    sd["transformer.final_layernorm.bias"] = _rand(D)
    if not control:
        sd["mixins.final_layer.norm_final.weight"] = _rand(D)
        sd["mixins.final_layer.norm_final.bias"] = _rand(D)
        sd["mixins.final_layer.adaLN_modulation.1.weight"] = _rand(2 * D, TE)
        sd["mixins.final_layer.adaLN_modulation.1.bias"] = _rand(2 * D)
        sd["mixins.final_layer.linear.weight"] = _rand(P * P * cfg.out_channels, D)
        sd["mixins.final_layer.linear.bias"] = _rand(P * P * cfg.out_channels)
    return sd


@pytest.mark.parametrize("control", [False, True])
def test_convert_dit_matches_init_tree(control):
    n = CFG.dit.control_layers if control else CFG.dit.num_layers
    sd = synth_dit_sd(CFG.dit, n, control)
    got = convert.convert_dit(sd, n, control=control)
    want = dit_lib.init(jax.random.PRNGKey(0), CFG.dit, control=control)
    if control:
        want = {k: v for k, v in want.items() if k != "final"}
    assert_tree_match(got, want)


def synth_vae_sd(cfg):
    sd = {}
    ch = cfg.ch
    zc = cfg.z_channels

    def causal(prefix, ci, co, k=3):
        sd[prefix + "conv.weight"] = _rand(co, ci, k, k, k)
        sd[prefix + "conv.bias"] = _rand(co)

    def norm(prefix, c, spatial):
        if spatial:
            sd[prefix + "norm_layer.weight"] = _rand(c)
            sd[prefix + "norm_layer.bias"] = _rand(c)
            sd[prefix + "conv_y.conv.weight"] = _rand(c, zc, 1, 1, 1)
            sd[prefix + "conv_y.conv.bias"] = _rand(c)
            sd[prefix + "conv_b.conv.weight"] = _rand(c, zc, 1, 1, 1)
            sd[prefix + "conv_b.conv.bias"] = _rand(c)
        else:
            sd[prefix + "weight"] = _rand(c)
            sd[prefix + "bias"] = _rand(c)

    def resblock(prefix, ci, co, spatial):
        norm(prefix + "norm1.", ci, spatial)
        causal(prefix + "conv1.", ci, co)
        norm(prefix + "norm2.", co, spatial)
        causal(prefix + "conv2.", co, co)
        if ci != co:
            sd[prefix + "nin_shortcut.weight"] = _rand(co, ci, 1, 1, 1)
            sd[prefix + "nin_shortcut.bias"] = _rand(co)

    in_mult = (1,) + tuple(cfg.ch_mult)
    causal("encoder.conv_in.", cfg.in_channels, ch)
    for i in range(len(cfg.ch_mult)):
        ci, co = ch * in_mult[i], ch * cfg.ch_mult[i]
        for j in range(cfg.num_res_blocks):
            resblock(f"encoder.down.{i}.block.{j}.", ci if j == 0 else co, co,
                     False)
        if i != len(cfg.ch_mult) - 1:
            sd[f"encoder.down.{i}.downsample.conv.weight"] = _rand(co, co, 3, 3)
            sd[f"encoder.down.{i}.downsample.conv.bias"] = _rand(co)
    top = ch * cfg.ch_mult[-1]
    resblock("encoder.mid.block_1.", top, top, False)
    resblock("encoder.mid.block_2.", top, top, False)
    sd["encoder.norm_out.weight"] = _rand(top)
    sd["encoder.norm_out.bias"] = _rand(top)
    causal("encoder.conv_out.", top, 2 * zc)

    causal("decoder.conv_in.", zc, top)
    resblock("decoder.mid.block_1.", top, top, True)
    resblock("decoder.mid.block_2.", top, top, True)
    block_in = top
    for i_level in reversed(range(len(cfg.ch_mult))):
        co = ch * cfg.ch_mult[i_level]
        for j in range(cfg.num_res_blocks + 1):
            resblock(f"decoder.up.{i_level}.block.{j}.",
                     block_in if j == 0 else co, co, True)
        if i_level != 0:
            sd[f"decoder.up.{i_level}.upsample.conv.weight"] = _rand(co, co, 3, 3)
            sd[f"decoder.up.{i_level}.upsample.conv.bias"] = _rand(co)
        block_in = co
    sd["decoder.norm_out.norm_layer.weight"] = _rand(ch * cfg.ch_mult[0])
    sd["decoder.norm_out.norm_layer.bias"] = _rand(ch * cfg.ch_mult[0])
    sd["decoder.norm_out.conv_y.conv.weight"] = _rand(ch * cfg.ch_mult[0], zc, 1, 1, 1)
    sd["decoder.norm_out.conv_y.conv.bias"] = _rand(ch * cfg.ch_mult[0])
    sd["decoder.norm_out.conv_b.conv.weight"] = _rand(ch * cfg.ch_mult[0], zc, 1, 1, 1)
    sd["decoder.norm_out.conv_b.conv.bias"] = _rand(ch * cfg.ch_mult[0])
    causal("decoder.conv_out.", ch * cfg.ch_mult[0], cfg.out_channels)
    return sd


def test_convert_vae_matches_init_tree():
    cfg = CFG.vae
    sd = synth_vae_sd(cfg)
    got = convert.convert_vae(sd, cfg.num_res_blocks, len(cfg.ch_mult))
    want = vae_lib.init(jax.random.PRNGKey(0), cfg)
    assert_tree_match(got, want)


def test_convert_semantic_cond_matches_init_tree():
    sc = CFG.semantic_cond
    tok = CFG.tokenizer
    sd = {}
    for k, v in synth_titok_sd(tok).items():
        sd["semantic_model.model." + k] = v
    ch = sc.upsample_ch
    block_in = int(ch * sc.ch_mult[-1])
    block_l0 = int(ch * sc.ch_mult[0])

    def resblock(prefix, ci, co):
        sd[prefix + "norm1.weight"] = _rand(ci)
        sd[prefix + "norm1.bias"] = _rand(ci)
        sd[prefix + "conv1.weight"] = _rand(co, ci, 3, 3)
        sd[prefix + "conv1.bias"] = _rand(co)
        sd[prefix + "norm2.weight"] = _rand(co)
        sd[prefix + "norm2.bias"] = _rand(co)
        sd[prefix + "conv2.weight"] = _rand(co, co, 3, 3)
        sd[prefix + "conv2.bias"] = _rand(co)
        if ci != co:
            sd[prefix + "nin_shortcut.weight"] = _rand(co, ci, 1, 1)
            sd[prefix + "nin_shortcut.bias"] = _rand(co)

    up = "upsample_model."
    sd[up + "conv_in.weight"] = _rand(block_in, sc.z_channels, 3, 3)
    sd[up + "conv_in.bias"] = _rand(block_in)
    resblock(up + "mid.block_1.", block_in, block_in)
    resblock(up + "mid.block_2.", block_in, block_in)
    for i in range(sc.num_res_blocks + 1):
        resblock(up + f"up.1.block.{i}.", block_in, block_in)
    sd[up + "up.1.upsample.conv.weight"] = _rand(block_in, block_in // 4, 3, 3)
    sd[up + "up.1.upsample.conv.bias"] = _rand(block_in)
    c = block_in
    for i in range(sc.num_res_blocks + 1):
        resblock(up + f"up.0.block.{i}.", c, block_l0)
        c = block_l0
    sd[up + "norm_out.weight"] = _rand(block_l0)
    sd[up + "norm_out.bias"] = _rand(block_l0)
    sd[up + "conv_out.weight"] = _rand(sc.up_out_channels, block_l0, 3, 3)
    sd[up + "conv_out.bias"] = _rand(sc.up_out_channels)
    sd["conv_out.weight"] = _rand(sc.out_channels, sc.up_out_channels, 3, 3)
    sd["conv_out.bias"] = _rand(sc.out_channels)

    got = convert.convert_semantic_cond(sd, sc.num_res_blocks)
    want = sc_lib.init(jax.random.PRNGKey(0), tok, sc)
    assert_tree_match(got, want)


def test_convert_theia_matches_init_tree():
    from landiff_tpu.models import theia as theia_lib
    from landiff_tpu.config import TheiaConfig

    cfg = TheiaConfig(image_size=32, patch_size=8, hidden_size=24,
                      num_layers=2, num_heads=2, mlp_ratio=2.0)
    sd = {}
    D, M, P = 24, 48, 8
    sd["backbone.model.embeddings.cls_token"] = _rand(1, 1, D)
    sd["backbone.model.embeddings.position_embeddings"] = _rand(1, 17, D)
    sd["backbone.model.embeddings.patch_embeddings.projection.weight"] = \
        _rand(D, 3, P, P)
    sd["backbone.model.embeddings.patch_embeddings.projection.bias"] = _rand(D)
    for i in range(2):
        p = f"backbone.model.encoder.layer.{i}."
        for nm in ("query", "key", "value"):
            sd[p + f"attention.attention.{nm}.weight"] = _rand(D, D)
            sd[p + f"attention.attention.{nm}.bias"] = _rand(D)
        sd[p + "attention.output.dense.weight"] = _rand(D, D)
        sd[p + "attention.output.dense.bias"] = _rand(D)
        sd[p + "layernorm_before.weight"] = _rand(D)
        sd[p + "layernorm_before.bias"] = _rand(D)
        sd[p + "layernorm_after.weight"] = _rand(D)
        sd[p + "layernorm_after.bias"] = _rand(D)
        sd[p + "intermediate.dense.weight"] = _rand(M, D)
        sd[p + "intermediate.dense.bias"] = _rand(M)
        sd[p + "output.dense.weight"] = _rand(D, M)
        sd[p + "output.dense.bias"] = _rand(D)
    sd["backbone.model.layernorm.weight"] = _rand(D)
    sd["backbone.model.layernorm.bias"] = _rand(D)
    got = convert.convert_theia(sd, num_layers=2)
    want = theia_lib.init(jax.random.PRNGKey(0), cfg)
    assert_tree_match(got, want)
