"""End-to-end checkpoint loading from a synthetic on-disk LanDiff ckpt tree
(all four reference formats; layout per ckpts/CHECKSUM.md5). Verifies file
parsing, DeepSpeed/Lightning envelope unwrapping, ControlDiffWarp base-then-
override ordering, and that the loaded pytrees match init() structure —
the path real weights will take in later rounds."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from landiff_tpu.ckpt import load as ckpt_load
from landiff_tpu.config import tiny_test_config
from tests.test_convert import (assert_tree_match, synth_dit_sd,
                                synth_llm_sd, synth_titok_sd, synth_vae_sd)

CFG = tiny_test_config()


def _save_safetensors(path, sd):
    from safetensors.numpy import save_file

    path.parent.mkdir(parents=True, exist_ok=True)
    save_file(sd, str(path))


def _save_deepspeed(path, sd):
    path.parent.mkdir(parents=True, exist_ok=True)
    torch.save({"module": {k: torch.from_numpy(v) for k, v in sd.items()}},
               str(path))


def _save_lightning(path, sd):
    path.parent.mkdir(parents=True, exist_ok=True)
    torch.save({"state_dict": {k: torch.from_numpy(v)
                               for k, v in sd.items()}}, str(path))


@pytest.fixture(scope="module")
def ckpt_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("LanDiff")
    # stage-1 LLM (safetensors)
    llm_sd, t5d = synth_llm_sd(CFG)
    _save_safetensors(root / "llm" / "model.safetensors", llm_sd)
    # tokenizer (safetensors)
    _save_safetensors(root / "tokenizer" / "model.safetensors",
                      synth_titok_sd(CFG.tokenizer))
    # base CogVideoX DiT (DeepSpeed, keys under model.)
    base_raw = synth_dit_sd(CFG.dit, CFG.dit.num_layers, control=False)
    base = {f"model.{k}": v for k, v in base_raw.items()}
    _save_deepspeed(root / "CogVideoX-2b-sat" / "transformer" / "1000"
                    / "mp_rank_00_model_states.pt", base)
    # LanDiff diffusion ckpt: trained control (+zero_linears, semantic
    # conditioner) under model.diffusion_model.control_model.
    ctrl_sd = synth_dit_sd(CFG.dit, CFG.dit.control_layers, control=True)
    landiff = {f"model.diffusion_model.control_model.{k}": v
               for k, v in ctrl_sd.items()}
    # semantic conditioner under the control model
    from tests.test_convert import _rand

    sc = CFG.semantic_cond
    tok = CFG.tokenizer
    sem_sd = {}
    for k, v in synth_titok_sd(tok).items():
        sem_sd["semantic_model.model." + k] = v
    ch = sc.upsample_ch
    block_in = int(ch * sc.ch_mult[-1])
    block_l0 = int(ch * sc.ch_mult[0])

    def resblock(prefix, ci, co):
        sem_sd[prefix + "norm1.weight"] = _rand(ci)
        sem_sd[prefix + "norm1.bias"] = _rand(ci)
        sem_sd[prefix + "conv1.weight"] = _rand(co, ci, 3, 3)
        sem_sd[prefix + "conv1.bias"] = _rand(co)
        sem_sd[prefix + "norm2.weight"] = _rand(co)
        sem_sd[prefix + "norm2.bias"] = _rand(co)
        sem_sd[prefix + "conv2.weight"] = _rand(co, co, 3, 3)
        sem_sd[prefix + "conv2.bias"] = _rand(co)
        if ci != co:
            sem_sd[prefix + "nin_shortcut.weight"] = _rand(co, ci, 1, 1)
            sem_sd[prefix + "nin_shortcut.bias"] = _rand(co)

    up = "upsample_model."
    sem_sd[up + "conv_in.weight"] = _rand(block_in, sc.z_channels, 3, 3)
    sem_sd[up + "conv_in.bias"] = _rand(block_in)
    resblock(up + "mid.block_1.", block_in, block_in)
    resblock(up + "mid.block_2.", block_in, block_in)
    for i in range(sc.num_res_blocks + 1):
        resblock(up + f"up.1.block.{i}.", block_in, block_in)
    sem_sd[up + "up.1.upsample.conv.weight"] = _rand(block_in, block_in // 4,
                                                     3, 3)
    sem_sd[up + "up.1.upsample.conv.bias"] = _rand(block_in)
    c = block_in
    for i in range(sc.num_res_blocks + 1):
        resblock(up + f"up.0.block.{i}.", c, block_l0)
        c = block_l0
    sem_sd[up + "norm_out.weight"] = _rand(block_l0)
    sem_sd[up + "norm_out.bias"] = _rand(block_l0)
    sem_sd[up + "conv_out.weight"] = _rand(sc.up_out_channels, block_l0, 3, 3)
    sem_sd[up + "conv_out.bias"] = _rand(sc.up_out_channels)
    sem_sd["conv_out.weight"] = _rand(sc.out_channels, sc.up_out_channels,
                                      3, 3)
    sem_sd["conv_out.bias"] = _rand(sc.out_channels)
    for k, v in sem_sd.items():
        landiff[f"model.diffusion_model.control_model."
                f"semantic_conditioner.{k}"] = v
    _save_deepspeed(root / "diffusion" / "1" / "mp_rank_00_model_states.pt",
                    landiff)
    # VAE (Lightning)
    _save_lightning(root / "CogVideoX-2b-sat" / "vae" / "3d-vae.pt",
                    synth_vae_sd(CFG.vae))
    # stage-2 T5 (single-file HF safetensors)
    from transformers import T5Config as HFT5Config, T5EncoderModel

    hf_cfg = HFT5Config(
        vocab_size=CFG.t5.vocab_size, d_model=CFG.t5.d_model,
        d_kv=CFG.t5.d_kv, d_ff=CFG.t5.d_ff, num_layers=CFG.t5.num_layers,
        num_heads=CFG.t5.num_heads, feed_forward_proj="gated-gelu",
        dropout_rate=0.0)
    torch.manual_seed(0)
    hf = T5EncoderModel(hf_cfg)
    t5_sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    _save_safetensors(
        root / "CogVideoX-2b-sat" / "t5-v1_1-xxl" / "model.safetensors",
        t5_sd)
    return root, base_raw, ctrl_sd


def test_load_stage1(ckpt_tree):
    root, _, _ = ckpt_tree
    params = ckpt_load.load_stage1(root, CFG)
    want_lm = __import__("landiff_tpu.models.lm", fromlist=["lm"]).init(
        jax.random.PRNGKey(0), CFG.llm, t5_dim=CFG.t5.d_model)
    # t5_dim of the synthetic llm ckpt is 24 (synth_llm_sd), so compare only
    # the gpt/micro/null parts structurally
    assert_tree_match(params["lm"]["gpt"], want_lm["gpt"])
    assert set(params["lm"]["micro"]) == {"frames", "motion_score"}
    assert params["t5"]["embed"].shape == (CFG.t5.vocab_size, CFG.t5.d_model)


def test_load_stage1_hub_fallback(tmp_path, monkeypatch):
    """Without a local T5 dir the loader mirrors the reference's HF-hub
    fallback to google/flan-t5-xxl (text_encoder.py:137-146); offline the
    failure must surface as an informative FileNotFoundError, not a
    silent skip."""
    llm_sd, _ = synth_llm_sd(CFG)
    _save_safetensors(tmp_path / "llm" / "model.safetensors", llm_sd)
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    with pytest.raises(FileNotFoundError, match="flan-t5-xxl"):
        ckpt_load.load_stage1(tmp_path, CFG)


def test_require_real_tokenizer_raises():
    """With converted real weights a missing T5 tokenizer must be a hard
    error (a byte-hash fallback would silently poison stage-1 codes)."""
    from landiff_tpu.pipeline.text import T5Text

    with pytest.raises(RuntimeError, match="real"):
        T5Text("/nonexistent/t5-dir", require_real=True)
    with pytest.raises(RuntimeError, match="real"):
        T5Text(None, require_real=True)
    # without the flag the fallback still works for smoke runs
    ids, mask = T5Text("/nonexistent/t5-dir")(["hello"])
    assert ids.shape == mask.shape and mask.any()


def test_load_tokenizer(ckpt_tree):
    from landiff_tpu.models import vq as vq_lib

    root, _, _ = ckpt_tree
    params = ckpt_load.load_tokenizer(root, CFG, with_theia=False)
    want = vq_lib.init(jax.random.PRNGKey(0), CFG.tokenizer,
                       with_theia=False)
    assert_tree_match(params, want)


def test_load_stage2_override_order(ckpt_tree):
    from landiff_tpu.models import dit as dit_lib

    root, base_raw, ctrl_sd = ckpt_tree
    params = ckpt_load.load_stage2(root, CFG)
    want_main = dit_lib.init(jax.random.PRNGKey(0), CFG.dit)
    assert_tree_match(params["main"], want_main)
    want_ctrl = dit_lib.init(jax.random.PRNGKey(0), CFG.dit, control=True)
    want_ctrl = {k: v for k, v in want_ctrl.items() if k != "final"}
    assert_tree_match(params["control"], want_ctrl)
    # ControlDiffWarp order: base into both, LanDiff control OVERRIDES
    key = "transformer.layers.0.attention.query_key_value.weight"
    got_ctrl_qkv = np.asarray(params["control"]["layers"][0]["qkv_w"])
    np.testing.assert_allclose(got_ctrl_qkv, ctrl_sd[key].T, rtol=1e-6)
    got_main_qkv = np.asarray(params["main"]["layers"][0]["qkv_w"])
    np.testing.assert_allclose(got_main_qkv, base_raw[key].T, rtol=1e-6)
    # and the forward runs with loaded params
    x = jnp.zeros((1, CFG.dit.latent_frames, CFG.dit.in_channels,
                   CFG.dit.latent_height, CFG.dit.latent_width))
    ctx = jnp.zeros((1, CFG.dit.text_length, CFG.dit.text_dim))
    sem = jnp.zeros_like(x)
    out = dit_lib.control_warp_forward(
        params["main"], params["control"], x, jnp.asarray([99.0]), ctx,
        CFG.dit, sem, compute_dtype=jnp.float32)
    assert np.isfinite(np.asarray(out)).all()