"""COMPOSED two-stage E2E direct-execution oracle — the reference's full
pipeline GLUE running verbatim against pipeline/{llm_infer,dif_infer}.

Every module already has a per-module direct oracle; this file closes the
last unverified surface: COMPOSITION drift (inter-stage scaling, seed
threading, latent scale_factor, chunk boundaries). The reference glue
executed VERBATIM from /root/reference:

  Semantic1DLM.sample full text path        (lm_model.py:293-516, with
    TextCond.forward -> text_encoder.encode_texts_padded, NOT the
    precomputed-embedding seam the per-module oracle used)
  stage-1 -> stage-2 handoff                 (infer_video.py:61-102:
    codes reshape(-1) -> VideoTask.semantic_token)
  CogWrapper.forward                         (dif_infer.py:152-243:
    InferValueRegistry registration, get_batch :52-77, conditioner
    get_unconditional_conditioning w/ force_uc_zero_embeddings,
    _pre/_post_process_cog_video :22-49, seed->set_seed_for_single_process)
  SATControlVideoDiffusionEngine.sample      (diffusion_video.py:255-315:
    torch.randn draw, denoiser closure, sampler dispatch)
  the REAL DiscreteDenoiser + VPODEDPMPP2MSampler + DynamicCFG stack
    running the REAL ControlDiffWarp (main + control DiT mixins on the
    SAT skeleton) with the REAL SemanticCond->VideoVQ->TiTok-decode->
    VQGAN-upsample semantic path (condition.py:86-137,
    video_titok_vq.py:251-278)
  CogWrapper.decode_latent                   (dif_infer.py:245-271:
    1/scale_factor + serial fake-CP chunked VideoAutoencoderInferenceWrapper
    decode with clear_fake_cp_cache)

Stand-ins (all pinned elsewhere, none carrying math under test): the SAT
transformer skeleton (_sat_stub, pinned by the released ckpt key
inventory), the vector_quantize_pytorch index->code surface (_ref_stubs,
pinned by the ckpt key inventory + public API), and the T5 *tokenizer*
(sentencepiece absent: both sides tokenize with the same byte-hash —
landiff_tpu's own offline fallback — while the T5 ENCODER is a real HF
T5EncoderModel executed verbatim inside the real FrozenT5Embedder.forward
and TextCond.forward).

Sampler choice: VPODE (deterministic) so trajectories are comparable
across frameworks; VPSDE's per-step torch.randn_like cannot be replicated
from a jax PRNG (its step math is oracled at function level in
test_reference_oracles_sgm). The initial torch.randn noise is captured
from the reference run and injected into our pipeline via the
sample_latents(init_noise=...) generator seam (diffusion_video.py:262-283).

Done-criteria (VERDICT r4 #1): codes IDENTICAL, pre-decode latents close,
final uint8 video within one quantization step.
"""

import argparse
import dataclasses
import sys
import tempfile
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)
import os

sys.path.insert(0, os.path.dirname(__file__))

import _e2e_helpers  # noqa: E402
import _ref_stubs  # noqa: E402
import _sat_stub  # noqa: E402

_ref_stubs.install()
_sat_stub.install()
_e2e_helpers.install()

dif_infer_ref = pytest.importorskip("landiff.diffusion.dif_infer")
diffusion_video = pytest.importorskip("landiff.diffusion.diffusion_video")
lm_model = pytest.importorskip("landiff.llm.models.lm_model")
from landiff.utils import set_seed_for_single_process  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from landiff_tpu.ckpt import convert  # noqa: E402
from landiff_tpu.config import (ARSampleConfig, SemanticCondConfig,  # noqa: E402
                                VAEConfig, tiny_test_config)
from landiff_tpu.models import t5 as t5_lib  # noqa: E402
from landiff_tpu.pipeline import dif_infer as our_dif  # noqa: E402
from landiff_tpu.pipeline import llm_infer as our_llm  # noqa: E402

from test_reference_oracle_lm_sample import \
    _StandinFrozenTokenizer  # noqa: E402

PROMPT = "a red fox jumping over snow"
SEED = 123
NF = 3          # semantic/latent frames (tiny segment = one I + 2 P)

_base = tiny_test_config()
CFG = dataclasses.replace(
    _base,
    # vocab must cover the byte-hash fallback tokenizer's id range
    t5=dataclasses.replace(_base.t5, vocab_size=32128),
    # deterministic sampler on both sides (module docstring)
    sampler=dataclasses.replace(_base.sampler, name="vpode_dpmpp2m"),
    # vq_gan_blocks hard-codes GroupNorm(32) -> smallest faithful ch=128
    semantic_cond=SemanticCondConfig(
        z_channels=32, upsample_ch=128, ch_mult=(0.25, 1.0),
        num_res_blocks=1, up_out_channels=8, out_channels=4),
    # cp_enc_dec hard-codes 32-group norms as well
    vae=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=4,
                  temporal_compress_level=1),
)
T_LAT, C_LAT = CFG.dit.latent_frames, CFG.dit.in_channels
H_LAT, W_LAT = CFG.dit.latent_height, CFG.dit.latent_width
IMAGE_SIZE = [H_LAT * 8, W_LAT * 8]     # CogWrapper F=8 latent formula


def _tiny_hf_t5(seed):
    from transformers import T5Config as HFT5Config
    from transformers import T5EncoderModel

    t = CFG.t5
    torch.manual_seed(seed)
    hf = T5EncoderModel(HFT5Config(
        vocab_size=t.vocab_size, d_model=t.d_model, d_kv=t.d_kv,
        d_ff=t.d_ff, num_layers=t.num_layers, num_heads=t.num_heads,
        feed_forward_proj="gated-gelu", dropout_rate=0.0)).eval()
    for p in hf.parameters():
        p.requires_grad_(False)
    return hf


def _build_ref_lm(t5_stage1):
    """Tiny REAL Semantic1DLM with the FULL text path (TextCond.forward ->
    encode_texts_padded), unlike the per-module oracle's precomputed seam."""
    from landiff.llm.models.transformer import GPT
    from landiff.llm.modules.conditioner import MicroConditioner, TextCond
    from landiff.llm.modules.transformer_blocks import LlamaTransformerBlock
    from landiff.modules.pos_emb import Rope1DPosEmb

    cfg = CFG.llm
    torch.manual_seed(0)
    blocks = [
        LlamaTransformerBlock(cfg.num_heads, cfg.hidden_size, cfg.mlp_hidden,
                              activation=torch.nn.GELU(approximate="tanh"))
        for _ in range(cfg.num_layers)
    ]
    rope = Rope1DPosEmb(dim=cfg.head_dim, max_len=cfg.rope.max_len,
                        device="cpu")
    gpt = GPT(cfg.vocab_size, cfg.hidden_size, blocks, causal=True,
              fwd_dtype=torch.float32, rope=rope)
    duck = _e2e_helpers.DuckFlanT5(t5_stage1, max_length=CFG.t5.max_length)
    cond = TextCond(text_encoder=duck, max_cond_tokens_num=64,
                    embed_dim=cfg.hidden_size, padding=False,
                    cfg_drop_prob=0.1, use_mlp_embeddings=True)
    micro = MicroConditioner(
        out_dim=cfg.hidden_size,
        frequency_embedding_size=cfg.micro_cond_embed_dim,
        crossattn_condition_keys=("frames", "motion_score"),
        defaults={"frames": 1, "motion_score": 0},
        fwd_dtype=torch.float32)
    # zero-init output MLPs (conditioner.py:85-89) — vacuous-pass trap
    for key in micro.mlps:
        torch.nn.init.normal_(micro.mlps[key][2].weight, std=0.05)
        torch.nn.init.normal_(micro.mlps[key][2].bias, std=0.05)
    return lm_model.Semantic1DLM(
        tokenizer=_StandinFrozenTokenizer(cfg), cond_model=cond,
        transformer=gpt, micro_condition=micro,
        Iframe_len=cfg.iframe_len, Pframe_len=cfg.pframe_len,
        fwd_dtype=torch.float32).eval()


def _tf_args():
    return argparse.Namespace(
        checkpoint_activations=False, vocab_size=1, max_sequence_length=64,
        layernorm_order="pre", skip_init=False, model_parallel_size=1,
        is_decoder=False)


def _dit_common(num_layers):
    d = CFG.dit
    return dict(
        transformer_args=_tf_args(),
        num_frames=1 + (T_LAT - 1) * 4,      # (nf-1)//4+1 == latent_frames
        time_compressed_rate=4, latent_width=W_LAT, latent_height=H_LAT,
        patch_size=d.patch_size, in_channels=d.in_channels,
        out_channels=d.out_channels, hidden_size=d.hidden_size,
        num_layers=num_layers, num_attention_heads=d.num_heads,
        elementwise_affine=True, time_embed_dim=d.time_embed_dim)


def _pos_patch_cfgs():
    d = CFG.dit
    return {
        "pos_embed_config": {
            "target": "landiff.diffusion.dit_video_concat."
                      "Basic3DPositionEmbeddingMixin",
            "params": {"text_length": d.text_length,
                       "height_interpolation": 1.875,
                       "width_interpolation": 1.875},
        },
        "patch_embed_config": {
            "target": "landiff.diffusion.dit_video_concat."
                      "ImagePatchEmbeddingMixin",
            "params": {"text_hidden_size": d.text_dim},
        },
    }


def _semantic_condition_config():
    sc = CFG.semantic_cond
    return {
        "target": "landiff.diffusion.semantic_models.condition.SemanticCond",
        "params": {
            "out_dim": sc.up_out_channels,
            "target_dim": sc.out_channels,
            "feature_type": "video_theia_interpolate",
            "zero_init_conv_out": True,
            "semantic_model_config": {
                "target": "landiff.diffusion.semantic_models."
                          "feature_extractor.vq_warp.VideoVQWrap",
                "params": {"config_str": "landiff_e2e_helpers.build_tiny_vq",
                           "ckpt_path": None, "freeze_model": True,
                           "freeze_encoder": False},
            },
            "upsample_model_config": {
                "target": "landiff.diffusion.semantic_models.modules."
                          "vq_gan_blocks.Decoder",
                "params": {"z_channels": sc.z_channels, "resolution": 16,
                           "in_channels": CFG.tokenizer.feature_dim,
                           "out_ch": sc.up_out_channels,
                           "ch": sc.upsample_ch,
                           "ch_mult": list(sc.ch_mult),
                           "num_res_blocks": sc.num_res_blocks,
                           "attn_resolutions": [], "dropout": 0.0,
                           "use_mid_attention": False,
                           "upsample_type": "pixelshuffle"},
            },
        },
    }


def _first_stage_config():
    v = CFG.vae
    enc_dec = dict(
        double_z=True, z_channels=v.z_channels, resolution=16,
        in_channels=3, out_ch=3, ch=v.ch, ch_mult=list(v.ch_mult),
        attn_resolutions=[], num_res_blocks=v.num_res_blocks, dropout=0.0,
        temporal_compress_times=2 ** v.temporal_compress_level)
    return {
        "target": "landiff.diffusion.vae_modules.autoencoder."
                  "VideoAutoencoderInferenceWrapper",
        "params": {
            "cp_size": 1,
            "loss_config": {"target": "torch.nn.Identity"},
            "regularizer_config": {
                "target": "landiff.diffusion.vae_modules.regularizers."
                          "DiagonalGaussianRegularizer"},
            "encoder_config": {
                "target": "landiff.diffusion.vae_modules.cp_enc_dec."
                          "ContextParallelEncoder3D",
                "params": dict(enc_dec)},
            "decoder_config": {
                "target": "landiff.diffusion.vae_modules.cp_enc_dec."
                          "ContextParallelDecoder3D",
                "params": dict(enc_dec)},
        },
    }


def _engine_args(pretrain_pt):
    s = CFG.sampler
    d = CFG.dit
    model_config = {
        "scale_factor": CFG.vae.scale_factor,
        "disable_first_stage_autocast": True,
        "latent_input": False,
        "pretrain_diffusion_model_ckpt_path": pretrain_pt,
        "freeze_dit": True,
        "log_keys": ["txt"],
        "network_config": {
            "target": "landiff.diffusion.dit_video_concat."
                      "DiffusionTransformer",
            "params": {
                **_dit_common(d.num_layers),
                "modules": {
                    **_pos_patch_cfgs(),
                    "adaln_layer_config": {
                        "target": "landiff.diffusion.dit_video_concat."
                                  "ControlAdaLNMixin",
                        "params": {"qk_ln": True,
                                   "use_semantic_injection_adaln": False,
                                   "control_layers": d.control_layers}},
                    "final_layer_config": {
                        "target": "landiff.diffusion.dit_video_concat."
                                  "FinalLayerMixin"},
                },
            },
        },
        "control_network_config": {
            "target": "landiff.diffusion.dit_video_concat."
                      "ControlDiffusionTransformer",
            "params": {
                **_dit_common(d.control_layers),
                "use_semantic_injection_adaln": False,
                "modules": {
                    **_pos_patch_cfgs(),
                    "semantic_condition_config":
                        _semantic_condition_config(),
                    "adaln_layer_config": {
                        "target": "landiff.diffusion.dit_video_concat."
                                  "ControlOutAdaLNMixin",
                        "params": {"qk_ln": True, "use_zero_linears": True}},
                    "final_layer_config": {
                        "target": "landiff.diffusion.dit_video_concat."
                                  "EmptyFinalLayerMixin"},
                },
            },
        },
        "denoiser_config": {
            "target": "landiff.diffusion.sgm.modules.diffusionmodules."
                      "denoiser.DiscreteDenoiser",
            "params": {
                "num_idx": s.num_train_timesteps,
                "quantize_c_noise": False,
                "weighting_config": {
                    "target": "landiff.diffusion.sgm.modules."
                              "diffusionmodules.denoiser_weighting."
                              "EpsWeighting"},
                "scaling_config": {
                    "target": "landiff.diffusion.sgm.modules."
                              "diffusionmodules.denoiser_scaling."
                              "VideoScaling"},
                "discretization_config": {
                    "target": "landiff.diffusion.sgm.modules."
                              "diffusionmodules.discretizer."
                              "ZeroSNRDDPMDiscretization",
                    "params": {"shift_scale": s.shift_scale}},
            },
        },
        "sampler_config": {
            "target": "landiff.diffusion.sgm.modules.diffusionmodules."
                      "sampling.VPODEDPMPP2MSampler",
            "params": {
                "num_steps": s.num_steps, "verbose": False, "device": "cpu",
                "discretization_config": {
                    "target": "landiff.diffusion.sgm.modules."
                              "diffusionmodules.discretizer."
                              "ZeroSNRDDPMDiscretization",
                    "params": {"shift_scale": s.shift_scale}},
                "guider_config": {
                    "target": "landiff.diffusion.sgm.modules."
                              "diffusionmodules.guiders.DynamicCFG",
                    "params": {"scale": s.cfg_scale, "exp": s.cfg_exp,
                               "num_steps": s.num_steps}},
            },
        },
        "conditioner_config": {
            "target": "landiff.diffusion.sgm.modules.GeneralConditioner",
            "params": {"emb_models": [{
                "is_trainable": False, "input_key": "txt", "ucg_rate": 0.1,
                "target": "landiff_e2e_helpers.TinyT5Embedder",
                "params": {"max_length": d.text_length}}]},
        },
        "first_stage_config": _first_stage_config(),
        "loss_fn_config": None,
    }
    return argparse.Namespace(model_config=model_config, fp16=False,
                              bf16=False, device="cpu",
                              sampling_num_frames=T_LAT,
                              latent_channels=C_LAT, seed=SEED)


def _randomize_module(module, seed, skip=("pos_embed.pos_embedding",
                                          "conditioner.")):
    """Randomize ALL parameters (zero-init adaLN/zero_linears/conv_out —
    the vacuous-pass trap) except the frozen sincos table (the converter
    recomputes it) and the conditioner's T5 (whose weights must stay equal
    to the HF model our side converts from)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in module.named_parameters():
            if any(s in name for s in skip):
                continue
            p.copy_(torch.randn(p.shape, generator=g) * 0.15)


def _module_sd(module):
    """state_dict via named_parameters/buffers: freeze_model
    (landiff/utils.py:249-268) poisons .state_dict() on the frozen
    main_model, but parameter/buffer iteration still works."""
    out = {k: v.detach().numpy() for k, v in module.named_parameters()}
    out.update({k: v.detach().numpy() for k, v in module.named_buffers()})
    return out


@pytest.fixture(scope="module")
def world():
    monkey = pytest.MonkeyPatch()
    # device-placement no-ops: the reference pins tensors/modules to cuda
    # (dif_infer.py:163,248-250); math is device-independent
    monkey.setattr(torch.Tensor, "cuda", lambda self, *a, **kw: self)
    monkey.setattr(torch.nn.Module, "cuda", lambda self, *a, **kw: self)

    # torch 2.13 classifies mask_mod vs score_mod by __code__.co_argcount,
    # which counts `self` on the reference's bound mask methods (written
    # for torch 2.5) — wrap in a plain 4-arg lambda so the REAL mask logic
    # runs unmodified (same fix as test_reference_oracles.fixed_create_mask)
    import torch.nn.attention.flex_attention as flex_mod

    real_cm = flex_mod.create_mask
    monkey.setattr(
        flex_mod, "create_mask",
        lambda mod_fn, B, H, Q_LEN, KV_LEN, device=None:
        real_cm(lambda b, h, q, kv: mod_fn(b, h, q, kv),
                B, H, Q_LEN, KV_LEN, device))

    _ref_stubs.init_reference_context_parallel()

    # ---- shared tiny T5 encoders (HF, random init, executed verbatim) ----
    t5_s1 = _tiny_hf_t5(31)
    t5_s2 = _tiny_hf_t5(32)
    _e2e_helpers.TinyT5Embedder.shared_transformer = t5_s2

    # ---- reference stage 1 ----
    ref_lm = _build_ref_lm(t5_s1)

    # ---- reference stage 2 engine ----
    with tempfile.NamedTemporaryFile(suffix=".pt", delete=False) as f:
        torch.save({"module": {}}, f.name)
        pretrain_pt = f.name
    engine = diffusion_video.SATControlVideoDiffusionEngine(
        _engine_args(pretrain_pt)).eval()
    os.unlink(pretrain_pt)

    _randomize_module(engine.model, 7)
    # buffers the randomizer skips: VQ codebook + feature mean/std
    vq_model = engine.model.control_model.diffusion_model \
        .semantic_conditioner.semantic_model.model
    g = torch.Generator().manual_seed(8)
    with torch.no_grad():
        vq_model.quantizer._codebook.embed.copy_(
            torch.randn(vq_model.quantizer._codebook.embed.shape,
                        generator=g) * 0.15)
        vq_model.mean.copy_(torch.randn(vq_model.mean.shape,
                                        generator=g) * 0.1)
        vq_model.std.copy_(0.5 + torch.rand(vq_model.std.shape,
                                            generator=g))

    # ---- reference run: stage 1 ----
    with torch.no_grad():
        codes_ref = ref_lm.sample(
            {"caption": [PROMPT], "frames": torch.tensor([float(NF)]),
             "motion_score": torch.tensor([0.1])},
            temperature=1e-3, num_frames=NF, guidance_scale=7.5)
    codes_ref = np.asarray(codes_ref).reshape(-1)   # infer_video.py:76

    # ---- reference run: stage 2 (CogWrapper.forward VERBATIM) ----
    cw = object.__new__(dif_infer_ref.CogWrapper)
    torch.nn.Module.__init__(cw)
    cw.args = _engine_args(None)
    cw.fwd_dtype = torch.float32
    cw.image_size = IMAGE_SIZE
    cw.seed = SEED
    cw.engine_type = "control"
    cw.model = engine

    captured_noise = []
    real_randn = torch.randn

    def recording_randn(*a, **kw):
        out = real_randn(*a, **kw)
        captured_noise.append(out)
        return out

    monkey.setattr(torch, "randn", recording_randn)
    with torch.no_grad():
        ref_out = cw.forward(
            {"caption": PROMPT, "video": None}, seed=SEED,
            semantic_token=torch.from_numpy(codes_ref.copy()))
    monkey.setattr(torch, "randn", real_randn)
    assert len(captured_noise) == 1, \
        f"expected exactly the engine.sample randn, saw {len(captured_noise)}"
    init_noise = captured_noise[0].numpy()

    # ---- our side: converted weights ----
    lm_sd = _module_sd(ref_lm)  # freeze_model poisons .state_dict()
    llm_params = {
        "lm": jax.tree.map(jnp.asarray,
                           convert.convert_llm(lm_sd, CFG.llm.num_layers)),
        "t5": jax.tree.map(jnp.asarray, t5_lib.params_from_hf_state_dict(
            {k: v.detach().numpy()
             for k, v in t5_s1.state_dict().items()}, CFG.t5)),
    }
    main_sd = _module_sd(engine.model.main_model.diffusion_model)
    ctrl_all = _module_sd(engine.model.control_model.diffusion_model)
    ctrl_sd = {k: v for k, v in ctrl_all.items()
               if not k.startswith("semantic_conditioner.")}
    sem_sd = {k[len("semantic_conditioner."):]: v
              for k, v in ctrl_all.items()
              if k.startswith("semantic_conditioner.")}
    vae_sd = {k: v.detach().numpy()
              for k, v in engine.first_stage_model.state_dict().items()}
    dif_params = jax.tree.map(jnp.asarray, {
        "main": convert.convert_dit(main_sd, CFG.dit.num_layers),
        "control": convert.convert_dit(ctrl_sd, CFG.dit.control_layers,
                                       control=True),
        "semantic": convert.convert_semantic_cond(
            sem_sd, CFG.semantic_cond.num_res_blocks),
        "vae": convert.convert_vae(vae_sd, CFG.vae.num_res_blocks,
                                   len(CFG.vae.ch_mult)),
        "t5": t5_lib.params_from_hf_state_dict(
            {k: v.detach().numpy()
             for k, v in t5_s2.state_dict().items()}, CFG.t5),
    })

    # ---- our run: the real pipeline wrappers ----
    llm_w = our_llm.ArModelInferWrapper(
        llm_params, CFG.llm, CFG.t5,
        ARSampleConfig(temperature=1e-3, top_k=0, top_p=1.0, cfg_scale=7.5,
                       motion_score=0.1, num_frames=NF, seed=0),
        compute_dtype=jnp.float32)
    code_task = llm_w(our_llm.CodeTask(save_file_name="e2e.npy",
                                       prompt=PROMPT))
    dif_w = our_dif.CogModelInferWrapper(dif_params, CFG,
                                         compute_dtype=jnp.float32,
                                         attn_impl="xla")
    video_task = dif_w(
        our_dif.VideoTask(save_file_name="e2e.mp4", prompt=PROMPT,
                          seed=SEED, semantic_token=code_task.result),
        init_noise=init_noise)

    yield {
        "codes_ref": codes_ref,
        "codes_ours": code_task.result,
        "ref_out": ref_out,
        "ours_latent": video_task.latent,
        "ours_video": video_task.result,
        "init_noise": init_noise,
    }
    monkey.undo()


def test_stage1_codes_identical(world):
    np.testing.assert_array_equal(world["codes_ours"], world["codes_ref"])
    assert len(world["codes_ref"]) == CFG.llm.iframe_len + \
        (NF - 1) * CFG.llm.pframe_len


def test_seed_threading_matches_reference(world):
    """The captured engine noise equals a fresh draw under the reference's
    exact seed semantics (dif_infer.py:190-195: explicit seed -> text_seed
    -> set_seed_for_single_process -> torch.randn) — pins that the only
    divergence our init_noise seam bridges is the PRNG itself."""
    set_seed_for_single_process(SEED)
    want = torch.randn(1, T_LAT, C_LAT, H_LAT, W_LAT,
                       device="cpu", dtype=torch.float32)
    np.testing.assert_array_equal(world["init_noise"], want.numpy())


def test_composed_latents_match(world):
    want = world["ref_out"].latent.float().numpy()
    got = np.asarray(world["ours_latent"], np.float32)
    assert got.shape == want.shape == (1, T_LAT, C_LAT, H_LAT, W_LAT)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_composed_video_matches(world):
    """Final RGB after decode_latent's serial fake-CP chunking + post
    scaling, within one uint8 quantization step (our wrapper fetches
    uint8)."""
    want = world["ref_out"].video.float().numpy()   # (B, 3, T, H, W) [0,1]
    got = np.asarray(world["ours_video"], np.float32)
    assert got.shape == want.shape
    want_q = np.round(want * 255.0)
    got_q = np.round(got * 255.0)
    assert np.abs(got_q - want_q).max() <= 1.0, \
        f"max uint8 delta {np.abs(got_q - want_q).max()}"
