"""Ad-hoc composition-drift probe for the composed E2E oracle (not a test).

Builds the same tiny world as test_reference_oracle_e2e.world and compares
mid-pipeline tensors: conditioner context, semantic feature, and the first
denoiser call. Run: python tests/_dbg_e2e.py
"""

import sys
import os

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import torch

import test_reference_oracle_e2e as E


def main():
    import tempfile

    import jax
    import jax.numpy as jnp

    from landiff_tpu.ckpt import convert
    from landiff_tpu.diffusion import engine as our_engine
    from landiff_tpu.diffusion import schedule as our_sched
    from landiff_tpu.models import t5 as t5_lib
    from landiff_tpu.pipeline.text import T5Text

    diffusion_video = E.diffusion_video
    CFG = E.CFG

    # torch 2.13 create_mask argcount fix (same as the fixture)
    import torch.nn.attention.flex_attention as flex_mod

    real_cm = flex_mod.create_mask
    flex_mod.create_mask = (
        lambda mod_fn, B, H, Q_LEN, KV_LEN, device=None:
        real_cm(lambda b, h, q, kv: mod_fn(b, h, q, kv),
                B, H, Q_LEN, KV_LEN, device))
    torch.Tensor.cuda = lambda self, *a, **kw: self
    torch.nn.Module.cuda = lambda self, *a, **kw: self

    E._ref_stubs.init_reference_context_parallel()
    t5_s2 = E._tiny_hf_t5(32)
    E._e2e_helpers.TinyT5Embedder.shared_transformer = t5_s2

    with tempfile.NamedTemporaryFile(suffix=".pt", delete=False) as f:
        torch.save({"module": {}}, f.name)
        pretrain_pt = f.name
    engine = diffusion_video.SATControlVideoDiffusionEngine(
        E._engine_args(pretrain_pt)).eval()
    os.unlink(pretrain_pt)

    E._randomize_module(engine.model, 7)
    vq_model = engine.model.control_model.diffusion_model \
        .semantic_conditioner.semantic_model.model
    g = torch.Generator().manual_seed(8)
    with torch.no_grad():
        vq_model.quantizer._codebook.embed.copy_(
            torch.randn(vq_model.quantizer._codebook.embed.shape,
                        generator=g) * 0.15)
        vq_model.mean.copy_(torch.randn(vq_model.mean.shape, generator=g) * 0.1)
        vq_model.std.copy_(0.5 + torch.rand(vq_model.std.shape, generator=g))

    # ---- converted params ----
    main_sd = E._module_sd(engine.model.main_model.diffusion_model)
    ctrl_all = E._module_sd(engine.model.control_model.diffusion_model)
    ctrl_sd = {k: v for k, v in ctrl_all.items()
               if not k.startswith("semantic_conditioner.")}
    sem_sd = {k[len("semantic_conditioner."):]: v
              for k, v in ctrl_all.items()
              if k.startswith("semantic_conditioner.")}
    dif_params = jax.tree.map(jnp.asarray, {
        "main": convert.convert_dit(main_sd, CFG.dit.num_layers),
        "control": convert.convert_dit(ctrl_sd, CFG.dit.control_layers,
                                       control=True),
        "semantic": convert.convert_semantic_cond(
            sem_sd, CFG.semantic_cond.num_res_blocks),
        "t5": t5_lib.params_from_hf_state_dict(
            {k: v.detach().numpy() for k, v in t5_s2.state_dict().items()},
            CFG.t5),
    })

    # ---- probe 1: conditioner crossattn context ----
    from landiff.diffusion.dif_infer import get_batch, \
        get_unique_embedder_keys_from_conditioner

    value_dict = {"prompt": E.PROMPT, "negative_prompt": "",
                  "num_frames": torch.tensor(E.T_LAT).unsqueeze(0)}
    batch, batch_uc = get_batch(
        get_unique_embedder_keys_from_conditioner(engine.conditioner),
        value_dict, [1])
    with torch.no_grad():
        c, uc = engine.conditioner.get_unconditional_conditioning(
            batch, batch_uc=batch_uc, force_uc_zero_embeddings=["txt"])
    ref_ctx = c["crossattn"].float().numpy()
    ref_uc = uc["crossattn"].float().numpy()

    text = T5Text(None, max_length=CFG.dit.text_length, padding_side="right")
    ids, _ = text([E.PROMPT], pad_to_max=True)
    our_ctx = np.asarray(t5_lib.encode(dif_params["t5"], jnp.asarray(ids),
                                       None, CFG.t5,
                                       compute_dtype=jnp.float32))
    print("ctx shapes", ref_ctx.shape, our_ctx.shape)
    print("ctx maxdiff", np.abs(ref_ctx - our_ctx).max(),
          "uc(ref) maxabs", np.abs(ref_uc).max())

    # ---- probe 2: semantic feature ----
    codes = np.arange(E.CFG.llm.iframe_len + (E.NF - 1) * E.CFG.llm.pframe_len) \
        % CFG.tokenizer.vq.codebook_size
    from landiff.diffusion.sgm.util import InferValueRegistry

    InferValueRegistry.clear()
    tok_t = torch.from_numpy(codes).reshape(1, 1, -1)
    InferValueRegistry.register("semantic_token", tok_t)
    sem_cond = engine.model.control_model.diffusion_model.semantic_conditioner
    with torch.no_grad():
        ref_feat = sem_cond(indexs=tok_t).float().numpy()
    from landiff_tpu.models import semantic_cond as sc_lib

    our_feat = np.asarray(sc_lib.semantic_feature_from_tokens(
        dif_params["semantic"], jnp.asarray(codes)[None], CFG.tokenizer,
        CFG.semantic_cond, forward_t=CFG.dit.latent_frames,
        compute_dtype=jnp.float32))
    print("sem feat shapes", ref_feat.shape, our_feat.shape)
    m = min(ref_feat.size, our_feat.size)
    print("sem feat maxdiff",
          np.abs(ref_feat.ravel()[:m] - our_feat.ravel()[:m]).max())

    # ---- probe 3: first denoiser call ----
    from landiff.utils import set_seed_for_single_process

    set_seed_for_single_process(E.SEED)
    x0 = torch.randn(1, E.T_LAT, E.C_LAT, E.H_LAT, E.W_LAT)

    steps_ref = []
    real_denoiser = engine.denoiser

    class Wrap(torch.nn.Module):
        def forward(self, network, input, sigma, c, **kw):
            out = real_denoiser(network, input, sigma, c, **kw)
            steps_ref.append({
                "in": input.detach().float().numpy(),
                "sigma": sigma.detach().float().numpy(),
                "out": out.detach().float().numpy(),
            })
            return out

    guided_ref = []
    from landiff.diffusion.sgm.modules.diffusionmodules import guiders

    real_gcall = guiders.DynamicCFG.__call__

    def gcall(self, x, sigma, step_index, scale=None):
        out = real_gcall(self, x, sigma, step_index, scale=scale)
        guided_ref.append({
            "step_index": int(step_index),
            "out": out.detach().float().numpy(),
        })
        return out

    guiders.DynamicCFG.__call__ = gcall

    engine.denoiser = Wrap()
    InferValueRegistry.clear()
    InferValueRegistry.register("semantic_token", tok_t)
    with torch.no_grad():
        z = engine.sample(c, uc=uc, batch_size=1,
                          shape=(E.T_LAT, E.C_LAT, E.H_LAT, E.W_LAT))
    engine.denoiser = real_denoiser
    guiders.DynamicCFG.__call__ = real_gcall
    z_ref = z.detach().float().numpy()
    print("denoiser calls:", len(steps_ref),
          "guider calls:", len(guided_ref))
    for i, s in enumerate(steps_ref):
        print(f"  ref step {i}: sigma={s['sigma'][0]:.6f}")

    # our side: full vpode trajectory with per-step capture
    denoise_fn, bundle = our_engine.make_denoise_fn(
        dif_params["main"], dif_params["control"], dif_params["semantic"],
        CFG.dit, CFG.sampler, CFG.tokenizer, CFG.semantic_cond,
        jnp.asarray(our_ctx), jnp.zeros_like(jnp.asarray(our_ctx)),
        jnp.asarray(codes)[None], compute_dtype=jnp.float32,
        attn_impl="xla")
    t = our_sched.sampler_tables(CFG.sampler)
    x0 = jnp.asarray(steps_ref[0]["in"][:1])  # both rows got the same x
    ours_steps = []

    def traced_fn(xx, step):
        out = denoise_fn(xx, step, bundle)
        ours_steps.append({"in": np.asarray(xx), "out": np.asarray(out),
                           "alpha": float(step["alpha"]),
                           "cfg": float(step["cfg_scale"])})
        return out

    # replicate vpode math eagerly (no scan) for step-level comparison
    from landiff_tpu.diffusion import schedule as sched_mod

    n = CFG.sampler.num_steps
    m1 = np.zeros(n); m2 = np.zeros(n); m3 = np.zeros(n); m4 = np.zeros(n)
    fo = np.zeros(n, bool)
    for i in range(n):
        a, an, ap = t["alpha"][i], t["alpha_next"][i], t["alpha_prev"][i]
        c1, c2, c3, c4 = sched_mod.dpmpp2m_ode_coeffs(a, an, ap)
        m1[i], m2[i] = c1, c2
        if c3 is None or an < 1e-14:
            fo[i] = True
        else:
            m3[i], m4[i] = c3, c4
    x = x0
    old_d = jnp.zeros_like(x)
    for i in range(n):
        step = {"alpha": jnp.float32(t["alpha"][i]),
                "timestep": jnp.int32(t["timestep"][i]),
                "idx": jnp.int32(t["idx"][i]),
                "cfg_scale": jnp.float32(t["cfg_scale"][i])}
        denoised = traced_fn(x, step)
        x_std = m1[i] * x - m2[i] * denoised
        x_adv = m3[i] * denoised - m4[i] * old_d
        x_adv = m1[i] * x - m2[i] * x_adv
        x_new = x_std if fo[i] else x_adv
        x_new = denoised if t["idx"][i] == 1 else x_new
        x, old_d = x_new, denoised
        ref_in = steps_ref[i]["in"][:1]
        ref_guided = guided_ref[i]["out"]
        print(f"step {i}: x_in maxdiff "
              f"{np.abs(ours_steps[i]['in'] - ref_in).max():.3e}  "
              f"guided maxdiff "
              f"{np.abs(ours_steps[i]['out'] - ref_guided).max():.3e}  "
              f"our cfg={ours_steps[i]['cfg']:.4f}")
    print("final z maxdiff", np.abs(np.asarray(x) - z_ref).max(),
          "ref mag", np.abs(z_ref).max())


if __name__ == "__main__":
    main()
