"""Stage-2 diffusion engine: wires DiT(+control) + DiscreteDenoiser +
DynamicCFG + VPSDE-DPM++2M sampler + VAE first stage.

Reference: landiff/diffusion/diffusion_video.py (SATVideoDiffusionEngine
:28-444, SATControlVideoDiffusionEngine :447-480) and sgm DiscreteDenoiser
(denoiser.py:44-77). The reference's InferValueRegistry caching of the
semantic feature across denoise steps becomes a plain closure: the feature
is computed once and captured by the jitted sampler step.

CFG batch order is [uncond, cond] (guiders.py prepare_inputs: cat(uc, c)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from landiff_tpu.config import DiTConfig, SamplerConfig, SemanticCondConfig, \
    TokenizerConfig, VAEConfig
from landiff_tpu.diffusion import samplers, schedule
from landiff_tpu.models import dit as dit_lib
from landiff_tpu.models import semantic_cond as sc_lib
from landiff_tpu.models import vae as vae_lib


@functools.lru_cache(maxsize=8)
def denoiser_quantized_alphas(cfg: SamplerConfig) -> np.ndarray:
    """DiscreteDenoiser.possibly_quantize_sigma (denoiser.py:63-72): snap
    each sampler alpha to the nearest entry of the full 1000-entry table."""
    table = schedule.zero_snr_sigmas(cfg, cfg.num_train_timesteps,
                                     return_idx=False)
    t = schedule.sampler_tables(cfg)
    al = t["alpha"]
    idx = np.abs(al[None, :] - table[:, None]).argmin(axis=0)
    return table[idx]


def make_denoise_fn(main_params, control_params, sem_params, dit_cfg: DiTConfig,
                    sampler_cfg: SamplerConfig, tok_cfg: TokenizerConfig,
                    sem_cfg: SemanticCondConfig, context, uc_context,
                    semantic_tokens, *, compute_dtype=jnp.bfloat16,
                    attn_impl="auto"):
    """Build the per-step denoise function for the sampler.

    context / uc_context: (B, 226, 4096). semantic_tokens: (B, L) or None.
    Returns (denoise_fn, bundle): denoise_fn(x, step, bundle) -> fp32
    v-parameterized x0 prediction after DynamicCFG combination. The bundle
    carries params/conditioning as EXPLICIT pytree arguments so the sampler
    jits with them as inputs, not multi-GB captured constants.
    """
    bundle = {
        "q_alpha": jnp.asarray(denoiser_quantized_alphas(sampler_cfg),
                               jnp.float32),
        "alpha_table": jnp.asarray(
            schedule.sampler_tables(sampler_cfg)["alpha"], jnp.float32),
        "main": main_params,
        "ctx2": jnp.concatenate([uc_context, context], axis=0),  # [uc, c]
    }
    if semantic_tokens is not None:
        # computed ONCE, reused every step (the reference's
        # InferValueRegistry caching, dit_video_concat.py:939-982)
        bundle["sem_feature"] = sc_lib.semantic_feature_from_tokens(
            sem_params, semantic_tokens, tok_cfg, sem_cfg,
            forward_t=dit_cfg.latent_frames, compute_dtype=compute_dtype)
        bundle["control"] = control_params

    return _denoise_fn_for(dit_cfg, compute_dtype, attn_impl), bundle


def update_bundle_tokens(bundle, sem_params, semantic_tokens,
                         dit_cfg: DiTConfig, tok_cfg: TokenizerConfig,
                         sem_cfg: SemanticCondConfig, *,
                         compute_dtype=jnp.bfloat16):
    """Per-segment bundle refresh for long-video runs: recompute ONLY the
    semantic feature for the new segment's tokens; params / context /
    schedule tables are shared across segments (pipeline/long_video.py)."""
    b = dict(bundle)
    b["sem_feature"] = sc_lib.semantic_feature_from_tokens(
        sem_params, semantic_tokens, tok_cfg, sem_cfg,
        forward_t=dit_cfg.latent_frames, compute_dtype=compute_dtype)
    return b


@functools.lru_cache(maxsize=8)
def _denoise_fn_for(dit_cfg: DiTConfig, compute_dtype, attn_impl):
    """The per-step denoise closure, cached on its ONLY real dependencies.

    Everything per-call (params, conditioning, schedule tables) rides in
    the bundle argument, so one function object serves every segment of a
    long-video run and every warm/timed pass — which lets the sampler's
    jitted chunk program (samplers._dpmpp2m_chunk_program, keyed on
    denoise_fn identity) be traced ONCE per process instead of once per
    sample_latents call (a fresh closure per segment re-traced the full
    45-layer DiT, seconds of host time per segment)."""

    def _scalings(step, b):
        # DiscreteDenoiser sigma quantization: nearest 1000-table entry
        alpha = b["q_alpha"][jnp.argmin(jnp.abs(step["alpha"]
                                                - b["alpha_table"]))]
        return alpha, -jnp.sqrt(1.0 - alpha ** 2)

    def denoise_fn(x, step, b):
        B = x.shape[0]
        c_skip, c_out = _scalings(step, b)
        x2 = jnp.concatenate([x, x], axis=0)
        ts = jnp.full((2 * B,), step["timestep"], jnp.float32)
        if "sem_feature" in b:
            sem2 = jnp.concatenate([b["sem_feature"]] * 2, axis=0)
            net_out = dit_lib.control_warp_forward(
                b["main"], b["control"], x2.astype(compute_dtype), ts,
                b["ctx2"], dit_cfg, sem2, attn_impl=attn_impl,
                compute_dtype=compute_dtype)
        else:
            net_out = dit_lib.forward(
                b["main"], x2.astype(compute_dtype), ts, b["ctx2"], dit_cfg,
                attn_impl=attn_impl, compute_dtype=compute_dtype)
        denoised = net_out.astype(jnp.float32) * c_out \
            + x2.astype(jnp.float32) * c_skip
        x_u, x_c = denoised[:B], denoised[B:]
        return x_u + step["cfg_scale"] * (x_c - x_u)

    def cond_only(x, step, b):
        """The cond row alone (guidance-window CFG, LANDIFF_CFG_WINDOW):
        outside the guidance interval the uncond row is skipped entirely —
        HALF the model rows for those steps. Equivalent to cfg_scale=1
        there (the training-free guidance-interval technique; the
        reference's DynamicCFG surface being windowed: guiders.py:58-79)."""
        B = x.shape[0]
        c_skip, c_out = _scalings(step, b)
        ts = jnp.full((B,), step["timestep"], jnp.float32)
        ctx_c = b["ctx2"][B:]  # CFG batch order [uc, c]
        if "sem_feature" in b:
            net_out = dit_lib.control_warp_forward(
                b["main"], b["control"], x.astype(compute_dtype), ts,
                ctx_c, dit_cfg, b["sem_feature"], attn_impl=attn_impl,
                compute_dtype=compute_dtype)
        else:
            net_out = dit_lib.forward(
                b["main"], x.astype(compute_dtype), ts, ctx_c, dit_cfg,
                attn_impl=attn_impl, compute_dtype=compute_dtype)
        return net_out.astype(jnp.float32) * c_out \
            + x.astype(jnp.float32) * c_skip

    denoise_fn.cond_only = cond_only
    return denoise_fn


def sample_latents(denoise_fn, sampler_cfg: SamplerConfig, dit_cfg: DiTConfig,
                   *, key, bundle=None, batch_size=1, prefix=None,
                   sdedit=False, max_steps_per_call: int | None = None,
                   reuse_every: int | None = None, init_noise=None,
                   cfg_window=None):
    """Engine.sample (diffusion_video.py:255-315): randn latents (optionally
    prefix-spliced) -> sampler loop. Returns (B, T, C, H, W) fp32.
    `bundle` is the params pytree from make_denoise_fn.

    `sampler_cfg.name` selects the sampler the way the reference's yaml
    sampler_config target does: "vpsde_dpmpp2m" (the shipped default,
    sampling.py:678-837), "vpode_dpmpp2m" (:840-951) or "video_ddim"
    (:538-675). The deterministic samplers close over the bundle (tiny /
    parity use); the production serving path is VPSDE, which takes the
    bundle as an explicit jit argument.

    `init_noise`: optional (B, T, C, H, W) initial latents replacing the
    PRNG draw — the reference `generator` seam (diffusion_video.py:262-283),
    used for cross-framework matched-noise parity and reproducible serving.

    `reuse_every` (default: env LANDIFF_STEP_REUSE, off): cross-step model-
    output reuse — a quality-affecting opt-in serving accelerator; see
    samplers.vpsde_dpmpp2m_sample. Applies to every pipeline (single-chip,
    TP, SP, long-video) since they all sample through this function.

    `cfg_window` (default: env LANDIFF_CFG_WINDOW="lo,hi", off): guidance
    interval — full CFG only on steps [lo, hi), cond-row-only elsewhere
    (half the model rows there); see samplers.vpsde_dpmpp2m_sample."""
    from landiff_tpu.utils import env_value, logger

    if reuse_every is None:
        reuse_every = int(env_value("LANDIFF_STEP_REUSE", "0") or 0)
    if cfg_window is None:
        env = env_value("LANDIFF_CFG_WINDOW", "")
        if env:
            lo, hi = env.split(",")
            cfg_window = (int(lo), int(hi))
            if getattr(denoise_fn, "cond_only", None) is None:
                # env/preset-derived window on a denoise_fn without a
                # cond-only twin (the mesh TP path: CFG rows ride the data
                # axis, skipping uncond would idle a shard, not save time)
                # — degrade to full CFG instead of failing the pipeline.
                # An EXPLICIT cfg_window argument still raises in the
                # sampler (the caller asked for something impossible).
                logger.warning(
                    "LANDIFF_CFG_WINDOW ignored: denoise_fn has no "
                    "cond_only variant (mesh TP/SP path)")
                cfg_window = None
    k_noise, k_samp = jax.random.split(key)
    if init_noise is not None:
        x = jnp.asarray(init_noise, jnp.float32)
    else:
        shape = (batch_size, dit_cfg.latent_frames, dit_cfg.in_channels,
                 dit_cfg.latent_height, dit_cfg.latent_width)
        x = jax.random.normal(k_noise, shape, jnp.float32)
    fixed = 0
    if prefix is not None:
        fixed = prefix.shape[1]
        x = jnp.concatenate([prefix.astype(jnp.float32), x[:, fixed:]], axis=1)
    name = getattr(sampler_cfg, "name", "vpsde_dpmpp2m")
    if name != "vpsde_dpmpp2m":
        fn = denoise_fn if bundle is None else \
            (lambda xx, step: denoise_fn(xx, step, bundle))
        if name == "vpode_dpmpp2m":
            return samplers.vpode_dpmpp2m_sample(fn, x, sampler_cfg,
                                                 key=k_samp,
                                                 fixed_frames=fixed)
        if name == "video_ddim":
            return samplers.video_ddim_sample(fn, x, sampler_cfg, key=k_samp,
                                              fixed_frames=fixed)
        raise ValueError(f"unknown sampler name: {name!r}")
    return samplers.vpsde_dpmpp2m_sample(denoise_fn, x, sampler_cfg,
                                         key=k_samp, fixed_frames=fixed,
                                         sdedit=sdedit, params=bundle,
                                         max_steps_per_call=max_steps_per_call,
                                         reuse_every=reuse_every,
                                         cfg_window=cfg_window)


def decode_first_stage(vae_params, latents, vae_cfg: VAEConfig, *,
                       streaming=True, compute_dtype=jnp.bfloat16,
                       first_chunk: int | None = None):
    """latents (B, T, C, H', W') -> video (B, 3, T_out, H, W) in [-1, 1]
    (dif_infer.py:245-271: 1/scale_factor then serial chunked decode)."""
    import os

    if first_chunk is None:
        first_chunk = int(os.environ.get("LANDIFF_VAE_FIRST_CHUNK", "3"))
    z = latents.transpose(0, 2, 1, 3, 4) / vae_cfg.scale_factor
    if streaming:
        out = vae_lib.decode_streaming(vae_params["decoder"], z, vae_cfg,
                                       compute_dtype=compute_dtype,
                                       first_chunk=first_chunk)
    else:
        out, _ = vae_lib.decode(vae_params["decoder"], z, vae_cfg,
                                compute_dtype=compute_dtype)
    return out.astype(jnp.float32)


def decode_first_stage_cp(vae_params, latents, vae_cfg: VAEConfig, mesh, *,
                          compute_dtype=jnp.bfloat16):
    """Multi-chip temporal-CP first-stage decode: latents (B, T, C, H', W')
    -> video (B, 3, T_out, H, W) in [-1, 1], with the frame axis sharded
    over the mesh `time` axis (parallel/vae_cp.py ppermute-halo decode —
    the reference's CP VAE, cp_enc_dec.py:249-300)."""
    from landiff_tpu.parallel import vae_cp

    z = latents.transpose(0, 2, 1, 3, 4) / vae_cfg.scale_factor
    out = vae_cp.decode_temporal_cp(vae_params["decoder"], z, vae_cfg, mesh,
                                    compute_dtype=compute_dtype)
    return out.astype(jnp.float32)


def encode_first_stage(vae_params, video, vae_cfg: VAEConfig, *, key=None,
                       compute_dtype=jnp.bfloat16, streaming=False):
    """video (B, 3, T, H, W) in [-1,1] -> latents (B, T', z, H/8, W/8)
    scaled (diffusion_video.py:232-253).

    streaming=True: chunked encode with conv-cache carry (required at
    49f/480p on a 16 GB chip — the full graph needs 22.7 GB of HLO temps,
    measured; see vae.encode_streaming). Not jittable as a whole (drives
    per-chunk programs), so call it OUTSIDE jit."""
    enc = (vae_lib.encode_streaming if streaming else vae_lib.encode)
    moments = enc(vae_params["encoder"], video, vae_cfg,
                  compute_dtype=compute_dtype)
    z = vae_lib.sample_posterior(moments, key)
    return (vae_cfg.scale_factor * z).transpose(0, 2, 1, 3, 4)


def post_process_video(video):
    """[-1,1] -> [0,1] (dif_infer.py:37-49)."""
    return jnp.clip((video + 1.0) / 2.0, 0.0, 1.0)


def pre_process_video(video):
    """[0,1] -> [-1,1] (dif_infer.py:22-34)."""
    return jnp.clip(video * 2.0 - 1.0, -1.0, 1.0)


@jax.jit
def video_to_uint8(video):
    """[0,1] float video -> uint8 ON DEVICE. The saved file is uint8
    anyway (utils.py:328-332); converting before the host fetch moves 4x
    fewer bytes across PCIe/tunnel than fetching f32 (the reference's
    .cpu() move at dif_infer.py:269 pays the full f32 width)."""
    return jnp.clip(jnp.round(video * 255.0), 0, 255).astype(jnp.uint8)
