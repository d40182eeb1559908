"""Long-video streaming generation: prefix-conditioned chunked diffusion +
segment-wise semantic tokens + one streaming VAE decode.

Reference mechanism (SURVEY §5 long-context): the sampler's `fixed_frames`
prefix splice (sampling.py:800-817, 834-836), engine `prefix` noise splice
(diffusion_video.py:287-288), and the VAE conv-cache streaming decode
(dif_infer.py:245-271). The shipped config documents the intended chunking
"49 frames, 13 latent, prefix 7 -> gen 25 new frames" (cogvideox yaml:213).

Stage 1 natively emits multi-segment token streams (1218 tokens per 13-frame
segment, lm_model.py:175-276); each diffusion chunk conditions on its
segment's tokens and on the last `prefix_latents` latent frames of the
previous chunk.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from landiff_tpu.config import LanDiffConfig
from landiff_tpu.diffusion import engine

logger = logging.getLogger("landiff_tpu.long_video")


def generate_long_video_latents(params, cfg: LanDiffConfig, context,
                                uc_context, codes: np.ndarray, *,
                                key, prefix_latents: int = 7,
                                sdedit: bool = False,
                                compute_dtype=jnp.bfloat16,
                                attn_impl="auto",
                                max_steps_per_call: int | None = None,
                                mesh=None, on_segment=None):
    """codes: flat semantic token stream, multiple of tokens-per-segment.

    Returns latents (1, T_total, C, H', W') where
    T_total = 13 + (n_segments - 1) * (13 - prefix_latents).
    mesh: optional Mesh — each segment's denoise loop runs the TP/DP
    shard_map program (parallel/tp_infer.py).
    on_segment: optional callback (seg_index, latents) invoked after each
    segment's device work completes (latents blocked) — per-segment
    timing/progress hooks for the 200+ frame runs.
    """
    t = cfg.tokenizer.titok
    seg_tokens = t.latent_tokens
    codes = np.asarray(codes).reshape(-1)
    assert len(codes) % seg_tokens == 0, (len(codes), seg_tokens)
    n_seg = len(codes) // seg_tokens
    lat_frames = cfg.dit.latent_frames

    all_latents = None
    denoise_fn = bundle = None
    for seg in range(n_seg):
        key, k_seg = jax.random.split(key)
        tokens = jnp.asarray(codes[seg * seg_tokens:(seg + 1) * seg_tokens]
                             ).reshape(1, -1)
        # build the denoise program ONCE; per segment only the semantic
        # feature changes — params stay placed and the sampler's jitted
        # chunk program (cached on denoise_fn identity) is traced once
        if mesh is not None:
            from landiff_tpu.parallel import tp_infer

            if denoise_fn is None:
                denoise_fn, bundle = tp_infer.make_tp_denoise_fn(
                    params, mesh, cfg.dit, cfg.sampler, cfg.tokenizer,
                    cfg.semantic_cond, context, uc_context, tokens,
                    compute_dtype=compute_dtype, attn_impl=attn_impl)
            else:
                bundle = tp_infer.update_tp_bundle(
                    bundle, mesh, params["semantic"], tokens, cfg.dit,
                    cfg.tokenizer, cfg.semantic_cond,
                    compute_dtype=compute_dtype)
        else:
            if denoise_fn is None:
                denoise_fn, bundle = engine.make_denoise_fn(
                    params["main"], params["control"], params["semantic"],
                    cfg.dit, cfg.sampler, cfg.tokenizer, cfg.semantic_cond,
                    context, uc_context, tokens, compute_dtype=compute_dtype,
                    attn_impl=attn_impl)
            else:
                bundle = engine.update_bundle_tokens(
                    bundle, params["semantic"], tokens, cfg.dit,
                    cfg.tokenizer, cfg.semantic_cond,
                    compute_dtype=compute_dtype)
        # accumulate on HOST: device-side concat/slice at a growing total
        # length would compile a fresh (tiny) program per unique length —
        # ~11 s each through the remote compile helper, measured as +5% on
        # new-length segments of the 8-segment hardware run — and would
        # keep the whole growing latent resident in HBM. The per-segment
        # fetch is only ~3 MB (13x16x60x90 bf16); the prefix fed back is
        # 7 latents. Segment shapes stay FIXED so both jitted segment
        # programs are compiled exactly once.
        if all_latents is None:
            latents = engine.sample_latents(
                denoise_fn, cfg.sampler, cfg.dit, key=k_seg, bundle=bundle,
                max_steps_per_call=max_steps_per_call)
            all_latents = np.asarray(latents)
        else:
            prefix = jnp.asarray(all_latents[:, -prefix_latents:])
            latents = engine.sample_latents(
                denoise_fn, cfg.sampler, cfg.dit, key=k_seg, bundle=bundle,
                prefix=prefix, sdedit=sdedit,
                max_steps_per_call=max_steps_per_call)
            all_latents = np.concatenate(
                [all_latents, np.asarray(latents[:, prefix_latents:])],
                axis=1)
        if on_segment is not None:
            on_segment(seg, all_latents)
        logger.info("segment %d/%d: latents %s", seg + 1, n_seg,
                    all_latents.shape)
    return all_latents


def generate_long_video(params, cfg: LanDiffConfig, context, uc_context,
                        codes, *, key, prefix_latents: int = 7,
                        sdedit: bool = False, compute_dtype=jnp.bfloat16,
                        attn_impl="auto",
                        max_steps_per_call: int | None = None, mesh=None):
    """Full long-video path: chunked latents -> one streaming VAE decode ->
    (1, 3, T_rgb, H, W) in [0, 1]. mesh: optional Mesh — per-segment
    denoising runs the TP/SP shard_map program and the VAE decode goes
    temporal-CP when the frame count halo-splits."""
    latents = generate_long_video_latents(
        params, cfg, context, uc_context, codes, key=key,
        prefix_latents=prefix_latents, sdedit=sdedit,
        compute_dtype=compute_dtype, attn_impl=attn_impl,
        max_steps_per_call=max_steps_per_call, mesh=mesh)
    n_time = mesh.shape.get("time", 1) if mesh is not None else 1
    if n_time > 1:
        from landiff_tpu.parallel import vae_cp

        if vae_cp.can_decode_cp(latents.shape[1], n_time):
            video = engine.decode_first_stage_cp(
                params["vae"], latents, cfg.vae, mesh,
                compute_dtype=compute_dtype)
            return engine.post_process_video(video), latents
    video = engine.decode_first_stage(params["vae"], latents, cfg.vae,
                                      compute_dtype=compute_dtype)
    return engine.post_process_video(video), latents
