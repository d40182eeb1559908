"""End-to-end CLI: prompt -> semantic tokens -> video (mp4 + npy).

Reference: landiff/infer_video.py (main :105-114, llm_infer :61-86,
infer_diffusion :89-102). No GPU<->CPU model swapping: both stages live
on-chip. `--tiny` runs the full pipeline with a tiny random-init config (no
checkpoints needed — smoke/benchmark mode)."""

from __future__ import annotations

import argparse
import logging
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from landiff_tpu.config import ARSampleConfig, LanDiffConfig, \
    tiny_test_config
from landiff_tpu.pipeline import dif_infer, llm_infer
from landiff_tpu.utils import save_video_tensor

logger = logging.getLogger("landiff_tpu.infer_video")


def build_pipeline(cfg: LanDiffConfig, sample_cfg: ARSampleConfig,
                   seed: int = 0, ckpt_dir: str | None = None,
                   compute_dtype=jnp.bfloat16, mesh=None):
    """Returns (llm_wrapper, dif_wrapper). With a checkpoint dir, loads
    converted weights (ckpt/convert.py); otherwise random-init (smoke).
    mesh: optional Mesh — stage-2 denoising runs the TP/DP/SP shard_map
    program (parallel/tp_infer.py); a `model` axis also TP-shards the
    stage-1 GPT (its decode is weights-bandwidth bound, so splitting the
    weight reads tp-ways is the one lever that shrinks per-step latency —
    PARITY.md)."""
    if ckpt_dir is not None:
        from landiff_tpu.ckpt import load as ckpt_load

        llm_params = ckpt_load.load_stage1(ckpt_dir, cfg)
        dif_params = ckpt_load.load_stage2(ckpt_dir, cfg)
        tok_dir = None
        for cand in ("t5-v1_1-xxl", "CogVideoX-2b-sat/t5-v1_1-xxl",
                     "flan-t5-xxl"):
            if (Path(ckpt_dir) / cand).exists():
                tok_dir = str(Path(ckpt_dir) / cand)
                break
    else:
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        llm_params = llm_infer.init_params(k1, cfg.llm, cfg.t5)
        dif_params = dif_infer.init_params(k2, cfg)
        tok_dir = None
    real = ckpt_dir is not None
    llm = llm_infer.ArModelInferWrapper(
        llm_params, cfg.llm, cfg.t5, sample_cfg, tokenizer_dir=tok_dir,
        compute_dtype=compute_dtype, require_real_tokenizer=real, mesh=mesh)
    dif = dif_infer.CogModelInferWrapper(
        dif_params, cfg, tokenizer_dir=tok_dir, compute_dtype=compute_dtype,
        require_real_tokenizer=real, mesh=mesh)
    return llm, dif


def run(prompt: str, output_dir: str = "results", seed: int = 42,
        cfg_scale: float = 7.5, motion_score: float = 0.1,
        num_frames: int = 13, tiny: bool = False,
        ckpt_dir: str | None = None, fps: int = 8,
        mesh_spec: str | None = None):
    cfg = tiny_test_config() if tiny else LanDiffConfig()
    if tiny and num_frames % cfg.llm.frames_per_segment != 0:
        # tiny config uses a smaller segment; map "one segment" semantics
        num_frames = cfg.llm.frames_per_segment
    sample_cfg = ARSampleConfig(cfg_scale=cfg_scale,
                                motion_score=motion_score,
                                num_frames=num_frames, seed=seed)
    dtype = jnp.float32 if tiny else jnp.bfloat16
    mesh = None
    if mesh_spec:
        from landiff_tpu.parallel import mesh as mesh_lib

        mesh = mesh_lib.make_mesh(mesh_lib.parse_mesh(mesh_spec))
    llm, dif = build_pipeline(cfg, sample_cfg, seed, ckpt_dir,
                              compute_dtype=dtype, mesh=mesh)

    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    stem = "".join(c if c.isalnum() else "_" for c in prompt[:48])

    t0 = time.time()
    code_task = llm(llm_infer.CodeTask(save_file_name=f"{stem}.npy",
                                       prompt=prompt))
    t1 = time.time()
    np.save(out / f"{stem}_codes.npy", code_task.result)
    logger.info("stage 1: %d codes in %.1fs", len(code_task.result), t1 - t0)

    seg_tokens = cfg.tokenizer.titok.latent_tokens
    n_segments = len(code_task.result) // seg_tokens
    if n_segments > 1:
        # long-video streaming: per-segment chunked diffusion with prefix
        # conditioning + one streaming VAE decode
        from landiff_tpu.pipeline import long_video
        from landiff_tpu.utils import seed_from_text

        context = dif.encode_text(prompt)
        # reference chunking: 7-latent prefix out of 13 (yaml:213); clamp
        # for small test configs
        prefix_latents = min(7, cfg.dit.latent_frames - 1)
        import os

        from landiff_tpu.diffusion import engine as _engine

        latents = long_video.generate_long_video_latents(
            dif.params, cfg, context, jnp.zeros_like(context),
            code_task.result,
            key=jax.random.PRNGKey(seed_from_text(prompt, seed)),
            prefix_latents=prefix_latents,
            compute_dtype=dif.compute_dtype,
            max_steps_per_call=dif.max_steps_per_call, mesh=dif.mesh)
        if os.environ.get("LANDIFF_OFFLOAD") == "1":
            jax.block_until_ready(latents)
            dif.offload_diffusion_params()
        from landiff_tpu.parallel import vae_cp

        n_time = dif.mesh.shape.get("time", 1) if dif.mesh is not None \
            else 1
        if n_time > 1 and vae_cp.can_decode_cp(latents.shape[1], n_time):
            video = _engine.decode_first_stage_cp(
                dif.params["vae"], latents, cfg.vae, dif.mesh,
                compute_dtype=dif.compute_dtype)
        else:
            video = _engine.decode_first_stage(
                dif.params["vae"], latents, cfg.vae,
                compute_dtype=dif.compute_dtype)
        video = _engine.post_process_video(video)
        vid8 = np.asarray(_engine.video_to_uint8(video))
        video_task = dif_infer.VideoTask(
            save_file_name=f"{stem}.mp4", prompt=prompt, seed=seed, fps=fps,
            semantic_token=code_task.result,
            result=vid8.astype(np.float32) / 255.0,
            latent=np.asarray(latents))
    else:
        video_task = dif(dif_infer.VideoTask(
            save_file_name=f"{stem}.mp4", prompt=prompt, seed=seed, fps=fps,
            semantic_token=code_task.result))
    t2 = time.time()
    logger.info("stage 2: video %s in %.1fs", video_task.result.shape,
                t2 - t1)

    save_video_tensor(video_task.result[0], str(out / f"{stem}.mp4"), fps)
    return {"codes": code_task.result, "video": video_task.result,
            "stage1_s": t1 - t0, "stage2_s": t2 - t1}


def main():
    parser = argparse.ArgumentParser(description="LanDiff-TPU text-to-video")
    parser.add_argument("--prompt", required=True)
    parser.add_argument("--output-dir", default="results")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--cfg-scale", type=float, default=7.5)
    parser.add_argument("--motion-score", type=float, default=0.1)
    parser.add_argument("--num-frames", type=int, default=13,
                        help="semantic frames (13 -> 49 RGB)")
    parser.add_argument("--ckpt-dir", default=None,
                        help="converted checkpoint dir (default: "
                             "LANDIFF_HOME resolution)")
    parser.add_argument("--tiny", action="store_true",
                        help="tiny random-init config (no ckpts; smoke)")
    parser.add_argument("--fps", type=int, default=8)
    parser.add_argument("--mesh", default=None,
                        help="device mesh for multi-chip stage-2: "
                             "data=2,model=4 (v5e-8 Megatron TP/DP) or "
                             "data=2,time=4 (sequence-parallel ring-"
                             "attention denoise + temporal-CP VAE)")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    ckpt_dir = args.ckpt_dir
    if ckpt_dir is None and not args.tiny:
        import landiff_tpu

        mp = landiff_tpu.initialize_model_path(required=False)
        ckpt_dir = str(mp) if mp else None
        if ckpt_dir is None:
            logger.warning("no checkpoints found; running random-init "
                           "(output will be noise) — pass --tiny for smoke")
    res = run(args.prompt, args.output_dir, args.seed, args.cfg_scale,
              args.motion_score, args.num_frames, args.tiny, ckpt_dir,
              args.fps, mesh_spec=args.mesh)
    print(f"stage1 {res['stage1_s']:.1f}s stage2 {res['stage2_s']:.1f}s "
          f"video {res['video'].shape}")


if __name__ == "__main__":
    main()
