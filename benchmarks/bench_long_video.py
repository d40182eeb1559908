"""Long-video streaming benchmark (BASELINE staged config #5): 2-segment
prefix-conditioned generation at production size — 2 x 1,218 semantic
tokens -> 13 + 6 latent frames -> 73-frame 480x720 video through ONE
streaming VAE decode (pipeline/long_video.py; reference mechanism
sampling.py:800-817 + dif_infer.py:245-271).

Warm timing (per-segment diffusion programs + VAE chunk programs compiled
by a first full pass). Prints ONE JSON line.

Env: LANDIFF_LV_SEGMENTS (default 2), LANDIFF_E2E_CHUNK (default 5),
LANDIFF_LV_WARM_SEGMENTS (default = LANDIFF_LV_SEGMENTS) — the warm pass
only needs to compile both segment programs (the seg-0 program and the
prefix-conditioned program used by every later segment), so 2 warm
segments suffice for an N-segment timed run (BASELINE staged config #5
is 200+ frames = 8 segments; a full 8-segment warm pass would waste
~35 min of device time re-running already-compiled programs).
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from landiff_tpu.utils import enable_compile_cache
enable_compile_cache()


def main():
    from landiff_tpu.config import LanDiffConfig
    from landiff_tpu.diffusion import engine
    from landiff_tpu.pipeline import long_video

    cfg = LanDiffConfig()
    # LANDIFF_LV_STEPS (default 50): reduced-step runs isolate per-segment
    # overheads (assembly/recompile/fetch) from the step compute
    lv_steps = int(os.environ.get("LANDIFF_LV_STEPS", "0"))
    if lv_steps:
        import dataclasses

        cfg = dataclasses.replace(cfg, sampler=dataclasses.replace(
            cfg.sampler, num_steps=lv_steps))
    dt = jnp.bfloat16
    n_seg = int(os.environ.get("LANDIFF_LV_SEGMENTS", "2"))
    n_warm = int(os.environ.get("LANDIFF_LV_WARM_SEGMENTS", str(n_seg)))
    chunk = int(os.environ.get("LANDIFF_E2E_CHUNK", "5"))
    os.environ.setdefault("LANDIFF_VAE_FIRST_CHUNK", "1")

    from landiff_tpu.models import dit as dit_lib
    from landiff_tpu.models import semantic_cond as sc_lib
    from landiff_tpu.models import vae as vae_lib

    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    dif_params = {
        "main": dit_lib.init(ks[0], cfg.dit, dtype=dt),
        "control": dit_lib.init(ks[1], cfg.dit, control=True, dtype=dt),
        "semantic": sc_lib.init(ks[2], cfg.tokenizer, cfg.semantic_cond, dt),
    }
    ctx = jax.random.normal(jax.random.PRNGKey(1),
                            (1, cfg.dit.text_length, cfg.dit.text_dim), dt)
    seg_tokens = cfg.tokenizer.titok.latent_tokens
    codes = np.asarray(jax.random.randint(
        jax.random.PRNGKey(2), (n_seg * seg_tokens,), 0,
        cfg.tokenizer.vq.codebook_size))

    def gen(key, ncodes, seg_times=None):
        marks = [time.time()]

        def on_segment(seg, lat):
            marks.append(time.time())
            if seg_times is not None:
                seg_times.append(round(marks[-1] - marks[-2], 2))
            print(f"  segment {seg + 1}: {marks[-1] - marks[-2]:.1f}s "
                  f"latents {lat.shape}", flush=True)

        t0 = time.time()
        latents = long_video.generate_long_video_latents(
            dif_params, cfg, ctx, jnp.zeros_like(ctx), codes[:ncodes],
            key=key, compute_dtype=dt, attn_impl="pallas",
            max_steps_per_call=chunk, on_segment=on_segment)
        jax.block_until_ready(latents)
        return time.time() - t0, latents

    # warm pass compiles BOTH segment programs (seg 0 + prefix-conditioned)
    gen(jax.random.PRNGKey(3), n_warm * seg_tokens)
    seg_times = []
    t_diff, latents = gen(jax.random.PRNGKey(4), len(codes), seg_times)
    lat_np = np.asarray(latents)

    # free the ~6 GB diffusion-side params before the VAE decode — the
    # production single-chip offload point (dif_infer.py
    # offload_diffusion_params; reference swaps models CPU<->GPU,
    # infer_video.py:83-85)
    del dif_params, latents
    vaep = vae_lib.init(ks[3], cfg.vae, dtype=dt)

    def dec():
        t0 = time.time()
        video = engine.decode_first_stage(vaep, jnp.asarray(lat_np),
                                          cfg.vae, compute_dtype=dt)
        vid8 = np.asarray(engine.video_to_uint8(
            engine.post_process_video(video)))
        return time.time() - t0, vid8.shape

    dec()                                           # compile + warm
    t_vae, vid_shape = dec()

    print(json.dumps({
        "metric": f"long_video_s_{vid_shape[2]}f_480p",
        "value": round(t_diff + t_vae, 2),
        "unit": "s",
        "vs_baseline": None,
        "segments": n_seg,
        "phases": {"chunked_diffusion": round(t_diff, 2),
                   "streaming_vae": round(t_vae, 2)},
        "segment_s": seg_times,
        "latents": list(lat_np.shape), "video": list(vid_shape),
    }))


if __name__ == "__main__":
    main()
