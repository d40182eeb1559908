"""End-to-end full-size benchmark on one chip: T5 encode -> 1,244-step AR
decode -> 50-step ControlNet DiT diffusion -> streaming VAE decode.
Random-init weights (no ckpts in this environment) — measures the complete
compute path at production shapes (BASELINE config #4 geometry).

Stages are built/freed sequentially to fit one 16GB chip (the reference
swaps models CPU<->GPU for the same reason, infer_video.py:83-85)."""

import gc
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/landiff_jax_cache")

from landiff_tpu.config import ARSampleConfig, LanDiffConfig
from landiff_tpu.diffusion import engine
from landiff_tpu.models import dit as dit_lib
from landiff_tpu.models import lm as lm_lib
from landiff_tpu.models import semantic_cond as sc_lib
from landiff_tpu.models import t5 as t5_lib
from landiff_tpu.models import vae as vae_lib


def sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


def main():
    cfg = LanDiffConfig()
    dt = jnp.bfloat16
    num_steps = int(os.environ.get("LANDIFF_E2E_STEPS", "50"))
    import dataclasses

    cfg = dataclasses.replace(cfg, sampler=dataclasses.replace(
        cfg.sampler, num_steps=num_steps))
    timings = {}

    # ---- T5 text encode (both stages use a T5-XXL encode; ~identical cost)
    t0 = time.time()
    t5p = t5_lib.init(jax.random.PRNGKey(0), cfg.t5, dtype=dt)
    ids = jnp.zeros((1, cfg.dit.text_length), jnp.int32)
    ctx = t5_lib.encode(t5p, ids, None, cfg.t5, compute_dtype=dt)
    sync(ctx)
    timings["t5_encode_s"] = time.time() - t0
    ctx = jnp.asarray(np.asarray(ctx, np.float32))  # keep, free params
    del t5p
    gc.collect()

    # ---- stage 1: constrained AR decode (CFG rows=2)
    t0 = time.time()
    lmp = lm_lib.init(jax.random.PRNGKey(1), cfg.llm, t5_dim=cfg.t5.d_model,
                      dtype=dt)
    prefix_len = 1 + 2 + 120 + 1
    sched = lm_lib.build_schedule(cfg.llm, prefix_len, 13)
    rows = jnp.zeros((2, prefix_len, cfg.llm.hidden_size), dt)
    codes = lm_lib.sample(lmp, cfg.llm, sched, rows,
                          ARSampleConfig(cfg_scale=7.5),
                          rng_key=jax.random.PRNGKey(2), compute_dtype=dt,
                          cache_dtype=dt)
    timings["stage1_s"] = time.time() - t0
    del lmp
    gc.collect()

    # ---- stage 2: semantic cond + 50-step diffusion
    t0 = time.time()
    main_p = dit_lib.init(jax.random.PRNGKey(3), cfg.dit, dtype=dt)
    ctrl_p = dit_lib.init(jax.random.PRNGKey(4), cfg.dit, control=True,
                          dtype=dt)
    sem_p = sc_lib.init(jax.random.PRNGKey(5), cfg.tokenizer,
                        cfg.semantic_cond, dtype=dt)
    tokens = jnp.asarray(codes).reshape(1, -1)
    uc = jnp.zeros_like(ctx)
    denoise_fn = engine.make_denoise_fn(
        main_p, ctrl_p, sem_p, cfg.dit, cfg.sampler, cfg.tokenizer,
        cfg.semantic_cond, ctx.astype(dt), uc.astype(dt), tokens,
        compute_dtype=dt, attn_impl="pallas")
    latents = engine.sample_latents(denoise_fn, cfg.sampler, cfg.dit,
                                    key=jax.random.PRNGKey(6))
    sync(latents)
    timings["stage2_diffusion_s"] = time.time() - t0
    latents = jnp.asarray(np.asarray(latents))
    del main_p, ctrl_p, sem_p
    gc.collect()

    # ---- VAE streaming decode
    t0 = time.time()
    vaep = vae_lib.init(jax.random.PRNGKey(7), cfg.vae, dtype=dt)
    video = engine.decode_first_stage(vaep, latents, cfg.vae,
                                      compute_dtype=dt)
    sync(video)
    timings["vae_decode_s"] = time.time() - t0

    total = sum(timings.values())
    print(json.dumps({
        "metric": "e2e_sec_per_video_49f_480p",
        "value": round(total, 2),
        "unit": "s",
        "vs_baseline": None,
    }))
    print("#", json.dumps({k: round(v, 2) for k, v in timings.items()}),
          "video", list(video.shape), f"steps={num_steps}")


if __name__ == "__main__":
    main()
