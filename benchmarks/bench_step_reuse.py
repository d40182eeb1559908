"""Cross-step model-output reuse (LANDIFF_STEP_REUSE) at production scale:
time the FULL 50-step diffusion phase (BASELINE config #4 geometry —
30L+15L ControlNet DiT, S=17776, CFG batch 2, bf16, int8-scores attention
default) exact vs reuse_every=k in ONE process with shared random-init
weights, and report the latent agreement between the two runs (same PRNG
key => identical noise path, so the difference is purely the reused model
outputs).

The reuse feature is the FORA/TeaCache family of training-free DiT caches
(quality-affecting, opt-in, OFF by default) — the reference always calls
the network every step (sampling.py:678-837). See
samplers.vpsde_dpmpp2m_sample and DEPLOYMENT.md.

Warm = one full untimed production-schedule pass per mode. (A 5-step warm
schedule compiles a DIFFERENT executable — the coefficient tables are
traced at length 5 vs length 50 — so the timed pass would pay the first
remote executable load, ~30-50 s through the axon tunnel, inside its
window; measured r5, see bench_cfg_window.py and PARITY.md.)

Env: LANDIFF_BENCH_SCALE (shrink the model for CPU smoke),
     LANDIFF_BENCH_REUSE_STEPS (timed steps, default 50),
     LANDIFF_STEP_REUSE_K (k for the reuse run, default 2).
"""

import dataclasses
import json
import os
import time

SCALE = float(os.environ.get("LANDIFF_BENCH_SCALE", "1"))


def _config(num_steps):
    from landiff_tpu.config import LanDiffConfig, tiny_test_config

    if SCALE >= 1:
        cfg = LanDiffConfig()
    else:
        cfg = tiny_test_config()
    return dataclasses.replace(cfg, sampler=dataclasses.replace(
        cfg.sampler, num_steps=num_steps))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from landiff_tpu.utils import enable_compile_cache
    enable_compile_cache()
    from landiff_tpu.diffusion import engine
    from landiff_tpu.models import dit as dit_lib
    from landiff_tpu.models import semantic_cond as sc_lib

    n = int(os.environ.get("LANDIFF_BENCH_REUSE_STEPS", "50"))
    k = int(os.environ.get("LANDIFF_STEP_REUSE_K", "2"))
    chunk = 5
    cfg = _config(n)
    dt = jnp.bfloat16
    d, t = cfg.dit, cfg.tokenizer
    n_sem = t.titok.iframe_latent_tokens + \
        (t.titok.temporal_size - 1) * t.titok.pframe_latent_tokens
    ctx = jax.random.normal(jax.random.PRNGKey(0),
                            (1, d.text_length, d.text_dim), dt)
    codes = jax.random.randint(jax.random.PRNGKey(1), (1, n_sem), 0,
                               t.vq.codebook_size)
    from landiff_tpu import utils
    main_p = dit_lib.init(jax.random.PRNGKey(3), d, dtype=dt)
    ctrl_p = dit_lib.init(jax.random.PRNGKey(4), d, control=True, dtype=dt)
    sem_p = sc_lib.init(jax.random.PRNGKey(5), t, cfg.semantic_cond,
                        dtype=dt)
    # fill adaLN/zero_linear leaves: at raw init the DiT output is
    # INDEPENDENT of attention/MLP/control paths (CLAUDE.md vacuous-pass
    # rule) and the drift signal would come from a degenerate denoiser
    main_p = utils.fill_zero_leaves(main_p, jax.random.PRNGKey(13))
    ctrl_p = utils.fill_zero_leaves(ctrl_p, jax.random.PRNGKey(14))
    sem_p = utils.fill_zero_leaves(sem_p, jax.random.PRNGKey(15))
    attn = "pallas" if SCALE >= 1 else "reference"
    denoise_fn, bundle = engine.make_denoise_fn(
        main_p, ctrl_p, sem_p, d, cfg.sampler, t, cfg.semantic_cond,
        ctx, jnp.zeros_like(ctx), codes, compute_dtype=dt, attn_impl=attn)

    def run(reuse_every, sampler_cfg, key=7):
        lat = engine.sample_latents(
            denoise_fn, sampler_cfg.sampler, d, key=jax.random.PRNGKey(key),
            bundle=bundle, max_steps_per_call=chunk, reuse_every=reuse_every)
        return np.asarray(lat, dtype=np.float32)

    results = {}
    lats = {}
    for mode, r in (("exact", 0), (f"reuse_{k}", k)):
        run(r, cfg)  # compile + load the exact timed executables, untimed
        t0 = time.time()
        lats[mode] = run(r, cfg)
        results[mode] = time.time() - t0

    a, b = lats["exact"].ravel(), lats[f"reuse_{k}"].ravel()
    corr = float(np.corrcoef(a, b)[0, 1])
    rel = float(np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-12))
    from landiff_tpu.diffusion import samplers
    computed = int(samplers.reuse_compute_schedule(n, k).sum())
    exact_s, reuse_s = results["exact"], results[f"reuse_{k}"]
    print(json.dumps({
        "metric": "diffusion_phase_step_reuse",
        "steps": n, "reuse_every": k, "computed_steps": computed,
        "exact_s": round(exact_s, 2), "reuse_s": round(reuse_s, 2),
        "speedup": round(exact_s / max(reuse_s, 1e-9), 3),
        "latent_corr_vs_exact": round(corr, 5),
        "latent_rel_err": round(rel, 5),
        "note": "random-init weights; corr is a mechanics-level drift "
                "signal, not a quality claim",
    }))


if __name__ == "__main__":
    main()
