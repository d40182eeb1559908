"""End-to-end full-size benchmark: T5 encode -> 1,244-step AR decode ->
50-step ControlNet DiT diffusion -> streaming VAE decode, at production
shapes (BASELINE config #4 geometry), random-init weights.

Each phase runs in its OWN process (driver mode) so the 16GB chip is clean
between the big models — the reference swaps models CPU<->GPU for the same
reason (infer_video.py:83-85). Intermediate tensors hand off via /tmp npy.

Usage: python benchmarks/bench_e2e.py            # driver (all phases)
       LANDIFF_E2E_PHASE=stage1 python ...        # single phase
"""

import json
import os
import subprocess
import sys
import time

WORK = "/tmp/landiff_e2e"


def _phase_t5():
    import jax, jax.numpy as jnp, numpy as np
    from landiff_tpu.utils import enable_compile_cache
    enable_compile_cache()
    from landiff_tpu.config import LanDiffConfig
    from landiff_tpu.models import t5 as t5_lib

    cfg = LanDiffConfig()
    dt = jnp.bfloat16
    t5p = t5_lib.init(jax.random.PRNGKey(0), cfg.t5, dtype=dt)
    ids = jnp.zeros((1, cfg.dit.text_length), jnp.int32)
    # warm
    ctx = t5_lib.encode(t5p, ids, None, cfg.t5, compute_dtype=dt)
    np.asarray(ctx)
    t0 = time.time()
    ctx = t5_lib.encode(t5p, ids, None, cfg.t5, compute_dtype=dt)
    ctx_np = np.asarray(ctx, dtype=np.float32)
    dt_s = time.time() - t0
    np.save(f"{WORK}/ctx.npy", ctx_np)
    print(json.dumps({"phase": "t5", "seconds": dt_s}))


def _phase_stage1():
    import jax, jax.numpy as jnp, numpy as np
    from landiff_tpu.utils import enable_compile_cache
    enable_compile_cache()
    from landiff_tpu.config import ARSampleConfig, LanDiffConfig
    from landiff_tpu.models import lm as lm_lib

    cfg = LanDiffConfig()
    dt = jnp.bfloat16
    lmp = lm_lib.init(jax.random.PRNGKey(1), cfg.llm, t5_dim=cfg.t5.d_model,
                      dtype=dt)
    from landiff_tpu.utils import env_flag

    if env_flag("LANDIFF_DECODE_INT8"):  # LANDIFF_FAST=1 flips this too
        from landiff_tpu.models import gpt as gpt_lib

        lmp = dict(lmp)
        lmp["gpt"] = gpt_lib.quantize_int8(lmp["gpt"])
    prefix_len = 1 + 2 + 120 + 1
    sched = lm_lib.build_schedule(cfg.llm, prefix_len, 13)
    rows = jnp.zeros((2, prefix_len, cfg.llm.hidden_size), dt)
    scfg = ARSampleConfig(cfg_scale=7.5)
    codes = lm_lib.sample(lmp, cfg.llm, sched, rows, scfg,
                          rng_key=jax.random.PRNGKey(2), compute_dtype=dt,
                          cache_dtype=dt)  # warm/compile
    t0 = time.time()
    codes = lm_lib.sample(lmp, cfg.llm, sched, rows, scfg,
                          rng_key=jax.random.PRNGKey(3), compute_dtype=dt,
                          cache_dtype=dt)
    dt_s = time.time() - t0
    np.save(f"{WORK}/codes.npy", np.asarray(codes))
    print(json.dumps({"phase": "stage1", "seconds": dt_s,
                      "steps": int(sched.full_len - sched.prefix_len)}))


def _phase_diffusion():
    import jax, jax.numpy as jnp, numpy as np
    from landiff_tpu.utils import enable_compile_cache
    enable_compile_cache()
    import dataclasses

    from landiff_tpu.config import LanDiffConfig
    from landiff_tpu.diffusion import engine
    from landiff_tpu.models import dit as dit_lib
    from landiff_tpu.models import semantic_cond as sc_lib

    num_steps = int(os.environ.get("LANDIFF_E2E_STEPS", "50"))
    cfg = LanDiffConfig()
    cfg = dataclasses.replace(cfg, sampler=dataclasses.replace(
        cfg.sampler, num_steps=num_steps))
    dt = jnp.bfloat16
    ctx = jnp.asarray(np.load(f"{WORK}/ctx.npy"), dt)
    codes = jnp.asarray(np.load(f"{WORK}/codes.npy")).reshape(1, -1)
    main_p = dit_lib.init(jax.random.PRNGKey(3), cfg.dit, dtype=dt)
    ctrl_p = dit_lib.init(jax.random.PRNGKey(4), cfg.dit, control=True,
                          dtype=dt)
    from landiff_tpu.utils import env_flag

    if env_flag("LANDIFF_DIT_INT8"):  # W8A8 opt-in; LANDIFF_FAST=1 preset
        main_p = dit_lib.quantize_int8(main_p)
        ctrl_p = dit_lib.quantize_int8(ctrl_p)
    sem_p = sc_lib.init(jax.random.PRNGKey(5), cfg.tokenizer,
                        cfg.semantic_cond, dtype=dt)
    denoise_fn, bundle = engine.make_denoise_fn(
        main_p, ctrl_p, sem_p, cfg.dit, cfg.sampler, cfg.tokenizer,
        cfg.semantic_cond, ctx, jnp.zeros_like(ctx), codes,
        compute_dtype=dt, attn_impl="pallas")
    chunk = int(os.environ.get("LANDIFF_E2E_CHUNK", "5"))
    # warm: compile the chunked-scan programs
    np.asarray(engine.sample_latents(denoise_fn, cfg.sampler, cfg.dit,
                                     key=jax.random.PRNGKey(5),
                                     bundle=bundle,
                                     max_steps_per_call=chunk))
    t0 = time.time()
    latents = engine.sample_latents(denoise_fn, cfg.sampler, cfg.dit,
                                    key=jax.random.PRNGKey(6), bundle=bundle,
                                    max_steps_per_call=chunk)
    lat_np = np.asarray(latents)
    dt_s = time.time() - t0
    np.save(f"{WORK}/latents.npy", lat_np)
    print(json.dumps({"phase": "diffusion", "seconds": dt_s,
                      "steps": num_steps}))


def _phase_vae():
    import jax, jax.numpy as jnp, numpy as np
    from landiff_tpu.utils import enable_compile_cache
    enable_compile_cache()
    from landiff_tpu.config import LanDiffConfig
    from landiff_tpu.diffusion import engine
    from landiff_tpu.models import vae as vae_lib

    cfg = LanDiffConfig()
    dt = jnp.bfloat16
    latents = jnp.asarray(np.load(f"{WORK}/latents.npy"))
    vaep = vae_lib.init(jax.random.PRNGKey(7), cfg.vae, dtype=dt)
    # warm: compile every per-chunk program shape (like the other phases)
    np.asarray(engine.decode_first_stage(vaep, latents, cfg.vae,
                                         compute_dtype=dt))
    t0 = time.time()
    video = engine.decode_first_stage(vaep, latents, cfg.vae,
                                      compute_dtype=dt)
    video = engine.post_process_video(video)
    vid_np = np.asarray(engine.video_to_uint8(video))  # production fetch
    dt_s = time.time() - t0
    print(json.dumps({"phase": "vae", "seconds": dt_s,
                      "video": list(vid_np.shape)}))


PHASES = {"t5": _phase_t5, "stage1": _phase_stage1,
          "diffusion": _phase_diffusion, "vae": _phase_vae}


def main():
    phase = os.environ.get("LANDIFF_E2E_PHASE")
    if phase:
        PHASES[phase]()
        return
    os.makedirs(WORK, exist_ok=True)
    results = {}
    for name in ("t5", "stage1", "diffusion", "vae"):
        env = dict(os.environ, LANDIFF_E2E_PHASE=name)
        # 16GB single chip: cap VAE programs at 8 output frames
        env.setdefault("LANDIFF_VAE_FIRST_CHUNK", "1")
        out = subprocess.run([sys.executable, __file__], env=env,
                             capture_output=True, text=True)
        line = [l for l in out.stdout.splitlines()
                if l.startswith("{")][-1] if "{" in out.stdout else None
        if line is None:
            print(f"# phase {name} FAILED:\n{out.stdout[-800:]}\n"
                  f"{out.stderr[-800:]}", file=sys.stderr)
            sys.exit(1)
        rec = json.loads(line)
        results[name] = rec["seconds"]
        print("#", line)
    total = sum(results.values())
    # ESTIMATED single-A100 reference e2e (the reference publishes no
    # timings, BASELINE.md): diffusion 50 x ~3.3 s (0.36 PFLOP/step at
    # 35% MFU bf16), stage-1 ~15 s (1,244-step Python loop, weights-
    # bandwidth + launch overhead), T5 ~1 s, chunked VAE decode + CPU
    # moves ~15 s => ~196 s.
    a100_est = {"t5": 1.0, "stage1": 15.0, "diffusion": 165.0, "vae": 15.0}
    record = {
        "metric": "e2e_sec_per_video_49f_480p_estbase",
        "value": round(total, 2),
        "unit": "s",
        "vs_baseline": round(sum(a100_est.values()) / total, 3),
        "baseline_kind": "estimate_a100_per_phase",
        "baseline_phases_est": a100_est,
        "phases": {k: round(v, 2) for k, v in results.items()},
    }
    from landiff_tpu.utils import fast_level

    if fast_level():
        record["preset"] = f"LANDIFF_FAST={fast_level()}"
    # driver-consumable per-phase artifact
    out_path = os.environ.get(
        "LANDIFF_E2E_JSON",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "E2E.json"))
    with open(out_path, "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
