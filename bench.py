"""Benchmark: full-size stage-2 CFG denoise step (main 30L + control 15L
DiT, batch 2, bf16, S = 226 + 17550 tokens) on one TPU chip — the hot loop
of LanDiff generation (50 steps/video, SURVEY §6).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: estimated A100 PyTorch reference time for the same step /
measured time (>1 means faster than the reference estimate). The reference
publishes no timings (BASELINE.md); the estimate assumes the documented
~0.36 PFLOP/step at 35% MFU on A100 bf16 (312 TFLOP/s) => ~3.3 s/step.

Env knobs: LANDIFF_BENCH_SCALE (default 1.0 — fraction of full model size),
LANDIFF_BENCH_ATTN (pallas|xla, default pallas).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/landiff_jax_cache")

A100_REF_STEP_MS = 3300.0


def main():
    from landiff_tpu.config import DiTConfig
    from landiff_tpu.models import dit as dit_lib

    scale = float(os.environ.get("LANDIFF_BENCH_SCALE", "1.0"))
    attn = os.environ.get("LANDIFF_BENCH_ATTN", "pallas")
    cfg = DiTConfig()
    if scale < 1.0:
        cfg = dataclasses.replace(
            cfg,
            num_layers=max(2, int(cfg.num_layers * scale)),
            control_layers=max(1, int(cfg.control_layers * scale)),
            hidden_size=max(128, int(cfg.hidden_size * scale) // 64 * 64),
            num_heads=max(2, int(cfg.num_heads * scale)),
        )

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    main_p = dit_lib.init(key, cfg, dtype=dt)
    ctrl_p = dit_lib.init(jax.random.PRNGKey(1), cfg, control=True, dtype=dt)

    B = 2  # CFG batch [uncond, cond]
    x = jax.random.normal(jax.random.PRNGKey(2),
                          (B, cfg.latent_frames, cfg.in_channels,
                           cfg.latent_height, cfg.latent_width), dt)
    ts = jnp.full((B,), 999.0, jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(3),
                            (B, cfg.text_length, cfg.text_dim), dt)
    sem = jnp.zeros_like(x)

    def denoise_step(main_p, ctrl_p, x, ts, ctx, sem):
        net = dit_lib.control_warp_forward(
            main_p, ctrl_p, x, ts, ctx, cfg, sem, attn_impl=attn,
            compute_dtype=dt)
        alpha = jnp.float32(0.5)
        return net.astype(jnp.float32) * (-jnp.sqrt(1 - alpha ** 2)) \
            + x.astype(jnp.float32) * alpha

    N = int(os.environ.get("LANDIFF_BENCH_STEPS", "4"))

    @jax.jit
    def chained(main_p, ctrl_p, x, ts, ctx, sem):
        # N denoise steps chained on-device (returns one scalar so the
        # host fetch through the remote tunnel doesn't dominate timing)
        def body(_, xc):
            out = denoise_step(main_p, ctrl_p, xc.astype(dt), ts, ctx, sem)
            return out.astype(dt)
        out = jax.lax.fori_loop(0, N, body, x)
        return jnp.sum(out.astype(jnp.float32))

    import numpy as np

    t0 = time.time()
    float(np.asarray(chained(main_p, ctrl_p, x, ts, ctx, sem)))
    compile_s = time.time() - t0

    times = []
    for _ in range(3):
        t = time.time()
        float(np.asarray(chained(main_p, ctrl_p, x, ts, ctx, sem)))
        times.append((time.time() - t) / N)
    step_ms = sorted(times)[len(times) // 2] * 1e3

    # honest scaling of the baseline estimate when benching a reduced model
    ref_ms = A100_REF_STEP_MS * (scale ** 3 if scale < 1.0 else 1.0)
    print(json.dumps({
        # "_estbase" marks that vs_baseline divides by an ESTIMATED A100
        # reference step time (35% MFU), since the reference publishes no
        # timings (BASELINE.md).
        "metric": "dit_cfg_denoise_step_ms_estbase" + (
            "" if scale == 1.0 else f"_scale{scale}"),
        "value": round(step_ms, 2),
        "unit": "ms",
        "vs_baseline": round(ref_ms / step_ms, 3),
        "baseline_kind": "estimate_a100_35pct_mfu",
    }))
    print(f"# compile {compile_s:.1f}s, runs {['%.3f' % t for t in times]}, "
          f"attn={attn}, devices={jax.devices()}")


if __name__ == "__main__":
    main()
