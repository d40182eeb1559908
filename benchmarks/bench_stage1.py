"""Stage-1 AR decode benchmark: full-size LLM (24x2048, CFG rows=2),
1,244-step constrained decode as one jitted fori_loop.

The reference runs this as a Python loop of ~1,244 sequential
forward+sample steps on GPU (lm_model.py:408-508) — its dominant stage-1
cost. Here the whole loop is one XLA program.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from landiff_tpu.utils import enable_compile_cache
enable_compile_cache()

from landiff_tpu.config import ARSampleConfig, LLMConfig
from landiff_tpu.models import lm


def main():
    cfg = LLMConfig()
    dt = jnp.bfloat16
    params = lm.init(jax.random.PRNGKey(0), cfg, t5_dim=4096, dtype=dt)
    if os.environ.get("LANDIFF_DECODE_INT4") == "1":
        from landiff_tpu.models import gpt as gpt_lib

        params = dict(params)
        params["gpt"] = gpt_lib.quantize_int4(params["gpt"])
        print("# int4 weight-only GPT decode (group=128)", flush=True)
    elif os.environ.get("LANDIFF_DECODE_INT8") == "1":
        from landiff_tpu.models import gpt as gpt_lib

        params = dict(params)
        params["gpt"] = gpt_lib.quantize_int8(params["gpt"])
        print("# int8 weight-only GPT decode", flush=True)
    text_len = int(os.environ.get("LANDIFF_BENCH_TEXT_LEN", "120"))
    prefix_len = 1 + 2 + text_len + 1
    num_frames = int(os.environ.get("LANDIFF_BENCH_FRAMES", "13"))
    sched = lm.build_schedule(cfg, prefix_len, num_frames)
    rows = jnp.zeros((2, prefix_len, cfg.hidden_size), dt)
    scfg = ARSampleConfig(cfg_scale=7.5, num_frames=num_frames)

    batch = int(os.environ.get("LANDIFF_BENCH_DECODE_BATCH", "0"))
    if batch > 0:
        return bench_batched(params, cfg, sched, scfg, batch, prefix_len, dt)

    t0 = time.time()
    codes = lm.sample(params, cfg, sched, rows, scfg,
                      rng_key=jax.random.PRNGKey(1), compute_dtype=dt,
                      cache_dtype=dt)
    compile_s = time.time() - t0
    times = []
    for i in range(2):
        t = time.time()
        codes = lm.sample(params, cfg, sched, rows, scfg,
                          rng_key=jax.random.PRNGKey(2 + i),
                          compute_dtype=dt, cache_dtype=dt)
        times.append(time.time() - t)
    total_s = min(times)
    steps = sched.full_len - sched.prefix_len
    print(json.dumps({
        "metric": "stage1_ar_decode_s",
        "value": round(total_s, 3),
        "unit": f"s/{steps}steps",
        "vs_baseline": None,
    }))
    print(f"# compile {compile_s:.1f}s, {steps} steps, "
          f"{total_s / steps * 1e3:.2f} ms/step, codes {codes.shape}")


def bench_batched(params, cfg, sched, scfg, n_prompts, prefix_len, dt):
    """Batched multi-prompt decode (lm.sample_batch): N prompts, 2N CFG rows,
    one jitted while_loop. Validates the serving-throughput claim from the
    stage-1 floor analysis (PARITY.md): decode at rows<=2 is MXU-occupancy
    bound on the weight tiles, so batching amortizes the per-step tile loads
    near-flat. LANDIFF_BENCH_DECODE_BATCH=N selects this path."""
    rows = jnp.zeros((2 * n_prompts, prefix_len, cfg.hidden_size), dt)
    pad = np.zeros((2 * n_prompts,), np.int32)
    keys = jnp.stack([jax.random.PRNGKey(10 + n) for n in range(n_prompts)])

    t0 = time.time()
    codes = lm.sample_batch(params, cfg, sched, rows, pad, scfg,
                            rng_keys=keys, compute_dtype=dt, cache_dtype=dt)
    compile_s = time.time() - t0
    times = []
    for i in range(2):
        keys_i = jnp.stack([jax.random.PRNGKey(100 * i + n)
                            for n in range(n_prompts)])
        t = time.time()
        codes = lm.sample_batch(params, cfg, sched, rows, pad, scfg,
                                rng_keys=keys_i, compute_dtype=dt,
                                cache_dtype=dt)
        times.append(time.time() - t)
    total_s = min(times)
    steps = sched.full_len - sched.prefix_len
    print(json.dumps({
        "metric": f"stage1_batched_decode_s_n{n_prompts}",
        "value": round(total_s, 3),
        "unit": f"s/{steps}steps",
        "vs_baseline": None,
    }))
    print(f"# batch={n_prompts} prompts ({2 * n_prompts} rows), "
          f"compile {compile_s:.1f}s, {total_s / steps * 1e3:.2f} ms/step, "
          f"{n_prompts / total_s:.3f} prompts/s, "
          f"codes[0] {np.asarray(codes[0]).shape}")


if __name__ == "__main__":
    main()
