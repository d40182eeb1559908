"""Training-step benchmark: ONE ControlNet train step at production
shapes (30L frozen main + 15L trainable control + semantic conditioner,
S = 226 + 17550, B = 1) on one 16 GB v5e chip.

Feasibility levers: per-layer jax.checkpoint (models/dit.py remat),
bf16 params, Adafactor (factored second moment — AdamW's f32 m+v alone
would be ~8 GB), donated control params + opt state.

Prints ONE JSON line. Env: LANDIFF_TRAIN_BATCH (default 1).
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from landiff_tpu.utils import enable_compile_cache
enable_compile_cache()


def main():
    from landiff_tpu.config import LanDiffConfig
    from landiff_tpu.models import dit as dit_lib
    from landiff_tpu.models import semantic_cond as sc_lib
    from landiff_tpu.training import diffusion_loss

    cfg = LanDiffConfig()
    dt = jnp.bfloat16
    B = int(os.environ.get("LANDIFF_TRAIN_BATCH", "1"))
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    main_p = dit_lib.init(ks[0], cfg.dit, dtype=dt)
    ctrl_p = dit_lib.init(ks[1], cfg.dit, control=True, dtype=dt)
    sem_p = sc_lib.init(ks[2], cfg.tokenizer, cfg.semantic_cond, dtype=dt)

    optimizer = optax.adafactor(1e-4)
    opt_state = optimizer.init(ctrl_p)
    step = diffusion_loss.make_train_step(
        optimizer, cfg.dit, cfg.sampler, cfg.tokenizer, cfg.semantic_cond,
        compute_dtype=dt, remat=True)
    step = jax.jit(step, donate_argnums=(0, 1))

    d = cfg.dit
    latents = jax.random.normal(jax.random.PRNGKey(1),
                                (B, d.latent_frames, d.in_channels,
                                 d.latent_height, d.latent_width))
    context = jax.random.normal(jax.random.PRNGKey(2),
                                (B, d.text_length, d.text_dim), dt)
    n_tok = cfg.tokenizer.titok.latent_tokens
    tokens = jax.random.randint(jax.random.PRNGKey(3), (B, n_tok), 0,
                                cfg.tokenizer.vq.codebook_size)

    t0 = time.time()
    ctrl_p, opt_state, loss = step(ctrl_p, opt_state, main_p, sem_p,
                                   latents, context, tokens,
                                   jax.random.PRNGKey(4))
    l0 = float(np.asarray(loss))
    compile_s = time.time() - t0
    times = []
    for i in range(2):
        t0 = time.time()
        ctrl_p, opt_state, loss = step(ctrl_p, opt_state, main_p, sem_p,
                                       latents, context, tokens,
                                       jax.random.PRNGKey(5 + i))
        lf = float(np.asarray(loss))
        times.append(time.time() - t0)
    print(json.dumps({
        "metric": "dit_controlnet_train_step_s_production",
        "value": round(min(times), 3),
        "unit": "s/step",
        "vs_baseline": None,
        "batch": B,
        "loss_first": round(l0, 4), "loss_last": round(lf, 4),
        "notes": "1x v5e 16GB, bf16, remat per layer, Adafactor, "
                 "frozen 30L main + trainable 15L control",
    }))
    print(f"# compile {compile_s:.1f}s, steps {times}")


if __name__ == "__main__":
    main()
