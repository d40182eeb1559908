"""Hardware training certification: overfit ONE fixed batch at production
shapes (30L frozen main + 15L trainable control + semantic conditioner,
B=1, S=226+17550) on one v5e chip and show the loss actually LEARNS
(drop >= 5x from step 0 — VERDICT r4 #3).

Why this exists: tests/test_training.py certifies loss-decrease only on
tiny CPU models, and TRAIN.json's 5-step production run only proves the
step executes. The Pallas fused flash backward (ops/attention.py) is
custom kernel code — a production-shape overfit is the end-to-end
gradient-correctness evidence for it.

Protocol: one fixed (latents, context, tokens) batch and a FIXED loss key
(same sigma index + same noise every step) -> a deterministic regression
target; reference loss spec: sgm loss.py:98-202 (v-pred, 1/(1-acp^2)
weighting). Each step is one ~9.4 s device execution (well under the
60-90 s remote-worker limit; CLAUDE.md) — looped from the host, loss
fetched as one f32 scalar per step.

Prints ONE JSON line and writes TRAIN_OVERFIT.json at the repo root.
Env: LANDIFF_OVERFIT_STEPS (default 150), LANDIFF_OVERFIT_LR (default
3e-3 Adafactor), LANDIFF_OVERFIT_KEYS (fixed-key cycle length, default 1
= the strict one-target protocol), LANDIFF_BENCH_SCALE (<1 shrinks the
model for CPU smoke), LANDIFF_TRAIN_BATCH.
"""

import json
import os
import time

SCALE = float(os.environ.get("LANDIFF_BENCH_SCALE", "1"))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from landiff_tpu.utils import enable_compile_cache
    enable_compile_cache()
    from landiff_tpu.config import LanDiffConfig, tiny_test_config
    from landiff_tpu.models import dit as dit_lib
    from landiff_tpu.models import semantic_cond as sc_lib
    from landiff_tpu.training import diffusion_loss

    cfg = LanDiffConfig() if SCALE >= 1 else tiny_test_config()
    dt = jnp.bfloat16
    B = int(os.environ.get("LANDIFF_TRAIN_BATCH", "1"))
    n_steps = int(os.environ.get("LANDIFF_OVERFIT_STEPS", "150"))
    lr = float(os.environ.get("LANDIFF_OVERFIT_LR", "3e-3"))
    n_keys = int(os.environ.get("LANDIFF_OVERFIT_KEYS", "1"))

    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    main_p = dit_lib.init(ks[0], cfg.dit, dtype=dt)
    ctrl_p = dit_lib.init(ks[1], cfg.dit, control=True, dtype=dt)
    sem_p = sc_lib.init(ks[2], cfg.tokenizer, cfg.semantic_cond, dtype=dt)
    # LANDIFF_OVERFIT_F32=1: f32 MASTER weights for the trainable branch
    # (compute stays bf16 — weights cast at use, the repo dtype policy).
    # bf16 masters stall once updates shrink below ~0.4% of the param
    # (8-bit mantissa rounds them away): the bf16 run plateaus at ~1.65x
    # loss drop. +1.8 GB HBM for the 0.91B-param control branch.
    f32_master = os.environ.get("LANDIFF_OVERFIT_F32") == "1"
    if f32_master:
        ctrl_p = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32), ctrl_p)

    # LANDIFF_OVERFIT_SR=1: stochastic-rounding bf16 updates
    # (training/sr.py) — unbiased sub-ulp accumulation at zero extra HBM
    sr = os.environ.get("LANDIFF_OVERFIT_SR") == "1"
    # multiply_by_parameter_scale=False is REQUIRED for the zero-init
    # ControlNet gates: the default scales each update by RMS(param), so
    # zero-initialized zero_linear/adaln weights get ~epsilon-sized
    # updates and the branch never leaves zero (measured: default
    # adafactor flatlines at tiny scale while noscale/adam both learn
    # 2x+ in 300 steps; the first production run's 1.68x-then-plateau was
    # this, not an optimization floor). train.py's production chain uses
    # adamw and never had the pathology; adafactor here is the 16 GB
    # single-chip memory fallback.
    # clip + warmup mirror train.py's chain: an unwarmed noscale run
    # spiked to loss 11.7 by step 9, the huge grad**2 overflowed the f32
    # factored second moment to inf, and updates became exactly 0 forever
    # (loss bit-frozen at 0.99870 for 70+ steps — measured r5).
    # peak lr is deliberately conservative: at 3e-3 the production run
    # twice blew the zero-init gates up around warmup end (loss spike to
    # 4.6-11.7) and then FROZE bit-exact at 0.99870 — the control
    # contribution grows past ~256x the hidden stream, bf16 addition
    # absorbs the stream exactly, and every gradient becomes exactly 0.
    # Tiny/CPU cannot reproduce it (different magnitudes); 5e-4 stays
    # below the cliff.
    warmup = int(os.environ.get("LANDIFF_OVERFIT_WARMUP", "40"))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps=warmup, decay_steps=n_steps,
        end_value=lr / 10)
    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adafactor(sched, multiply_by_parameter_scale=False))
    opt_state = optimizer.init(ctrl_p)
    step = diffusion_loss.make_train_step(
        optimizer, cfg.dit, cfg.sampler, cfg.tokenizer, cfg.semantic_cond,
        compute_dtype=dt, remat=True, sr_updates=sr)
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
    # the fixed key(s): same sigma idx + same noise each visit -> a
    # deterministic target the control branch can actually drive to zero
    loss_keys = [jax.random.PRNGKey(1000 + i) for i in range(n_keys)]

    losses = []
    t0 = time.time()
    for i in range(n_steps):
        ctrl_p, opt_state, loss = step(ctrl_p, opt_state, main_p, sem_p,
                                       latents, context, tokens,
                                       loss_keys[i % n_keys])
        losses.append(float(np.asarray(loss)))
        if i < 3 or (i + 1) % 10 == 0:
            print(f"# step {i}: loss {losses[-1]:.5f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    wall = time.time() - t0

    l0 = losses[0]
    l_final = float(np.mean(losses[-max(1, n_keys):]))
    drop = l0 / max(l_final, 1e-12)
    # downsample the curve for the artifact (keep head + every 5th + tail)
    keep = sorted(set(range(0, n_steps, 5)) | set(range(min(5, n_steps)))
                  | {n_steps - 1})
    curve = {int(i): round(losses[i], 5) for i in keep}
    record = {
        "metric": "train_overfit_one_batch_production",
        "value": round(drop, 2),
        "unit": "x_loss_drop",
        "steps": n_steps,
        "lr": lr,
        "optimizer": "adafactor",
        "master_dtype": "f32" if f32_master else (
            "bf16_sr" if sr else "bf16"),
        "fixed_key_cycle": n_keys,
        "loss_first": round(l0, 5),
        "loss_final": round(l_final, 5),
        "wall_s": round(wall, 1),
        "step_s": round(wall / n_steps, 3),
        "loss_curve": curve,
        "passed_5x": bool(drop >= 5.0),
        "notes": "1x v5e bf16 remat; fixed batch + fixed loss key => "
                 "deterministic target; certifies gradients through the "
                 "Pallas fused flash backward at production shape",
    }
    if SCALE >= 1:
        out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "TRAIN_OVERFIT.json")
        with open(out, "w") as f:
            json.dump(record, f, indent=2)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
