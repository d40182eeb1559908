"""Measure the FULL per-chip SP (sequence-parallel) TRAIN shard step on
ONE v5e, giving the multi-chip TRAINING projection a measured compute
basis (the inference projections got theirs in r4 via
bench_tp_shard_step.py / bench_sp_shard_step.py).

Layout projected: `--mesh data=2,time=4` training
(training/diffusion_loss.make_train_step_sp): DP over `data`
(B_local = global_batch/2), tokens sharded S/4 over `time` via ring
attention, main/control/semantic weights REPLICATED, per-layer remat,
Adafactor on the control branch (freeze_dit semantics). This script runs
that layout's COMPLETE per-device program on one chip:

  - one batch row (B_local = 1), full replicated weights,
  - the exact global noising arithmetic of make_train_step_sp.loss_fn,
  - control_warp_forward_sp's shard-0 program hand-mirrored (replicated
    embeddings -> [:, :S/4] slice -> remat'd _layer_sp stack with the
    ring attention forced to n local hops -> local control taps -> tiled
    all_gather stand-in -> replicated full-S final head + loss),
  - a forced-local DIFFERENTIABLE ring (custom_vjp) that mirrors
    ring_attention._ring_diff_fwd/_ring_diff_bwd exactly — exact-f32
    hops (the training pin), n-hop backward accumulation with the
    fused Pallas flash backward per hop — with the ppermutes replaced
    by reuse of the resident block (identical shapes/FLOPs, zero wire),
  - value_and_grad over the control params + the Adafactor update,
    params/opt-state donated, N steps chained in one execution.

On top of this measured compute the projection adds wire: per-hop
rotations (k/v bf16 fwd; k/v/dk/dv bwd) overlap hop compute on the
second ICI direction, so only max(0, wire - compute) serializes; the
control-grad psum (shard_map transpose of the replicated params over
all 8 chips) and the pre-final-head all_gather are charged at the ring
all-reduce model — the script prints the measured grad byte count so
the projection needs no parameter-size assumption.

Reference: the reference ships NO training code at all (SURVEY §2.8 —
its CP covers only the VAE, vae_modules/cp_enc_dec.py); SP training is
the TPU lever for sequences past one chip's HBM (long-video training).
"""

import dataclasses
import functools
import json
import math
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from landiff_tpu.utils import enable_compile_cache
enable_compile_cache()

from landiff_tpu.config import LanDiffConfig, tiny_test_config  # noqa: E402
from landiff_tpu.diffusion import schedule  # noqa: E402
from landiff_tpu.models import dit as dit_lib  # noqa: E402
from landiff_tpu.models import semantic_cond as sc_lib  # noqa: E402
from landiff_tpu.parallel import ring_attention as ra  # noqa: E402
from landiff_tpu.training import diffusion_loss  # noqa: E402


def forced_ring_diff_local(n_hops: int):
    """Differentiable ring_attention_local stand-in executing `n_hops`
    LOCAL hops on one chip: forward = _ring_diff_fwd's exact-f32 hops +
    lse merges; backward = _ring_diff_bwd's n-hop scan (fused Pallas
    flash backward per hop on the pallas impl) — both with the
    ppermute'd blocks replaced by the resident one (same shapes/FLOPs;
    wire is modeled by the caller's projection)."""

    def _fwd_hops(q, k, v, scale, impl):
        if impl == "pallas":
            local = ra._local_attn_flash  # exact: training pins int8 off
            merge = functools.partial(ra._merge, exp=jnp.exp2, log=jnp.log2)
        else:
            local, merge = ra._local_attn, ra._merge
        out, lse = local(q, k, v, scale)

        def body(c, _):
            o, l = c
            o2, l2 = local(q, k, v, scale)
            return merge(o, l, o2, l2), None

        (out, lse), _ = jax.lax.scan(body, (out, lse), None,
                                     length=n_hops - 1)
        if impl != "pallas":
            lse = lse * ra._LOG2E
        return out, lse

    @functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
    def ring(q, k, v, axis, scale, impl):
        out, _ = _fwd_hops(q, k, v, scale, impl)
        return out.astype(q.dtype)

    def fwd(q, k, v, axis, scale, impl):
        out, lse2 = _fwd_hops(q, k, v, scale, impl)
        outq = out.astype(q.dtype)
        return outq, (q, k, v, outq, lse2)

    def bwd(axis, scale, impl, res, do):
        q, k, v, out, lse2 = res
        hop = ra._hop_bwd_pallas if impl == "pallas" else ra._hop_bwd_dense
        q32 = q.astype(jnp.float32)
        do32 = do.astype(jnp.float32)
        delta = jnp.sum(do32 * out.astype(jnp.float32),
                        axis=-1).transpose(0, 2, 1)
        dq0 = jnp.zeros(q.shape, jnp.float32)
        dkv0 = jnp.zeros(k.shape, jnp.float32)

        def body(carry, _):
            dq, dk, dv = carry
            if impl == "pallas":
                dq_i, dk_i, dv_i = hop(q, k, v, do, lse2, delta, out, scale)
            else:
                dq_i, dk_i, dv_i = hop(q32, k.astype(jnp.float32),
                                       v.astype(jnp.float32), do32, lse2,
                                       delta, out, scale)
            return (dq + dq_i, dk + dk_i, dv + dv_i), None

        (dq, dk, dv), _ = jax.lax.scan(body, (dq0, dkv0, dkv0), None,
                                       length=n_hops)
        return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)

    ring.defvjp(fwd, bwd)

    def ring_local(q, k, v, axis, *, scale=None, impl="xla"):
        del axis
        if scale is None:
            scale = 1.0 / math.sqrt(q.shape[-1])
        return ring(q, k, v, "_forced", scale, impl)

    return ring_local


def main():
    n_time = int(os.environ.get("LANDIFF_BENCH_SP", "4"))
    cfg = LanDiffConfig()
    scale = float(os.environ.get("LANDIFF_BENCH_SCALE", "1.0"))
    if scale < 1.0:  # CPU smoke path (plumbing check, not a timing)
        cfg = tiny_test_config()
    d = cfg.dit
    dt = jnp.bfloat16
    attn = "pallas" if jax.default_backend() == "tpu" else "xla"

    S = d.text_length + d.latent_frames * (d.latent_height // d.patch_size) \
        * (d.latent_width // d.patch_size)
    assert S % n_time == 0, (S, n_time)
    s_loc = S // n_time

    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    main_p = dit_lib.init(ks[0], d, dtype=dt)
    ctrl_p = dit_lib.init(ks[1], d, control=True, dtype=dt)
    sem_p = sc_lib.init(ks[2], cfg.tokenizer, cfg.semantic_cond, dtype=dt)

    ra.ring_attention_local = forced_ring_diff_local(n_time)

    ctrl_cfg = dataclasses.replace(d, num_layers=d.control_layers)
    layer_fn = jax.checkpoint(dit_lib._layer_sp, static_argnums=(3, 4, 5))

    def local_net(mp, cp, noised, idxf, ctx, sem):
        """control_warp_forward_sp's shard-0 per-chip program (remat'd)."""
        xs = noised.astype(dt) + sem.astype(dt)
        h, emb = dit_lib._embed_inputs(cp, xs, idxf, ctx, ctrl_cfg, dt)
        h = h[:, :s_loc]
        taps = []
        for p in cp["layers"]:
            h = layer_fn(p, h, emb, ctrl_cfg, attn, "time", 0)
            taps.append(h @ p["zero_linear_w"].astype(h.dtype))
        h, emb = dit_lib._embed_inputs(mp, noised.astype(dt), idxf, ctx, d,
                                       dt)
        h = h[:, :s_loc]
        for i, p in enumerate(mp["layers"]):
            h = layer_fn(p, h, emb, d, attn, "time", 0)
            if i < len(taps):
                h = h + taps[i].astype(h.dtype)
        h = jnp.concatenate([h] * n_time, axis=1)  # all_gather stand-in
        return dit_lib._final_head(mp, h, emb, d)

    table = jnp.asarray(
        schedule.zero_snr_sigmas(cfg.sampler, cfg.sampler.num_train_timesteps,
                                 return_idx=False).copy(), jnp.float32)

    def local_loss(cp, mp, sp_, latents, ctx, tokens, key):
        # make_train_step_sp.loss_fn's global noising at B_local rows
        B = latents.shape[0]
        k_idx, k_noise, _ = jax.random.split(key, 3)
        idx = diffusion_loss.uniform_sigma_indices(
            k_idx, B, cfg.sampler.num_train_timesteps)
        a = table[idx].reshape(B, 1, 1, 1, 1)
        x = latents.astype(jnp.float32)
        noise = jax.random.normal(k_noise, latents.shape, jnp.float32)
        noised = x * a + noise * jnp.sqrt(1.0 - a ** 2)
        sem = sc_lib.semantic_feature_from_tokens(
            sp_, tokens, cfg.tokenizer, cfg.semantic_cond,
            forward_t=d.latent_frames, compute_dtype=dt)
        net = local_net(mp, cp, noised.astype(dt), idx.astype(jnp.float32),
                        ctx, sem).astype(jnp.float32)
        denoised = net * (-jnp.sqrt(1.0 - a ** 2)) + noised * a
        w = 1.0 / (1.0 - a ** 2)
        per_sample = jnp.mean((w * (denoised - x) ** 2).reshape(B, -1),
                              axis=1)
        return jnp.mean(per_sample)

    optimizer = optax.adafactor(1e-4)
    opt_state = optimizer.init(ctrl_p)

    B = 1  # B_local of global batch 2 over data=2
    latents = jax.random.normal(jax.random.PRNGKey(1),
                                (B, d.latent_frames, d.in_channels,
                                 d.latent_height, d.latent_width))
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (B, d.text_length, d.text_dim), dt)
    n_tok = cfg.tokenizer.titok.latent_tokens
    tokens = jax.random.randint(jax.random.PRNGKey(3), (B, n_tok), 0,
                                cfg.tokenizer.vq.codebook_size)

    N = int(os.environ.get("LANDIFF_BENCH_STEPS", "2"))

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def chained(cp, opt_state, mp, sp_, latents, ctx, tokens, key):
        def body(i, carry):
            cp, opt_state, _ = carry
            loss, grads = jax.value_and_grad(local_loss)(
                cp, mp, sp_, latents, ctx, tokens,
                jax.random.fold_in(key, i))
            updates, opt_state = optimizer.update(grads, opt_state, cp)
            cp = optax.apply_updates(cp, updates)
            return cp, opt_state, loss
        return jax.lax.fori_loop(0, N, body,
                                 (cp, opt_state, jnp.float32(0.0)))

    # grad bytes the shard_map transpose all-reduces (control tree, bf16)
    grad_bytes = sum(int(np.prod(l.shape)) * l.dtype.itemsize
                     for l in jax.tree_util.tree_leaves(ctrl_p))

    t0 = time.time()
    ctrl_p, opt_state, loss = chained(ctrl_p, opt_state, main_p, sem_p,
                                      latents, ctx, tokens,
                                      jax.random.PRNGKey(7))
    l0 = float(np.asarray(loss))
    compile_s = time.time() - t0
    times = []
    for i in range(2):
        t0 = time.time()
        ctrl_p, opt_state, loss = chained(ctrl_p, opt_state, main_p, sem_p,
                                          latents, ctx, tokens,
                                          jax.random.PRNGKey(8 + i))
        lf = float(np.asarray(loss))
        times.append((time.time() - t0) / N)
    step_s = min(times)
    print(json.dumps({
        "metric": f"dit_controlnet_train_step_sp{n_time}"
                  "_shard_shape_per_chip_s",
        "value": round(step_s, 3),
        "unit": "s/step",
        "layout": f"B_local=1 (data=2), tokens {S}//{n_time}={s_loc}, "
                  f"weights replicated, remat per layer, Adafactor, "
                  f"{n_time} forced local diff-ring hops per layer "
                  "(exact-f32 fwd + fused Pallas flash bwd per hop), "
                  "zero wire",
        "control_grad_allreduce_bytes": grad_bytes,
        "loss_first": round(l0, 4), "loss_last": round(lf, 4),
    }))
    print(f"# compile {compile_s:.1f}s, per-step runs "
          f"{['%.3f' % t for t in times]}, attn={attn}")


if __name__ == "__main__":
    main()
