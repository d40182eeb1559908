"""Stage-2 training: VideoDiffusionLoss + ControlNet train step.

Reference: sgm/modules/diffusionmodules/loss.py (VideoDiffusionLoss:98-202)
and sigma_sampling.py (DiscreteSampling:18-72). The reference trains only the
control branch (freeze_dit=True, dit_video_concat.py:1190-1193); the MP-group
noise/idx broadcasts (loss.py:130-140) are unnecessary under pjit — every
device sees the same traced randomness by construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from landiff_tpu.config import DiTConfig, SamplerConfig, SemanticCondConfig, \
    TokenizerConfig
from landiff_tpu.diffusion import schedule
from landiff_tpu.models import dit as dit_lib
from landiff_tpu.models import semantic_cond as sc_lib


def uniform_sigma_indices(key, n_samples: int, num_idx: int,
                          dp_rank: int = 0, dp_size: int = 1):
    """DiscreteSampling uniform_sampling groups (sigma_sampling.py:31-63):
    rank r draws timesteps from its group's interval so a DP batch covers
    the noise levels evenly."""
    i = 1
    while dp_size % i != 0 or num_idx % (dp_size // i) != 0:
        i += 1
    group_num = dp_size // i
    group_width = dp_size // group_num
    interval = num_idx // group_num
    g = dp_rank // group_width
    return jax.random.randint(key, (n_samples,), g * interval,
                              (g + 1) * interval)


def video_diffusion_loss(main_params, control_params, sem_params,
                         latents, context, semantic_tokens, key,
                         dit_cfg: DiTConfig, sampler_cfg: SamplerConfig,
                         tok_cfg: TokenizerConfig,
                         sem_cfg: SemanticCondConfig, *,
                         fixed_frames: int = 0, dp_rank: int = 0,
                         dp_size: int = 1, compute_dtype=jnp.bfloat16,
                         remat: bool = True, ucg_rate: float = 0.0):
    """v-pred L2 with 1/(1-acp) weighting; prefix frames kept clean and
    excluded from the loss (loss.py:155-172).

    ucg_rate: GeneralConditioner's per-embedder unconditional-guidance
    dropout (encoders/modules.py:150-166): with probability ucg_rate per
    sample, the text context is zeroed — matching inference's
    force_uc_zero_embeddings=["txt"] uc row, which is exactly zeros. This
    is what trains the model's CFG capability."""
    B = latents.shape[0]
    k_idx, k_noise, k_ucg = jax.random.split(key, 3)
    if ucg_rate > 0.0:
        keep = jax.random.bernoulli(k_ucg, 1.0 - ucg_rate, (B,))
        context = context * keep[:, None, None].astype(context.dtype)
    table = jnp.asarray(
        schedule.zero_snr_sigmas(sampler_cfg, sampler_cfg.num_train_timesteps,
                                 return_idx=False).copy(), jnp.float32)
    idx = uniform_sigma_indices(k_idx, B, sampler_cfg.num_train_timesteps,
                                dp_rank, dp_size)
    acs = table[idx]                                   # alpha_cumprod_sqrt
    noise = jax.random.normal(k_noise, latents.shape, jnp.float32)
    a = acs.reshape(B, 1, 1, 1, 1)
    x = latents.astype(jnp.float32)
    noised = x * a + noise * jnp.sqrt(1.0 - a ** 2)
    if fixed_frames > 0:
        noised = jnp.concatenate([x[:, :fixed_frames],
                                  noised[:, fixed_frames:]], axis=1)

    sem_feature = sc_lib.semantic_feature_from_tokens(
        sem_params, semantic_tokens, tok_cfg, sem_cfg,
        forward_t=dit_cfg.latent_frames, compute_dtype=compute_dtype)

    # DiscreteDenoiser: c_skip=a, c_out=-sqrt(1-a^2), c_in=1, c_noise=idx
    # remat defaults ON for training: a 30L+15L backward at production
    # S=17776 cannot hold per-layer activations on a 16 GB chip
    net_out = dit_lib.control_warp_forward(
        main_params, control_params, noised.astype(compute_dtype),
        idx.astype(jnp.float32), context, dit_cfg, sem_feature,
        compute_dtype=compute_dtype, remat=remat).astype(jnp.float32)
    denoised = net_out * (-jnp.sqrt(1.0 - a ** 2)) + noised * a

    w = 1.0 / (1.0 - a ** 2)
    tgt, out = x, denoised
    if fixed_frames > 0:
        tgt = tgt[:, fixed_frames:]
        out = out[:, fixed_frames:]
        w = jnp.broadcast_to(w, x.shape)[:, fixed_frames:]
    per_sample = jnp.mean((w * (out - tgt) ** 2).reshape(B, -1), axis=1)
    return jnp.mean(per_sample)


def make_train_step(optimizer, dit_cfg, sampler_cfg, tok_cfg, sem_cfg, *,
                    fixed_frames: int = 0, compute_dtype=jnp.bfloat16,
                    remat: bool = True, ucg_rate: float = 0.0,
                    sr_updates: bool = False):
    """ControlNet training step: grads w.r.t. the control branch only
    (freeze_dit semantics). ucg_rate trains CFG via per-sample context
    zeroing (see video_diffusion_loss).

    sr_updates=True applies parameter updates with stochastic rounding
    on bf16 leaves (training/sr.py): lets pure-bf16 masters keep
    learning past the round-to-nearest stall (~2^-8 relative updates)
    without the +1.8 GB HBM an f32 master copy of the 0.91B-param
    control branch costs — measured to OOM a 16 GB v5e by 125 MB
    (TRAIN_OVERFIT.json)."""

    def loss_fn(control_params, main_params, sem_params, latents, context,
                tokens, key):
        return video_diffusion_loss(
            main_params, control_params, sem_params, latents, context,
            tokens, key, dit_cfg, sampler_cfg, tok_cfg, sem_cfg,
            fixed_frames=fixed_frames, compute_dtype=compute_dtype,
            remat=remat, ucg_rate=ucg_rate)

    def train_step(control_params, opt_state, main_params, sem_params,
                   latents, context, tokens, key):
        loss, grads = jax.value_and_grad(loss_fn)(
            control_params, main_params, sem_params, latents, context,
            tokens, key)
        updates, opt_state = optimizer.update(grads, opt_state,
                                              control_params)
        import optax

        if sr_updates:
            from landiff_tpu.training.sr import apply_updates_sr

            control_params = apply_updates_sr(
                control_params, updates, jax.random.fold_in(key, 0x5B))
        else:
            control_params = optax.apply_updates(control_params, updates)
        return control_params, opt_state, loss

    return train_step


def make_train_step_sp(optimizer, mesh, dit_cfg, sampler_cfg, tok_cfg,
                       sem_cfg, *, fixed_frames: int = 0,
                       compute_dtype=jnp.bfloat16, remat: bool = True,
                       attn_impl: str = "xla", ucg_rate: float = 0.0):
    """SEQUENCE-PARALLEL ControlNet train step over a (data, time) mesh:
    the 45-layer network forward/backward runs token-sharded over the
    `time` axis (dit.control_warp_forward_sp — ring attention, replicated
    weights) with DP over `data`. Per-chip layer activations shrink to the
    1/n_time token shard, which is the lever for training sequences past
    one chip's HBM (long-video training) — the reference ships no training
    code at all, and its CP covers only the VAE (SURVEY §2.8).

    Gradients are taken straight THROUGH the shard_map program: ring
    ppermutes transpose to reverse-ring ppermutes and the replicated
    control params' cotangents are psummed by the shard_map transpose —
    verified exact against the single-device step
    (tests/test_training_sp.py). attn_impl: 'xla' (default) keeps the ring
    hops reverse-differentiable; hop scores materialize at
    (B_loc, H, S/n, S/n) f32 per hop, bounded by remat to one layer.

    Same call contract as make_train_step; batch inputs are consumed
    data-sharded (place them with P('data') or pass host arrays)."""
    from jax.sharding import PartitionSpec as P

    DATA_AXIS, SP_AXIS = "data", "time"
    n_data = mesh.shape[DATA_AXIS]

    def local_loss(cp, mp, sp_, noised, x, idx, a, ctx, tokens):
        B = noised.shape[0]
        sem = sc_lib.semantic_feature_from_tokens(
            sp_, tokens, tok_cfg, sem_cfg, forward_t=dit_cfg.latent_frames,
            compute_dtype=compute_dtype)
        net = dit_lib.control_warp_forward_sp(
            mp, cp, noised.astype(compute_dtype), idx.astype(jnp.float32),
            ctx, dit_cfg, sem, axis=SP_AXIS, attn_impl=attn_impl,
            compute_dtype=compute_dtype, remat=remat).astype(jnp.float32)
        denoised = net * (-jnp.sqrt(1.0 - a ** 2)) + noised * a
        w = 1.0 / (1.0 - a ** 2)
        tgt, out = x, denoised
        if fixed_frames > 0:
            tgt = tgt[:, fixed_frames:]
            out = out[:, fixed_frames:]
            w = jnp.broadcast_to(w, x.shape)[:, fixed_frames:]
        per_sample = jnp.mean((w * (out - tgt) ** 2).reshape(B, -1), axis=1)
        return jax.lax.psum(jnp.sum(per_sample), DATA_AXIS) / (B * n_data)

    d = P(DATA_AXIS)
    sm_loss = jax.shard_map(
        local_loss, mesh=mesh,
        in_specs=(P(), P(), P(), d, d, d, d, d, d), out_specs=P(),
        check_vma=False)

    def loss_fn(control_params, main_params, sem_params, latents, context,
                tokens, key):
        # global-batch noising identical to video_diffusion_loss (same key
        # -> same idx/noise as the unsharded step; parity-tested).
        # NOTE: split(key) here and split(key, 3) there give DIFFERENT
        # subkey values, so ucg must use the same 3-way split to stay
        # bit-identical to the unsharded step.
        B = latents.shape[0]
        k_idx, k_noise, k_ucg = jax.random.split(key, 3)
        if ucg_rate > 0.0:
            keep = jax.random.bernoulli(k_ucg, 1.0 - ucg_rate, (B,))
            context = context * keep[:, None, None].astype(context.dtype)
        table = jnp.asarray(
            schedule.zero_snr_sigmas(sampler_cfg,
                                     sampler_cfg.num_train_timesteps,
                                     return_idx=False).copy(), jnp.float32)
        idx = uniform_sigma_indices(k_idx, B,
                                    sampler_cfg.num_train_timesteps)
        a = table[idx].reshape(B, 1, 1, 1, 1)
        x = latents.astype(jnp.float32)
        noise = jax.random.normal(k_noise, latents.shape, jnp.float32)
        noised = x * a + noise * jnp.sqrt(1.0 - a ** 2)
        if fixed_frames > 0:
            noised = jnp.concatenate([x[:, :fixed_frames],
                                      noised[:, fixed_frames:]], axis=1)
        return sm_loss(control_params, main_params, sem_params, noised, x,
                       idx, a, context, tokens)

    def train_step(control_params, opt_state, main_params, sem_params,
                   latents, context, tokens, key):
        loss, grads = jax.value_and_grad(loss_fn)(
            control_params, main_params, sem_params, latents, context,
            tokens, key)
        updates, opt_state = optimizer.update(grads, opt_state,
                                              control_params)
        import optax

        control_params = optax.apply_updates(control_params, updates)
        return control_params, opt_state, loss

    return train_step
