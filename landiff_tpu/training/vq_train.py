"""Tokenizer (VideoVQ) training: straight-through VQ with EMA codebook,
kmeans init, dead-code replacement, and the reference loss mix.

Reference behavior: vector_quantize_pytorch.VectorQuantize(kmeans_init=True,
threshold_ema_dead_code=2, decay default 0.8) configured at
tokenizer_cfg.py:89-95; losses (recon MSE + commit, plus per-I/P-frame
monitoring losses) from video_titok_vq.py:279-375.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from landiff_tpu.config import TokenizerConfig
from landiff_tpu.models import titok as titok_lib


class CodebookState(NamedTuple):
    embed_avg: jax.Array      # (K, cdim)
    cluster_size: jax.Array   # (K,)
    initted: jax.Array        # () bool


def init_codebook_state(cfg: TokenizerConfig):
    q = cfg.vq
    return CodebookState(
        embed_avg=jnp.zeros((q.codebook_size, q.codebook_dim)),
        cluster_size=jnp.zeros((q.codebook_size,)),
        initted=jnp.asarray(False))


def kmeans_init_codebook(zin, codebook_size: int, key, iters: int = 10):
    """Simple k-means over the first batch's projected latents
    (vector-quantize-pytorch kmeans_init)."""
    flat = zin.reshape(-1, zin.shape[-1])
    n = flat.shape[0]
    perm = jax.random.permutation(key, n)
    means = flat[perm[jnp.arange(codebook_size) % n]]

    def step(means, _):
        d = (jnp.sum(flat ** 2, -1, keepdims=True) - 2 * flat @ means.T
             + jnp.sum(means ** 2, -1)[None])
        assign = jnp.argmin(d, -1)
        one_hot = jax.nn.one_hot(assign, codebook_size, dtype=flat.dtype)
        counts = one_hot.sum(0)
        sums = one_hot.T @ flat
        new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1),
                        means)
        return new, None

    means, _ = jax.lax.scan(step, means, None, length=iters)
    return means


def quantize_ste(qp, z):
    """Straight-through VQ: returns (quantized_out (..., dim), zin, idx,
    commit_loss). Gradients flow through project_in/out; the codebook is
    EMA-updated (no gradient)."""
    zf = z.astype(jnp.float32)
    zin = zf @ qp["in_w"].astype(jnp.float32) + qp["in_b"].astype(jnp.float32)
    cb = jax.lax.stop_gradient(qp["codebook"].astype(jnp.float32))
    d = (jnp.sum(zin ** 2, -1, keepdims=True) - 2 * zin @ cb.T
         + jnp.sum(cb ** 2, -1)[None])
    idx = jnp.argmin(d, -1)
    e = cb[idx]
    commit = jnp.mean(jnp.sum((zin - jax.lax.stop_gradient(e)) ** 2, -1)
                      / zin.shape[-1])
    q_ste = zin + jax.lax.stop_gradient(e - zin)
    out = q_ste @ qp["out_w"].astype(jnp.float32) + qp["out_b"].astype(jnp.float32)
    return out, zin, idx, commit


def ema_codebook_update(qp, state: CodebookState, zin, idx, *, key,
                        decay: float = 0.8, eps: float = 1e-5,
                        threshold_dead: float = 2.0):
    """EMA cluster update + dead-code replacement from batch samples."""
    K = qp["codebook"].shape[0]
    flat = jax.lax.stop_gradient(zin.reshape(-1, zin.shape[-1]))
    one_hot = jax.nn.one_hot(idx.reshape(-1), K, dtype=flat.dtype)
    counts = one_hot.sum(0)
    sums = one_hot.T @ flat
    cluster_size = state.cluster_size * decay + counts * (1 - decay)
    embed_avg = state.embed_avg * decay + sums * (1 - decay)
    n = cluster_size.sum()
    smoothed = (cluster_size + eps) / (n + K * eps) * n
    embed = embed_avg / smoothed[:, None]
    # dead-code replacement: expired codes <- random batch vectors
    dead = cluster_size < threshold_dead
    rand_idx = jax.random.randint(key, (K,), 0, flat.shape[0])
    samples = flat[rand_idx]
    embed = jnp.where(dead[:, None], samples, embed)
    embed_avg = jnp.where(dead[:, None], samples * cluster_size[:, None],
                          embed_avg)
    new_qp = dict(qp)
    new_qp["codebook"] = embed.astype(qp["codebook"].dtype)
    return new_qp, CodebookState(embed_avg, cluster_size,
                                 jnp.asarray(True))


def tokenizer_loss(params, features, cfg: TokenizerConfig, *,
                   commit_weight=1.0, recon_weight=1.0,
                   compute_dtype=jnp.float32):
    """VideoVQ._inner_forward + forward loss mix (video_titok_vq.py:279-375).
    Returns (total_loss, aux) with zin/idx for the EMA update and the
    per-I/P-frame monitoring losses."""
    feats = features.astype(compute_dtype)
    lat = titok_lib.encode(params["encoder"], feats, cfg.titok,
                           compute_dtype=compute_dtype)
    q_out, zin, idx, commit = quantize_ste(params["quant"], lat)
    rec = titok_lib.decode(params["decoder"], q_out.astype(compute_dtype),
                           cfg.titok, compute_dtype=compute_dtype)
    diff = (rec.astype(jnp.float32) - feats.astype(jnp.float32))
    re_loss = jnp.mean(diff ** 2)
    iframe_loss = jnp.mean(diff[:, 0] ** 2)
    pframe_loss = jnp.mean(diff[:, 1:] ** 2) if feats.shape[1] > 1 else 0.0
    total = commit_weight * commit + recon_weight * re_loss
    aux = {"zin": zin, "idx": idx, "commit_loss": commit,
           "re_loss": re_loss, "iframe_loss": iframe_loss,
           "pframe_loss": pframe_loss}
    return total, aux


def make_train_step(optimizer, cfg: TokenizerConfig, *, decay=0.8,
                    threshold_dead=2.0, compute_dtype=jnp.float32,
                    ema_decay: float | None = None):
    """Build the jitted tokenizer train step.

    With `ema_decay` set (LitEma parity, sgm/modules/ema.py:1-88 — the
    reference default is 0.9999), the step additionally takes and returns
    an `ema.EmaState` tracking a shadow of the trainable params; evaluate
    with `ema.copy_to(state, params)`."""
    from landiff_tpu.training import ema as ema_lib

    def loss_fn(params, features):
        return tokenizer_loss(params, features, cfg,
                              commit_weight=cfg.vq.commitment_weight,
                              compute_dtype=compute_dtype)

    def _step(params, opt_state, cb_state, features, key):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, features)
        # codebook is EMA-owned: zero its gradient
        grads["quant"]["codebook"] = jnp.zeros_like(
            grads["quant"]["codebook"])
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        new_quant, cb_state = ema_codebook_update(
            params["quant"], cb_state, aux["zin"], aux["idx"], key=key,
            decay=decay, threshold_dead=threshold_dead)
        params = dict(params)
        params["quant"] = new_quant
        metrics = {k: aux[k] for k in
                   ("commit_loss", "re_loss", "iframe_loss", "pframe_loss")}
        metrics["total_loss"] = loss
        return params, opt_state, cb_state, metrics

    if ema_decay is None:
        return jax.jit(_step)

    @jax.jit
    def train_step_ema(params, opt_state, cb_state, ema_state, features,
                       key):
        params, opt_state, cb_state, metrics = _step(
            params, opt_state, cb_state, features, key)
        ema_state = ema_lib.ema_update(ema_state, params, decay=ema_decay)
        return params, opt_state, cb_state, ema_state, metrics

    return train_step_ema
