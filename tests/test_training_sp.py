"""Sequence-parallel ControlNet training (diffusion_loss.make_train_step_sp):
the token-sharded ring-attention train step must reproduce the single-device
step exactly — loss AND updated control params — including gradient flow
through the ring ppermutes and the psummed replicated-param cotangents."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from landiff_tpu.config import MeshConfig, tiny_test_config
from landiff_tpu.models import dit as dit_lib
from landiff_tpu.models import semantic_cond as sc_lib
from landiff_tpu.parallel import mesh as mesh_lib
from landiff_tpu.training import diffusion_loss
from landiff_tpu.utils import fill_zero_leaves

CFG = tiny_test_config()


def _setup():
    cfg = CFG.dit
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    main = fill_zero_leaves(dit_lib.init(ks[0], cfg),
                            jax.random.PRNGKey(20), scale=0.05)
    ctrl = fill_zero_leaves(dit_lib.init(ks[1], cfg, control=True),
                            jax.random.PRNGKey(21), scale=0.05)
    sem = fill_zero_leaves(
        sc_lib.init(ks[2], CFG.tokenizer, CFG.semantic_cond),
        jax.random.PRNGKey(22), scale=0.05)
    B = 2
    latents = jax.random.normal(ks[3], (B, cfg.latent_frames,
                                        cfg.in_channels, cfg.latent_height,
                                        cfg.latent_width), jnp.float32)
    ctx = jax.random.normal(ks[4], (B, cfg.text_length, cfg.text_dim),
                            jnp.float32)
    tokens = jnp.zeros((B, CFG.tokenizer.titok.latent_tokens), jnp.int32)
    return main, ctrl, sem, latents, ctx, tokens


@pytest.mark.parametrize("fixed_frames", [0, 1])
def test_sp_train_step_matches_single(fixed_frames):
    if len(jax.devices()) < 8:
        pytest.skip("needs virtual mesh")
    main, ctrl, sem, latents, ctx, tokens = _setup()
    opt = optax.adamw(1e-3)
    opt_state = opt.init(ctrl)
    key = jax.random.PRNGKey(7)

    step = diffusion_loss.make_train_step(
        opt, CFG.dit, CFG.sampler, CFG.tokenizer, CFG.semantic_cond,
        fixed_frames=fixed_frames, compute_dtype=jnp.float32, remat=False)
    want_p, _, want_loss = jax.jit(step)(ctrl, opt_state, main, sem,
                                         latents, ctx, tokens, key)

    mesh = mesh_lib.make_mesh(MeshConfig(data=2, model=1, time=4),
                              jax.devices()[:8])
    step_sp = diffusion_loss.make_train_step_sp(
        opt, mesh, CFG.dit, CFG.sampler, CFG.tokenizer, CFG.semantic_cond,
        fixed_frames=fixed_frames, compute_dtype=jnp.float32, remat=False,
        attn_impl="xla")
    got_p, _, got_loss = jax.jit(step_sp)(ctrl, opt_state, main, sem,
                                          latents, ctx, tokens, key)

    np.testing.assert_allclose(float(got_loss), float(want_loss),
                               rtol=2e-5, atol=2e-6)
    for a, b in zip(jax.tree_util.tree_leaves(want_p),
                    jax.tree_util.tree_leaves(got_p)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-5)


def test_sp_train_step_remat_matches_no_remat():
    """Per-layer checkpointing on the SP path must not change values."""
    if len(jax.devices()) < 8:
        pytest.skip("needs virtual mesh")
    main, ctrl, sem, latents, ctx, tokens = _setup()
    opt = optax.adamw(1e-3)
    opt_state = opt.init(ctrl)
    key = jax.random.PRNGKey(9)
    mesh = mesh_lib.make_mesh(MeshConfig(data=2, model=1, time=4),
                              jax.devices()[:8])
    outs = []
    for remat in (False, True):
        step_sp = diffusion_loss.make_train_step_sp(
            opt, mesh, CFG.dit, CFG.sampler, CFG.tokenizer,
            CFG.semantic_cond, compute_dtype=jnp.float32, remat=remat)
        outs.append(jax.jit(step_sp)(ctrl, opt_state, main, sem, latents,
                                     ctx, tokens, key))
    np.testing.assert_allclose(float(outs[0][2]), float(outs[1][2]),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(outs[0][0]),
                    jax.tree_util.tree_leaves(outs[1][0])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-7)
