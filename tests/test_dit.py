"""DiT tests: sincos pos-embed golden vs a literal transcription of the
reference numpy code, zero-init identity properties of adaLN layers, control
branch wiring, unpatchify round-trip, timestep embedding parity."""

import dataclasses

import einops
import jax
import jax.numpy as jnp
import numpy as np
import torch

from landiff_tpu.config import DiTConfig, tiny_test_config
from landiff_tpu.models import dit
from landiff_tpu.ops.embeddings import timestep_embedding

CFG = tiny_test_config().dit


def ref_1d(embed_dim, pos):
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000 ** omega
    out = np.einsum("m,d->md", pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def ref_3d_pos(embed_dim, grid_height, grid_width, t_size, hi, wi, ti):
    """Literal transcription of get_3d_sincos_pos_embed
    (dit_video_concat.py:72-117)."""
    dim_sp = embed_dim // 4 * 3
    dim_t = embed_dim // 4
    grid_h = np.arange(grid_height, dtype=np.float32) / hi
    grid_w = np.arange(grid_width, dtype=np.float32) / wi
    grid = np.stack(np.meshgrid(grid_w, grid_h), axis=0)
    grid = grid.reshape([2, 1, grid_height, grid_width])
    emb_h = ref_1d(dim_sp // 2, grid[0])
    emb_w = ref_1d(dim_sp // 2, grid[1])
    pos_sp = np.concatenate([emb_h, emb_w], axis=1)
    grid_t = np.arange(t_size, dtype=np.float32) / ti
    pos_t = ref_1d(dim_t, grid_t)
    pos_t = np.repeat(pos_t[:, None, :], grid_height * grid_width, axis=1)
    pos_sp = np.repeat(pos_sp[None, :, :], t_size, axis=0)
    return np.concatenate([pos_t, pos_sp], axis=-1)


def test_pos_embed_matches_reference_transcription():
    got = dit.get_3d_sincos_pos_embed(64, 5, 7, 3, 1.875, 1.875, 1.0)
    want = ref_3d_pos(64, 5, 7, 3, 1.875, 1.875, 1.0)
    np.testing.assert_allclose(got, want, atol=1e-12)
    table = dit.pos_embed_table(CFG)
    np.testing.assert_array_equal(table[:CFG.text_length], 0.0)


def test_timestep_embedding_matches_sgm():
    """cos-then-sin layout (sgm diffusionmodules/util.py:207-232)."""
    import math as m

    t = jnp.asarray([0.0, 1.0, 999.0])
    got = np.asarray(timestep_embedding(t, 8))
    half = 4
    freqs = np.exp(-m.log(10000) * np.arange(half) / half)
    args = np.asarray(t)[:, None] * freqs[None]
    want = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def _inputs(cfg, B=1):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, cfg.latent_frames, cfg.in_channels,
                                cfg.latent_height, cfg.latent_width))
    ts = jnp.asarray([999.0] * B)
    ctx = jax.random.normal(jax.random.PRNGKey(1),
                            (B, cfg.text_length, cfg.text_dim))
    return x, ts, ctx


def test_dit_forward_shape_and_zero_init_layers():
    params = dit.init(jax.random.PRNGKey(2), CFG)
    x, ts, ctx = _inputs(CFG)
    out = dit.forward(params, x, ts, ctx, CFG, compute_dtype=jnp.float32)
    assert out.shape == (1, CFG.latent_frames, CFG.out_channels,
                         CFG.latent_height, CFG.latent_width)
    assert not np.isnan(np.asarray(out)).any()
    # zero-init adaLN gates -> every transformer layer is the identity, so
    # removing layers must not change the output
    few = dict(params)
    few["layers"] = params["layers"][:1]
    out2 = dit.forward(few, x, ts, ctx, CFG, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2),
                               rtol=1e-5, atol=1e-5)


def test_control_zero_init_is_noop():
    """Zero-init control zero_linears -> control outputs are all zero ->
    main output unchanged."""
    params = dit.init(jax.random.PRNGKey(2), CFG)
    ctrl = dit.init(jax.random.PRNGKey(3), CFG, control=True)
    x, ts, ctx = _inputs(CFG)
    sem = jnp.zeros((1, CFG.latent_frames, CFG.in_channels,
                     CFG.latent_height, CFG.latent_width))
    out_plain = dit.forward(params, x, ts, ctx, CFG,
                            compute_dtype=jnp.float32)
    out_ctrl = dit.control_warp_forward(params, ctrl, x, ts, ctx, CFG, sem,
                                        compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out_plain), np.asarray(out_ctrl),
                               rtol=1e-5, atol=1e-5)


def test_control_outputs_shapes():
    ctrl = dit.init(jax.random.PRNGKey(3), CFG, control=True)
    ctrl_cfg = dataclasses.replace(CFG, num_layers=CFG.control_layers)
    x, ts, ctx = _inputs(CFG)
    sem = jnp.zeros_like(x)
    outs = dit.control_forward(ctrl, x, ts, ctx, ctrl_cfg, sem,
                               compute_dtype=jnp.float32)
    assert len(outs) == CFG.control_layers
    S = CFG.text_length + CFG.video_tokens
    assert outs[0].shape == (1, S, CFG.hidden_size)


def test_unpatchify_roundtrip():
    """Patchify (conv with identity-like kernel) -> unpatchify == einops
    rearrange inverse."""
    cfg = CFG
    B, T = 1, cfg.latent_frames
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, T * cfg.patches_per_frame,
                             cfg.patch_size ** 2 * cfg.out_channels))
    hh = cfg.latent_height // cfg.patch_size
    ww = cfg.latent_width // cfg.patch_size
    want = einops.rearrange(
        torch.from_numpy(x), "b (t h w) (c p q) -> b t c (h p) (w q)",
        h=hh, w=ww, c=cfg.out_channels, p=cfg.patch_size, q=cfg.patch_size)
    got = (x.reshape(B, T, hh, ww, cfg.out_channels, cfg.patch_size,
                     cfg.patch_size)
           .transpose(0, 1, 4, 2, 5, 3, 6)
           .reshape(B, T, cfg.out_channels, cfg.latent_height,
                    cfg.latent_width))
    np.testing.assert_allclose(got, want.numpy())


def test_semantic_cond_zero_init():
    """Zero-init conv_out -> semantic feature is exactly zero."""
    from landiff_tpu.models import semantic_cond as sc

    full = tiny_test_config()
    params = sc.init(jax.random.PRNGKey(0), full.tokenizer, full.semantic_cond)
    idx = jnp.zeros((1, full.tokenizer.titok.latent_tokens), jnp.int32)
    out = sc.semantic_feature_from_tokens(params, idx, full.tokenizer,
                                          full.semantic_cond,
                                          compute_dtype=jnp.float32)
    t = full.tokenizer.titok
    assert out.shape == (1, t.temporal_size, full.semantic_cond.out_channels,
                         2 * t.grid_h, 2 * t.grid_w)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=0)


def test_semantic_cond_visual_path():
    """Training path: video -> pad square -> VQ round trip -> crop ->
    upsample -> zero conv_out (zero at init)."""
    import jax

    from landiff_tpu.models import semantic_cond as sc
    from landiff_tpu.models import theia as theia_lib

    full = tiny_test_config()
    tok = full.tokenizer
    params = sc.init(jax.random.PRNGKey(0), tok, full.semantic_cond)
    theia_params = theia_lib.init(jax.random.PRNGKey(1), tok.theia)
    T = tok.titok.temporal_size
    P = tok.theia.patch_size
    H = tok.titok.grid_h * P * 2      # taller than wide after /16? keep int
    W = tok.titok.grid_w * P * 2
    video = jax.random.uniform(jax.random.PRNGKey(2), (1, T, 3, H, W),
                               minval=-1, maxval=1)
    out = sc.semantic_feature_from_video(
        params, video, tok, full.semantic_cond, downsample_factor=2 * P,
        compute_dtype=jnp.float32, theia_params=theia_params)
    assert out.shape[:2] == (1, T)
    assert out.shape[2] == full.semantic_cond.out_channels
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=0)  # zero conv_out


def test_remat_gradients_match():
    """jax.checkpoint per layer (training memory; a full-size 45-layer
    backward at S=17776 OOMs 16 GB without it) must not change the loss
    or its gradients."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from landiff_tpu.config import tiny_test_config
    from landiff_tpu.models import dit as dit_lib

    cfg = tiny_test_config().dit
    main_p = dit_lib.init(jax.random.PRNGKey(0), cfg)
    ctrl_p = dit_lib.init(jax.random.PRNGKey(1), cfg, control=True)
    x = jax.random.normal(jax.random.PRNGKey(2),
                          (1, cfg.latent_frames, cfg.in_channels,
                           cfg.latent_height, cfg.latent_width))
    ts = jnp.asarray([500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(3),
                            (1, cfg.text_length, cfg.text_dim))
    sem = jax.random.normal(jax.random.PRNGKey(4), x.shape) * 0.1

    def loss(cp, remat):
        out = dit_lib.control_warp_forward(
            main_p, cp, x, ts, ctx, cfg, sem, compute_dtype=jnp.float32,
            remat=remat)
        return jnp.mean(out ** 2)

    l0, g0 = jax.value_and_grad(lambda cp: loss(cp, False))(ctrl_p)
    l1, g1 = jax.value_and_grad(lambda cp: loss(cp, True))(ctrl_p)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)
