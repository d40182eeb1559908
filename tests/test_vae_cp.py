"""Temporal context-parallel VAE decode must match the single-device full
decode (gathered norms + ppermute halos; reference seam cp_enc_dec.py CP
path) on a multi-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from landiff_tpu.config import MeshConfig, VAEConfig
from landiff_tpu.models import vae
from landiff_tpu.parallel import mesh as mesh_lib
from landiff_tpu.parallel import vae_cp

CFG = VAEConfig(ch=8, ch_mult=(1, 2), num_res_blocks=1, z_channels=4,
                in_channels=3, out_channels=3, temporal_compress_level=1,
                norm_num_groups=4)


@pytest.mark.parametrize("n_dev", [2, 4])
def test_cp_decode_matches_single_device(n_dev):
    if len(jax.devices()) < n_dev:
        pytest.skip("needs virtual device mesh")
    params = vae.init(jax.random.PRNGKey(0), CFG)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 1 + 2 * n_dev, 4, 4))

    want, _ = vae.decode(params["decoder"], z, CFG,
                         compute_dtype=jnp.float32)

    mesh = mesh_lib.make_mesh(MeshConfig(data=1, model=1, time=n_dev),
                              jax.devices()[:n_dev])
    got = vae_cp.decode_temporal_cp(params["decoder"], z, CFG, mesh,
                                    compute_dtype=jnp.float32)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_cp_encode_matches_single_device():
    n_dev = 2
    if len(jax.devices()) < n_dev:
        pytest.skip("needs virtual device mesh")
    params = vae.init(jax.random.PRNGKey(0), CFG)
    # T = 1 + c*n with c=4 (>= 2 frames after 1 temporal downsample)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 9, 16, 16))
    want = vae.encode(params["encoder"], x, CFG, compute_dtype=jnp.float32)
    mesh = mesh_lib.make_mesh(MeshConfig(data=1, model=1, time=n_dev),
                              jax.devices()[:n_dev])
    got = vae_cp.encode_temporal_cp(params["encoder"], x, CFG, mesh,
                                    compute_dtype=jnp.float32)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_ring_attention_matches_dense():
    from landiff_tpu.ops import attention as A
    from landiff_tpu.parallel.ring_attention import ring_attention

    n_dev = 4
    if len(jax.devices()) < n_dev:
        pytest.skip("needs virtual mesh")
    mesh = mesh_lib.make_mesh(MeshConfig(data=1, model=1, time=n_dev),
                              jax.devices()[:n_dev])
    B, S, H, D = 2, 32, 3, 8
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, S, H, D))
    k = jax.random.normal(ks[1], (B, S, H, D))
    v = jax.random.normal(ks[2], (B, S, H, D))
    want = A.mha_reference(q, k, v)
    got = ring_attention(q, k, v, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_tp_sharded_dit_matches_replicated():
    """DiT forward with TP-sharded params (GSPMD) must equal unsharded."""
    from landiff_tpu.config import tiny_test_config
    from landiff_tpu.models import dit as dit_lib

    if len(jax.devices()) < 4:
        pytest.skip("needs virtual mesh")
    cfg = tiny_test_config().dit
    params = dit_lib.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (1, cfg.latent_frames, cfg.in_channels,
                           cfg.latent_height, cfg.latent_width))
    ts = jnp.asarray([999.0])
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (1, cfg.text_length, cfg.text_dim))
    want = dit_lib.forward(params, x, ts, ctx, cfg,
                           compute_dtype=jnp.float32)
    mesh = mesh_lib.make_mesh(MeshConfig(data=1, model=4, time=1),
                              jax.devices()[:4])
    sharded = mesh_lib.shard_params(params, mesh, mesh_lib.DIT_RULES)
    fn = jax.jit(lambda p, x, ts, ctx: dit_lib.forward(
        p, x, ts, ctx, cfg, compute_dtype=jnp.float32))
    with mesh:
        got = fn(sharded, x, ts, ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
