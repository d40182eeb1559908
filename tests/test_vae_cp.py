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
