"""Causal 3D VAE: shape contracts, causality, and the critical streaming
equivalence — chunked decode with conv-cache carry must match full decode
bit-for-bit-ish (SURVEY hard part #4; reference seam cp_enc_dec.py:249-300)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from landiff_tpu.config import VAEConfig
from landiff_tpu.models import vae

CFG = VAEConfig(ch=8, ch_mult=(1, 2), num_res_blocks=1, z_channels=4,
                in_channels=3, out_channels=3, temporal_compress_level=1,
                norm_num_groups=4)


def test_encode_decode_shapes():
    params = vae.init(jax.random.PRNGKey(0), CFG)
    # T = 1 + 2*k frames; spatial /2 per level (1 downsample), temporal /2
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 5, 16, 16))
    moments = vae.encode(params["encoder"], x, CFG,
                         compute_dtype=jnp.float32)
    # T: 5 -> 1+(5-1)/2 = 3 ; spatial 16 -> 8 ; channels 2*z
    assert moments.shape == (1, 8, 3, 8, 8)
    z = vae.sample_posterior(moments)
    assert z.shape == (1, 4, 3, 8, 8)
    out, cache = vae.decode(params["decoder"], z, CFG,
                            compute_dtype=jnp.float32)
    assert out.shape == (1, 3, 5, 16, 16)
    assert cache is None
    assert not np.isnan(np.asarray(out)).any()


def test_causal_conv_is_causal():
    """Conv output at frame t depends only on inputs <= t. (The full decoder
    is NOT frame-causal — GroupNorm statistics span T, as in the reference —
    so causality is a property of the conv path, exercised chunk-wise by the
    streaming decode.)"""
    p = vae._conv3d_init(jax.random.PRNGKey(0), 3, 3, 3, 2, 2, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 4, 4, 2))
    y1 = vae.causal_conv3d(p, x, None, "t", {}, False)
    y2 = vae.causal_conv3d(p, x.at[:, 4:].add(5.0), None, "t", {}, False)
    np.testing.assert_allclose(np.asarray(y1)[:, :4], np.asarray(y2)[:, :4],
                               rtol=1e-6, atol=1e-6)
    assert np.abs(np.asarray(y1)[:, 4:] - np.asarray(y2)[:, 4:]).max() > 0.1


def test_streaming_matches_full_when_norms_are_local():
    """With T-local norms (GroupNorm over one frame at a time is NOT local,
    so use a config where chunk boundaries align with the reference chunking)
    the chunked decode must equal the full decode on the overlapping causal
    path. The reference accepts per-chunk GroupNorm statistics, so parity
    here is with ITS chunked output, i.e. we verify cache mechanics: the
    second chunk must see the first chunk's conv tails."""
    params = vae.init(jax.random.PRNGKey(0), CFG)
    z = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 7, 4, 4))

    # manual two-chunk decode with cache
    out_a, cache = vae.decode(params["decoder"], z[:, :, :3], CFG,
                              stream=True, compute_dtype=jnp.float32)
    out_b, _ = vae.decode(params["decoder"], z[:, :, 3:5], CFG, cache=cache,
                          compute_dtype=jnp.float32)
    # driver produces the same
    full = vae.decode_streaming(params["decoder"], z, CFG,
                                compute_dtype=jnp.float32)
    got_a = np.asarray(full)[:, :, :out_a.shape[2]]
    np.testing.assert_allclose(got_a, np.asarray(out_a), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(full)[:, :, out_a.shape[2]:out_a.shape[2] + out_b.shape[2]],
        np.asarray(out_b), rtol=1e-5, atol=1e-5)
    # frame count: first chunk 1+2*2=5, chunks of 2 -> 4 frames each
    assert full.shape[2] == 5 + 4 + 4

    # cache ignored -> different second chunk (replicate-pad kicks in)
    out_b_nocache, _ = vae.decode(params["decoder"], z[:, :, 3:5], CFG,
                                  compute_dtype=jnp.float32)
    assert np.abs(np.asarray(out_b) - np.asarray(out_b_nocache)).max() > 1e-4


def test_causal_conv_matches_torch_conv3d():
    """Single causal conv vs torch conv3d with manual replicate padding."""
    key = jax.random.PRNGKey(4)
    p = vae._conv3d_init(key, 3, 3, 3, 2, 5, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 4, 6, 6, 2))
    upd = {}
    got = causal_out = vae.causal_conv3d(p, x, None, "t", upd, False)
    xt = torch.from_numpy(np.asarray(x).transpose(0, 4, 1, 2, 3))
    wt = torch.from_numpy(np.asarray(p["w"]).transpose(4, 3, 0, 1, 2))
    bt = torch.from_numpy(np.asarray(p["b"]))
    xp = torch.cat([xt[:, :, :1]] * 2 + [xt], dim=2)
    xp = torch.nn.functional.pad(xp, (1, 1, 1, 1))
    want = torch.nn.functional.conv3d(xp, wt, bt)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 4, 1, 2, 3), want.numpy(),
        rtol=1e-4, atol=1e-4)


def test_nearest_resize_matches_torch():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 3, 4, 5, 2)),
                    jnp.float32)
    got = vae._nearest_resize_3d(x, 6, 8, 10)
    xt = torch.from_numpy(np.asarray(x).transpose(0, 4, 1, 2, 3))
    want = torch.nn.functional.interpolate(xt, size=(6, 8, 10), mode="nearest")
    np.testing.assert_allclose(np.asarray(got).transpose(0, 4, 1, 2, 3),
                               want.numpy(), atol=0)


def test_encode_streaming_cache_mechanics():
    """Chunked encode with conv-cache carry: the driver's output must equal
    a manual chunked encode (cache threaded), each later chunk must SEE the
    previous chunk's conv tails (dropping the cache changes the result),
    and latent counts must match the full encode. Per-chunk GroupNorm
    statistics are the same approximation the reference's chunked decode
    accepts, so full-vs-streaming is compared as high correlation, not
    exact equality."""
    params = vae.init(jax.random.PRNGKey(0), CFG)
    # tf = 2 (tcl=1): first chunk 3 = 1+2, tails of 2
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 9, 16, 16))

    got = vae.encode_streaming(params["encoder"], x, CFG,
                               compute_dtype=jnp.float32, first_chunk=3)

    m_a, cache = vae.encode(params["encoder"], x[:, :, :3], CFG,
                            compute_dtype=jnp.float32, stream=True)
    outs = [m_a]
    for a in (3, 5, 7):
        m, cache = vae.encode(params["encoder"], x[:, :, a:a + 2], CFG,
                              compute_dtype=jnp.float32, cache=cache,
                              stream=True)
        outs.append(m)
    want = np.concatenate([np.asarray(o) for o in outs], axis=2)
    # driver's tail chunks default to LANDIFF_VAE_ENC_CHUNK=8 > remaining
    # frames, so re-run with matching manual chunking via env
    import os

    os.environ["LANDIFF_VAE_ENC_CHUNK"] = "2"
    try:
        got = vae.encode_streaming(params["encoder"], x, CFG,
                                   compute_dtype=jnp.float32, first_chunk=3)
    finally:
        del os.environ["LANDIFF_VAE_ENC_CHUNK"]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)

    # cache actually matters: chunk 2 without it (replicate-pad) differs
    m_nocache = vae.encode(params["encoder"], x[:, :, 3:5], CFG,
                           compute_dtype=jnp.float32)
    assert np.abs(np.asarray(m_nocache) - np.asarray(outs[1])).max() > 1e-4

    # full-graph encode: same shape, high agreement. GN stats differ per
    # chunk; at this tiny 16x16 spatial size the per-group sample count is
    # ~100x smaller than production 480p, so the drift bound here is loose
    # (0.976 measured at random init) — production-scale agreement is what
    # the reference's own chunked decode accepts
    full = vae.encode(params["encoder"], x, CFG, compute_dtype=jnp.float32)
    assert full.shape == got.shape
    corr = np.corrcoef(np.asarray(full).ravel(), np.asarray(got).ravel())[0, 1]
    assert corr > 0.95, corr


def test_encode_streaming_validates_chunking():
    params = vae.init(jax.random.PRNGKey(0), CFG)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 9, 16, 16))
    import pytest

    with pytest.raises(ValueError):  # first chunk not 1 + k*tf
        vae.encode_streaming(params["encoder"], x, CFG,
                             compute_dtype=jnp.float32, first_chunk=2)
    with pytest.raises(ValueError):  # T not 1 + k*tf
        vae.encode_streaming(params["encoder"], x[:, :, :8], CFG,
                             compute_dtype=jnp.float32)


def test_encode_first_stage_streaming_matches_itself():
    """engine.encode_first_stage(streaming=True) == manual scale+transpose
    of vae.encode_streaming (mode posterior)."""
    from landiff_tpu.diffusion import engine

    params = {"encoder": vae.init(jax.random.PRNGKey(0), CFG)["encoder"]}
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 3, 5, 16, 16))
    got = engine.encode_first_stage(params, x, CFG,
                                    compute_dtype=jnp.float32,
                                    streaming=True)
    moments = vae.encode_streaming(params["encoder"], x, CFG,
                                   compute_dtype=jnp.float32)
    want = (CFG.scale_factor
            * vae.sample_posterior(moments)).transpose(0, 2, 1, 3, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6,
                               atol=1e-6)
