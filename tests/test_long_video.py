"""Long-video streaming: multi-segment stage-1 schedule + chunked diffusion
with prefix conditioning + single streaming VAE decode."""

import jax
import jax.numpy as jnp
import numpy as np

from landiff_tpu.config import tiny_test_config
from landiff_tpu.models import lm as lm_lib
from landiff_tpu.pipeline import dif_infer, long_video

CFG = tiny_test_config()


def test_multi_segment_schedule():
    """Stage-1 schedule for 2 segments (2x frames) has 2x visual tokens and
    a forced SOI at the start of the second block."""
    llm = CFG.llm
    seg = llm.frames_per_segment
    one = lm_lib.build_schedule(llm, prefix_len=9, num_frames=seg)
    two = lm_lib.build_schedule(llm, prefix_len=9, num_frames=2 * seg)
    assert two.num_visual == 2 * one.num_visual
    vocab = lm_lib.Vocab(llm.codebook_size)
    block = llm.iframe_len + (seg - 1) * llm.pframe_len + 2 * seg
    soi2 = 8 + block  # start_of_iframe_index + visual_block_len
    assert two.forced[soi2] == vocab.START_OF_IFRAME


def test_long_video_two_segments():
    key = jax.random.PRNGKey(0)
    params = dif_infer.init_params(key, CFG)
    t = CFG.tokenizer.titok
    n_codes = 2 * t.latent_tokens
    codes = np.random.default_rng(0).integers(
        0, CFG.tokenizer.vq.codebook_size, size=n_codes)
    ctx = jnp.zeros((1, CFG.dit.text_length, CFG.dit.text_dim))
    video, latents = long_video.generate_long_video(
        params, CFG, ctx, jnp.zeros_like(ctx), codes,
        key=jax.random.PRNGKey(1), prefix_latents=1,
        compute_dtype=jnp.float32)
    lat_frames = CFG.dit.latent_frames
    expect_latents = lat_frames + (lat_frames - 1)  # prefix 1
    assert latents.shape[1] == expect_latents
    # VAE: 1 + (T_lat - 1) * 2^compress  (tiny: compress level 1)
    assert video.shape[2] == 1 + (expect_latents - 1) * 2
    assert video.shape[1] == 3
    assert not np.isnan(np.asarray(video)).any()
    assert float(video.min()) >= 0.0 and float(video.max()) <= 1.0


def test_long_video_chunked_equals_full():
    """max_steps_per_call threading: chunked per-segment sampling must be
    bit-identical to the single-scan path (remote-attached runtimes kill
    long single executions, so production always chunks)."""
    key = jax.random.PRNGKey(0)
    params = dif_infer.init_params(key, CFG)
    t = CFG.tokenizer.titok
    codes = np.random.default_rng(1).integers(
        0, CFG.tokenizer.vq.codebook_size, size=2 * t.latent_tokens)
    ctx = jnp.zeros((1, CFG.dit.text_length, CFG.dit.text_dim))
    kw = dict(key=jax.random.PRNGKey(2), prefix_latents=1,
              compute_dtype=jnp.float32)
    full = long_video.generate_long_video_latents(
        params, CFG, ctx, jnp.zeros_like(ctx), codes, **kw)
    chunked = long_video.generate_long_video_latents(
        params, CFG, ctx, jnp.zeros_like(ctx), codes,
        max_steps_per_call=2, **kw)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               rtol=1e-5, atol=1e-5)


def test_long_video_four_segments_boundary_continuity():
    """BASELINE staged config #5 mechanism at >= 4 segments: every
    segment boundary must carry the prefix latents over EXACTLY (the
    spliced frames are the previous segment's output, sampling.py:800-817),
    total length must follow 13 + (n-1)*(13-p) scaling, and no seam NaNs
    or blow-ups appear as segments accumulate."""
    key = jax.random.PRNGKey(0)
    params = dif_infer.init_params(key, CFG)
    t = CFG.tokenizer.titok
    n_seg = 4
    codes = np.random.default_rng(2).integers(
        0, CFG.tokenizer.vq.codebook_size, size=n_seg * t.latent_tokens)
    ctx = jnp.zeros((1, CFG.dit.text_length, CFG.dit.text_dim))
    p = 1
    lat = CFG.dit.latent_frames

    # per-prefix-count check: the concat math must hold for p=1 and p=2
    for p in (1, 2):
        if lat - p < 1:
            continue
        latents = long_video.generate_long_video_latents(
            params, CFG, ctx, jnp.zeros_like(ctx), codes,
            key=jax.random.PRNGKey(3), prefix_latents=p,
            compute_dtype=jnp.float32)
        assert latents.shape[1] == lat + (n_seg - 1) * (lat - p)
        arr = np.asarray(latents)
        assert np.isfinite(arr).all()
        # seam health: per-frame RMS must stay in the same range across
        # ALL segment boundaries (drift across 4 segments would compound)
        rms = np.sqrt((arr ** 2).mean(axis=(0, 2, 3, 4)))
        assert rms.max() < 10 * max(rms.min(), 1e-3), rms

    # continuity: re-running with the same key but truncated codes must
    # reproduce the shared prefix of the stream (segment k depends only on
    # segments < k, never on later ones)
    latents4 = long_video.generate_long_video_latents(
        params, CFG, ctx, jnp.zeros_like(ctx), codes,
        key=jax.random.PRNGKey(3), prefix_latents=1,
        compute_dtype=jnp.float32)
    latents2 = long_video.generate_long_video_latents(
        params, CFG, ctx, jnp.zeros_like(ctx),
        codes[:2 * t.latent_tokens],
        key=jax.random.PRNGKey(3), prefix_latents=1,
        compute_dtype=jnp.float32)
    n2 = latents2.shape[1]
    np.testing.assert_allclose(np.asarray(latents4)[:, :n2],
                               np.asarray(latents2), rtol=1e-5, atol=1e-5)


def test_long_video_sp_mesh_matches_single():
    """Long-video chunked diffusion on a sequence-parallel (data=2, time=4)
    mesh: the per-segment SP denoise program (dit.forward_sp + ring
    attention) must reproduce the single-device latent stream, including
    the prefix splices at segment boundaries."""
    from landiff_tpu.config import MeshConfig
    from landiff_tpu.parallel import mesh as mesh_lib

    key = jax.random.PRNGKey(0)
    params = dif_infer.init_params(key, CFG)
    t = CFG.tokenizer.titok
    codes = np.random.default_rng(3).integers(
        0, CFG.tokenizer.vq.codebook_size, size=2 * t.latent_tokens)
    ctx = jnp.zeros((1, CFG.dit.text_length, CFG.dit.text_dim))
    kw = dict(key=jax.random.PRNGKey(4), prefix_latents=1,
              compute_dtype=jnp.float32, attn_impl="xla")
    want = long_video.generate_long_video_latents(
        params, CFG, ctx, jnp.zeros_like(ctx), codes, **kw)
    mesh = mesh_lib.make_mesh(MeshConfig(data=2, model=1, time=4),
                              jax.devices()[:8])
    got = long_video.generate_long_video_latents(
        params, CFG, ctx, jnp.zeros_like(ctx), codes, mesh=mesh, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)


def test_long_video_full_wrapper_sp_mesh():
    """generate_long_video(mesh=...): SP denoise + (CP or fallback) VAE
    decode must reproduce the single-device video."""
    from landiff_tpu.config import MeshConfig
    from landiff_tpu.parallel import mesh as mesh_lib

    key = jax.random.PRNGKey(0)
    params = dif_infer.init_params(key, CFG)
    t = CFG.tokenizer.titok
    codes = np.random.default_rng(5).integers(
        0, CFG.tokenizer.vq.codebook_size, size=2 * t.latent_tokens)
    ctx = jnp.zeros((1, CFG.dit.text_length, CFG.dit.text_dim))
    kw = dict(key=jax.random.PRNGKey(6), prefix_latents=1,
              compute_dtype=jnp.float32, attn_impl="xla")
    want_v, want_l = long_video.generate_long_video(
        params, CFG, ctx, jnp.zeros_like(ctx), codes, **kw)
    mesh = mesh_lib.make_mesh(MeshConfig(data=2, model=1, time=4),
                              jax.devices()[:8])
    got_v, got_l = long_video.generate_long_video(
        params, CFG, ctx, jnp.zeros_like(ctx), codes, mesh=mesh, **kw)
    np.testing.assert_allclose(np.asarray(got_l), np.asarray(want_l),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=5e-4, atol=5e-4)
