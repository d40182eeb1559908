"""End-to-end pipeline smoke on the tiny config: prompt -> codes -> video."""

import numpy as np

from landiff_tpu.pipeline.infer_video import run


def test_tiny_pipeline_end_to_end(tmp_path):
    res = run("a cat playing piano", output_dir=str(tmp_path), seed=7,
              tiny=True)
    codes = res["codes"]
    video = res["video"]
    assert codes.ndim == 1 and len(codes) > 0
    assert video.ndim == 5 and video.shape[1] == 3
    assert video.min() >= 0.0 and video.max() <= 1.0
    assert not np.isnan(video).any()
    # files written (mp4, or MJPEG-AVI fallback when ffmpeg is unavailable)
    assert (list(tmp_path.glob("*.mp4")) or list(tmp_path.glob("*.avi"))
            or list(tmp_path.glob("*.gif")))
    assert list(tmp_path.glob("*_codes.npy"))


def test_image2video_prefix(tmp_path):
    """i2v path: VAE-encoded prefix latents preserved through sampling."""
    import jax
    import jax.numpy as jnp

    from landiff_tpu.config import tiny_test_config
    from landiff_tpu.pipeline import dif_infer

    cfg = tiny_test_config()
    params = dif_infer.init_params(jax.random.PRNGKey(0), cfg)
    wrap = dif_infer.CogModelInferWrapper(params, cfg,
                                          compute_dtype=jnp.float32)
    t = cfg.tokenizer.titok
    codes = np.zeros(t.latent_tokens, np.int32)
    # prefix: 3 RGB frames -> (1 + 2)/2 = 2 latent frames (tiny: 2x temporal)
    prefix_video = np.random.default_rng(0).random(
        (1, 3, 3, cfg.dit.latent_height * 2, cfg.dit.latent_width * 2)
    ).astype(np.float32)
    task = wrap(dif_infer.VideoTask(save_file_name="x", prompt="p", seed=1,
                                    semantic_token=codes),
                prefix_video=prefix_video)
    assert task.result is not None
    assert task.latent.shape[1] == cfg.dit.latent_frames


def test_tiny_pipeline_long_video(tmp_path):
    """Multi-segment prompt routes through the long-video streaming path."""
    from landiff_tpu.config import tiny_test_config

    cfg = tiny_test_config()
    seg = cfg.llm.frames_per_segment
    res = run("a dog surfing", output_dir=str(tmp_path), seed=3, tiny=True,
              num_frames=2 * seg)
    t = cfg.tokenizer.titok
    assert len(res["codes"]) == 2 * t.latent_tokens
    # latent frames: 13-tiny=3 -> 3 + (3 - 7?) prefix default 7 > tiny lat
    video = res["video"]
    assert video.shape[1] == 3 and not np.isnan(video).any()


def test_video_to_uint8_roundtrip():
    """Device-side uint8 fetch helper: exact 255-step quantization of the
    [0,1] video (the saved container is uint8 anyway; 4x fewer host
    transfer bytes)."""
    import jax.numpy as jnp
    import numpy as np

    from landiff_tpu.diffusion import engine

    v = jnp.asarray([[0.0, 0.5, 1.0, 0.999, -0.1, 1.1]])
    got = np.asarray(engine.video_to_uint8(v))
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, [[0, 128, 255, 255, 0, 255]])


def test_offload_diffusion_params_moves_to_host(tmp_path):
    """offload_diffusion_params converts main/control/semantic leaves to
    numpy (freeing HBM) and the wrapper still works afterwards (host
    pytrees restage automatically on the next jitted call)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from landiff_tpu.config import tiny_test_config
    from landiff_tpu.pipeline import dif_infer

    cfg = tiny_test_config()
    params = dif_infer.init_params(jax.random.PRNGKey(0), cfg,
                                   dtype=jnp.float32)
    w = dif_infer.CogModelInferWrapper(params, cfg,
                                       compute_dtype=jnp.float32)
    w.offload_diffusion_params()
    leaves = jax.tree_util.tree_leaves(w.params["main"])
    assert all(isinstance(x, np.ndarray) for x in leaves)
    task = w(dif_infer.VideoTask(save_file_name="x.mp4", prompt="p",
                                 seed=0, semantic_token=np.zeros(
                                     cfg.tokenizer.titok.latent_tokens,
                                     np.int32)))
    assert task.result is not None and np.isfinite(task.result).all()
