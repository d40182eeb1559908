"""Golden regression tests: frozen outputs of tiny models with fixed seeds.

The reference's test strategy relies on golden comparison against released
weights (SURVEY §4); without weights in this environment, we freeze OUR OWN
tiny-model outputs so cross-round refactors can't silently change numerics.

Regenerate after an INTENTIONAL change:
    LANDIFF_REGEN_GOLDEN=1 python -m pytest tests/test_golden.py
"""

import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN_DIR = Path(__file__).parent / "golden"
REGEN = os.environ.get("LANDIFF_REGEN_GOLDEN") == "1"


def check(name: str, arrays: dict[str, np.ndarray], rtol=2e-4, atol=2e-4):
    path = GOLDEN_DIR / f"{name}.npz"
    if REGEN or not path.exists():
        GOLDEN_DIR.mkdir(exist_ok=True)
        np.savez_compressed(path, **arrays)
        if not REGEN:
            pytest.skip(f"golden {name} created; rerun to compare")
        return
    want = np.load(path)
    for k, v in arrays.items():
        np.testing.assert_allclose(
            np.asarray(v, np.float64), np.asarray(want[k], np.float64),
            rtol=rtol, atol=atol, err_msg=f"{name}/{k}")


def test_golden_lm_codes():
    from landiff_tpu.config import ARSampleConfig, LLMConfig, Rope1DConfig
    from landiff_tpu.models import lm

    cfg = LLMConfig(hidden_size=32, num_layers=2, num_heads=2, mlp_hidden=64,
                    codebook_size=16, iframe_len=6, pframe_len=2,
                    frames_per_segment=3, cond_dim=32,
                    micro_cond_embed_dim=16,
                    rope=Rope1DConfig(dim=16, max_len=512))
    params = lm.init(jax.random.PRNGKey(0), cfg, t5_dim=24)
    text = lm.text_cond_features(params, jnp.ones((4, 24)),
                                 compute_dtype=jnp.float32)
    micro = lm.micro_cond_features(params, cfg,
                                   {"frames": 3, "motion_score": 0.1},
                                   compute_dtype=jnp.float32)
    prompt = lm.assemble_prompt(params, cfg, text, micro,
                                compute_dtype=jnp.float32)[None]
    sched = lm.build_schedule(cfg, prompt.shape[1], 3)
    codes = lm.sample(params, cfg, sched, prompt,
                      ARSampleConfig(cfg_scale=0.0, num_frames=3),
                      rng_key=jax.random.PRNGKey(11),
                      compute_dtype=jnp.float32, cache_dtype=jnp.float32)
    check("lm_codes", {"codes": codes}, rtol=0, atol=0)


def test_golden_dit_forward():
    from landiff_tpu.config import tiny_test_config
    from landiff_tpu.models import dit

    cfg = tiny_test_config().dit
    params = dit.init(jax.random.PRNGKey(1), cfg)
    ctrl = dit.init(jax.random.PRNGKey(2), cfg, control=True)
    x = jax.random.normal(jax.random.PRNGKey(3),
                          (1, cfg.latent_frames, cfg.in_channels,
                           cfg.latent_height, cfg.latent_width))
    ts = jnp.asarray([500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(4),
                            (1, cfg.text_length, cfg.text_dim))
    sem = 0.01 * jax.random.normal(jax.random.PRNGKey(5), x.shape)
    out = dit.control_warp_forward(params, ctrl, x, ts, ctx, cfg, sem,
                                   compute_dtype=jnp.float32)
    check("dit_forward", {"out": np.asarray(out)})


def test_golden_vae_roundtrip():
    from landiff_tpu.config import VAEConfig
    from landiff_tpu.models import vae

    cfg = VAEConfig(ch=8, ch_mult=(1, 2), num_res_blocks=1, z_channels=4,
                    temporal_compress_level=1, norm_num_groups=4)
    params = vae.init(jax.random.PRNGKey(6), cfg)
    x = jax.random.normal(jax.random.PRNGKey(7), (1, 3, 5, 16, 16))
    moments = vae.encode(params["encoder"], x, cfg,
                         compute_dtype=jnp.float32)
    z = vae.sample_posterior(moments)
    out, _ = vae.decode(params["decoder"], z, cfg, compute_dtype=jnp.float32)
    check("vae_roundtrip", {"moments": np.asarray(moments),
                            "out": np.asarray(out)})


def test_golden_sampler_trajectory():
    from landiff_tpu.config import SamplerConfig
    from landiff_tpu.diffusion import samplers, schedule

    cfg = SamplerConfig(num_steps=10)
    t = schedule.sampler_tables(cfg)
    target = jax.random.normal(jax.random.PRNGKey(8), (1, 2, 3, 4, 4))

    def denoise_fn(x, step):
        # nontrivial but deterministic pseudo-model
        return 0.9 * jnp.broadcast_to(target, x.shape) + 0.05 * x

    x0 = jax.random.normal(jax.random.PRNGKey(9), target.shape)
    out = samplers.vpsde_dpmpp2m_sample(denoise_fn, x0, cfg,
                                        key=jax.random.PRNGKey(10))
    check("sampler_traj", {
        "alpha": t["alpha"], "cfg_scale": t["cfg_scale"],
        "out": np.asarray(out)})
