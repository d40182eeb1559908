"""Cross-step model-output reuse (LANDIFF_STEP_REUSE) — the FORA/TeaCache
family of training-free DiT caches, TPU-adapted as a per-step lax.cond in
the DPM++2M scan (samplers._dpmpp2m_chunk_program reuse variant).

Quality-affecting and OFF by default; the reference has no equivalent
(its sampler always calls the network, sampling.py:678-837). These tests
pin the mechanics:
  - wiring exactness: for a denoiser whose residual (denoised − x) is
    constant, reuse is EXACT — any carry/table/cond mistake breaks equality
  - skipped steps really skip the model (host call counter via
    jax.debug.callback fires only on computed steps)
  - on a smooth contraction denoiser the drift is small but nonzero
  - the env knob plumbs through engine.sample_latents
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from landiff_tpu.config import SamplerConfig
from landiff_tpu.diffusion import samplers


def _cfg(n=10):
    return SamplerConfig(num_steps=n)


SHAPE = (1, 3, 2, 4, 4)  # (B, T, C, H, W)


@pytest.mark.parametrize("fixed_frames,sdedit", [(0, False), (1, False),
                                                 (1, True)])
def test_reuse_exact_for_constant_residual(fixed_frames, sdedit):
    # denoised = x + c  =>  resid = c at every step, so the reuse branch
    # x + resid reproduces the model branch up to one f32 rounding (resid
    # is reconstructed as (x_prev + c) − x_prev); same key => same noise
    # path, so any carry/table/cond wiring mistake shows up as large error.
    c = jnp.asarray(np.random.default_rng(0).standard_normal(SHAPE),
                    jnp.float32)

    def denoise_fn(x, step):
        return x + c

    cfg = _cfg()
    x0 = jnp.asarray(np.random.default_rng(1).standard_normal(SHAPE),
                     jnp.float32)
    key = jax.random.PRNGKey(7)
    kw = dict(key=key, fixed_frames=fixed_frames, sdedit=sdedit)
    exact = samplers.vpsde_dpmpp2m_sample(denoise_fn, x0, cfg, **kw)
    reused = samplers.vpsde_dpmpp2m_sample(denoise_fn, x0, cfg,
                                           reuse_every=3, reuse_head=1,
                                           reuse_tail=1, **kw)
    np.testing.assert_allclose(np.asarray(exact), np.asarray(reused),
                               rtol=1e-5, atol=1e-5)


def test_reuse_skips_model_calls():
    calls = []

    def bump(_):
        calls.append(1)

    def denoise_fn(x, step):
        jax.debug.callback(bump, step["timestep"])
        return 0.9 * x

    cfg = _cfg(10)
    x0 = jnp.ones(SHAPE, jnp.float32)
    key = jax.random.PRNGKey(0)

    calls.clear()
    np.asarray(samplers.vpsde_dpmpp2m_sample(denoise_fn, x0, cfg, key=key))
    assert len(calls) == 10  # default: every step computes

    calls.clear()
    np.asarray(samplers.vpsde_dpmpp2m_sample(
        denoise_fn, x0, cfg, key=key, reuse_every=2, reuse_head=2,
        reuse_tail=2))
    # head {0,1} + middle {2,4,6} ((i-2)%2==0 on 2..7) + tail {8,9}
    assert len(calls) == 7

    calls.clear()
    np.asarray(samplers.vpsde_dpmpp2m_sample(
        denoise_fn, x0, cfg, key=key, reuse_every=3, reuse_head=1,
        reuse_tail=1, max_steps_per_call=4))  # chunked path too
    # head {0} + middle {1,4,7} ((i-1)%3==0 on 1..8) + tail {9}
    assert len(calls) == 5


def test_reuse_head_and_tail_clamped_to_one():
    # step 0 must compute (resid init is zeros) and the final is_last step
    # must compute (its denoised passthrough IS the sample output — a
    # skipped last step would return a pure extrapolation); both head=0
    # and tail=0 are clamped to 1 (ADVICE r4)
    calls = []

    def denoise_fn(x, step):
        jax.debug.callback(lambda _: calls.append(1), step["timestep"])
        return 0.9 * x

    cfg = _cfg(6)
    np.asarray(samplers.vpsde_dpmpp2m_sample(
        denoise_fn, jnp.ones(SHAPE, jnp.float32), cfg,
        key=jax.random.PRNGKey(0), reuse_every=6, reuse_head=0,
        reuse_tail=0))
    # head {0} + middle {1} ((i-1)%6==0 on 1..4) + tail {5}
    assert len(calls) == 3
    sched = samplers.reuse_compute_schedule(6, 6, head=0, tail=0)
    assert bool(sched[0]) and bool(sched[-1]) and int(sched.sum()) == 3


def test_reuse_drift_small_on_contraction():
    # a denoiser that contracts toward a target (what trained denoisers do
    # along the schedule): resid varies smoothly, reuse is approximate —
    # drift must be small but NONZERO (else the test would be vacuous)
    target = jnp.asarray(np.random.default_rng(3).standard_normal(SHAPE),
                         jnp.float32)

    def denoise_fn(x, step):
        return target + 0.2 * (x - target)

    cfg = _cfg(12)
    x0 = jnp.asarray(np.random.default_rng(4).standard_normal(SHAPE),
                     jnp.float32)
    key = jax.random.PRNGKey(5)
    exact = np.asarray(samplers.vpsde_dpmpp2m_sample(
        denoise_fn, x0, cfg, key=key))
    reused = np.asarray(samplers.vpsde_dpmpp2m_sample(
        denoise_fn, x0, cfg, key=key, reuse_every=2))
    assert not np.array_equal(exact, reused)
    corr = np.corrcoef(exact.ravel(), reused.ravel())[0, 1]
    assert corr > 0.99, corr


def test_env_knob_plumbs_through_engine(monkeypatch):
    import dataclasses

    from landiff_tpu.config import tiny_test_config
    from landiff_tpu.diffusion import engine

    cfg = tiny_test_config()
    # the tiny config's 4 steps are fully covered by the default
    # head(3)+tail(3) always-compute windows; give the middle room
    cfg = dataclasses.replace(cfg, sampler=dataclasses.replace(
        cfg.sampler, num_steps=12))
    calls = []

    def denoise_fn(x, step, bundle):
        jax.debug.callback(lambda _: calls.append(1), step["timestep"])
        return 0.5 * x

    n = cfg.sampler.num_steps
    monkeypatch.setenv("LANDIFF_STEP_REUSE", "2")
    out = engine.sample_latents(denoise_fn, cfg.sampler, cfg.dit,
                                key=jax.random.PRNGKey(0), bundle={})
    np.asarray(out)
    assert 0 < len(calls) < n
    assert np.isfinite(np.asarray(out)).all()

    calls.clear()
    monkeypatch.setenv("LANDIFF_STEP_REUSE", "0")
    np.asarray(engine.sample_latents(denoise_fn, cfg.sampler, cfg.dit,
                                     key=jax.random.PRNGKey(0), bundle={}))
    assert len(calls) == n
