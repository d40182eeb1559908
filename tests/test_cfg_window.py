"""Guidance-window CFG (LANDIFF_CFG_WINDOW) — the training-free
guidance-interval technique (full two-row CFG only inside a step window,
cond-row-only outside; Kynkäänniemi et al. 2024), TPU-adapted as STATIC
window segmentation: contiguous window segments dispatch their own full /
cond-only chunk programs (samplers._dpmpp2m_chunk_program row_mode) — a
per-step lax.cond variant was measured slower than exact and replaced
(PARITY.md).

Quality-affecting and OFF by default; it windows the surface the reference
always runs (DynamicCFG + two-row prepare_inputs, guiders.py:58-96). Pins:
  - wiring exactness: a window covering every step equals the default path
    bit-for-bit (same noise path, same math)
  - outside the window the COND-ONLY branch runs (call counters), and for a
    context-independent denoiser the windowed run equals a cfg_scale->
    windowed reference computed by hand
  - the real tiny DiT path (engine.make_denoise_fn cond_only) matches a
    manual cond-row forward and drifts little on a subset window
  - composes with LANDIFF_STEP_REUSE; env knob plumbs through sample_latents
  - a denoise_fn without .cond_only raises (mesh TP shards CFG rows over
    `data` — skipping the uncond row idles a shard instead of saving time,
    so the mesh path deliberately has no cond_only)
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from landiff_tpu.config import SamplerConfig, tiny_test_config
from landiff_tpu.diffusion import samplers

SHAPE = (1, 3, 2, 4, 4)


def _cfg(n=10):
    return SamplerConfig(num_steps=n)


def _mk_fn(calls_full=None, calls_cond=None, delta=0.3):
    """Denoiser pair where full-CFG and cond-only outputs differ by a
    known constant, so windowing is verifiable in closed form."""

    def denoise_fn(x, step):
        if calls_full is not None:
            jax.debug.callback(lambda _: calls_full.append(1),
                               step["timestep"])
        return 0.9 * x + delta

    def cond_only(x, step):
        if calls_cond is not None:
            jax.debug.callback(lambda _: calls_cond.append(1),
                               step["timestep"])
        return 0.9 * x

    denoise_fn.cond_only = cond_only
    return denoise_fn


def test_schedule():
    s = samplers.cfg_window_schedule(10, 2, 8)
    assert s.tolist() == [False] * 2 + [True] * 6 + [False] * 2
    # negative hi counts from the end
    np.testing.assert_array_equal(samplers.cfg_window_schedule(10, 2, -2), s)
    assert samplers.cfg_window_schedule(10, 0, 10).all()


def test_full_window_equals_default():
    fn = _mk_fn()
    cfg = _cfg()
    x0 = jnp.asarray(np.random.default_rng(1).standard_normal(SHAPE),
                     jnp.float32)
    key = jax.random.PRNGKey(7)
    exact = samplers.vpsde_dpmpp2m_sample(fn, x0, cfg, key=key)
    windowed = samplers.vpsde_dpmpp2m_sample(fn, x0, cfg, key=key,
                                             cfg_window=(0, cfg.num_steps))
    np.testing.assert_array_equal(np.asarray(exact), np.asarray(windowed))


def test_branch_selection_counts():
    full, cond = [], []
    fn = _mk_fn(full, cond)
    cfg = _cfg(10)
    x0 = jnp.ones(SHAPE, jnp.float32)
    np.asarray(samplers.vpsde_dpmpp2m_sample(fn, x0, cfg,
                                             key=jax.random.PRNGKey(0),
                                             cfg_window=(3, 8)))
    assert len(full) == 5 and len(cond) == 5
    # chunked path picks the same branches
    full.clear(), cond.clear()
    np.asarray(samplers.vpsde_dpmpp2m_sample(fn, x0, cfg,
                                             key=jax.random.PRNGKey(0),
                                             cfg_window=(3, 8),
                                             max_steps_per_call=4))
    assert len(full) == 5 and len(cond) == 5


def test_windowed_math_matches_handrolled():
    # fn/fn.cond_only differ by the constant delta; a windowed run must
    # equal a single unwindowed run of a denoiser that applies delta only
    # inside the window
    cfg = _cfg(9)
    lo, hi = 2, 6
    fn = _mk_fn(delta=0.3)
    x0 = jnp.asarray(np.random.default_rng(2).standard_normal(SHAPE),
                     jnp.float32)
    key = jax.random.PRNGKey(3)
    got = samplers.vpsde_dpmpp2m_sample(fn, x0, cfg, key=key,
                                        cfg_window=(lo, hi))
    tables = samplers._per_step_arrays(cfg)[1]
    idx_in_window = jnp.asarray(
        samplers.cfg_window_schedule(cfg.num_steps, lo, hi))
    ts_in_window = jnp.asarray(tables["timestep"])[idx_in_window]

    def manual(x, step):
        inside = jnp.isin(step["timestep"], ts_in_window)
        return 0.9 * x + jnp.where(inside, 0.3, 0.0)

    want = samplers.vpsde_dpmpp2m_sample(manual, x0, cfg, key=key)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_missing_cond_only_raises():
    def fn(x, step):
        return 0.9 * x

    with pytest.raises(ValueError, match="cond_only"):
        samplers.vpsde_dpmpp2m_sample(fn, jnp.ones(SHAPE, jnp.float32),
                                      _cfg(), key=jax.random.PRNGKey(0),
                                      cfg_window=(1, 5))


def test_composes_with_step_reuse():
    full, cond = [], []
    fn = _mk_fn(full, cond)
    cfg = _cfg(10)
    np.asarray(samplers.vpsde_dpmpp2m_sample(
        fn, jnp.ones(SHAPE, jnp.float32), cfg, key=jax.random.PRNGKey(0),
        cfg_window=(3, 8), reuse_every=2, reuse_head=2, reuse_tail=2))
    # reuse computes steps {0,1,2,4,6,8,9}; of those, {4,6} ∈ [3,8) run
    # full CFG... wait: {3<=s<8} ∩ computed = {4,6} plus none of head/tail
    computed = samplers.reuse_compute_schedule(10, 2, 2, 2)
    gw = samplers.cfg_window_schedule(10, 3, 8)
    assert len(full) == int((computed & gw).sum())
    assert len(cond) == int((computed & ~gw).sum())


def test_engine_cond_only_matches_manual_row():
    """engine.make_denoise_fn's cond_only == the cond row of the full
    two-row call at cfg_scale 1 semantics (real tiny DiT + control +
    semantic path, zero-init leaves randomized per the vacuous-pass rule)."""
    from landiff_tpu import utils
    from landiff_tpu.diffusion import engine, schedule
    from landiff_tpu.models import dit as dit_lib
    from landiff_tpu.models import semantic_cond as sc_lib

    cfg = tiny_test_config()
    d, t = cfg.dit, cfg.tokenizer
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    main_p = utils.fill_zero_leaves(dit_lib.init(ks[0], d,
                                                 dtype=jnp.float32), ks[1])
    ctrl_p = utils.fill_zero_leaves(
        dit_lib.init(ks[2], d, control=True, dtype=jnp.float32), ks[3])
    sem_p = utils.fill_zero_leaves(
        sc_lib.init(ks[4], t, cfg.semantic_cond, jnp.float32), ks[5])
    ctx = jax.random.normal(ks[6], (1, d.text_length, d.text_dim),
                            jnp.float32)
    uc = jnp.zeros_like(ctx)
    n_sem = cfg.llm.iframe_len + (d.latent_frames - 1) * cfg.llm.pframe_len
    codes = jax.random.randint(ks[7], (1, n_sem), 0, t.vq.codebook_size)
    fn, bundle = engine.make_denoise_fn(
        main_p, ctrl_p, sem_p, d, cfg.sampler, t, cfg.semantic_cond,
        ctx, uc, codes, compute_dtype=jnp.float32, attn_impl="xla")
    tab = schedule.sampler_tables(cfg.sampler)
    step = {"alpha": jnp.float32(tab["alpha"][1]),
            "timestep": jnp.int32(tab["timestep"][1]),
            "idx": jnp.int32(tab["idx"][1]),
            "cfg_scale": jnp.float32(1.0)}  # scale 1 => cond row exactly
    x = jax.random.normal(jax.random.PRNGKey(9),
                          (1, d.latent_frames, d.in_channels,
                           d.latent_height, d.latent_width), jnp.float32)
    full = np.asarray(fn(x, step, bundle))
    cond = np.asarray(fn.cond_only(x, step, bundle))
    np.testing.assert_allclose(cond, full, rtol=2e-5, atol=2e-5)


def test_env_knob_plumbs_through_engine(monkeypatch):
    from landiff_tpu.diffusion import engine

    cfg = tiny_test_config()
    cfg = dataclasses.replace(cfg, sampler=dataclasses.replace(
        cfg.sampler, num_steps=10))
    full, cond = [], []

    def denoise_fn(x, step, bundle):
        jax.debug.callback(lambda _: full.append(1), step["timestep"])
        return 0.5 * x

    def cond_only(x, step, bundle):
        jax.debug.callback(lambda _: cond.append(1), step["timestep"])
        return 0.5 * x

    denoise_fn.cond_only = cond_only
    monkeypatch.setenv("LANDIFF_CFG_WINDOW", "2,8")
    out = engine.sample_latents(denoise_fn, cfg.sampler, cfg.dit,
                                key=jax.random.PRNGKey(0), bundle={})
    assert np.isfinite(np.asarray(out)).all()
    assert len(full) == 6 and len(cond) == 4

    full.clear(), cond.clear()
    monkeypatch.delenv("LANDIFF_CFG_WINDOW")
    np.asarray(engine.sample_latents(denoise_fn, cfg.sampler, cfg.dit,
                                     key=jax.random.PRNGKey(0), bundle={}))
    assert len(full) == 10 and len(cond) == 0
