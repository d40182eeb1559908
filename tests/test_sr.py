"""Stochastic-rounding bf16 updates (training/sr.py): unbiasedness, the
sub-ulp accumulation property that motivates it, and the train-step wiring
(sr_updates=True). Production context: bf16 masters + default-adafactor
flatlined the production overfit (TRAIN_OVERFIT.json); f32 masters OOM a
16 GB v5e by 125 MB, so SR is the zero-memory alternative."""

import jax
import jax.numpy as jnp
import numpy as np

from landiff_tpu.training import sr


def test_sr_rounds_to_neighbours_and_is_unbiased():
    # a value exactly between two bf16 neighbours must round to one of
    # them, ~50/50 across keys, mean converging to the true value
    lo = jnp.bfloat16(1.0)
    hi = jnp.nextafter(jnp.bfloat16(1.0), jnp.bfloat16(2.0))
    mid = (np.float32(lo) + np.float32(hi)) / 2
    v = jnp.full((2048,), mid, jnp.float32)
    out = np.asarray(sr.stochastic_round_bf16(v, jax.random.PRNGKey(0)),
                     np.float32)
    assert set(np.unique(out)) <= {np.float32(lo), np.float32(hi)}
    frac_hi = float((out == np.float32(hi)).mean())
    assert 0.4 < frac_hi < 0.6, frac_hi
    np.testing.assert_allclose(out.mean(), mid, rtol=2e-4)


def test_sr_preserves_exact_values_and_nonfinite():
    v = jnp.asarray([1.0, -2.5, 0.0, np.inf, -np.inf, np.nan], jnp.float32)
    out = np.asarray(sr.stochastic_round_bf16(v, jax.random.PRNGKey(1)),
                     np.float32)
    # bf16-representable values never move (their low bits are zero)
    np.testing.assert_array_equal(out[:3], [1.0, -2.5, 0.0])
    assert out[3] == np.inf and out[4] == -np.inf and np.isnan(out[5])


def test_sr_accumulates_sub_ulp_updates():
    """The motivating property: adding an update ~ulp/8 for N steps moves
    an SR-rounded bf16 parameter by ~N*update in expectation, while
    round-to-nearest discards it entirely."""
    p_sr = jnp.full((4096,), 1.0, jnp.bfloat16)
    p_rn = jnp.full((4096,), 1.0, jnp.bfloat16)
    ulp = np.float32(jnp.nextafter(jnp.bfloat16(1.0),
                                   jnp.bfloat16(2.0))) - 1.0
    upd = jnp.full((4096,), ulp / 8, jnp.float32)
    for i in range(64):
        p_sr = sr.stochastic_round_bf16(p_sr.astype(jnp.float32) + upd,
                                        jax.random.PRNGKey(10 + i))
        p_rn = (p_rn.astype(jnp.float32) + upd).astype(jnp.bfloat16)
    drift_sr = float(jnp.mean(p_sr.astype(jnp.float32))) - 1.0
    drift_rn = float(jnp.mean(p_rn.astype(jnp.float32))) - 1.0
    want = 64 * float(ulp) / 8
    assert drift_rn == 0.0  # round-to-nearest threw every update away
    np.testing.assert_allclose(drift_sr, want, rtol=0.15)


def test_apply_updates_sr_mixed_dtypes():
    params = {"a": jnp.ones((8,), jnp.bfloat16),
              "b": jnp.ones((8,), jnp.float32)}
    updates = {"a": jnp.full((8,), 0.25, jnp.float32),
               "b": jnp.full((8,), 0.25, jnp.float32)}
    out = sr.apply_updates_sr(params, updates, jax.random.PRNGKey(0))
    assert out["a"].dtype == jnp.bfloat16
    assert out["b"].dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out["a"], np.float32), 1.25)
    np.testing.assert_allclose(np.asarray(out["b"]), 1.25)


def test_train_step_sr_wiring():
    """make_train_step(sr_updates=True) executes and updates params."""
    import optax

    from landiff_tpu.config import tiny_test_config
    from landiff_tpu.models import dit as dit_lib
    from landiff_tpu.models import semantic_cond as sc_lib
    from landiff_tpu.training import diffusion_loss

    cfg = tiny_test_config()
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    main_p = dit_lib.init(ks[0], cfg.dit, dtype=jnp.bfloat16)
    ctrl_p = dit_lib.init(ks[1], cfg.dit, control=True, dtype=jnp.bfloat16)
    sem_p = sc_lib.init(ks[2], cfg.tokenizer, cfg.semantic_cond,
                        dtype=jnp.bfloat16)
    opt = optax.adafactor(3e-3, multiply_by_parameter_scale=False)
    step = diffusion_loss.make_train_step(
        opt, cfg.dit, cfg.sampler, cfg.tokenizer, cfg.semantic_cond,
        compute_dtype=jnp.bfloat16, remat=False, sr_updates=True)
    d = cfg.dit
    lat = jax.random.normal(ks[3], (1, d.latent_frames, d.in_channels,
                                    d.latent_height, d.latent_width))
    ctx = jnp.zeros((1, d.text_length, d.text_dim), jnp.bfloat16)
    tok = jnp.zeros((1, cfg.tokenizer.titok.latent_tokens), jnp.int32)
    st = opt.init(ctrl_p)
    losses = []
    for i in range(3):
        ctrl_p, st, loss = step(ctrl_p, st, main_p, sem_p, lat, ctx, tok,
                                jax.random.PRNGKey(42))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # zero-init gates learn under noscale
    leaf = jax.tree_util.tree_leaves(ctrl_p)[0]
    assert leaf.dtype == jnp.bfloat16
