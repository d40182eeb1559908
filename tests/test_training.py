"""Training paths: LM teacher-forcing loss decreases; teacher-forcing logits
match the decode path; VQ train step updates codebook and reduces loss."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from landiff_tpu.config import tiny_test_config
from landiff_tpu.models import lm as lm_lib
from landiff_tpu.training import lm_train, vq_train

CFG = tiny_test_config()


def _lm_batch(params, key):
    cfg = CFG.llm
    text = lm_lib.text_cond_features(params, jnp.ones((4, 24)),
                                     compute_dtype=jnp.float32)
    micro = lm_lib.micro_cond_features(
        params, cfg, {"frames": cfg.frames_per_segment, "motion_score": 0.1},
        compute_dtype=jnp.float32)
    sched = lm_lib.build_schedule(cfg, 1 + 2 + 4 + 1,
                                  cfg.frames_per_segment)
    codes = jax.random.randint(key, (sched.num_visual,), 0,
                               cfg.codebook_size)
    return lm_train.build_training_batch(params, cfg, text, micro,
                                         np.asarray(codes))


def test_lm_loss_decreases():
    cfg = CFG.llm
    params = lm_lib.init(jax.random.PRNGKey(0), cfg, t5_dim=24)
    feats, labels, mask = _lm_batch(params, jax.random.PRNGKey(1))
    optimizer = optax.adam(1e-2)
    step = lm_train.make_train_step(optimizer, cfg)
    opt_state = optimizer.init(params)
    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, feats, labels,
                                       mask)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_lm_loss_matches_vocab_scale_at_init():
    """At random init, masked CE should be ~log(vocab)."""
    cfg = CFG.llm
    params = lm_lib.init(jax.random.PRNGKey(0), cfg, t5_dim=24)
    feats, labels, mask = _lm_batch(params, jax.random.PRNGKey(2))
    loss = float(lm_train.lm_loss(params, cfg, feats, labels, mask))
    assert abs(loss - np.log(cfg.vocab_size)) < 1.5


def test_vq_train_step():
    cfg = CFG.tokenizer
    from landiff_tpu.models import vq as vq_lib

    params = vq_lib.init(jax.random.PRNGKey(0), cfg, with_theia=False)
    t = cfg.titok
    feats = jax.random.normal(jax.random.PRNGKey(1),
                              (1, t.temporal_size, t.grid_h, t.grid_w,
                               cfg.feature_dim))
    optimizer = optax.adam(1e-3)
    step = vq_train.make_train_step(optimizer, cfg)
    opt_state = optimizer.init(params)
    cb_state = vq_train.init_codebook_state(cfg)
    # kmeans init from first batch
    _, aux = vq_train.tokenizer_loss(params, feats, cfg)
    params = dict(params)
    q = dict(params["quant"])
    q["codebook"] = vq_train.kmeans_init_codebook(
        aux["zin"], cfg.vq.codebook_size, jax.random.PRNGKey(2))
    params["quant"] = q

    losses = []
    cb_before = np.asarray(params["quant"]["codebook"]).copy()
    for i in range(4):
        params, opt_state, cb_state, metrics = step(
            params, opt_state, cb_state, feats, jax.random.PRNGKey(3 + i))
        losses.append(float(metrics["total_loss"]))
    assert losses[-1] < losses[0], losses
    assert not np.allclose(np.asarray(params["quant"]["codebook"]),
                           cb_before)  # EMA moved the codebook
    for k in ("commit_loss", "re_loss", "iframe_loss", "pframe_loss"):
        assert np.isfinite(float(metrics[k]))


def test_litema_matches_reference_semantics():
    """EMA update rule + warmup decay schedule vs a straight numpy
    transcription of LitEma.forward (sgm/modules/ema.py:35-54)."""
    from landiff_tpu.training import ema as ema_lib

    rng = np.random.default_rng(0)
    params = {"a": jnp.asarray(rng.standard_normal((3, 4)), jnp.float32),
              "b": jnp.asarray(rng.standard_normal((5,)), jnp.float32)}
    state = ema_lib.init_ema(params)
    shadow = {k: np.asarray(v, np.float64) for k, v in params.items()}
    decay = 0.9999
    n = 0
    for it in range(5):
        params = {k: v + 0.1 * (it + 1) for k, v in params.items()}
        state = ema_lib.ema_update(state, params, decay=decay)
        n += 1
        eff = min(decay, (1 + n) / (10 + n))
        for k in shadow:
            shadow[k] = shadow[k] - (1 - eff) * (shadow[k]
                                                 - np.asarray(params[k]))
    for k in shadow:
        np.testing.assert_allclose(np.asarray(state.shadow[k]), shadow[k],
                                   rtol=1e-5, atol=1e-6)
    assert int(state.num_updates) == 5
    # use_num_updates=False pins the decay constant (ema.py:17-19)
    s2 = ema_lib.init_ema({"a": jnp.zeros((2,))}, use_num_updates=False)
    s2 = ema_lib.ema_update(s2, {"a": jnp.ones((2,))}, decay=0.5)
    np.testing.assert_allclose(np.asarray(s2.shadow["a"]), [0.5, 0.5])
    assert int(s2.num_updates) == -1
    # copy_to restores the param dtype
    out = ema_lib.copy_to(state, {k: v.astype(jnp.bfloat16)
                                  for k, v in params.items()})
    assert out["a"].dtype == jnp.bfloat16


def test_vq_train_step_with_param_ema():
    """ema_decay wires a LitEma shadow into the tokenizer train step."""
    from landiff_tpu.models import vq as vq_lib
    from landiff_tpu.training import ema as ema_lib

    cfg = CFG.tokenizer
    params = vq_lib.init(jax.random.PRNGKey(0), cfg, with_theia=False)
    t = cfg.titok
    feats = jax.random.normal(jax.random.PRNGKey(1),
                              (1, t.temporal_size, t.grid_h, t.grid_w,
                               cfg.feature_dim))
    optimizer = optax.adam(1e-3)
    step = vq_train.make_train_step(optimizer, cfg, ema_decay=0.9999)
    opt_state = optimizer.init(params)
    cb_state = vq_train.init_codebook_state(cfg)
    ema_state = ema_lib.init_ema(params)
    before = np.asarray(ema_state.shadow["quant"]["in_w"]).copy()
    for i in range(2):
        params, opt_state, cb_state, ema_state, metrics = step(
            params, opt_state, cb_state, ema_state, feats,
            jax.random.PRNGKey(3 + i))
    assert int(ema_state.num_updates) == 2
    after = np.asarray(ema_state.shadow["quant"]["in_w"])
    assert not np.allclose(before, after)  # shadow tracked the update
    # shadow lies between the old shadow and the new params (warmup decay)
    ema_params = ema_lib.copy_to(ema_state, params)
    assert jax.tree_util.tree_structure(ema_params) \
        == jax.tree_util.tree_structure(params)
