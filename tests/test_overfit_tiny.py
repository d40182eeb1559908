"""Tiny-scale OVERFIT certification (VERDICT r4 #3, CPU side): training on
one fixed batch must not merely decrease the loss (tests/test_training.py)
but drive the model far enough that the SAMPLED output reproduces the
training target — end-to-end evidence that gradients, the loss masks, and
the train->sample code paths agree.

Production-shape hardware twin: benchmarks/bench_train_overfit.py
(TRAIN_OVERFIT.json). Reference loss specs: transformer.py:134-138 (LM
masked CE), tokenizer losses (SURVEY §2.3), sgm loss.py:98-202 (diffusion).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from landiff_tpu.config import ARSampleConfig, tiny_test_config
from landiff_tpu.models import lm as lm_lib
from landiff_tpu.training import lm_train, vq_train

CFG = tiny_test_config()


def test_lm_overfit_then_sample_recovers_target():
    """Overfit the tiny stage-1 LM on ONE (text, codes) pair, then run the
    REAL constrained sampler (lm.sample, argmax temperature) from the same
    prompt: the sampled codes must equal the training target exactly."""
    cfg = CFG.llm
    params = lm_lib.init(jax.random.PRNGKey(0), cfg, t5_dim=24)
    rng = np.random.default_rng(0)
    n_text = 3
    t5 = jnp.asarray(rng.standard_normal((1, n_text, 24)), jnp.float32)
    prefix_len = 1 + len(cfg.micro_cond_keys) + n_text + 1
    sched = lm_lib.build_schedule(cfg, prefix_len, cfg.frames_per_segment)
    target = rng.integers(0, cfg.codebook_size,
                          (1, sched.num_visual)).astype(np.int32)
    micro = {"frames": cfg.frames_per_segment, "motion_score": 0.1}

    opt = optax.adam(1e-2)
    step = lm_train.make_cond_train_step(opt, cfg, micro, cfg_drop_prob=0.0)
    opt_state = opt.init(params)
    codes_j = jnp.asarray(target)
    loss = None
    for i in range(400):
        params, opt_state, loss = step(params, opt_state, t5, codes_j,
                                       jax.random.PRNGKey(100 + i))
        if float(loss) < 0.02:
            break
    assert float(loss) < 0.05, f"did not overfit: final loss {float(loss)}"

    text = lm_lib.text_cond_features(params, t5[0],
                                     compute_dtype=jnp.float32)
    micro_f = lm_lib.micro_cond_features(params, cfg, micro,
                                         compute_dtype=jnp.float32)
    prompt = lm_lib.assemble_prompt(params, cfg, text, micro_f, jnp.float32)
    assert prompt.shape[0] == prefix_len
    sc = ARSampleConfig(cfg_scale=1.0, temperature=1e-3)
    sampled = lm_lib.sample(params, cfg, sched, prompt[None], sc,
                            rng_key=jax.random.PRNGKey(7),
                            compute_dtype=jnp.float32,
                            cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(sampled), target[0])


def test_vq_overfit_reconstruction_converges():
    """Overfit the tiny video tokenizer on ONE feature batch: the
    reconstruction loss must drop >= 5x and the decoded features must
    approach the target (rel err by feature norm)."""
    cfg = CFG.tokenizer
    from landiff_tpu.models import vq as vq_lib

    params = vq_lib.init(jax.random.PRNGKey(0), cfg, with_theia=False)
    t = cfg.titok
    feats = jax.random.normal(jax.random.PRNGKey(1),
                              (1, t.temporal_size, t.grid_h, t.grid_w,
                               cfg.feature_dim))
    opt = optax.adam(3e-3)
    step = vq_train.make_train_step(opt, cfg)
    opt_state = opt.init(params)
    cb_state = vq_train.init_codebook_state(cfg)
    _, aux = vq_train.tokenizer_loss(params, feats, cfg)
    params = dict(params)
    q = dict(params["quant"])
    q["codebook"] = vq_train.kmeans_init_codebook(
        aux["zin"], cfg.vq.codebook_size, jax.random.PRNGKey(2))
    params["quant"] = q

    re0 = None
    metrics = None
    for i in range(450):
        params, opt_state, cb_state, metrics = step(
            params, opt_state, cb_state, feats, jax.random.PRNGKey(3 + i))
        if re0 is None:
            re0 = float(metrics["re_loss"])
        if float(metrics["re_loss"]) < re0 / 8:
            break
    re_final = float(metrics["re_loss"])
    assert re_final < re0 / 5, (re0, re_final)

    # decoded features approach the target batch
    _, codes = vq_lib.encode_features_to_index(params, feats, cfg,
                                               compute_dtype=jnp.float32)
    recon = vq_lib.index_to_feature(params, codes, cfg,
                                    compute_dtype=jnp.float32)
    rel = float(jnp.linalg.norm(recon - feats) / jnp.linalg.norm(feats))
    assert rel < 0.5, rel
