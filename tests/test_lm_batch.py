"""Batched multi-prompt stage-1 decode (lm.sample_batch /
ArModelInferWrapper.infer_batch): right-aligned left-padded prompts with
per-row rope shifts + pad masks must reproduce the single-prompt sampler
BIT-EXACTLY per prompt (same per-prompt PRNG streams), for CFG and
no-guidance, and through the pipeline wrapper.

Reference behavior: lm_model.py:293-516 (one prompt per call); batching is
a TPU-serving extension (decode is weights-bandwidth bound, PARITY.md)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from landiff_tpu.config import ARSampleConfig, tiny_test_config
from landiff_tpu.models import lm as lm_lib


def _setup():
    cfg = tiny_test_config().llm
    params = lm_lib.init(jax.random.PRNGKey(0), cfg, t5_dim=32)
    return cfg, params


def _prompt_rows(params, cfg, n_text, key, with_guidance, dt=jnp.bfloat16):
    """(cond[, uncond]) rows for a synthetic prompt with n_text text tokens."""
    t5_feats = jax.random.normal(key, (n_text, 32), jnp.float32)
    text = lm_lib.text_cond_features(params, t5_feats, dt)
    micro = lm_lib.micro_cond_features(
        params, cfg, {"frames": 3.0, "motion_score": 0.1}, dt)
    cond = lm_lib.assemble_prompt(params, cfg, text, micro, dt)
    rows = [cond]
    if with_guidance:
        null = lm_lib.null_text_features(params, n_text, dt)
        rows.append(lm_lib.assemble_prompt(params, cfg, null, micro, dt))
    return rows


def _single(params, cfg, rows, sc, seed, predict_eos=False):
    stacked = jnp.stack(rows)
    sched = lm_lib.build_schedule(cfg, stacked.shape[1], sc.num_frames)
    return lm_lib.sample(params, cfg, sched, stacked, sc,
                         rng_key=jax.random.PRNGKey(seed),
                         predict_eos=predict_eos)


def _batched(params, cfg, per_prompt_rows, sc, seeds, predict_eos=False):
    lens = [r[0].shape[0] for r in per_prompt_rows]
    prefix = max(lens)
    flat, pad = [], []
    for rows, n in zip(per_prompt_rows, lens):
        for r in rows:
            flat.append(jnp.pad(r, ((prefix - n, 0), (0, 0))))
            pad.append(prefix - n)
    stacked = jnp.stack(flat)
    sched = lm_lib.build_schedule(cfg, prefix, sc.num_frames)
    keys = jnp.stack([jax.random.PRNGKey(s) for s in seeds])
    return lm_lib.sample_batch(params, cfg, sched, stacked,
                               np.asarray(pad, np.int32), sc,
                               rng_keys=keys, predict_eos=predict_eos)


def test_batch_matches_single_cfg():
    cfg, params = _setup()
    sc = ARSampleConfig(num_frames=3, cfg_scale=7.5, top_k=0, top_p=1.0,
                        seed=11)
    lens = (4, 7, 2)
    prompts = [_prompt_rows(params, cfg, n, jax.random.PRNGKey(100 + i),
                            True) for i, n in enumerate(lens)]
    batched = _batched(params, cfg, prompts, sc, [sc.seed] * 3)
    for i, rows in enumerate(prompts):
        single = _single(params, cfg, rows, sc, sc.seed)
        np.testing.assert_array_equal(batched[i], single)


def test_batch_matches_single_no_guidance_topk_topp():
    cfg, params = _setup()
    sc = ARSampleConfig(num_frames=2, cfg_scale=0.0, top_k=8, top_p=0.9,
                        seed=3)
    prompts = [_prompt_rows(params, cfg, n, jax.random.PRNGKey(200 + i),
                            False) for i, n in enumerate((5, 3))]
    batched = _batched(params, cfg, prompts, sc, [sc.seed] * 2)
    for i, rows in enumerate(prompts):
        single = _single(params, cfg, rows, sc, sc.seed)
        np.testing.assert_array_equal(batched[i], single)


def test_batch_matches_single_predict_eos():
    cfg, params = _setup()
    sc = ARSampleConfig(num_frames=3, cfg_scale=7.5, top_k=0, top_p=1.0,
                        seed=5)
    prompts = [_prompt_rows(params, cfg, n, jax.random.PRNGKey(300 + i),
                            True) for i, n in enumerate((6, 4))]
    batched = _batched(params, cfg, prompts, sc, [sc.seed] * 2,
                       predict_eos=True)
    for i, rows in enumerate(prompts):
        single = _single(params, cfg, rows, sc, sc.seed, predict_eos=True)
        np.testing.assert_array_equal(batched[i], single)


def test_wrapper_infer_batch_matches_sequential():
    from landiff_tpu.config import tiny_test_config
    from landiff_tpu.pipeline import llm_infer

    full = tiny_test_config()
    params = llm_infer.init_params(jax.random.PRNGKey(1), full.llm, full.t5)
    sc = ARSampleConfig(num_frames=2, cfg_scale=7.5, seed=9)
    w = llm_infer.ArModelInferWrapper(params, full.llm, full.t5,
                                      sample_cfg=sc)
    tasks = [llm_infer.CodeTask(save_file_name=f"t{i}", prompt=p)
             for i, p in enumerate(["a cat", "a dog on a skateboard",
                                    "rain"])]
    batched = w.infer_batch(tasks)
    for task, got in zip(tasks, batched):
        single = w(dataclasses.replace(task))
        np.testing.assert_array_equal(got.result, single.result)
        assert got.prompt == task.prompt


def test_batch_matches_single_int8():
    """Production decode mode: int8 weight-only GPT through the batched
    loop stays bit-exact vs the single-prompt int8 path (the serving
    batcher runs this combination)."""
    from landiff_tpu.models import gpt as gpt_lib

    cfg, params = _setup()
    qp = dict(params)
    qp["gpt"] = gpt_lib.quantize_int8(params["gpt"])
    sc = ARSampleConfig(num_frames=3, cfg_scale=7.5, top_k=0, top_p=1.0,
                        seed=21)
    prompts = [_prompt_rows(qp, cfg, n, jax.random.PRNGKey(400 + i), True)
               for i, n in enumerate((5, 3))]
    batched = _batched(qp, cfg, prompts, sc, [sc.seed] * 2)
    for i, rows in enumerate(prompts):
        single = _single(qp, cfg, rows, sc, sc.seed)
        np.testing.assert_array_equal(batched[i], single)
