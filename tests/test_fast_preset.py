"""LANDIFF_FAST=1 — the serving fast preset (DEPLOYMENT.md): one knob that
bundles the measured, drift-gated quantizations (W8A8 DiT linears + int8
weight-only stage-1 decode; int8-scores attention is already the default).
This is the compound gate: BOTH stages run quantized together and the
end output must stay close to the exact pipeline's."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from landiff_tpu.config import tiny_test_config
from landiff_tpu.utils import env_flag


@pytest.fixture
def clean_env(monkeypatch):
    for k in ("LANDIFF_FAST", "LANDIFF_DIT_INT8", "LANDIFF_DECODE_INT8",
              "LANDIFF_STEP_REUSE", "LANDIFF_CFG_WINDOW"):
        monkeypatch.delenv(k, raising=False)
    return monkeypatch


def test_env_flag_semantics(clean_env):
    m = clean_env
    assert env_flag("LANDIFF_DIT_INT8") is False
    assert env_flag("LANDIFF_DECODE_INT8") is False
    m.setenv("LANDIFF_FAST", "1")
    assert env_flag("LANDIFF_DIT_INT8") is True
    assert env_flag("LANDIFF_DECODE_INT8") is True
    # an explicit setting always beats the preset
    m.setenv("LANDIFF_DIT_INT8", "0")
    assert env_flag("LANDIFF_DIT_INT8") is False
    # non-preset knobs are untouched by LANDIFF_FAST
    assert env_flag("LANDIFF_SOMETHING_ELSE") is False
    assert env_flag("LANDIFF_SOMETHING_ELSE", default=True) is True


def test_fast_level2_semantics(clean_env):
    """LANDIFF_FAST=2 ("turbo", r5): level-1 quantizations PLUS the
    accepted schedule accelerators (STEP_REUSE=2 and CFG_WINDOW=2,44 —
    both measured at production shape, benchmarks/bench_step_reuse.py /
    bench_cfg_window.py). Explicit settings always win; level 1 does NOT
    enable the schedule knobs."""
    from landiff_tpu.utils import env_value, fast_level

    m = clean_env
    assert fast_level() == 0
    assert env_value("LANDIFF_STEP_REUSE", "0") == "0"
    m.setenv("LANDIFF_FAST", "2")
    assert fast_level() == 2
    assert env_flag("LANDIFF_DIT_INT8") is True  # level-1 knobs included
    assert env_value("LANDIFF_STEP_REUSE", "0") == "2"
    assert env_value("LANDIFF_CFG_WINDOW", "") == "2,44"
    m.setenv("LANDIFF_STEP_REUSE", "0")  # explicit beats the preset
    assert env_value("LANDIFF_STEP_REUSE", "0") == "0"
    m.delenv("LANDIFF_STEP_REUSE")
    m.setenv("LANDIFF_FAST", "1")  # level 1: quantization only
    assert env_value("LANDIFF_STEP_REUSE", "0") == "0"
    assert env_value("LANDIFF_CFG_WINDOW", "") == ""
    m.setenv("LANDIFF_FAST", "true")  # legacy truthy string = level 1
    assert fast_level() == 1


def test_fast_level2_compound_drift(clean_env):
    """FAST=2 end-to-end on the tiny stage-2 pipeline: the combined
    W8A8 + step-reuse + guidance-window sampling must stay correlated
    with the exact run (tiny-scale gate; production-shape numbers live in
    bench_step_reuse.py / bench_cfg_window.py + PARITY.md)."""
    from landiff_tpu.pipeline import dif_infer

    m = clean_env
    cfg = tiny_test_config()
    # 12 steps so STEP_REUSE actually skips middle steps (head/tail
    # always-compute windows are 3+3; the tiny default of 4 would make
    # the reuse component vacuous in this compound gate)
    cfg = dataclasses.replace(cfg, sampler=dataclasses.replace(
        cfg.sampler, num_steps=12))
    dif_params = dif_infer.init_params(jax.random.PRNGKey(1), cfg)
    n_sem = cfg.tokenizer.titok.latent_tokens
    codes = np.asarray(jax.random.randint(
        jax.random.PRNGKey(2), (1, n_sem), 0, cfg.llm.codebook_size))
    vtask = dif_infer.VideoTask(save_file_name="t.mp4", prompt="a cat",
                                seed=3, semantic_token=codes)
    base = dif_infer.CogModelInferWrapper(dif_params, cfg,
                                          compute_dtype=jnp.float32,
                                          attn_impl="xla")
    out_base = base(dataclasses.replace(vtask))

    m.setenv("LANDIFF_FAST", "2")
    fast = dif_infer.CogModelInferWrapper(dif_params, cfg,
                                          compute_dtype=jnp.float32,
                                          attn_impl="xla")
    assert isinstance(fast.params["main"]["layers"][0]["qkv_w"], dict)
    out_fast = fast(dataclasses.replace(vtask))
    corr = np.corrcoef(out_fast.latent.ravel(),
                       out_base.latent.ravel())[0, 1]
    assert corr > 0.98, corr  # schedule accelerators trade more drift
    assert np.isfinite(out_fast.latent).all()


def test_fast_preset_compound_drift(clean_env):
    """Both wrappers pick up the preset and the COMBINED quantized pipeline
    (int8 stage-1 decode feeding W8A8 stage-2) stays correlated with the
    exact pipeline — the production serving combination under one gate."""
    from landiff_tpu.pipeline import dif_infer, llm_infer

    m = clean_env
    cfg = tiny_test_config()

    # exact baseline, stage 1
    lm_params = llm_infer.init_params(jax.random.PRNGKey(0), cfg.llm,
                                      cfg.t5)
    from landiff_tpu.config import ARSampleConfig

    sc = ARSampleConfig(num_frames=cfg.llm.frames_per_segment,
                        cfg_scale=7.5, seed=5)
    task = llm_infer.CodeTask(save_file_name="t.npy", prompt="a cat")
    base1 = llm_infer.ArModelInferWrapper(
        lm_params, cfg.llm, cfg.t5, sc, compute_dtype=jnp.float32)
    codes_base = np.asarray(base1(dataclasses.replace(task)).result)

    # exact baseline, stage 2
    dif_params = dif_infer.init_params(jax.random.PRNGKey(1), cfg)
    vtask = dif_infer.VideoTask(save_file_name="t.mp4", prompt="a cat",
                                seed=3, semantic_token=codes_base)
    base2 = dif_infer.CogModelInferWrapper(dif_params, cfg,
                                           compute_dtype=jnp.float32,
                                           attn_impl="xla")
    out_base = base2(dataclasses.replace(vtask))

    m.setenv("LANDIFF_FAST", "1")
    fast1 = llm_infer.ArModelInferWrapper(
        lm_params, cfg.llm, cfg.t5, sc, compute_dtype=jnp.float32)
    # int8 weight-only GPT active
    assert isinstance(fast1.params["lm"]["gpt"]["blocks"][0]["wqkv"], dict)
    codes_fast = np.asarray(fast1(dataclasses.replace(task)).result)

    fast2 = dif_infer.CogModelInferWrapper(dif_params, cfg,
                                           compute_dtype=jnp.float32,
                                           attn_impl="xla")
    # W8A8 DiT linears active
    assert isinstance(fast2.params["main"]["layers"][0]["qkv_w"], dict)
    out_fast = fast2(dataclasses.replace(
        vtask, semantic_token=codes_fast))

    # stage-1 drift gate: sampled tokens flip easily at random-weight tiny
    # configs (near-uniform logits), so gate on the LOGITS: int8 weight-only
    # GPT must stay highly correlated with the exact forward
    assert codes_fast.shape == codes_base.shape
    assert codes_fast.min() >= 0
    assert codes_fast.max() < cfg.llm.codebook_size
    from landiff_tpu.models import gpt as gpt_lib
    from landiff_tpu.ops.rope import rope_1d_table

    cos, sin = rope_1d_table(cfg.llm.rope)
    feats = jax.random.normal(jax.random.PRNGKey(9),
                              (1, 12, cfg.llm.hidden_size)) * 0.5
    logits_exact = np.asarray(gpt_lib.forward(
        lm_params["lm"]["gpt"], feats, cfg.llm, jnp.asarray(cos[:12]),
        jnp.asarray(sin[:12]), compute_dtype=jnp.float32))
    logits_int8 = np.asarray(gpt_lib.forward(
        fast1.params["lm"]["gpt"], feats, cfg.llm, jnp.asarray(cos[:12]),
        jnp.asarray(sin[:12]), compute_dtype=jnp.float32))
    corr1 = np.corrcoef(logits_exact.ravel(), logits_int8.ravel())[0, 1]
    assert corr1 > 0.999, corr1
    # compound stage-2 drift gate vs the exact pipeline on the SAME codes
    out_ref = base2(dataclasses.replace(vtask, semantic_token=codes_fast))
    corr = np.corrcoef(out_fast.latent.ravel(), out_ref.latent.ravel())[0, 1]
    assert corr > 0.999, corr
