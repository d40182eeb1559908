"""Multi-chip TP/DP inference (parallel/tp_infer.py) on the 8-device CPU
mesh: the sharded denoise program must match the single-chip engine
numerically, including when the head count does not divide tp (the
production case: 30 heads / tp=4 -> padded to 32)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from landiff_tpu.config import (DiTConfig, MeshConfig, SamplerConfig,
                                tiny_test_config)
from landiff_tpu.diffusion import engine
from landiff_tpu.models import dit as dit_lib
from landiff_tpu.parallel import mesh as mesh_lib
from landiff_tpu.parallel import tp_infer


def _mesh(data=2, model=4):
    return mesh_lib.make_mesh(MeshConfig(data=data, model=model),
                              jax.devices()[:data * model])


def _params_and_inputs(cfg_full, key=0):
    from landiff_tpu.utils import fill_zero_leaves

    k = jax.random.PRNGKey(key)
    ks = jax.random.split(k, 4)
    dit_cfg = cfg_full.dit
    # fill_zero_leaves: raw init zero-gates the attention/MLP/control
    # subpaths (adaLN + zero_linear convention), which would make this TP
    # parity check vacuous — the sharded qkv/attention/head-padding logic
    # must actually contribute to the compared output
    params = {
        "main": fill_zero_leaves(dit_lib.init(ks[0], dit_cfg),
                                 jax.random.PRNGKey(20), scale=0.05),
        "control": fill_zero_leaves(
            dit_lib.init(ks[1], dit_cfg, control=True),
            jax.random.PRNGKey(21), scale=0.05),
    }
    from landiff_tpu.models import semantic_cond as sc_lib

    params["semantic"] = fill_zero_leaves(
        sc_lib.init(ks[2], cfg_full.tokenizer, cfg_full.semantic_cond),
        jax.random.PRNGKey(22), scale=0.05)
    x = jax.random.normal(ks[3], (1, dit_cfg.latent_frames,
                                  dit_cfg.in_channels, dit_cfg.latent_height,
                                  dit_cfg.latent_width), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(7),
                            (1, dit_cfg.text_length, dit_cfg.text_dim),
                            jnp.float32)
    tokens = jnp.zeros((1, cfg_full.tokenizer.titok.latent_tokens),
                       jnp.int32)
    return params, x, ctx, tokens


def _step_dict(cfg: SamplerConfig):
    from landiff_tpu.diffusion import schedule

    t = schedule.sampler_tables(cfg)
    return {"alpha": jnp.float32(t["alpha"][0]),
            "timestep": jnp.int32(t["timestep"][0]),
            "idx": jnp.int32(t["idx"][0]),
            "cfg_scale": jnp.float32(t["cfg_scale"][0])}


def _compare_tp_vs_single(cfg_full, mesh):
    params, x, ctx, tokens = _params_and_inputs(cfg_full)
    uc = jnp.zeros_like(ctx)
    dfn, b = engine.make_denoise_fn(
        params["main"], params["control"], params["semantic"], cfg_full.dit,
        cfg_full.sampler, cfg_full.tokenizer, cfg_full.semantic_cond, ctx,
        uc, tokens, compute_dtype=jnp.float32, attn_impl="xla")
    step = _step_dict(cfg_full.sampler)
    want = np.asarray(jax.jit(dfn)(x, step, b))

    tfn, tb = tp_infer.make_tp_denoise_fn(
        params, mesh, cfg_full.dit, cfg_full.sampler, cfg_full.tokenizer,
        cfg_full.semantic_cond, ctx, uc, tokens,
        compute_dtype=jnp.float32, attn_impl="xla")
    got = np.asarray(jax.jit(tfn)(x, step, tb))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_tp_denoise_matches_single_chip():
    # heads (4) divide tp (4): no padding path
    cfg = tiny_test_config()
    _compare_tp_vs_single(cfg, _mesh(data=2, model=4))


def test_tp_denoise_head_padding():
    # 3 heads over tp=4: the production 30/4 situation in miniature — heads
    # are zero-padded to 4 and the result must still be exact
    cfg = tiny_test_config()
    dit = dataclasses.replace(cfg.dit, hidden_size=48, num_heads=3)
    cfg = dataclasses.replace(cfg, dit=dit)
    assert cfg.dit.head_dim == 16
    _compare_tp_vs_single(cfg, _mesh(data=2, model=4))


def test_tp_denoise_model_only_mesh():
    # data=1: both CFG rows on every shard (replicated over data)
    cfg = tiny_test_config()
    _compare_tp_vs_single(cfg, _mesh(data=1, model=4))


def test_tp_hlo_collective_count():
    """The sharded step's measured collective count: exactly 2 psum
    all-reduces per transformer layer (Megatron column+row parallel),
    main + control — the quantity bench.py's v5e-8 projection models."""
    cfg = tiny_test_config()
    mesh = _mesh(data=2, model=4)
    params, x, ctx, tokens = _params_and_inputs(cfg)
    tfn, tb = tp_infer.make_tp_denoise_fn(
        params, mesh, cfg.dit, cfg.sampler, cfg.tokenizer,
        cfg.semantic_cond, ctx, jnp.zeros_like(ctx), tokens,
        compute_dtype=jnp.float32, attn_impl="xla")
    step = _step_dict(cfg.sampler)
    counts = tp_infer.count_hlo_collectives(tfn, x, step, tb)
    expect = 2 * (cfg.dit.num_layers + cfg.dit.control_layers)
    assert counts["all_reduce"] >= expect, counts
    # no unexpected blow-up: a handful of data-axis reshards at most
    assert counts["all_reduce"] <= expect + 4, counts


def test_tp_denoise_int8_drift_bounded():
    """W8A8 int8 at the tp shapes (quantize AFTER prep; activation scales
    per shard): close to the exact single-chip output, and the {q, s}
    leaves carry the intended shardings."""
    cfg = tiny_test_config()
    mesh = _mesh(data=2, model=4)
    params, x, ctx, tokens = _params_and_inputs(cfg)
    uc = jnp.zeros_like(ctx)
    dfn, b = engine.make_denoise_fn(
        params["main"], params["control"], params["semantic"], cfg.dit,
        cfg.sampler, cfg.tokenizer, cfg.semantic_cond, ctx, uc, tokens,
        compute_dtype=jnp.float32, attn_impl="xla")
    step = _step_dict(cfg.sampler)
    want = np.asarray(jax.jit(dfn)(x, step, b))

    tfn, tb = tp_infer.make_tp_denoise_fn(
        params, mesh, cfg.dit, cfg.sampler, cfg.tokenizer,
        cfg.semantic_cond, ctx, uc, tokens,
        compute_dtype=jnp.float32, attn_impl="xla", int8=True)
    leaf = tb["main"]["layers"][0]["qkv_w"]
    assert isinstance(leaf, dict) and leaf["q"].dtype == jnp.int8
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert leaf["q"].sharding == NamedSharding(
        mesh, P(None, None, tp_infer.TP_AXIS, None))
    assert leaf["s"].sharding == NamedSharding(
        mesh, P(None, tp_infer.TP_AXIS, None))
    got = np.asarray(jax.jit(tfn)(x, step, tb))
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.999, corr
    rel = np.abs(got - want).mean() / (np.abs(want).mean() + 1e-9)
    assert rel < 0.03, rel


def test_tp_pipeline_e2e_matches_single():
    """Whole stage-2 wrapper under a mesh vs without: same video."""
    from landiff_tpu.pipeline import dif_infer

    cfg = tiny_test_config()
    params = dif_infer.init_params(jax.random.PRNGKey(0), cfg)
    tokens = np.zeros((cfg.tokenizer.titok.latent_tokens,), np.int32)
    task = dif_infer.VideoTask(save_file_name="t.mp4", prompt="a cat",
                               seed=3, semantic_token=tokens)
    single = dif_infer.CogModelInferWrapper(params, cfg,
                                            compute_dtype=jnp.float32,
                                            attn_impl="xla")
    out_single = single(dataclasses.replace(task))
    meshed = dif_infer.CogModelInferWrapper(params, cfg,
                                            compute_dtype=jnp.float32,
                                            attn_impl="xla",
                                            mesh=_mesh(data=2, model=4))
    out_mesh = meshed(dataclasses.replace(task))
    np.testing.assert_allclose(out_mesh.latent, out_single.latent,
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(out_mesh.result, out_single.result,
                               rtol=0, atol=1 / 255.0 + 1e-6)
