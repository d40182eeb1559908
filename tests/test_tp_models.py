"""TP-sharded correctness for the remaining model families (DiT is
covered in test_vae_cp.py): GPT prefill+decode, T5 encode, and TiTok
encode must be numerically identical sharded (GSPMD over the `model`
axis) vs replicated — the §2.8 TP story for every rules table in
parallel/mesh.py. Also regression-covers the divisibility fallback
(GPT head vocab 39 is not divisible by model=4 -> replicated)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from landiff_tpu.config import MeshConfig, tiny_test_config
from landiff_tpu.parallel import mesh as mesh_lib

CFG = tiny_test_config()


def _mesh(n):
    if len(jax.devices()) < n:
        pytest.skip("needs virtual mesh")
    return mesh_lib.make_mesh(MeshConfig(data=1, model=n, time=1),
                              jax.devices()[:n])


def test_tp_sharded_gpt_decode_matches_replicated():
    from landiff_tpu.models import gpt
    from landiff_tpu.ops.rope import rope_1d_table

    cfg = CFG.llm
    params = gpt.init(jax.random.PRNGKey(0), cfg)
    cos_t, sin_t = rope_1d_table(cfg.rope)
    S = 6
    cos, sin = jnp.asarray(cos_t[:S]), jnp.asarray(sin_t[:S])
    feats = jax.random.normal(jax.random.PRNGKey(1),
                              (1, S, cfg.hidden_size)) * 0.3

    def run(p):
        cache = gpt.KVCache.create(cfg, 1, S, jnp.float32)
        logits, cache = gpt.prefill(p, feats[:, :-1], cache, cfg,
                                    cos[:-1], sin[:-1],
                                    compute_dtype=jnp.float32)
        l2, _ = gpt.decode_step(p, feats[:, -1:], cache, S - 1, cfg,
                                cos[-1:], sin[-1:],
                                compute_dtype=jnp.float32)
        return logits, l2

    want1, want2 = run(params)
    mesh = _mesh(4)
    sharded = mesh_lib.shard_params(params, mesh, mesh_lib.GPT_RULES)
    # vocab 39 % 4 != 0: the head must have degraded to replicated
    head_sh = sharded["head"].sharding.spec
    assert all(ax is None for ax in head_sh), head_sh
    with mesh:
        got1, got2 = jax.jit(run)(sharded)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want1),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               rtol=2e-4, atol=2e-4)


def test_tp_sharded_t5_matches_replicated():
    from landiff_tpu.models import t5 as t5_lib

    cfg = CFG.t5
    params = t5_lib.init(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0,
                             cfg.vocab_size)
    want = t5_lib.encode(params, ids, None, cfg,
                         compute_dtype=jnp.float32)
    mesh = _mesh(2)
    sharded = mesh_lib.shard_params(params, mesh, mesh_lib.T5_RULES)
    with mesh:
        got = jax.jit(lambda p: t5_lib.encode(
            p, ids, None, cfg, compute_dtype=jnp.float32))(sharded)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_tp_sharded_titok_matches_replicated():
    from landiff_tpu.models import vq as vq_lib

    cfg = CFG.tokenizer
    params = vq_lib.init(jax.random.PRNGKey(0), cfg, with_theia=False)
    t = cfg.titok
    feats = jax.random.normal(jax.random.PRNGKey(1),
                              (1, t.temporal_size, t.grid_h, t.grid_w,
                               cfg.feature_dim))
    want_q, want_idx = vq_lib.encode_features_to_index(
        params, feats, cfg, compute_dtype=jnp.float32)
    mesh = _mesh(2)
    sharded = mesh_lib.shard_params(params, mesh, mesh_lib.TITOK_RULES)
    with mesh:
        got_q, got_idx = jax.jit(lambda p: vq_lib.encode_features_to_index(
            p, feats, cfg, compute_dtype=jnp.float32))(sharded)
    np.testing.assert_array_equal(np.asarray(got_idx), np.asarray(want_idx))
    np.testing.assert_allclose(np.asarray(got_q), np.asarray(want_q),
                               rtol=2e-4, atol=2e-4)


def test_tp_sharded_int8_gpt_decode_matches_replicated():
    """int8 {q, s} leaves inherit the base weight's rule (param_specs):
    column-parallel wqkv -> q (None, model) / s (model,); row-parallel
    wo -> q (model, None) / s replicated — and the sharded int8 decode
    matches the replicated int8 decode exactly."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from landiff_tpu.models import gpt
    from landiff_tpu.ops.rope import rope_1d_table

    cfg = CFG.llm
    params = gpt.quantize_int8(gpt.init(jax.random.PRNGKey(0), cfg))
    cos_t, sin_t = rope_1d_table(cfg.rope)
    S = 6
    cos, sin = jnp.asarray(cos_t[:S]), jnp.asarray(sin_t[:S])
    feats = jax.random.normal(jax.random.PRNGKey(1),
                              (1, S, cfg.hidden_size)) * 0.3

    def run(p):
        cache = gpt.KVCache.create(cfg, 1, S, jnp.float32)
        logits, cache = gpt.prefill(p, feats[:, :-1], cache, cfg,
                                    cos[:-1], sin[:-1],
                                    compute_dtype=jnp.float32)
        l2, _ = gpt.decode_step(p, feats[:, -1:], cache, S - 1, cfg,
                                cos[-1:], sin[-1:],
                                compute_dtype=jnp.float32)
        return logits, l2

    want1, want2 = run(params)
    mesh = _mesh(4)
    sharded = mesh_lib.shard_params(params, mesh, mesh_lib.GPT_RULES)
    blk = sharded["blocks"][0]
    assert blk["wqkv"]["q"].sharding == NamedSharding(mesh, P(None, "model"))
    assert blk["wqkv"]["s"].sharding == NamedSharding(mesh, P("model"))
    assert blk["wo"]["q"].sharding == NamedSharding(mesh, P("model", None))
    assert blk["wo"]["s"].sharding.is_equivalent_to(
        NamedSharding(mesh, P()), 1)
    with mesh:
        got1, got2 = jax.jit(run)(sharded)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want1),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               rtol=2e-4, atol=2e-4)


def test_stage1_wrapper_mesh_matches_single():
    """ArModelInferWrapper(mesh=...): the TP-sharded constrained AR decode
    must emit the same codes as the replicated wrapper."""
    from landiff_tpu.config import ARSampleConfig
    from landiff_tpu.pipeline import llm_infer

    params = llm_infer.init_params(jax.random.PRNGKey(0), CFG.llm, CFG.t5)
    sc = ARSampleConfig(num_frames=CFG.llm.frames_per_segment, seed=5)
    task = llm_infer.CodeTask(save_file_name="t", prompt="a cat")
    single = llm_infer.ArModelInferWrapper(
        params, CFG.llm, CFG.t5, sc, compute_dtype=jnp.float32,
        int8_decode=False)
    want = single(task).result
    mesh = _mesh(4)
    meshed = llm_infer.ArModelInferWrapper(
        params, CFG.llm, CFG.t5, sc, compute_dtype=jnp.float32,
        int8_decode=False, mesh=mesh)
    got = meshed(task).result
    np.testing.assert_array_equal(got, want)


def test_hbm_plan():
    """Placement planner (parallel/plan.py): sharded components must
    shrink per chip under model>1, replicated ones must not, and the
    accounting must be internally consistent."""
    from landiff_tpu.parallel import plan as plan_lib

    p1 = plan_lib.plan(MeshConfig(data=1, model=1), CFG)
    p4 = plan_lib.plan(MeshConfig(data=2, model=4), CFG)
    c1, c4 = p1["components"], p4["components"]
    for name in ("dit_main", "dit_control", "t5", "lm"):
        assert c4[name]["per_chip_bytes"] < c1[name]["per_chip_bytes"], name
        assert c4[name]["per_chip_bytes"] >= \
            c4[name]["total_bytes"] // 8, name
    for name in ("semantic_cond", "vae"):
        assert c4[name]["per_chip_bytes"] == c4[name]["total_bytes"], name
    assert p4["per_chip_total_bytes"] == sum(
        v["per_chip_bytes"] for v in c4.values())
