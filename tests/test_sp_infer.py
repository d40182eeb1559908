"""Sequence-parallel DiT inference (mesh time>1: dit.forward_sp + ring
attention) on the CPU mesh: the token-sharded denoise program must match
the single-chip engine numerically. This is the scaling mode the head
count cannot cap (tp stops at 30 heads; S = 17776 splits over 8/16/32
chips exactly) — the reference has no sequence-parallel DiT at all (its
CP covers only the VAE, cp_enc_dec.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from landiff_tpu.config import MeshConfig, tiny_test_config
from landiff_tpu.diffusion import engine
from landiff_tpu.parallel import mesh as mesh_lib
from landiff_tpu.parallel import tp_infer

from test_tp_infer import _params_and_inputs, _step_dict


def _mesh(data=1, time=4):
    return mesh_lib.make_mesh(MeshConfig(data=data, model=1, time=time),
                              jax.devices()[:data * time])


def _compare_sp_vs_single(cfg_full, mesh, *, int8=None, rtol=2e-4):
    params, x, ctx, tokens = _params_and_inputs(cfg_full)
    uc = jnp.zeros_like(ctx)
    dfn, b = engine.make_denoise_fn(
        params["main"], params["control"], params["semantic"], cfg_full.dit,
        cfg_full.sampler, cfg_full.tokenizer, cfg_full.semantic_cond, ctx,
        uc, tokens, compute_dtype=jnp.float32, attn_impl="xla")
    step = _step_dict(cfg_full.sampler)
    want = np.asarray(jax.jit(dfn)(x, step, b))

    sfn, sb = tp_infer.make_tp_denoise_fn(
        params, mesh, cfg_full.dit, cfg_full.sampler, cfg_full.tokenizer,
        cfg_full.semantic_cond, ctx, uc, tokens,
        compute_dtype=jnp.float32, attn_impl="xla", int8=int8)
    got = np.asarray(jax.jit(sfn)(x, step, sb))
    if int8:
        corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
        assert corr > 0.999, corr
        rel = np.abs(got - want).mean() / (np.abs(want).mean() + 1e-9)
        assert rel < 0.03, rel
    else:
        np.testing.assert_allclose(got, want, rtol=rtol, atol=rtol)
    return sfn, sb, x, step


def test_sp_denoise_matches_single_chip():
    # S = 8 text + 72 video = 80 over time=4 -> 20 tokens/shard; the
    # text/video adaLN boundary (8) falls INSIDE shard 0, exercising the
    # offset position-select
    cfg = tiny_test_config()
    _compare_sp_vs_single(cfg, _mesh(data=2, time=4))


def test_sp_denoise_time_only_mesh():
    cfg = tiny_test_config()
    _compare_sp_vs_single(cfg, _mesh(data=1, time=8))


def test_tpsp_hybrid_denoise_matches_single_chip():
    """2-D hybrid (the v5e-16/32 layout in miniature): heads Megatron-
    sharded over model=2 AND tokens ring-sharded over time=2, CFG rows
    over data=2 — 8 devices, all three mesh axes live at once."""
    cfg = tiny_test_config()
    mesh = mesh_lib.make_mesh(MeshConfig(data=2, model=2, time=2),
                              jax.devices()[:8])
    _compare_sp_vs_single(cfg, mesh)


def test_tpsp_hybrid_head_padding_int8():
    """Hybrid with BOTH hazards at once: 3 heads zero-padded over model=2
    (-> 4) and int8 tp-layout weights, tokens over time=2."""
    cfg = tiny_test_config()
    dit = dataclasses.replace(cfg.dit, hidden_size=48, num_heads=3)
    cfg = dataclasses.replace(cfg, dit=dit)
    mesh = mesh_lib.make_mesh(MeshConfig(data=2, model=2, time=2),
                              jax.devices()[:8])
    _compare_sp_vs_single(cfg, mesh, int8=True)


def test_sp_denoise_int8():
    """Single-chip int8 layout (dit.quantize_int8) under SP: weights
    replicated, per-token activation scales shard-local -> same quantized
    numerics as single-chip int8, drift-bounded vs the exact output."""
    cfg = tiny_test_config()
    _compare_sp_vs_single(cfg, _mesh(data=2, time=4), int8=True)


def test_sp_hlo_collectives_ring_only():
    """SP's collective budget: ring ppermutes in the layers (2 transfers x
    (n-1) hops x layers) + ONE tiled all-gather per branch end — and no
    PER-LAYER all-reduce (the Megatron-TP cost model does not apply; a
    small constant number of data-axis reshard reduces outside the layer
    loop is fine)."""
    cfg = tiny_test_config()
    mesh = _mesh(data=2, time=4)
    params, x, ctx, tokens = _params_and_inputs(cfg)
    sfn, sb = tp_infer.make_tp_denoise_fn(
        params, mesh, cfg.dit, cfg.sampler, cfg.tokenizer,
        cfg.semantic_cond, ctx, jnp.zeros_like(ctx), tokens,
        compute_dtype=jnp.float32, attn_impl="xla")
    step = _step_dict(cfg.sampler)
    counts = tp_infer.count_hlo_collectives(sfn, x, step, sb)
    assert counts["collective_permute"] >= 1, counts
    assert counts["all_gather"] >= 1, counts
    layers = cfg.dit.num_layers + cfg.dit.control_layers
    assert counts["all_reduce"] < layers, counts


def test_sp_pipeline_e2e_matches_single():
    """Whole stage-2 wrapper on a (data=2, time=4) mesh vs single chip:
    SP denoise + temporal-CP VAE decode -> same video."""
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
                                            mesh=_mesh(data=2, time=4))
    out_mesh = meshed(dataclasses.replace(task))
    np.testing.assert_allclose(out_mesh.latent, out_single.latent,
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(out_mesh.result, out_single.result,
                               rtol=0, atol=1 / 255.0 + 1e-6)


def test_ring_log2_merge_matches_dense():
    """The Pallas-path hop merge: two flash_attention calls over disjoint
    kv chunks, merged via the log2-domain lse combination, must equal
    dense attention over the full kv — the exact computation each ring
    hop performs on TPU (no shard_map needed to validate the math)."""
    from landiff_tpu.ops import attention as attn_lib
    from landiff_tpu.parallel import ring_attention as ring

    k = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(k, 3)
    B, S, H, D = 1, 256, 2, 16
    q = jax.random.normal(kq, (B, S, H, D), jnp.float32)
    kf = jax.random.normal(kk, (B, S, H, D), jnp.float32)
    vf = jax.random.normal(kv, (B, S, H, D), jnp.float32)
    half = S // 2
    o1, l1 = ring._local_attn_flash(q, kf[:, :half], vf[:, :half],
                                    1.0 / np.sqrt(D))
    o2, l2 = ring._local_attn_flash(q, kf[:, half:], vf[:, half:],
                                    1.0 / np.sqrt(D))
    merged, _ = ring._merge(o1, l1, o2, l2, exp=jnp.exp2, log=jnp.log2)
    want = attn_lib.mha_reference(q, kf, vf)
    np.testing.assert_allclose(np.asarray(merged), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


import pytest


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_ring_attention_gradient_parity(impl):
    """ring_attention_diff backward (second ring pass with rotating dk/dv
    accumulators, per-hop flash/dense backward from the GLOBAL lse) must
    match jax.grad of dense attention over the gathered sequence — for
    both hop kernels."""
    from landiff_tpu.ops import attention as attn_lib
    from landiff_tpu.parallel import ring_attention as ring

    if len(jax.devices()) < 4:
        pytest.skip("needs virtual mesh")
    mesh = mesh_lib.make_mesh(MeshConfig(data=1, model=1, time=4),
                              jax.devices()[:4])
    B, S, H, D = 1, 256, 2, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (B, S, H, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, S, H, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, S, H, D), jnp.float32)
    w = jax.random.normal(ks[3], (B, S, H, D), jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum(attn_lib.mha_reference(q, k, v) * w)

    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)

    from jax.sharding import PartitionSpec as P

    sm = jax.shard_map(
        lambda q, k, v: ring.ring_attention_local(q, k, v, "time",
                                                  impl=impl),
        mesh=mesh, in_specs=(P(None, "time"),) * 3,
        out_specs=P(None, "time"), check_vma=False)

    def loss_ring(q, k, v):
        return jnp.sum(sm(q, k, v) * w)

    got = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", want, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_ring_int8_hop_merge_self_consistent():
    """int8-scores hops now return their own (approximate) lse: merging
    two int8 chunk calls must equal ONE int8 call over the full kv (the
    quantization error is per-chunk-identical), and stay correlated with
    the exact output."""
    from landiff_tpu.ops import attention as attn_lib
    from landiff_tpu.parallel import ring_attention as ring

    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    B, S, H, D = 1, 256, 2, 16
    q = jax.random.normal(ks[0], (B, S, H, D), jnp.float32)
    kf = jax.random.normal(ks[1], (B, S, H, D), jnp.float32)
    vf = jax.random.normal(ks[2], (B, S, H, D), jnp.float32)
    half = S // 2
    sc = 1.0 / np.sqrt(D)
    o1, l1 = ring._local_attn_flash(q, kf[:, :half], vf[:, :half], sc,
                                    int8_scores=True)
    o2, l2 = ring._local_attn_flash(q, kf[:, half:], vf[:, half:], sc,
                                    int8_scores=True)
    merged, _ = ring._merge(o1, l1, o2, l2, exp=jnp.exp2, log=jnp.log2)
    # NOTE K quantizes per kv-position (scales independent of chunking),
    # q per row inside the kernel (identical every chunk) -> chunked and
    # full int8 runs quantize identically, so the merge must reproduce
    # the one-shot int8 result up to merge arithmetic
    full_i8 = attn_lib.flash_attention(q, kf, vf, scale=sc,
                                       int8_scores=True)
    np.testing.assert_allclose(np.asarray(merged),
                               np.asarray(full_i8.astype(jnp.float32)),
                               rtol=2e-4, atol=2e-4)
    exact = attn_lib.mha_reference(q, kf, vf)
    corr = np.corrcoef(np.asarray(merged).ravel(),
                       np.asarray(exact).ravel())[0, 1]
    assert corr > 0.999, corr
