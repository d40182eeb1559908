"""Tensor-parallel stage-2 inference: the v5e-8 denoise program.

Replaces the reference's model-parallel inference wiring — SAT mpu process
groups + broadcast of the initial noise across the MP group
(landiff/diffusion/arguments.py:215-299, diffusion_video.py:291-297) —
with an explicit shard_map program over a (data, model) mesh:

  - CFG rows [uncond, cond] ride the `data` axis (the reference runs both
    rows on every rank; here each data shard computes one row),
  - transformer weights are Megatron-sharded over `model`
    (column-parallel qkv/mlp-in, row-parallel attn-out/mlp-out), giving
    exactly 2 psum all-reduces per layer over ICI,
  - the Pallas flash-attention kernel runs unchanged per shard on its
    local heads (shard_map hands it local arrays — no GSPMD guesswork
    around pallas_call),
  - 30 heads don't divide tp=4/8: heads are ZERO-PADDED to the next
    multiple (32). A pad head has zero q/k/v weights and zero attn-out
    rows, so it contributes exactly nothing (see dit._layer_tp); numerics
    are bit-comparable to the unsharded model up to reduction order.

The VAE stays on the streaming decode (replicated) or vae_cp over `time`;
stage 1's GPT decode TP-shards over `model` via the GSPMD rules instead
(pipeline/llm_infer.py — weights-bandwidth bound, so splitting the weight
reads is the lever; PARITY.md).

A `time`-axis mesh (e.g. data=2,time=4) selects the SEQUENCE-PARALLEL
denoise instead (dit.forward_sp): weights replicated, the 17776-token
[text|video] sequence sharded, attention as a ppermute ring
(parallel/ring_attention.py) — no per-layer all-reduce, and scaling is
not capped by the 30-head count (tp tops out at model=30; S splits over
8/16/32 chips exactly). The reference has no sequence-parallel DiT (its
CP covers only the VAE). Both axes together (e.g. data=2,model=4,time=2
on v5e-16) run the 2-D hybrid: heads Megatron-sharded within each ring
position, tokens ring-sharded across them (dit.forward_tp sp_axis).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from landiff_tpu.config import DiTConfig, SamplerConfig, SemanticCondConfig, \
    TokenizerConfig

TP_AXIS = "model"
DATA_AXIS = "data"
SP_AXIS = "time"

# per-leaf-name PartitionSpecs for the tp-prepped layer layout
_TP_LEAF_SPECS = {
    "qkv_w": P(None, None, TP_AXIS, None),      # (D, 3, H_pad, Dk)
    "qkv_b": P(None, TP_AXIS, None),            # (3, H_pad, Dk)
    "attn_out_w": P(TP_AXIS, None, None),       # (H_pad, Dk, D)
    "mlp0_w": P(None, TP_AXIS),
    "mlp0_b": P(TP_AXIS,),
    "mlp1_w": P(TP_AXIS, None),
    # attn_out_b / mlp1_b replicated: added AFTER the psum (row-parallel
    # bias must be applied once, not tp times)
}

# W8A8 int8 tp layout ({"q", "s"} leaves, dit.quantize_int8 semantics at
# the tp shapes): q shards like the raw weight; the per-output-channel
# scale s shards like the weight's OUTPUT dims (replicated for
# row-parallel weights — it applies after the contraction and commutes
# with the psum)
_TP_INT8_SPECS = {
    ("qkv_w", "q"): P(None, None, TP_AXIS, None),
    ("qkv_w", "s"): P(None, TP_AXIS, None),     # (3, H_pad, Dk)
    ("attn_out_w", "q"): P(TP_AXIS, None, None),
    ("attn_out_w", "s"): P(),                   # (D,)
    ("mlp0_w", "q"): P(None, TP_AXIS),
    ("mlp0_w", "s"): P(TP_AXIS,),               # (M,)
    ("mlp1_w", "q"): P(TP_AXIS, None),
    ("mlp1_w", "s"): P(),                       # (D,)
}


def _quant_leaf(a, contract_axes):
    """Symmetric absmax int8 over the contraction axes (per-output-channel
    scales; zero-padded heads quantize to all-zero q with the floored
    scale, contributing exactly nothing like the bf16 pad path)."""
    a = jnp.asarray(a, jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(a), axis=contract_axes), 1e-8) / 127.0
    sb = jnp.expand_dims(s, contract_axes)
    q = jnp.clip(jnp.round(a / sb), -127, 127).astype(jnp.int8)
    return {"q": q, "s": s}


_INT8_CONTRACT_AXES = {
    "qkv_w": (0,),          # (D, 3, Hp, Dk) contracts D
    "attn_out_w": (0, 1),   # (Hp, Dk, D) contracts Hp, Dk
    "mlp0_w": (0,),
    "mlp1_w": (0,),
}


def quantize_layer_tp(p: dict) -> dict:
    return {k: (_quant_leaf(v, _INT8_CONTRACT_AXES[k])
                if k in _INT8_CONTRACT_AXES else v)
            for k, v in p.items()}


def pad_heads(n_heads: int, tp: int) -> int:
    return int(math.ceil(n_heads / tp) * tp)


def prep_layer_tp(p: dict, cfg: DiTConfig, tp: int) -> dict:
    """Reorganize one DiT layer's params into the head-major tp layout
    (and zero-pad the head axis up to a multiple of tp)."""
    D, H, Dk = cfg.hidden_size, cfg.num_heads, cfg.head_dim
    Hp = pad_heads(H, tp)
    out = dict(p)
    qkv = jnp.reshape(p["qkv_w"], (D, 3, H, Dk))
    out["qkv_w"] = jnp.pad(qkv, ((0, 0), (0, 0), (0, Hp - H), (0, 0)))
    qkv_b = jnp.reshape(p["qkv_b"], (3, H, Dk))
    out["qkv_b"] = jnp.pad(qkv_b, ((0, 0), (0, Hp - H), (0, 0)))
    ao = jnp.reshape(p["attn_out_w"], (H, Dk, D))
    out["attn_out_w"] = jnp.pad(ao, ((0, Hp - H), (0, 0), (0, 0)))
    return out


def prep_dit_tp(params: dict, cfg: DiTConfig, tp: int, *,
                int8: bool = False) -> dict:
    out = dict(params)
    layers = [prep_layer_tp(p, cfg, tp) for p in params["layers"]]
    if int8:
        layers = [quantize_layer_tp(p) for p in layers]
    out["layers"] = layers
    return out


def _key_str(k) -> str:
    return str(getattr(k, "key", getattr(k, "idx", k)))


def dit_tp_specs(prepped: dict):
    """PartitionSpec pytree matching a prep_dit_tp output: layer matmul
    weights tp-sharded, everything else replicated."""
    def spec(path, x):
        keys = [_key_str(k) for k in path]
        if "layers" in keys:
            if keys[-1] in ("q", "s"):
                return _TP_INT8_SPECS.get((keys[-2], keys[-1]), P())
            return _TP_LEAF_SPECS.get(keys[-1], P())
        return P()

    return jax.tree_util.tree_map_with_path(spec, prepped)


def shard_dit_tp(params: dict, cfg: DiTConfig, mesh: Mesh, *,
                 int8: bool = False):
    """prep + place on the mesh. Returns (sharded_params, specs)."""
    tp = mesh.shape[TP_AXIS]
    prepped = prep_dit_tp(params, cfg, tp, int8=int8)
    specs = dit_tp_specs(prepped)
    sharded = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), prepped,
        specs)
    return sharded, specs


def make_tp_denoise_fn(params, mesh: Mesh, dit_cfg: DiTConfig,
                       sampler_cfg: SamplerConfig, tok_cfg: TokenizerConfig,
                       sem_cfg: SemanticCondConfig, context, uc_context,
                       semantic_tokens, *, compute_dtype=jnp.bfloat16,
                       attn_impl="auto", int8: bool | None = None):
    """Mesh-mode twin of diffusion/engine.make_denoise_fn: same contract
    (denoise_fn(x, step, bundle) -> fp32 CFG-combined x0 prediction), but
    the network forward is a shard_map program with DP over the CFG rows
    and Megatron TP over the transformer (dit.control_warp_forward_tp).

    params: the CogModelInferWrapper dict ({"main","control","semantic"});
    the semantic feature is computed ONCE (replicated — the conditioner is
    ~0.2B and runs a single time per video) and its CFG pair is DP-sharded.
    int8: W8A8 int8 layer matmuls at the tp shapes (default: the
    LANDIFF_DIT_INT8=1 env knob, same as single-chip; activation scales
    are per-shard-local so numerics differ slightly from single-chip int8
    — finer-grained, drift-gated by tests/test_tp_infer.py).
    """
    import os

    from landiff_tpu.diffusion import engine, schedule

    if int8 is None:
        from landiff_tpu.utils import env_flag

        int8 = env_flag("LANDIFF_DIT_INT8")
    has_sp = mesh.shape.get(SP_AXIS, 1) > 1
    has_tp = mesh.shape.get(TP_AXIS, 1) > 1
    # mode: 'tp' (Megatron heads), 'sp' (token ring), 'tpsp' (2-D hybrid —
    # the v5e-16/32 layout: heads over `model`, tokens over `time`)
    mode = ("tpsp" if has_tp and has_sp else "sp" if has_sp else "tp")
    if mode == "sp":
        # sequence-parallel mode (mesh time>1, model=1): weights
        # replicated, tokens sharded, ring attention — no tp prep / head
        # padding needed. The single-chip int8 layout (dit.quantize_int8)
        # applies unchanged.
        from landiff_tpu.models import dit as dit_lib

        def _prep_sp(p):
            p = dit_lib.quantize_int8(p) if int8 else p
            specs = jax.tree_util.tree_map(lambda _: P(), p)
            repl_ns = NamedSharding(mesh, P())
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, repl_ns), p), specs

        main_tp, main_specs = _prep_sp(params["main"])
        ctrl_tp, ctrl_specs = _prep_sp(params["control"])
    else:
        main_tp, main_specs = shard_dit_tp(params["main"], dit_cfg, mesh,
                                           int8=int8)
        ctrl_tp, ctrl_specs = shard_dit_tp(params["control"], dit_cfg, mesh,
                                           int8=int8)

    repl = NamedSharding(mesh, P())
    dsh = NamedSharding(mesh, P(DATA_AXIS))
    bundle = {
        "q_alpha": jax.device_put(
            jnp.asarray(engine.denoiser_quantized_alphas(sampler_cfg),
                        jnp.float32), repl),
        "alpha_table": jax.device_put(
            jnp.asarray(schedule.sampler_tables(sampler_cfg)["alpha"],
                        jnp.float32), repl),
        "main": main_tp,
        "ctx2": jax.device_put(
            jnp.concatenate([uc_context, context], axis=0), dsh),
        "control": ctrl_tp,
    }
    bundle = update_tp_bundle(bundle, mesh, params["semantic"],
                              semantic_tokens, dit_cfg, tok_cfg, sem_cfg,
                              compute_dtype=compute_dtype)

    denoise_fn = _tp_denoise_fn_for(mesh, dit_cfg, _freeze_tree(main_specs),
                                    _freeze_tree(ctrl_specs), compute_dtype,
                                    attn_impl, mode=mode)
    return denoise_fn, bundle


def update_tp_bundle(bundle, mesh: Mesh, sem_params, semantic_tokens,
                     dit_cfg: DiTConfig, tok_cfg: TokenizerConfig,
                     sem_cfg: SemanticCondConfig, *,
                     compute_dtype=jnp.bfloat16):
    """Per-segment bundle refresh for long-video mesh runs: recompute ONLY
    the semantic feature for the new segment's tokens; the tp-sharded
    main/control params, context and schedule tables are reused, so no
    multi-GB device_put per segment (pipeline/long_video.py)."""
    from landiff_tpu.models import semantic_cond as sc_lib

    b = dict(bundle)
    sem = sc_lib.semantic_feature_from_tokens(
        sem_params, semantic_tokens, tok_cfg, sem_cfg,
        forward_t=dit_cfg.latent_frames, compute_dtype=compute_dtype)
    b["sem2"] = jax.device_put(jnp.concatenate([sem, sem], axis=0),
                               NamedSharding(mesh, P(DATA_AXIS)))
    return b


def _freeze_tree(tree):
    """Hashable (leaves, treedef) key for a PartitionSpec pytree."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return (tuple(leaves), treedef)


@functools.lru_cache(maxsize=8)
def _tp_denoise_fn_for(mesh: Mesh, dit_cfg: DiTConfig, frozen_main_specs,
                       frozen_ctrl_specs, compute_dtype, attn_impl,
                       mode: str = "tp"):
    """The shard_map denoise program, cached on its real dependencies
    (mesh / config / spec trees) so every segment of a long-video run and
    every warm/timed bench pass reuses ONE function object — which keys the
    sampler's jitted chunk program cache (samplers._dpmpp2m_chunk_program)
    and avoids re-tracing the full 45-layer sharded DiT per call.
    mode: 'tp' (Megatron heads over `model`), 'sp' (token ring over
    `time`, dit.control_warp_forward_sp), 'tpsp' (2-D hybrid)."""
    from landiff_tpu.models import dit as dit_lib

    main_specs = jax.tree_util.tree_unflatten(frozen_main_specs[1],
                                              list(frozen_main_specs[0]))
    ctrl_specs = jax.tree_util.tree_unflatten(frozen_ctrl_specs[1],
                                              list(frozen_ctrl_specs[0]))

    if mode == "sp":
        def local_net(mp, cp, x2, ts, ctx2, sem2):
            return dit_lib.control_warp_forward_sp(
                mp, cp, x2, ts, ctx2, dit_cfg, sem2, axis=SP_AXIS,
                attn_impl=attn_impl, compute_dtype=compute_dtype)
    else:
        sp_axis = SP_AXIS if mode == "tpsp" else None

        def local_net(mp, cp, x2, ts, ctx2, sem2):
            return dit_lib.control_warp_forward_tp(
                mp, cp, x2, ts, ctx2, dit_cfg, sem2, axis=TP_AXIS,
                attn_impl=attn_impl, compute_dtype=compute_dtype,
                sp_axis=sp_axis)

    d = P(DATA_AXIS)
    net = jax.shard_map(local_net, mesh=mesh,
                        in_specs=(main_specs, ctrl_specs, d, d, d, d),
                        out_specs=d, check_vma=False)

    def denoise_fn(x, step, b):
        B = x.shape[0]
        alpha = b["q_alpha"][jnp.argmin(jnp.abs(step["alpha"]
                                                - b["alpha_table"]))]
        c_skip = alpha
        c_out = -jnp.sqrt(1.0 - alpha ** 2)
        x2 = jnp.concatenate([x, x], axis=0)
        ts = jnp.full((2 * B,), step["timestep"], jnp.float32)
        net_out = net(b["main"], b["control"], x2.astype(compute_dtype), ts,
                      b["ctx2"], b["sem2"])
        denoised = net_out.astype(jnp.float32) * c_out \
            + x2.astype(jnp.float32) * c_skip
        x_u, x_c = denoised[:B], denoised[B:]
        return x_u + step["cfg_scale"] * (x_c - x_u)

    return denoise_fn


def count_hlo_collectives(fn, *args) -> dict:
    """Diagnostic: compile `fn(*args)` and count the collective ops in the
    optimized HLO (the measured-program replacement for the analytic
    projection's assumed collective count)."""
    compiled = jax.jit(fn).lower(*args).compile()
    txt = compiled.as_text()
    return {
        "all_reduce": txt.count(" all-reduce("),
        "all_gather": txt.count(" all-gather("),
        "reduce_scatter": txt.count(" reduce-scatter("),
        "collective_permute": txt.count(" collective-permute("),
    }
