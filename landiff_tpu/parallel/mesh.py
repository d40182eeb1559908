"""Device mesh + sharding rules.

Replaces the reference's process-group bookkeeping (SAT mpu model-parallel
groups, sgm CP groups, DeepSpeed init — SURVEY §2.8) with jax.sharding:
pick a mesh, annotate param/batch shardings, let XLA insert the ICI
collectives.

Axes:
  data  — DP (batch)
  model — TP (attention heads / mlp hidden, all-reduce over ICI)
  time  — temporal/sequence sharding (VAE CP, long-video DiT)
"""

from __future__ import annotations

import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from landiff_tpu.config import MeshConfig

AXES = ("data", "model", "time")


def parse_mesh(spec: str | None) -> MeshConfig:
    """'data=2,model=4' -> MeshConfig. None -> all devices on data."""
    if not spec:
        return MeshConfig(data=len(jax.devices()), model=1)
    kv = dict(part.split("=") for part in spec.split(","))
    return MeshConfig(**{k: int(v) for k, v in kv.items()})


def make_mesh(cfg: MeshConfig | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if cfg is None:
        cfg = MeshConfig(data=1, model=len(devices), time=1)
    assert cfg.num_devices <= len(devices), (cfg, len(devices))
    arr = np.asarray(devices[: cfg.num_devices]).reshape(
        cfg.data, cfg.model, cfg.time)
    return Mesh(arr, AXES)


# ---------------------------------------------------------------------------
# parameter sharding rules: list of (path-regex, PartitionSpec). First match
# wins; default replicated. Paths are '/'-joined pytree keys.

# Megatron-style TP: column-parallel on the out-features of qkv/mlp-in,
# row-parallel on the in-features of attn-out/mlp-out -> one psum per block.
DIT_RULES = [
    (r".*\bqkv_w$", P(None, "model")),
    (r".*\bqkv_b$", P("model")),
    (r".*attn_out_w$", P("model", None)),
    (r".*mlp0_w$", P(None, "model")),
    (r".*mlp0_b$", P("model")),
    (r".*mlp1_w$", P("model", None)),
    (r".*zero_linear_w$", P(None, "model")),
]

GPT_RULES = [
    (r".*\bwqkv$", P(None, "model")),
    (r".*\bwo$", P("model", None)),
    (r".*\bw1$", P(None, "model")),
    (r".*\bw3$", P(None, "model")),
    (r".*\bw2$", P("model", None)),
    (r".*\bhead$", P(None, "model")),
]

T5_RULES = [
    (r".*attn/q$", P(None, "model")),
    (r".*attn/k$", P(None, "model")),
    (r".*attn/v$", P(None, "model")),
    (r".*attn/o$", P("model", None)),
    (r".*ff/wi_0$", P(None, "model")),
    (r".*ff/wi_1$", P(None, "model")),
    (r".*ff/wo$", P("model", None)),
]

TITOK_RULES = [
    (r".*\bwq$", P(None, "model")),
    (r".*\bwk$", P(None, "model")),
    (r".*\bwv$", P(None, "model")),
    (r".*\bwo$", P("model", None)),
    (r".*fc0_w$", P(None, "model")),
    (r".*fc1_w$", P("model", None)),
]


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def spec_for(path: str, rules) -> P:
    for pat, spec in rules:
        if re.match(pat, path):
            return spec
    return P()


def _fit_spec(spec: P, shape, mesh: Mesh | None) -> P:
    """Drop sharded axes that don't divide the leaf dim (e.g. vocab 2055
    over model=4) — those leaves stay replicated on that dim."""
    if mesh is None or not any(spec):
        return spec
    out = []
    for d, ax in enumerate(spec):
        if ax is None or d >= len(shape):
            out.append(None)
            continue
        size = np.prod([mesh.shape[a] for a in
                        (ax if isinstance(ax, tuple) else (ax,))])
        out.append(ax if shape[d] % size == 0 else None)
    return P(*out)


def param_specs(params, rules, mesh: Mesh | None = None):
    """Pytree of PartitionSpecs matching `params`. With `mesh` given,
    specs are divisibility-checked against leaf shapes (non-dividing axes
    degrade to replicated).

    int8 {q, s} leaves (gpt/dit quantize_int8: per-output-channel scales,
    reduction over weight axis 0) inherit the BASE weight's rule: q shards
    like the raw weight, s like the weight minus its first (contracted)
    dim — so e.g. a column-parallel (None, model) wqkv quantizes to
    q (None, model) / s (model,), and a row-parallel (model, None) wo to
    q (model, None) / s replicated. A full-path rule match (e.g. T5's
    attn/q leaf NAME) takes precedence over the suffix interpretation."""
    def spec(path, x):
        p = _path_str(path)
        s = spec_for(p, rules)
        if not any(s) and (p.endswith("/q") or p.endswith("/s")):
            base, leaf = p.rsplit("/", 1)
            bs = spec_for(base, rules)
            s = bs if leaf == "q" else P(*bs[1:])
        return _fit_spec(s, np.shape(x), mesh)

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params(params, mesh: Mesh, rules):
    """Place params on the mesh per the rules (device_put with
    NamedSharding)."""
    specs = param_specs(params, rules, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def shardings(mesh: Mesh, specs):
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P))
