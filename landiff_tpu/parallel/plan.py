"""Per-chip HBM placement planner for multi-chip serving/training layouts.

Deployment tooling the reference lacks entirely (its MP sizing is
trial-and-error against CUDA OOMs): given a mesh layout and model config,
report each component's per-chip parameter bytes under the SAME placement
rules the pipelines use — tp_infer head-padded Megatron sharding for the
DiT under `model` (replicated under a pure `time`/SP mesh),
mesh.GPT_RULES / mesh.T5_RULES for stage-1, replicated semantic/VAE — so a
layout can be validated against the 16 GB v5e HBM budget host-side, with
no chips and no allocation (shapes via jax.eval_shape).

Usage: python -m landiff_tpu.parallel.plan --mesh data=2,model=4 [--tiny]
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from landiff_tpu.config import LanDiffConfig, MeshConfig, tiny_test_config
from landiff_tpu.parallel import mesh as mesh_lib

V5E_HBM_BYTES = 16 * 1024 ** 3


def _leaf_bytes(leaf, spec, mesh_cfg: MeshConfig) -> tuple[int, int]:
    """(total_bytes, per_chip_bytes) for one leaf under a PartitionSpec."""
    shape = leaf.shape
    total = int(np.prod(shape, dtype=np.int64)) * leaf.dtype.itemsize \
        if shape else leaf.dtype.itemsize
    div = 1
    sizes = {"data": mesh_cfg.data, "model": mesh_cfg.model,
             "time": mesh_cfg.time}
    for d, ax in enumerate(spec):
        if ax is None or d >= len(shape):
            continue
        axes = ax if isinstance(ax, tuple) else (ax,)
        n = int(np.prod([sizes[a] for a in axes]))
        if shape[d] % n == 0:
            div *= n
    return total, total // div


def _tree_bytes(shapes, rules, mesh_cfg: MeshConfig) -> tuple[int, int]:
    total = per_chip = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(shapes)[0]:
        p = mesh_lib._path_str(path)
        spec = mesh_lib.spec_for(p, rules) if rules else ()
        t, c = _leaf_bytes(leaf, spec, mesh_cfg)
        total += t
        per_chip += c
    return total, per_chip


def plan(mesh_cfg: MeshConfig, cfg: LanDiffConfig | None = None, *,
         dtype=jnp.bfloat16) -> dict:
    """Per-component (total, per-chip) parameter bytes for the inference
    fleet layout. DiT main/control follow the serving path: Megatron
    head-padded TP under `model` (ceil(H/tp)*tp heads), replicated under a
    pure SP (`time`) mesh — matching parallel/tp_infer.make_tp_denoise_fn."""
    from landiff_tpu.models import dit as dit_lib
    from landiff_tpu.models import gpt as gpt_lib
    from landiff_tpu.models import semantic_cond as sc_lib
    from landiff_tpu.models import t5 as t5_lib
    from landiff_tpu.models import vae as vae_lib
    from landiff_tpu.models import lm as lm_lib

    cfg = cfg or LanDiffConfig()
    key = jax.random.PRNGKey(0)
    ev = jax.eval_shape

    # DiT: reflect the head padding the tp prep applies
    tp = mesh_cfg.model
    pad = dataclasses.replace(
        cfg.dit, num_heads=int(math.ceil(cfg.dit.num_heads / tp) * tp)) \
        if tp > 1 else cfg.dit
    dit_rules = mesh_lib.DIT_RULES if tp > 1 else None
    comps = {
        "dit_main": (ev(lambda k: dit_lib.init(k, pad, dtype=dtype), key),
                     dit_rules),
        "dit_control": (ev(lambda k: dit_lib.init(k, pad, control=True,
                                                  dtype=dtype), key),
                        dit_rules),
        "semantic_cond": (ev(lambda k: sc_lib.init(k, cfg.tokenizer,
                                                   cfg.semantic_cond,
                                                   dtype), key), None),
        "vae": (ev(lambda k: vae_lib.init(k, cfg.vae, dtype=dtype), key),
                None),
        "t5": (ev(lambda k: t5_lib.init(k, cfg.t5, dtype), key),
               mesh_lib.T5_RULES if tp > 1 else None),
        "lm": (ev(lambda k: lm_lib.init(k, cfg.llm, t5_dim=cfg.t5.d_model,
                                        dtype=dtype), key),
               mesh_lib.GPT_RULES if tp > 1 else None),
    }
    out = {"mesh": dataclasses.asdict(mesh_cfg), "dtype": str(dtype),
           "components": {}, "per_chip_total_bytes": 0}
    for name, (shapes, rules) in comps.items():
        t, c = _tree_bytes(shapes, rules, mesh_cfg)
        out["components"][name] = {"total_bytes": t, "per_chip_bytes": c}
        out["per_chip_total_bytes"] += c
    out["per_chip_total_gib"] = round(
        out["per_chip_total_bytes"] / 1024 ** 3, 3)
    out["v5e_hbm_fraction"] = round(
        out["per_chip_total_bytes"] / V5E_HBM_BYTES, 3)
    return out


def main():
    import argparse
    import json

    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", default="data=2,model=4")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    cfg = tiny_test_config() if args.tiny else LanDiffConfig()
    p = plan(mesh_lib.parse_mesh(args.mesh), cfg,
             dtype=jnp.dtype(args.dtype).type)
    print(json.dumps(p, indent=1))


if __name__ == "__main__":
    main()
