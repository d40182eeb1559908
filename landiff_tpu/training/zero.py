"""ZeRO-style sharded optimizer state (the DeepSpeed replacement, SURVEY
§2.9): shard every optimizer-state leaf over the `data` axis so N-way DP
costs ~1/N optimizer memory per chip, while params stay in their TP layout.

With GSPMD this is just sharding constraints on the optimizer state pytree:
XLA inserts the reduce-scatter/all-gather pattern around the update."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _zero_spec(x, axis: str, axis_size: int, min_size: int) -> P:
    """Shard the largest dim divisible by the axis size; replicate tiny
    leaves (scalars, norms)."""
    shape = np.asarray(x).shape
    if not shape or np.prod(shape) < min_size:
        return P()
    for d in np.argsort(shape)[::-1]:
        if shape[d] % axis_size == 0 and shape[d] >= axis_size:
            spec = [None] * len(shape)
            spec[d] = axis
            return P(*spec)
    return P()


def zero_shard_opt_state(opt_state, mesh: Mesh, *, axis: str = "data",
                         min_size: int = 2 ** 16):
    """Place optimizer state on the mesh with each large leaf 1D-sharded
    over `axis`. Returns (sharded_state, shardings_pytree) — pass the
    shardings as jit out_shardings for the train step so updated state
    stays sharded."""
    n = mesh.shape[axis]
    specs = jax.tree_util.tree_map(
        lambda x: _zero_spec(x, axis, n, min_size), opt_state)
    shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda s: isinstance(s, P))
    sharded = jax.tree_util.tree_map(jax.device_put, opt_state, shardings)
    return sharded, shardings


def opt_state_bytes_per_device(opt_state, mesh: Mesh, axis: str = "data"):
    """Diagnostic: optimizer-state bytes on one device under ZeRO sharding
    vs replicated."""
    n = mesh.shape[axis]
    total = sum(np.asarray(x).nbytes
                for x in jax.tree_util.tree_leaves(opt_state))
    sharded = 0
    for x in jax.tree_util.tree_leaves(opt_state):
        spec = _zero_spec(x, axis, n, 2 ** 16)
        frac = 1.0 / n if any(spec) else 1.0
        sharded += np.asarray(x).nbytes * frac
    return int(sharded), int(total)
