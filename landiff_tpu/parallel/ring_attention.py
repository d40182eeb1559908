"""Ring attention: sequence-parallel full attention over a mesh axis.

For >49-frame DiT scaling (SURVEY §2.8 "ring attention for long-video"):
queries stay sharded over the `time` axis while K/V blocks rotate around
the ring via jax.lax.ppermute; each hop computes local attention and merges
into the running result with the standard log-sum-exp combination. XLA
overlaps the next ppermute with the current block's compute.

Layout: (B, S, H, Dh) with S sharded over `axis`; full (unmasked) attention
(the DiT uses none).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def _local_attn(q, k, v, scale):
    """Local attention -> (normalized out (B,Sq,H,Dh) fp32,
    lse (B,Sq,H) fp32)."""
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bhqk,bkhd->bqhd", p / l, v.astype(jnp.float32))
    lse = (m + jnp.log(l))[..., 0].transpose(0, 2, 1)
    return out, lse


def _merge(o1, lse1, o2, lse2):
    """Combine two normalized partial attentions over disjoint key sets."""
    m = jnp.maximum(lse1, lse2)
    w1 = jnp.exp(lse1 - m)
    w2 = jnp.exp(lse2 - m)
    denom = w1 + w2
    out = (o1 * w1[..., None] + o2 * w2[..., None]) / denom[..., None]
    return out, m + jnp.log(denom)


def ring_attention_local(q, k, v, axis: str, *, scale=None):
    """Per-shard ring attention body (use under shard_map with q/k/v
    sharded on `axis` along S). Returns the local output shard, q.dtype."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    n = jax.lax.axis_size(axis)
    perm = [(i, (i + 1) % n) for i in range(n)]
    out, lse = _local_attn(q, k, v, scale)

    def body(_, carry):
        out, lse, kr, vr = carry
        kr = jax.lax.ppermute(kr, axis, perm)
        vr = jax.lax.ppermute(vr, axis, perm)
        o2, lse2 = _local_attn(q, kr, vr, scale)
        out, lse = _merge(out, lse, o2, lse2)
        return out, lse, kr, vr

    out, lse, _, _ = jax.lax.fori_loop(0, n - 1, body, (out, lse, k, v))
    return out.astype(q.dtype)


def ring_attention(q, k, v, mesh, *, axis: str = "time", scale=None):
    """Sharded full attention: (B, S, H, Dh), S sharded on `axis`. Matches
    dense attention over the gathered sequence."""
    n = mesh.shape[axis]
    assert q.shape[1] % n == 0, (q.shape, n)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(None, axis)),
        out_specs=P(None, axis), check_vma=False)
    def run(q, k, v):
        return ring_attention_local(q, k, v, axis, scale=scale)

    return run(q, k, v)
