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


def _merge(o1, lse1, o2, lse2, exp=jnp.exp, log=jnp.log):
    """Combine two normalized partial attentions over disjoint key sets.
    `exp`/`log` pick the lse domain: natural (xla path) or base-2 (the
    Pallas kernel's log2-domain lse)."""
    m = jnp.maximum(lse1, lse2)
    w1 = exp(lse1 - m)
    w2 = exp(lse2 - m)
    denom = w1 + w2
    out = (o1 * w1[..., None] + o2 * w2[..., None]) / denom[..., None]
    return out, m + log(denom)


def _local_attn_flash(q, k, v, scale):
    """Pallas-kernel local attention for the ring hops: the fused flash
    forward with its log2-domain logsumexp ((B, H, Sq) -> (B, Sq, H));
    return_lse pins the exact-f32 score path (ops/attention.py)."""
    from landiff_tpu.ops import attention as attn_lib

    out, lse = attn_lib.flash_attention(q, k, v, scale=scale,
                                        return_lse=True)
    return out.astype(jnp.float32), lse.transpose(0, 2, 1)


def ring_attention_local(q, k, v, axis: str, *, scale=None, impl="xla"):
    """Per-shard ring attention body (use under shard_map with q/k/v
    sharded on `axis` along S). Returns the local output shard, q.dtype.

    impl: 'xla' (dense einsum per hop — fine for small local blocks /
    CPU-mesh tests) or 'pallas' (the flash kernel per hop, lse-merged in
    its log2 domain — the TPU path; a (B, H, Sq_loc, Skv_loc) f32 score
    block at production shapes would not fit HBM comfortably)."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    n = jax.lax.axis_size(axis)
    perm = [(i, (i + 1) % n) for i in range(n)]
    if impl == "pallas":
        local, merge = _local_attn_flash, functools.partial(
            _merge, exp=jnp.exp2, log=jnp.log2)
    else:
        local, merge = _local_attn, _merge
    out, lse = local(q, k, v, scale)

    def body(carry, _):
        out, lse, kr, vr = carry
        kr = jax.lax.ppermute(kr, axis, perm)
        vr = jax.lax.ppermute(vr, axis, perm)
        o2, lse2 = local(q, kr, vr, scale)
        out, lse = merge(out, lse, o2, lse2)
        return (out, lse, kr, vr), None

    # scan (not fori_loop): reverse-mode differentiable, so the xla-impl
    # ring can be trained through directly (sequence-parallel training)
    (out, lse, _, _), _ = jax.lax.scan(body, (out, lse, k, v), None,
                                       length=n - 1)
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
