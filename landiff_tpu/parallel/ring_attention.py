"""Ring attention: sequence-parallel full attention over a mesh axis.

For >49-frame DiT scaling (SURVEY §2.8 "ring attention for long-video"):
queries stay sharded over the `time` axis while K/V blocks rotate around
the ring via jax.lax.ppermute; each hop computes local attention and merges
into the running result with the standard log-sum-exp combination. XLA
overlaps the next ppermute with the current block's compute.

Differentiable end-to-end (`ring_attention_diff` custom_vjp): the backward
is a second ring pass — each hop computes that kv-block's dq/dk/dv from the
GLOBAL logsumexp (the flash decomposition: p_j = 2^(s̃_j − L) is already the
globally-normalized probability for block j), with dk/dv accumulators
rotating around the ring alongside k/v so every block's gradient arrives
back at its home shard after n hops. Hop kernels: the Pallas fused flash
forward/backward (ops/attention.py — memory-bounded, the TPU training
path) or dense einsums (CPU-mesh tests / tiny shapes).

Layout: (B, S, H, Dh) with S sharded over `axis`; full (unmasked) attention
(the DiT uses none).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

_LOG2E = 1.4426950408889634  # log2(e): natural <-> base-2 lse conversion


def _local_attn(q, k, v, scale):
    """Dense local attention -> (normalized out (B,Sq,H,Dh) fp32,
    lse (B,Sq,H) fp32, natural log)."""
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


def _local_attn_flash(q, k, v, scale, int8_scores=False, int8_pv=False):
    """Pallas-kernel local attention for the ring hops: the fused flash
    forward with its log2-domain logsumexp ((B, H, Sq) -> (B, Sq, H)).
    int8_scores/int8_pv select the quantized kernel — its lse is
    approximate like its out (self-consistent, which is what the merge
    needs); the DIFFERENTIATED ring pins these False (_ring_diff_fwd)."""
    from landiff_tpu.ops import attention as attn_lib

    out, lse = attn_lib.flash_attention(q, k, v, scale=scale,
                                        int8_scores=int8_scores,
                                        int8_pv=int8_pv, return_lse=True)
    return out.astype(jnp.float32), lse.transpose(0, 2, 1)


def _ring_fwd(q, k, v, axis: str, scale, impl, int8_scores=False,
              int8_pv=False):
    """Ring forward. Returns (out f32 (B,Sq,H,D), lse (B,Sq,H) LOG2)."""
    n = jax.lax.axis_size(axis)
    perm = [(i, (i + 1) % n) for i in range(n)]
    if impl == "pallas":
        local = functools.partial(_local_attn_flash,
                                  int8_scores=int8_scores, int8_pv=int8_pv)
        merge = functools.partial(_merge, exp=jnp.exp2, log=jnp.log2)
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

    (out, lse, _, _), _ = jax.lax.scan(body, (out, lse, k, v), None,
                                       length=n - 1)
    if impl != "pallas":
        lse = lse * _LOG2E  # natural -> log2, one residual convention
    return out, lse


def _hop_bwd_dense(q, kr, vr, do, lse2, delta, out, scale):
    """Dense per-hop backward from the GLOBAL log2 lse: p is the globally
    normalized probability block, so dv/ds/dq/dk follow the plain flash
    gradient identities. All f32."""
    s = jnp.einsum("bqhd,bkhd->bhqk", q, kr) * (scale * _LOG2E)
    p = jnp.exp2(s - lse2.transpose(0, 2, 1)[..., None])     # (B,H,Sq,Skv)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, do)
    dp = jnp.einsum("bqhd,bkhd->bhqk", do, vr)
    ds = p * (dp - delta[..., None])
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, kr) * scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, q) * scale
    return dq, dk, dv


def _hop_bwd_pallas(q, kr, vr, do, lse2, delta, out, scale):
    """Pallas fused flash backward per hop (ops/attention._flash_bwd_pallas
    — kv-major grid, never materializes the score block). `out`/`do` are
    the GLOBAL output/cotangent; delta is recomputed inside (cheap)."""
    from landiff_tpu.ops import attention as attn_lib

    dq, dk, dv = attn_lib._flash_bwd_pallas(
        q, kr, vr, out, lse2.transpose(0, 2, 1), do, None, scale)
    return (dq.astype(jnp.float32), dk.astype(jnp.float32),
            dv.astype(jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def ring_attention_diff(q, k, v, axis: str, scale, impl):
    # PRIMAL (inference) path: int8-scores hops follow the same default
    # as the single-chip dispatcher (ops/attention.attention — ON on the
    # pallas path, opt-out LANDIFF_ATTN_INT8=0, int8 p@v opt-in)
    import os

    int8 = (impl == "pallas"
            and os.environ.get("LANDIFF_ATTN_INT8", "1") == "1")
    int8_pv = int8 and os.environ.get("LANDIFF_ATTN_INT8_PV") == "1"
    out, _ = _ring_fwd(q, k, v, axis, scale, impl, int8, int8_pv)
    return out.astype(q.dtype)


def _ring_diff_fwd(q, k, v, axis, scale, impl):
    # DIFFERENTIATED path: exact f32 hops regardless of env knobs — the
    # ring backward recomputes exact p from the saved lse (same rule as
    # ops/attention._flash_diff_fwd)
    out, lse2 = _ring_fwd(q, k, v, axis, scale, impl)
    outq = out.astype(q.dtype)
    return outq, (q, k, v, outq, lse2)


def _ring_diff_bwd(axis, scale, impl, res, do):
    q, k, v, out, lse2 = res
    n = jax.lax.axis_size(axis)
    perm = [(i, (i + 1) % n) for i in range(n)]
    hop = _hop_bwd_pallas if impl == "pallas" else _hop_bwd_dense
    q32 = q.astype(jnp.float32)
    do32 = do.astype(jnp.float32)
    delta = jnp.sum(do32 * out.astype(jnp.float32),
                    axis=-1).transpose(0, 2, 1)               # (B, H, Sq)
    dq0 = jnp.zeros(q.shape, jnp.float32)
    dkv0 = jnp.zeros(k.shape, jnp.float32)

    def body(carry, _):
        dq, kr, vr, dkr, dvr = carry
        if impl == "pallas":
            dq_i, dk_i, dv_i = hop(q, kr, vr, do, lse2, delta, out, scale)
        else:
            dq_i, dk_i, dv_i = hop(q32, kr.astype(jnp.float32),
                                   vr.astype(jnp.float32), do32, lse2,
                                   delta, out, scale)
        dq = dq + dq_i
        dkr = dkr + dk_i
        dvr = dvr + dv_i
        # rotate grads WITH their k/v so after n hops every block's
        # accumulated gradient lands back on its home shard
        kr, vr, dkr, dvr = (jax.lax.ppermute(x, axis, perm)
                            for x in (kr, vr, dkr, dvr))
        return (dq, kr, vr, dkr, dvr), None

    (dq, _, _, dk, dv), _ = jax.lax.scan(
        body, (dq0, k, v, dkv0, dkv0), None, length=n)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


ring_attention_diff.defvjp(_ring_diff_fwd, _ring_diff_bwd)


def ring_attention_local(q, k, v, axis: str, *, scale=None, impl="xla"):
    """Per-shard ring attention body (use under shard_map with q/k/v
    sharded on `axis` along S). Returns the local output shard, q.dtype.
    Differentiable for BOTH impls (ring_attention_diff custom_vjp).

    impl: 'xla' (dense einsum per hop — fine for small local blocks /
    CPU-mesh tests) or 'pallas' (the flash kernel per hop, lse-merged in
    its log2 domain; backward = the fused Pallas flash backward per hop —
    the TPU path: a dense (B, H, Sq_loc, Skv_loc) f32 score block at
    production shapes would not fit HBM comfortably)."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    return ring_attention_diff(q, k, v, axis, scale, impl)


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
