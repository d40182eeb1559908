"""Attention kernels.

Replaces the reference's native attention surface (SURVEY §2.9):
  - flash-attn CUDA / torch sdpa            -> Pallas flash attention (TPU)
  - torch flex_attention + BlockMask        -> same kernel + mask-spec
    evaluation in-kernel with a block-visibility table for sparsity skipping
    (masks from ops/masks.py)
  - einsum attention (llm decode)           -> KV-cache einsum decode in
    models/gpt.py (block_decode)

Layout convention: (batch, seq, heads, head_dim) a.k.a. BSHD everywhere.

`mha_reference` is the numerics oracle (fp32 softmax, -max stabilization,
matching tokenizer blocks.py TORCH sdpa and llm transformer_blocks.py einsum
attention); `flash_attention` is the Pallas kernel that must match it.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from landiff_tpu.ops import masks as masks_lib

NEG_INF = -1e30

# VMEM budget for the K/V-resident kernel variant (out of ~16 MB/core;
# leaves room for q/o blocks, the f32 s tile, and accumulators)
_KV_CACHE_VMEM_BUDGET = 9 * 1024 * 1024

def _softmax_tile(m, l, s, keep, v_dtype, exp_bf16=False):
    """One online-softmax tile update (log2-domain s). Returns
    (m_new, alpha, l_new, p_for_pv). exp_bf16: opt-in bf16 exp2 — halves
    VPU cycles on the tile-sized transcendental; p is in [0,1] and feeds a
    bf16 matmul anyway."""
    m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp2(m - m_new)
    if exp_bf16:
        p = jnp.exp2((s - m_new).astype(jnp.bfloat16))
        if keep is not None:
            p = p * keep.astype(jnp.bfloat16)
        l_new = l * alpha + jnp.sum(p, axis=-1,
                                    keepdims=True).astype(jnp.float32)
        pv = p.astype(v_dtype)
    else:
        p = jnp.exp2(s - m_new)
        if keep is not None:
            p = p * keep
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = p.astype(v_dtype)
    return m_new, alpha, l_new, pv


def mha_reference(q, k, v, mask=None, scale=None, mask_fn=None):
    """Dense attention oracle. q,k,v: (B, S, H, D); mask: bool (.., S_q, S_kv)
    broadcastable, True = visible. fp32 softmax, output cast to q.dtype."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if mask_fn is not None:
        qi = jnp.arange(q.shape[1])[:, None]
        ki = jnp.arange(k.shape[1])[None, :]
        mask = mask_fn(qi, ki)
    if mask is not None:
        s = jnp.where(mask, s, NEG_INF)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    if mask is not None:
        # fully-masked rows -> 0 output (flex-attention semantics)
        p = jnp.where(jnp.any(mask, axis=-1, keepdims=True), p, 0.0)
    # floor 1e-6 (not 1e-30): after -max stabilization every non-masked
    # row has sum >= 1, and 1/sum^2 in the VJP must stay finite in f32
    # (1e60 overflows -> inf * 0 = NaN for fully-masked rows)
    p = p / jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-6)
    out = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas flash attention


def _flash_kernel(count_ref,     # SMEM (nq,) int32: visible kv-block count
                  order_ref,     # SMEM (nq, nk) int32: visible kv-block ids
                  kind_ref,      # SMEM (nq, nk) int32: 1 partial / 2 full
                  q_ref,         # VMEM (1, block_q, D)
                  k_hbm,         # ANY  (BH, D, S_kv)  — transposed layout
                  v_hbm,         # ANY  (BH, D, S_kv)
                  o_ref,         # VMEM (1, block_q, D)
                  lse_ref,       # VMEM (1, block_q, 8) f32 log2 lse
                  k_buf,         # VMEM scratch (2, D, block_kv)
                  v_buf,         # VMEM scratch (2, D, block_kv)
                  sem,           # DMA semaphores (2, 2)
                  *,
                  mask_fn, scale, block_q, block_kv, exp_bf16=False):
    """Online-softmax flash attention over only the VISIBLE kv blocks for
    this q block. K/V stay in HBM in (D, S) layout — manual DMA slices must
    be 128-aligned on the minormost dim, which head_dim=64 is not, while the
    S dim is; (D, S) is also the contraction-friendly layout for q @ k^T.
    Blocks are DMA'd into a double buffer so fetch overlaps compute, and
    invisible blocks are never fetched (the scalar-prefetch order table
    provides the block-sparsity skip)."""
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    nkb = count_ref[qi]
    # log2-domain softmax: fold scale*log2(e) into q (a (bq, D) multiply
    # instead of per-tile (bq, bkv) ones) and use the native exp2
    LOG2E = 1.4426950408889634
    q = (q_ref[0].astype(jnp.float32) * (scale * LOG2E)).astype(q_ref.dtype)
    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    a0 = jnp.zeros((block_q, q.shape[-1]), jnp.float32)

    def dma_k(slot, j):
        kj = order_ref[qi, j]
        return pltpu.make_async_copy(
            k_hbm.at[bh, :, pl.ds(kj * block_kv, block_kv)],
            k_buf.at[slot], sem.at[slot, 0])

    def dma_v(slot, j):
        kj = order_ref[qi, j]
        return pltpu.make_async_copy(
            v_hbm.at[bh, :, pl.ds(kj * block_kv, block_kv)],
            v_buf.at[slot], sem.at[slot, 1])

    @pl.when(nkb > 0)
    def _():
        dma_k(0, 0).start()
        dma_v(0, 0).start()

    def body(j, carry):
        m, l, acc = carry
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < nkb)
        def _():
            nxt = jax.lax.rem(j + 1, 2)
            dma_k(nxt, j + 1).start()
            dma_v(nxt, j + 1).start()

        dma_k(slot, j).wait()
        dma_v(slot, j).wait()
        kj = order_ref[qi, j]
        k = k_buf[slot]                                # (D, bkv), bf16
        v = v_buf[slot]                                # (D, bkv), bf16
        # bf16 x bf16 -> f32 accumulation: keep the MXU at full rate;
        # s is in log2 units (scale*log2e folded into q)
        s = jax.lax.dot_general(
            q, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # (bq, bkv) f32
        keep = None
        if mask_fn is not None:
            rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
            tile_mask = mask_fn(rows + qi * block_q, cols + kj * block_kv)
            # float-arithmetic masking (Mosaic can't lower the broadcast
            # i8->i1 truncations that bool-literal selects produce);
            # kind==2 means the whole tile is visible
            full = (kind_ref[qi, j] == 2).astype(jnp.float32)
            keep = jnp.maximum(tile_mask.astype(jnp.float32), full)
            s = s * keep + NEG_INF * (1.0 - keep)
        # fully-masked rows must output 0 (flex-attention semantics):
        # _softmax_tile re-applies keep to p
        m_new, alpha, l_new, pv = _softmax_tile(m, l, s, keep, v_buf.dtype,
                                                exp_bf16=exp_bf16)
        acc_new = acc * alpha + jax.lax.dot_general(
            pv, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # (bq, D)
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, nkb, body, (m0, l0, a0))
    out = acc / jnp.maximum(l, 1e-30)
    o_ref[0] = out.astype(o_ref.dtype)
    _write_lse(lse_ref, m, l)


def _write_lse(lse_ref, m, l):
    """Row logsumexp in log2 units (scores had scale*log2e folded in):
    L2 = m + log2(l); NEG_INF marks fully-masked rows. Saved by the
    forward so the flash BACKWARD kernels recompute p = exp2(s - L2)
    without a second stats pass."""
    lse = jnp.where(l > 0.0, m + jnp.log2(jnp.maximum(l, 1e-30)), NEG_INF)
    # (block_q, 8) broadcast: Mosaic requires the last two block dims be
    # (div 8, div 128) or equal to the array dims — a bare (1, block_q)
    # row vector is unmappable, so row stats ride an 8-lane minor dim
    lse_ref[0] = jnp.broadcast_to(lse, (lse.shape[0], 8))


def _flash_kernel_cached(count_ref,   # SMEM (nq,) int32
                         order_ref,   # SMEM (nq, nk) int32
                         kind_ref,    # SMEM (nq, nk) int32
                         q_ref,       # VMEM (1, block_q, D)
                         k_hbm,       # ANY (BH, D, S_kv)
                         v_hbm,       # ANY (BH, D, S_kv)
                         o_ref,       # VMEM (1, block_q, D)
                         lse_ref,     # VMEM (1, block_q, 8) f32 log2 lse
                         k_cache,     # VMEM scratch (D, S_kv)
                         v_cache,     # VMEM scratch (D, S_kv)
                         sem,         # DMA semaphores (2,)
                         *,
                         mask_fn, scale, block_q, block_kv, exp_bf16=False):
    """K/V-resident variant: the whole (D, S_kv) K and V for the current
    batch*head row are DMA'd into VMEM ONCE (at the first q block) and
    reused by every q block — with grid (BH, nq) iterated row-major
    ('arbitrary' semantics), this cuts K/V HBM traffic by nq (~36x at DiT
    shapes, ~10 GB -> ~0.3 GB per attention call). Only valid when
    2 * D * S_kv * itemsize fits the VMEM budget (checked by the caller)."""
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    nkb = count_ref[qi]
    LOG2E = 1.4426950408889634
    q = (q_ref[0].astype(jnp.float32) * (scale * LOG2E)).astype(q_ref.dtype)
    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    a0 = jnp.zeros((block_q, q.shape[-1]), jnp.float32)

    @pl.when(qi == 0)
    def _():
        ck = pltpu.make_async_copy(k_hbm.at[bh], k_cache, sem.at[0])
        cv = pltpu.make_async_copy(v_hbm.at[bh], v_cache, sem.at[1])
        ck.start()
        cv.start()
        ck.wait()
        cv.wait()

    def body(j, carry):
        m, l, acc = carry
        kj = order_ref[qi, j]
        k = k_cache[:, pl.ds(kj * block_kv, block_kv)]   # (D, bkv)
        v = v_cache[:, pl.ds(kj * block_kv, block_kv)]
        s = jax.lax.dot_general(
            q, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (bq, bkv) f32
        keep = None
        if mask_fn is not None:
            rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
            tile_mask = mask_fn(rows + qi * block_q, cols + kj * block_kv)
            full = (kind_ref[qi, j] == 2).astype(jnp.float32)
            keep = jnp.maximum(tile_mask.astype(jnp.float32), full)
            s = s * keep + NEG_INF * (1.0 - keep)
        m_new, alpha, l_new, pv = _softmax_tile(m, l, s, keep,
                                                v_cache.dtype,
                                                exp_bf16=exp_bf16)
        acc_new = acc * alpha + jax.lax.dot_general(
            pv, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, nkb, body, (m0, l0, a0))
    out = acc / jnp.maximum(l, 1e-30)
    o_ref[0] = out.astype(o_ref.dtype)
    _write_lse(lse_ref, m, l)


def _flash_kernel_cached_i8(count_ref,   # SMEM (nq,) int32
                            order_ref,   # SMEM (nq, nk) int32
                            kind_ref,    # SMEM (nq, nk) int32
                            q_ref,       # VMEM (1, block_q, D)
                            k_hbm,       # ANY (BH, D, S_kv) int8
                            ks_hbm,      # ANY (BH, 1, S_kv) f32 k scales
                            v_hbm,       # ANY (BH, D, S_kv); int8 if int8_pv
                            *rest,       # [vs_ref] o_ref lse_ref k_cache
                                         # ks_cache v_cache sem
                            mask_fn, scale, block_q, block_kv,
                            exp_bf16=False, int8_pv=False):
    """int8-scores variant of the K/V-resident kernel: the q @ k^T
    contraction is head_dim=64 — half the 128-wide MXU K dimension — so
    bf16 scores run the MXU at half rate (the measured step floor,
    PARITY.md). int8 MXU throughput is 2x bf16, recovering the factor:
    K is pre-quantized per kv-position (symmetric absmax over D) outside
    the kernel, q is quantized per row ONCE per q block in here, and the
    int32 scores are rescaled by the exact outer product of the two
    scale vectors before the (unchanged, f32) online softmax.

    int8_pv additionally runs the p @ v matmul in int8 (2x MXU rate even
    at its full-rate S contraction): p is in [0, 1] by construction (post
    online-max exp2), so it quantizes with the FIXED scale 127; V is
    pre-quantized per (bh, kv-block) with a scalar absmax scale (vs_ref,
    (1, nk8, 8) f32) that is constant within a tile contraction and
    therefore factors out exactly: sum_k p*v = (p8 @ v8) * sv_j / 127."""
    if int8_pv:
        vs_ref, o_ref, lse_ref, k_cache, ks_cache, v_cache, sem = rest
    else:
        o_ref, lse_ref, k_cache, ks_cache, v_cache, sem = rest
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    nkb = count_ref[qi]
    LOG2E = 1.4426950408889634
    qf = q_ref[0].astype(jnp.float32)                      # (bq, D)
    sq = jnp.max(jnp.abs(qf), axis=-1, keepdims=True)      # (bq, 1)
    sq = jnp.maximum(sq, 1e-30) / 127.0
    q8 = jnp.round(qf / sq).astype(jnp.int8)
    # fold softmax scale and the log2-domain factor into the q scales
    sq = sq * (scale * LOG2E)
    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    a0 = jnp.zeros((block_q, qf.shape[-1]), jnp.float32)

    @pl.when(qi == 0)
    def _():
        ck = pltpu.make_async_copy(k_hbm.at[bh], k_cache, sem.at[0])
        cs = pltpu.make_async_copy(ks_hbm.at[bh], ks_cache, sem.at[1])
        cv = pltpu.make_async_copy(v_hbm.at[bh], v_cache, sem.at[2])
        ck.start()
        cs.start()
        cv.start()
        ck.wait()
        cs.wait()
        cv.wait()

    def body(j, carry):
        m, l, acc = carry
        kj = order_ref[qi, j]
        k = k_cache[:, pl.ds(kj * block_kv, block_kv)]     # (D, bkv) int8
        sk = ks_cache[0, pl.ds(kj * block_kv, block_kv)]   # (bkv,) f32
        v = v_cache[:, pl.ds(kj * block_kv, block_kv)]
        s32 = jax.lax.dot_general(
            q8, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)              # (bq, bkv) i32
        s = s32.astype(jnp.float32) * sq * sk[None, :]     # log2 units
        keep = None
        if mask_fn is not None:
            rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
            tile_mask = mask_fn(rows + qi * block_q, cols + kj * block_kv)
            full = (kind_ref[qi, j] == 2).astype(jnp.float32)
            keep = jnp.maximum(tile_mask.astype(jnp.float32), full)
            s = s * keep + NEG_INF * (1.0 - keep)
        if int8_pv:
            m_new, alpha, l_new, pv = _softmax_tile(m, l, s, keep,
                                                    jnp.float32,
                                                    exp_bf16=exp_bf16)
            p8 = jnp.round(pv * 127.0).astype(jnp.int8)
            pv32 = jax.lax.dot_general(
                p8, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)          # (bq, D) i32
            sv = vs_ref[0, kj, 0]                          # scalar f32
            acc_new = acc * alpha \
                + pv32.astype(jnp.float32) * (sv * (1.0 / 127.0))
        else:
            m_new, alpha, l_new, pv = _softmax_tile(m, l, s, keep,
                                                    v_cache.dtype,
                                                    exp_bf16=exp_bf16)
            acc_new = acc * alpha + jax.lax.dot_general(
                pv, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, nkb, body, (m0, l0, a0))
    out = acc / jnp.maximum(l, 1e-30)
    o_ref[0] = out.astype(o_ref.dtype)
    # approximate (int8-score) lse in the same log2 convention as the
    # exact kernels — consistent with THIS kernel's own out, which is all
    # the ring merge needs (parallel/ring_attention.py int8 hops)
    _write_lse(lse_ref, m, l)


def _pad_to(x, length, axis):
    pad = length - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(
    jax.jit,
    static_argnames=("mask_fn", "scale", "block_q", "block_kv", "interpret",
                     "cached", "int8_scores", "exp_bf16", "int8_pv"))
def _flash_call(q, k, v, count, order, kind, k_scales=None, v_scales=None,
                *, mask_fn, scale, block_q, block_kv, interpret,
                cached=False, int8_scores=False, exp_bf16=False,
                int8_pv=False):
    BH, Sq, D = q.shape
    Skv = k.shape[2]           # k/v arrive transposed: (BH, D, S_kv)
    nq = Sq // block_q
    if int8_scores:
        in_specs = [
            pl.BlockSpec((1, block_q, D), lambda bh, qi, *_: (bh, qi, 0)),
            pl.BlockSpec(memory_space=pl.ANY),   # K int8 in HBM
            pl.BlockSpec(memory_space=pl.ANY),   # K scales in HBM
            pl.BlockSpec(memory_space=pl.ANY),   # V in HBM
        ]
        operands = (count, order, kind, q, k, k_scales, v)
        if int8_pv:
            # per-(bh, kv-block) scalar V scales ride a small VMEM block
            nk8 = v_scales.shape[1]
            in_specs.append(pl.BlockSpec((1, nk8, 8),
                                         lambda bh, qi, *_: (bh, 0, 0)))
            operands = operands + (v_scales,)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(BH, nq),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, block_q, D), lambda bh, qi, *_: (bh, qi, 0)),
                pl.BlockSpec((1, block_q, 8), lambda bh, qi, *_: (bh, qi, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((D, Skv), jnp.int8),
                pltpu.VMEM((1, Skv), jnp.float32),
                pltpu.VMEM((D, Skv), v.dtype),
                pltpu.SemaphoreType.DMA((3,)),
            ],
        )
        out, lse = pl.pallas_call(
            functools.partial(_flash_kernel_cached_i8, mask_fn=mask_fn,
                              scale=scale, block_q=block_q,
                              block_kv=block_kv, exp_bf16=exp_bf16,
                              int8_pv=int8_pv),
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype),
                       jax.ShapeDtypeStruct((BH, Sq, 8), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
            cost_estimate=pl.CostEstimate(
                flops=4 * BH * Sq * Skv * D,
                bytes_accessed=BH * (4 * Sq * D + Skv * (3 * D + 4)),
                transcendentals=BH * Sq * Skv),
            interpret=interpret,
        )(*operands)
        return out, lse
    if cached:
        scratch = [
            pltpu.VMEM((D, Skv), q.dtype),
            pltpu.VMEM((D, Skv), v.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        kernel = functools.partial(
            _flash_kernel_cached, mask_fn=mask_fn, scale=scale,
            block_q=block_q, block_kv=block_kv, exp_bf16=exp_bf16)
        # scratch K/V must persist across the qi sweep of one bh row
        semantics = ("arbitrary", "arbitrary")
        bytes_accessed = 2 * BH * (Sq + Skv) * D * q.dtype.itemsize
    else:
        scratch = [
            pltpu.VMEM((2, D, block_kv), q.dtype),
            pltpu.VMEM((2, D, block_kv), v.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ]
        kernel = functools.partial(
            _flash_kernel, mask_fn=mask_fn, scale=scale, block_q=block_q,
            block_kv=block_kv, exp_bf16=exp_bf16)
        semantics = ("parallel", "parallel")
        bytes_accessed = 2 * BH * (Sq + 2 * Skv) * D * q.dtype.itemsize
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(BH, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda bh, qi, *_: (bh, qi, 0)),
            pl.BlockSpec(memory_space=pl.ANY),   # K stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),   # V stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, D), lambda bh, qi, *_: (bh, qi, 0)),
            pl.BlockSpec((1, block_q, 8), lambda bh, qi, *_: (bh, qi, 0)),
        ],
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct((BH, Sq, 8), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics),
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * Sq * Skv * D,
            bytes_accessed=bytes_accessed,
            transcendentals=BH * Sq * Skv),
        interpret=interpret,
    )(count, order, kind, q, k, v)


def flash_attention(q, k, v, *, mask_fn=None, scale=None,
                    block_q: int = 512, block_kv: int = 1024,
                    interpret: bool | None = None,
                    int8_scores: bool | None = None,
                    exp_bf16: bool | None = None,
                    int8_pv: bool | None = None,
                    return_lse: bool = False):
    """Flash attention with optional structured mask.

    Args:
      q, k, v: (B, S, H, D).
      mask_fn: a mask spec from ops/masks.py (hashable callable of
        (q_idx, kv_idx) -> bool), or None for full attention. Evaluated at
        trace time on host for block visibility and inside the kernel for
        partial tiles.
      scale: softmax scale; default 1/sqrt(D).
      return_lse: also return the per-row log2-domain logsumexp
        (B, H, S) f32 — consumed by the Pallas flash backward and the
        ring-attention hop merge. Available from the int8-scores kernel
        too (its lse is approximate like its out — self-consistent, which
        is what the ring merge needs); the DIFFERENTIABLE path pins
        int8_scores=False itself (_flash_diff_fwd), so training stays
        exact.
    Returns: (B, S, H, D) q.dtype; with return_lse a tuple (out, lse).
    """
    B, Sq, H, D = q.shape
    Skv = k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    block_q = min(block_q, masks_lib.round_up(Sq, 128))
    block_kv = min(block_kv, masks_lib.round_up(Skv, 128))
    Sq_p = masks_lib.round_up(Sq, block_q)
    Skv_p = masks_lib.round_up(Skv, block_kv)

    # padding-aware mask: padded kv columns must be invisible
    if mask_fn is None and Skv_p == Skv:
        eff_fn = None
    elif Skv_p != Skv:
        eff_fn = masks_lib.kv_limit(mask_fn, Skv)
    else:
        eff_fn = mask_fn

    nq, nk = Sq_p // block_q, Skv_p // block_kv
    if eff_fn is None:
        vis = np.full((nq, nk), 2, np.int8)
    else:
        vis = masks_lib.block_visibility(eff_fn, Sq_p, Skv_p, block_q, block_kv)
    kern_fn = eff_fn

    # per-q-block visible kv-block order tables (block-sparsity skip)
    count = np.zeros((nq,), np.int32)
    order = np.zeros((nq, nk), np.int32)
    kind = np.zeros((nq, nk), np.int32)
    for i in range(nq):
        ids = np.nonzero(vis[i])[0]
        count[i] = len(ids)
        order[i, :len(ids)] = ids
        kind[i, :len(ids)] = vis[i, ids]

    # q: BSHD -> (B*H, S, D); k/v -> transposed (B*H, D, S) for aligned DMA
    qt = _pad_to(q.transpose(0, 2, 1, 3).reshape(B * H, Sq, D), Sq_p, 1)
    kt = _pad_to(k.transpose(0, 2, 3, 1).reshape(B * H, D, Skv), Skv_p, 2)
    vt = _pad_to(v.transpose(0, 2, 3, 1).reshape(B * H, D, Skv), Skv_p, 2)

    # K/V-resident kernel when a full (D, S_kv) K+V pair fits the VMEM
    # budget AND there is >1 q block to amortize (cuts K/V HBM refetch nq x)
    import os

    if int8_scores is None:
        int8_scores = os.environ.get("LANDIFF_ATTN_INT8") == "1"
    if exp_bf16 is None:
        exp_bf16 = os.environ.get("LANDIFF_ATTN_EXP_BF16") == "1"
    if int8_pv is None:
        int8_pv = os.environ.get("LANDIFF_ATTN_INT8_PV") == "1"
    cache_bytes = 2 * D * Skv_p * q.dtype.itemsize
    cached = (cache_bytes <= _KV_CACHE_VMEM_BUDGET and nq > 1
              and os.environ.get("LANDIFF_ATTN_CACHED", "1") != "0")
    if int8_scores and cached:
        # symmetric per-kv-position absmax quantization of K (over D)
        sk = jnp.max(jnp.abs(kt.astype(jnp.float32)), axis=1,
                     keepdims=True)                    # (BH, 1, Skv)
        sk = jnp.maximum(sk, 1e-30) / 127.0
        k8 = jnp.round(kt.astype(jnp.float32) / sk).astype(jnp.int8)
        vs = None
        v_in = vt
        if int8_pv:
            # per-(bh, kv-block) scalar absmax quantization of V: constant
            # within a tile contraction, so the scale factors out exactly
            nk_ = Skv_p // block_kv
            vb = vt.astype(jnp.float32).reshape(B * H, D, nk_, block_kv)
            sv = jnp.max(jnp.abs(vb), axis=(1, 3))     # (BH, nk)
            sv = jnp.maximum(sv, 1e-30) / 127.0
            v_in = jnp.round(vb / sv[:, None, :, None]).astype(
                jnp.int8).reshape(B * H, D, Skv_p)
            nk8 = masks_lib.round_up(nk_, 8)
            svp = jnp.pad(sv, ((0, 0), (0, nk8 - nk_)))
            vs = jnp.broadcast_to(svp[:, :, None], (B * H, nk8, 8)) + 0.0
        out, lse = _flash_call(qt, k8, v_in, jnp.asarray(count),
                               jnp.asarray(order), jnp.asarray(kind), sk, vs,
                               mask_fn=kern_fn, scale=scale, block_q=block_q,
                               block_kv=block_kv, interpret=interpret,
                               int8_scores=True, exp_bf16=exp_bf16,
                               int8_pv=int8_pv)
        out = out[:, :Sq].reshape(B, H, Sq, D).transpose(0, 2, 1, 3)
        if return_lse:
            return out, lse[:, :Sq, 0].reshape(B, H, Sq)
        return out

    out, lse = _flash_call(qt, kt, vt, jnp.asarray(count), jnp.asarray(order),
                           jnp.asarray(kind), mask_fn=kern_fn,
                           scale=scale, block_q=block_q, block_kv=block_kv,
                           interpret=interpret, cached=cached,
                           exp_bf16=exp_bf16)
    out = out[:, :Sq].reshape(B, H, Sq, D).transpose(0, 2, 1, 3)
    if return_lse:
        return out, lse[:, :Sq, 0].reshape(B, H, Sq)
    return out


# ---------------------------------------------------------------------------
# Pallas flash-attention BACKWARD (the flash-attn CUDA backward equivalent,
# SURVEY §2.9): ONE fused kernel over a kv-major grid (BH, kj, qi) that
# recomputes each (q, kv) tile's s / p = exp2(s - L) / dp / ds exactly once
# and feeds all three gradient matmuls from it:
#   dv[kj] += p^T do,  dk[kj] += (scale·ds)^T q   — accumulated straight
#     into the per-kj OUTPUT blocks (revisited consecutively across qi);
#   dq[qi] += (scale·ds) @ k^T — accumulated at a dynamic row offset into
#     a FULL-SIZE (Sq_p, D) f32 output ref that stays VMEM-resident for the
#     whole bh iteration (~4.6 MB at production shapes; the TPU grid is
#     sequential, so cross-kj accumulation into one ref is race-free).
# 5 matmul passes + 1 exp pass total, vs 7 + 2 for the classic separate
# dq / dkv kernels — measured 96 ms vs 137 ms (two-kernel) vs 131 ms (XLA
# double-scan) per call at (1, 17776, 30, 64) on v5e.
# p/ds are cast to bf16 for the MXU matmuls (same as the XLA fallback);
# the row stats come from the forward's saved log2-domain lse (no extra
# stats pass). Block sparsity rides the prefetched per-kv-block tables
# through the BlockSpec index_maps, so invisible tiles are neither fetched
# nor computed; q rows visible to no kv block keep their zero-initialized
# dq.

_LOG2E = 1.4426950408889634


def _bwd_tile(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, mask_fn,
              scale, q_base, kv_base, is_full):
    """Shared per-tile recompute: returns (p, ds) f32 (bq, bkv)."""
    q = (q_ref[0].astype(jnp.float32) * (scale * _LOG2E)).astype(q_ref.dtype)
    k = k_ref[0]                                  # (D, bkv)
    s = jax.lax.dot_general(q, k, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    keep = None
    if mask_fn is not None:
        bq, bkv = s.shape
        rows = jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 1)
        tile_mask = mask_fn(rows + q_base, cols + kv_base)
        full = is_full.astype(jnp.float32)
        keep = jnp.maximum(tile_mask.astype(jnp.float32), full)
        s = s * keep + NEG_INF * (1.0 - keep)
    # p = exp2(s - L2) is the exact softmax prob; multiply by keep so
    # fully-masked rows (L2 = NEG_INF -> s - L2 = 0) stay 0
    p = jnp.exp2(s - lse_ref[0, :, :1])
    if keep is not None:
        p = p * keep
    dp = jax.lax.dot_general(do_ref[0], v_ref[0], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[0, :, :1])
    return p, ds


def _flash_bwd_fused_kernel(count_ref, order_ref, kind_ref, q_ref, k_ref,
                            v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                            dk_ref, dv_ref, *, mask_fn, scale, block_q,
                            block_kv):
    kj = pl.program_id(1)
    i = pl.program_id(2)

    @pl.when((kj == 0) & (i == 0))
    def _():
        dq_ref[...] = jnp.zeros_like(dq_ref)

    @pl.when(i == 0)
    def _():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    @pl.when(i < count_ref[kj])
    def _():
        qi = order_ref[kj, i]
        p, ds = _bwd_tile(q_ref, k_ref, v_ref, do_ref, lse_ref,
                          delta_ref, mask_fn, scale, qi * block_q,
                          kj * block_kv, kind_ref[kj, i] == 2)
        pb = p.astype(q_ref.dtype)
        dsb = (ds * scale).astype(q_ref.dtype)   # scale folded once, used
        dv_ref[0] += jax.lax.dot_general(        # by both dk and dq
            pb, do_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk_ref[0] += jax.lax.dot_general(
            dsb, q_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        rows = pl.ds(qi * block_q, block_q)
        cur = dq_ref[0, rows, :]
        dq_ref[0, rows, :] = cur + jax.lax.dot_general(
            dsb, k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("mask_fn", "scale", "block_q", "block_kv", "interpret"))
def _flash_bwd_call(q, k, v, do, lse, delta, *, mask_fn, scale, block_q,
                    block_kv, interpret):
    """q/do: (BH, Sq_p, D); k/v: (BH, D, Skv_p); lse/delta: (BH, Sq_p, 8) f32
    (row stats broadcast over an 8-lane minor dim; see _write_lse note).
    Returns (dq f32, dk f32, dv f32) in the same layouts."""
    BH, Sqp, D = q.shape
    Skvp = k.shape[2]
    nq, nk = Sqp // block_q, Skvp // block_kv

    if mask_fn is None:
        vis = np.full((nq, nk), 2, np.int8)
    else:
        vis = masks_lib.block_visibility(mask_fn, Sqp, Skvp, block_q,
                                         block_kv)

    # per-kv-block tables over the TRANSPOSED visibility: which q blocks
    # see kv block kj, in what order, and whether the tile is full (kind 2)
    vt = vis.T
    count = np.zeros((nk,), np.int32)
    order = np.zeros((nk, nq), np.int32)
    kind = np.zeros((nk, nq), np.int32)
    for r in range(nk):
        ids = np.nonzero(vt[r])[0]
        count[r] = len(ids)
        order[r, :len(ids)] = ids
        kind[r, :len(ids)] = vt[r, ids]
    ck, ok, kk = jnp.asarray(count), jnp.asarray(order), jnp.asarray(kind)

    qspec_t = pl.BlockSpec((1, block_q, D),
                           lambda bh, kj, i, c, o, kn: (bh, o[kj, i], 0))
    rowspec_t = pl.BlockSpec((1, block_q, 8),
                             lambda bh, kj, i, c, o, kn: (bh, o[kj, i], 0))
    kvspec = pl.BlockSpec((1, D, block_kv),
                          lambda bh, kj, i, *_: (bh, 0, kj))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_fused_kernel, mask_fn=mask_fn,
                          scale=scale, block_q=block_q, block_kv=block_kv),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(BH, nk, nq),
            in_specs=[qspec_t, kvspec, kvspec, qspec_t, rowspec_t,
                      rowspec_t],
            out_specs=[
                pl.BlockSpec((1, Sqp, D), lambda bh, kj, i, *_: (bh, 0, 0)),
                pl.BlockSpec((1, block_kv, D),
                             lambda bh, kj, i, *_: (bh, kj, 0)),
                pl.BlockSpec((1, block_kv, D),
                             lambda bh, kj, i, *_: (bh, kj, 0)),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((BH, Sqp, D), jnp.float32),
                   jax.ShapeDtypeStruct((BH, Skvp, D), jnp.float32),
                   jax.ShapeDtypeStruct((BH, Skvp, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            # The full-size dq accumulator ((Sq_p, D) f32 ≈ 4.6 MB at
            # production shapes, double-buffered across bh by Mosaic) plus
            # the (bq, bkv) f32 tile intermediates need ~20 MB of scoped
            # VMEM — over the 16 MB default but a small slice of the 128 MB
            # physical VMEM, so raise the per-kernel limit instead of
            # shrinking tiles (smaller tiles cost MXU efficiency).
            vmem_limit_bytes=48 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=10 * BH * Sqp * Skvp * D,
            bytes_accessed=BH * (4 * Sqp * D + 2 * Skvp * D * 2
                                 + nk * 2 * Sqp * D * 2),
            transcendentals=BH * Sqp * Skvp),
        interpret=interpret,
    )(ck, ok, kk, q, k, v, do, lse, delta)
    return dq, dk, dv


def _flash_bwd_pallas(q, k, v, out, lse, do, mask_fn, scale, *,
                      block_q=512, block_kv=512, interpret=None):
    """BSHD-layout driver for the Pallas backward. lse: (B, H, Sq) log2."""
    B, Sq, H, D = q.shape
    Skv = k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    BH = B * H
    block_q = min(block_q, masks_lib.round_up(Sq, 128))
    block_kv = min(block_kv, masks_lib.round_up(Skv, 128))
    Sqp = masks_lib.round_up(Sq, block_q)
    Skvp = masks_lib.round_up(Skv, block_kv)

    if mask_fn is None and Skvp == Skv:
        eff_fn = None
    elif Skvp != Skv:
        eff_fn = masks_lib.kv_limit(mask_fn, Skv)
    else:
        eff_fn = mask_fn

    qt = _pad_to(q.transpose(0, 2, 1, 3).reshape(BH, Sq, D), Sqp, 1)
    dot = _pad_to(do.astype(q.dtype).transpose(0, 2, 1, 3)
                  .reshape(BH, Sq, D), Sqp, 1)
    kt = _pad_to(k.transpose(0, 2, 3, 1).reshape(BH, D, Skv), Skvp, 2)
    vt = _pad_to(v.transpose(0, 2, 3, 1).reshape(BH, D, Skv), Skvp, 2)
    # delta = rowsum(do * o) (natural units); lse arrives log2-domain;
    # both broadcast onto the 8-lane stat layout the kernels map
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)                               # (B, Sq, H)
    delta = _pad_to(delta.transpose(0, 2, 1).reshape(BH, Sq), Sqp, 1)
    delta = jnp.broadcast_to(delta[..., None], (BH, Sqp, 8))
    lse_p = _pad_to(lse.reshape(BH, Sq), Sqp, 1)
    lse_p = jnp.broadcast_to(lse_p[..., None], (BH, Sqp, 8))

    dq, dk, dv = _flash_bwd_call(qt, kt, vt, dot, lse_p, delta,
                                 mask_fn=eff_fn, scale=scale,
                                 block_q=block_q, block_kv=block_kv,
                                 interpret=interpret)

    def unprep(x, S):
        return x[:, :S].reshape(B, H, S, D).transpose(0, 2, 1, 3)

    return (unprep(dq, Sq).astype(q.dtype), unprep(dk, Skv).astype(k.dtype),
            unprep(dv, Skv).astype(v.dtype))


# ---------------------------------------------------------------------------
# differentiable wrapper: Pallas forward + chunked flash backward
#
# pallas_call has no autodiff rule, and a dense jnp backward would
# materialize the (S_q, S_kv) score matrix (37 GB at DiT shapes). The
# backward here is an XLA-level flash backward: a scan over q chunks with
# an inner scan over kv chunks — logsumexp recompute pass + gradient pass,
# never holding more than one (bq, bkv) tile of scores. This is what makes
# attention differentiable at production sequence lengths (training path;
# the forward stays the Pallas kernel).


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_diff(q, k, v, mask_fn, scale, int8_scores=False):
    # PRIMAL (inference) path: int8 scores allowed when requested — the
    # denoise loop is never differentiated, and the quantized kernel is
    # 1.065x with end-output corr ≥ 0.9999 vs exact (gated by
    # tests/test_attention_int8_drift.py). exp_bf16 stays off (measured
    # slower, PARITY.md).
    return flash_attention(q, k, v, mask_fn=mask_fn, scale=scale,
                           int8_scores=int8_scores, exp_bf16=False)


def _flash_diff_fwd(q, k, v, mask_fn, scale, int8_scores=False):
    from jax.ad_checkpoint import checkpoint_name

    # DIFFERENTIATED path: exact f32 scores regardless of int8_scores /
    # env knobs — the backward recomputes exact scores from the saved lse,
    # so an approximate forward would silently mismatch its own gradients
    # (advisor r2 finding). Training numerics are always exact.
    out, lse = flash_attention(q, k, v, mask_fn=mask_fn, scale=scale,
                               int8_scores=False, exp_bf16=False,
                               int8_pv=False, return_lse=True)
    # names let a remat policy SAVE the kernel outputs while recomputing
    # the cheap qkv projections: jax.checkpoint(policy=save_only_these_
    # names('flash_out','flash_lse')) skips re-running the forward kernel
    # in the backward pass (~45 ms/layer at production shapes) for
    # ~71 MB/layer of residuals (models/dit.py remat_policy)
    out = checkpoint_name(out, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    return out, (q, k, v, out, lse)


def _flash_diff_bwd(mask_fn, scale, int8_scores, res, do):
    """Dispatch: Pallas flash backward (default) or the XLA double-scan
    fallback/oracle (LANDIFF_ATTN_BWD=xla). int8_scores is a nondiff arg
    of the primal only — the backward is always exact f32."""
    import os

    q, k, v, out, lse = res
    if os.environ.get("LANDIFF_ATTN_BWD", "pallas") != "xla":
        return _flash_bwd_pallas(q, k, v, out, lse, do, mask_fn, scale)
    return _flash_diff_bwd_xla(mask_fn, scale, (q, k, v, out), do)


def _flash_diff_bwd_xla(mask_fn, scale, res, do, *, bq=512, bkv=1024):
    q, k, v, out = res
    B, Sq, H, D = q.shape
    Skv = k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    BH = B * H
    Sqp = masks_lib.round_up(Sq, bq)
    Skvp = masks_lib.round_up(Skv, bkv)
    nq, nk = Sqp // bq, Skvp // bkv

    def prep(x, S, Sp):
        return _pad_to(x.transpose(0, 2, 1, 3).reshape(BH, S, D), Sp, 1)

    qt = prep(q, Sq, Sqp)
    kt = prep(k, Skv, Skvp).reshape(BH, nk, bkv, D)
    vt = prep(v, Skv, Skvp).reshape(BH, nk, bkv, D)
    dot = prep(do.astype(q.dtype), Sq, Sqp).reshape(BH, nq, bq, D)
    ot = prep(out, Sq, Sqp).reshape(BH, nq, bq, D)
    qt = qt.reshape(BH, nq, bq, D)

    def keep_tile(qi0, ki0):
        qi = qi0 + jnp.arange(bq)[:, None]
        ki = ki0 + jnp.arange(bkv)[None, :]
        m = ki < Skv
        if mask_fn is not None:
            m = jnp.logical_and(m, mask_fn(qi, ki))
        return m

    def scores(qb, kj):
        return jnp.einsum("bqd,bkd->bqk", qb, kj,
                          preferred_element_type=jnp.float32) * scale

    def q_chunk(carry, i):
        dk, dv = carry
        qb = jax.lax.dynamic_index_in_dim(qt, i, 1, keepdims=False)
        dob = jax.lax.dynamic_index_in_dim(dot, i, 1, keepdims=False)
        ob = jax.lax.dynamic_index_in_dim(ot, i, 1, keepdims=False)
        Dvec = jnp.sum(dob.astype(jnp.float32) * ob.astype(jnp.float32),
                       axis=-1)                                # (BH, bq)

        def lse(carry2, j):
            m, l = carry2
            kj = jax.lax.dynamic_index_in_dim(kt, j, 1, keepdims=False)
            s = scores(qb, kj)
            km = keep_tile(i * bq, j * bkv)
            s = jnp.where(km[None], s, NEG_INF)
            m2 = jnp.maximum(m, jnp.max(s, axis=-1))
            l2 = l * jnp.exp(m - m2) + jnp.sum(
                jnp.exp(s - m2[..., None]) * km[None], axis=-1)
            return (m2, l2), None

        m0 = jnp.full((BH, bq), NEG_INF, jnp.float32)
        l0 = jnp.zeros((BH, bq), jnp.float32)
        (m, l), _ = jax.lax.scan(lse, (m0, l0), jnp.arange(nk))
        L = m + jnp.log(jnp.maximum(l, 1e-30))                 # (BH, bq)

        def grad(carry2, j):
            dqacc, dk, dv = carry2
            kj = jax.lax.dynamic_index_in_dim(kt, j, 1, keepdims=False)
            vj = jax.lax.dynamic_index_in_dim(vt, j, 1, keepdims=False)
            s = scores(qb, kj)
            km = keep_tile(i * bq, j * bkv)
            # mask BEFORE the exp: invisible columns can have raw s >> L
            # (overflow -> inf * 0 = NaN) ...
            s = jnp.where(km[None], s, NEG_INF)
            # ... AND zero p explicitly after: for a FULLY-masked row,
            # L = NEG_INF + log(1e-30) so s - L = +69 and the exp alone
            # gives ~9e29, not 0 (flex-attention zero-row semantics)
            p = jnp.where(km[None], jnp.exp(s - L[..., None]), 0.0)
            dp = jnp.einsum("bqd,bkd->bqk", dob, vj,
                            preferred_element_type=jnp.float32)
            t = (p * (dp - Dvec[..., None])).astype(q.dtype)
            pb = p.astype(q.dtype)
            dqacc = dqacc + scale * jnp.einsum(
                "bqk,bkd->bqd", t, kj, preferred_element_type=jnp.float32)
            dkj = scale * jnp.einsum("bqk,bqd->bkd", t, qb,
                                     preferred_element_type=jnp.float32)
            dvj = jnp.einsum("bqk,bqd->bkd", pb, dob,
                             preferred_element_type=jnp.float32)
            dk = dk.at[:, j].add(dkj)
            dv = dv.at[:, j].add(dvj)
            return (dqacc, dk, dv), None

        dq0 = jnp.zeros((BH, bq, D), jnp.float32)
        (dqc, dk, dv), _ = jax.lax.scan(grad, (dq0, dk, dv),
                                        jnp.arange(nk))
        return (dk, dv), dqc

    z = jnp.zeros((BH, nk, bkv, D), jnp.float32)
    (dk, dv), dq_chunks = jax.lax.scan(q_chunk, (z, z), jnp.arange(nq))

    def unprep(x, S):
        # x: (BH, Sp, D) -> (B, S, H, D)
        return x[:, :S].reshape(B, H, S, D).transpose(0, 2, 1, 3)

    dq = unprep(jnp.moveaxis(dq_chunks, 0, 1).reshape(BH, Sqp, D), Sq)
    dk_out = unprep(dk.reshape(BH, Skvp, D), Skv)
    dv_out = unprep(dv.reshape(BH, Skvp, D), Skv)
    return (dq.astype(q.dtype), dk_out.astype(k.dtype),
            dv_out.astype(v.dtype))


_flash_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


def attention(q, k, v, *, mask_fn=None, mask=None, scale=None,
              impl: str = "auto", int8_scores: bool | None = None):
    """Dispatcher. impl: 'auto' (pallas on TPU for long sequences, xla
    elsewhere / for short ones where the dense S^2 fits easily), 'xla',
    'pallas'. The pallas path is differentiable: forward is the Pallas
    kernel, backward the fused Pallas flash backward above.

    int8_scores: quantize the scores matmul at INFERENCE (the primal path
    only — anything under jax.grad always computes exact f32 scores, see
    _flash_diff_fwd). Default ON on TPU (1.065x, end-output corr ≥ 0.9999
    gated by tests/test_attention_int8_drift.py); LANDIFF_ATTN_INT8=0
    opts out. LANDIFF_ATTN_INT8_PV=1 additionally runs p@v in int8
    (fixed-scale p, per-kv-block V scales — see _flash_kernel_cached_i8);
    opt-in pending TPU measurement, same drift gates."""
    if impl == "auto":
        impl = ("pallas" if jax.default_backend() == "tpu"
                and q.shape[1] >= 2048 else "xla")
    if impl == "xla":
        return mha_reference(q, k, v, mask=mask, scale=scale, mask_fn=mask_fn)
    assert mask is None, "pallas path takes mask_fn, not dense mask"
    if int8_scores is None:
        import os

        int8_scores = os.environ.get("LANDIFF_ATTN_INT8", "1") == "1"
    return _flash_diff(q, k, v, mask_fn, scale, bool(int8_scores))
