"""Packed-sequence utilities for training (reference
landiff/modules/packed_seq.py PackedSeqlens — the flash-attn varlen
cu_seqlens holder). On TPU, packing is expressed as segment ids + a
block-maskable segment attention spec instead of varlen kernels."""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np



@dataclass(frozen=True)
class PackedSeqlens:
    """cu_seqlens semantics (packed_seq.py:6-24): cumulative sequence
    boundaries of a packed batch."""

    seqlens: tuple[int, ...]

    @property
    def cu_seqlens(self) -> np.ndarray:
        return np.concatenate([[0], np.cumsum(self.seqlens)]).astype(np.int32)

    @property
    def total(self) -> int:
        return int(sum(self.seqlens))

    def segment_ids(self) -> np.ndarray:
        """(total,) int32 segment id per token."""
        return np.repeat(np.arange(len(self.seqlens), dtype=np.int32),
                         self.seqlens)

    def position_ids(self) -> np.ndarray:
        """(total,) position within each segment (for RoPE tables —
        get_freqs_cis_by_seqlens semantics, pos_emb.py:108-123)."""
        return np.concatenate([np.arange(n) for n in self.seqlens]).astype(
            np.int32)


def packed_causal_mask(seqlens: tuple[int, ...]):
    """Mask spec: causal within each packed segment, no cross-segment
    attention. Usable with ops.attention.flash_attention. Segment ids are
    computed arithmetically from the static boundaries (a pallas kernel
    cannot close over device arrays)."""
    bounds = tuple(int(b) for b in PackedSeqlens(seqlens).cu_seqlens[1:-1])

    def seg_of(i):
        s = i - i  # zeros of i's shape/dtype
        for b in bounds:
            s = s + (i >= b).astype(jnp.int32)
        return s

    def fn(q_idx, kv_idx):
        return (seg_of(q_idx) == seg_of(kv_idx)) & (q_idx >= kv_idx)

    return fn
