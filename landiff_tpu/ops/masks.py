"""Structured attention masks for the video tokenizer (and generic causal /
prefix-LM masks).

Re-derivation of landiff/tokenizer/modules/flex_attention_mask.py as *mask
spec* functions: each spec maps integer index arrays (q_idx, kv_idx) -> bool,
implemented with jnp ops so the same spec can be
  - materialized on host for tests / XLA dense-mask attention, or
  - evaluated inside a Pallas kernel tile from broadcasted iotas, or
  - coarsened to a block-visibility table for block-sparse skipping.

Sequence layout (I/P-frame TiTok, blocks.py:414-976):
  [ frame patches: num_frames * tokens_per_frame
  | I-frame query tokens: iframe_tokens
  | P-frame query tokens: (num_frames-1) * pframe_tokens ]

Encoder visibility (flex_attention_mask.py:150-184):
  - frame patches: frame-causal (kv_frame <= q_frame), frames only
  - I queries: frame 0 patches + causally earlier I queries
  - P queries (frame f>=1): frames 0..f patches + causally earlier query
    tokens (all I queries + P queries with kv_idx <= q_idx)
Decoder visibility (flex_attention_mask.py:283-335):
  - frame-0 patches + I queries see: frame 0 + all I queries
  - frame-f patches (f>=1) see: frames <= f, all I queries, P queries of
    frames <= f
  - P queries of frame f see: frames <= f, I queries, P queries of frames <= f
Padding rows/cols (beyond seq_len) are fully masked.
"""

from __future__ import annotations

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np

# A MaskSpec is a callable (q_idx, kv_idx) -> bool array (broadcasting), using
# jnp ops only.


def causal(q_idx, kv_idx):
    return q_idx >= kv_idx


@functools.lru_cache(maxsize=64)
def prefix_lm(prefix_length: int):
    """Full attention within the first `prefix_length` tokens, causal after
    (flex_attention_mask.py:17-33)."""

    def fn(q_idx, kv_idx):
        return (kv_idx < prefix_length) | (q_idx >= kv_idx)

    return fn


def full(q_idx, kv_idx):
    return jnp.broadcast_to(jnp.array(True), jnp.broadcast_shapes(
        jnp.shape(q_idx), jnp.shape(kv_idx)))


@dataclasses.dataclass(frozen=True)
class VideoMaskLayout:
    num_frames: int
    tokens_per_frame: int
    iframe_tokens: int
    pframe_tokens: int

    @property
    def frames_end(self) -> int:
        return self.num_frames * self.tokens_per_frame

    @property
    def iq_end(self) -> int:
        return self.frames_end + self.iframe_tokens

    @property
    def seq_len(self) -> int:
        return self.iq_end + self.pframe_tokens * (self.num_frames - 1)


@functools.lru_cache(maxsize=32)
def kv_limit(mask_fn, kv_len: int):
    """Wrap a mask spec (or None) so kv columns >= kv_len are invisible —
    used when sequences are padded to block multiples. Cached so the wrapped
    closure is a stable hashable for jit static args."""

    def fn(q_idx, kv_idx):
        ok = kv_idx < kv_len
        return ok if mask_fn is None else (mask_fn(q_idx, kv_idx) & ok)

    return fn


@functools.lru_cache(maxsize=32)
def video_encoder_mask(layout: VideoMaskLayout):
    L = layout

    def fn(q_idx, kv_idx):
        # pure boolean algebra (no bool literals in jnp.where): Mosaic cannot
        # lower broadcast-i8 -> i1 truncations that literal-where produces
        q_frame = q_idx // L.tokens_per_frame
        kv_frame = kv_idx // L.tokens_per_frame
        # which P-frame a P-query belongs to (1-based)
        p_frame = (q_idx - L.iq_end) // L.pframe_tokens + 1

        in_frames = kv_frame <= q_frame
        kv_in_iq = (kv_idx >= L.frames_end) & (kv_idx < L.iq_end)
        iq = (kv_idx < L.tokens_per_frame) | (kv_in_iq & (kv_idx <= q_idx))
        pq = (kv_idx < (p_frame + 1) * L.tokens_per_frame) | (
            (kv_idx >= L.frames_end) & (kv_idx <= q_idx))
        return (((q_idx < L.frames_end) & in_frames)
                | ((q_idx >= L.frames_end) & (q_idx < L.iq_end) & iq)
                | ((q_idx >= L.iq_end) & (q_idx < L.seq_len) & pq))

    return fn


@functools.lru_cache(maxsize=32)
def video_decoder_mask(layout: VideoMaskLayout):
    L = layout

    def fn(q_idx, kv_idx):
        q_frame = q_idx // L.tokens_per_frame
        kv_frame = kv_idx // L.tokens_per_frame
        p_frame = (q_idx - L.iq_end) // L.pframe_tokens + 1

        sees_f0_and_iq = (kv_idx < L.tokens_per_frame) | (
            (kv_idx >= L.frames_end) & (kv_idx < L.iq_end))
        # P-frame patches (frames 1..): frames <= q_frame, I queries, and P
        # queries of frames <= q_frame  (kv_frame >= num_frames <=> kv >= fe)
        pfp = (((kv_idx < L.frames_end) & (kv_frame <= q_frame))
               | ((kv_idx >= L.frames_end)
                  & (kv_idx < L.iq_end + q_frame * L.pframe_tokens)))
        # P queries of frame f: frames <= f, I queries + P queries of frames <= f
        pq = ((kv_idx < (p_frame + 1) * L.tokens_per_frame)
              | ((kv_idx >= L.frames_end)
                 & (kv_idx < L.iq_end + p_frame * L.pframe_tokens)))
        return (((q_idx < L.tokens_per_frame) & sees_f0_and_iq)
                | ((q_idx >= L.tokens_per_frame) & (q_idx < L.frames_end) & pfp)
                | ((q_idx >= L.frames_end) & (q_idx < L.iq_end) & sees_f0_and_iq)
                | ((q_idx >= L.iq_end) & (q_idx < L.seq_len) & pq))

    return fn


# ---------------------------------------------------------------------------
# materialization helpers


def materialize(mask_fn, q_len: int, kv_len: int) -> np.ndarray:
    """Dense (q_len, kv_len) bool mask on host."""
    import jax

    q = np.arange(q_len)[:, None]
    kv = np.arange(kv_len)[None, :]
    # Mask specs are pure boolean algebra usable host-side (CLAUDE.md
    # convention), so evaluate on plain NumPy first — this stays concrete
    # even inside nested traces (grad-of-shard_map, where
    # ensure_compile_time_eval cannot escape the ambient trace).
    try:
        out = np.asarray(mask_fn(q, kv))
    except jax.errors.TracerArrayConversionError:
        # spec closed over jnp values: force compile-time evaluation
        # (works at plain jit trace level)
        with jax.ensure_compile_time_eval():
            out = np.asarray(mask_fn(jnp.asarray(q), jnp.asarray(kv)))
    # specs that ignore one operand return a broadcastable (1, kv) row
    return np.broadcast_to(out, (q_len, kv_len))


@functools.lru_cache(maxsize=64)
def block_visibility(mask_fn, q_len: int, kv_len: int,
                     block_q: int, block_kv: int) -> np.ndarray:
    """Coarsen a mask spec to block granularity.

    Returns int8 array (num_q_blocks, num_kv_blocks):
      0 = fully masked (skip), 1 = partial (evaluate mask in-kernel),
      2 = fully visible (skip mask evaluation).
    """
    dense = materialize(mask_fn, q_len, kv_len)
    nq = -(-q_len // block_q)
    nk = -(-kv_len // block_kv)
    out = np.zeros((nq, nk), dtype=np.int8)
    for i in range(nq):
        for j in range(nk):
            blk = dense[i * block_q:(i + 1) * block_q,
                        j * block_kv:(j + 1) * block_kv]
            if blk.all():
                out[i, j] = 2
            elif blk.any():
                out[i, j] = 1
    return out


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m
