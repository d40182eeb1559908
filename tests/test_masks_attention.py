"""Mask-spec parity vs a literal per-element oracle (the reference's own
test seam: flex_attention_mask.py test_mask), and Pallas flash attention vs
the dense fp32 oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from landiff_tpu.ops import attention as A
from landiff_tpu.ops import masks as M

LAYOUT = M.VideoMaskLayout(num_frames=3, tokens_per_frame=8,
                           iframe_tokens=5, pframe_tokens=2)


def oracle_encoder(L, q_idx, kv_idx):
    # literal transcription of the prose spec (flex_attention_mask.py:150-184)
    fe, iqe, sl = L.frames_end, L.iq_end, L.seq_len
    if q_idx < fe:
        return kv_idx // L.tokens_per_frame <= q_idx // L.tokens_per_frame
    if q_idx < iqe:
        if kv_idx < L.tokens_per_frame:
            return True
        if fe <= kv_idx < iqe:
            return kv_idx <= q_idx
        return False
    if q_idx < sl:
        f = (q_idx - iqe) // L.pframe_tokens + 1
        if kv_idx < (f + 1) * L.tokens_per_frame:
            return True
        if (f + 1) * L.tokens_per_frame <= kv_idx < fe:
            return False
        return kv_idx <= q_idx
    return False


def oracle_decoder(L, q_idx, kv_idx):
    fe, iqe, sl = L.frames_end, L.iq_end, L.seq_len
    sees_f0_iq = kv_idx < L.tokens_per_frame or fe <= kv_idx < iqe
    if q_idx < L.tokens_per_frame:
        return sees_f0_iq
    if q_idx < fe:
        f = q_idx // L.tokens_per_frame
        if kv_idx // L.tokens_per_frame < L.num_frames:
            return kv_idx // L.tokens_per_frame <= f
        return fe <= kv_idx < iqe + f * L.pframe_tokens
    if q_idx < iqe:
        return sees_f0_iq
    if q_idx < sl:
        f = (q_idx - iqe) // L.pframe_tokens + 1
        return (kv_idx < (f + 1) * L.tokens_per_frame
                or fe <= kv_idx < iqe + f * L.pframe_tokens)
    return False


@pytest.mark.parametrize("which", ["encoder", "decoder"])
def test_video_masks_match_oracle(which):
    pad = 8  # also check padded region behavior
    n = LAYOUT.seq_len + pad
    if which == "encoder":
        got = M.materialize(M.video_encoder_mask(LAYOUT), n, n)
        oracle = oracle_encoder
    else:
        got = M.materialize(M.video_decoder_mask(LAYOUT), n, n)
        oracle = oracle_decoder
    want = np.array([[oracle(LAYOUT, q, k) for k in range(n)]
                     for q in range(n)])
    np.testing.assert_array_equal(got, want)


def test_causal_prefix_masks():
    got = M.materialize(M.prefix_lm(3), 6, 6)
    want = np.array([[k < 3 or q >= k for k in range(6)] for q in range(6)])
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(M.materialize(M.causal, 4, 4),
                                  np.tril(np.ones((4, 4), bool)))


def test_block_visibility_classes():
    vis = M.block_visibility(M.causal, 8, 8, 4, 4)
    # lower-left block fully visible, diag partial, upper-right empty
    assert vis[1, 0] == 2 and vis[0, 1] == 0
    assert vis[0, 0] == 1 and vis[1, 1] == 1


def _rand_qkv(key, B, S, H, D, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    mk = lambda k: jax.random.normal(k, (B, S, H, D), dtype)
    return mk(ks[0]), mk(ks[1]), mk(ks[2])


@pytest.mark.parametrize("mask_name", [None, "causal", "encoder", "decoder"])
def test_flash_matches_reference(mask_name):
    mask_fn = {None: None, "causal": M.causal,
               "encoder": M.video_encoder_mask(LAYOUT),
               "decoder": M.video_decoder_mask(LAYOUT)}[mask_name]
    B, S, H, D = 2, LAYOUT.seq_len, 2, 16  # S=35: exercises padding
    q, k, v = _rand_qkv(jax.random.PRNGKey(0), B, S, H, D)
    want = A.mha_reference(q, k, v, mask_fn=mask_fn)
    got = A.flash_attention(q, k, v, mask_fn=mask_fn, block_q=16, block_kv=16,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_bf16_and_uneven_kv():
    B, Sq, Skv, H, D = 1, 24, 40, 2, 8
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (B, Sq, H, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, Skv, H, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, Skv, H, D), jnp.bfloat16)
    want = A.mha_reference(q, k, v)
    got = A.flash_attention(q, k, v, block_q=16, block_kv=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=5e-2, atol=5e-2)


def test_fully_masked_rows_are_zero():
    """Padding q rows (beyond seq_len) see nothing -> output 0, not NaN."""
    L = LAYOUT
    B, H, D = 1, 1, 8
    S = L.seq_len + 5
    q, k, v = _rand_qkv(jax.random.PRNGKey(2), B, S, H, D)
    got = A.flash_attention(q, k, v, mask_fn=M.video_encoder_mask(L),
                            block_q=16, block_kv=16, interpret=True)
    assert not np.isnan(np.asarray(got)).any()
    np.testing.assert_allclose(np.asarray(got)[0, L.seq_len:], 0.0, atol=0)


def test_flash_int8_scores_close_to_reference():
    """Opt-in int8-scores kernel (LANDIFF_ATTN_INT8): per-row q / per-kv-
    position k absmax quantization keeps outputs close to the f32 oracle
    (the quantization only perturbs pre-softmax logits ~1%). The d=64
    scores matmul is the measured single-chip step floor (PARITY.md);
    int8 doubles the MXU rate there."""
    B, S, H, D = 2, 64, 2, 16
    q, k, v = _rand_qkv(jax.random.PRNGKey(3), B, S, H, D)
    want = np.asarray(A.mha_reference(q, k, v), np.float32)
    got = np.asarray(A.flash_attention(q, k, v, block_q=16, block_kv=16,
                                       interpret=True, int8_scores=True),
                     np.float32)
    # int8 logit noise: allow a loose tolerance but demand high agreement
    np.testing.assert_allclose(got, want, rtol=0.1, atol=0.02)
    assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.999
    # masked variant stays correct too
    want_m = np.asarray(A.mha_reference(q, k, v, mask_fn=M.causal),
                        np.float32)
    got_m = np.asarray(A.flash_attention(q, k, v, mask_fn=M.causal,
                                         block_q=16, block_kv=16,
                                         interpret=True, int8_scores=True),
                       np.float32)
    np.testing.assert_allclose(got_m, want_m, rtol=0.1, atol=0.02)


def test_flash_int8_pv_close_to_reference():
    """int8 p @ v variant (LANDIFF_ATTN_INT8_PV): p quantizes at the fixed
    scale 127 (p in [0,1] post online-max), V per (bh, kv-block) scalar
    absmax — the scale is constant within a tile contraction so it factors
    out exactly. Requires int8_scores (it extends that kernel)."""
    B, S, H, D = 2, 64, 2, 16
    q, k, v = _rand_qkv(jax.random.PRNGKey(4), B, S, H, D)
    want = np.asarray(A.mha_reference(q, k, v), np.float32)
    got = np.asarray(A.flash_attention(q, k, v, block_q=16, block_kv=16,
                                       interpret=True, int8_scores=True,
                                       int8_pv=True),
                     np.float32)
    np.testing.assert_allclose(got, want, rtol=0.1, atol=0.03)
    assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.998
    # masked variant: partial tiles + fully-masked padding rows stay exact
    want_m = np.asarray(A.mha_reference(q, k, v, mask_fn=M.causal),
                        np.float32)
    got_m = np.asarray(A.flash_attention(q, k, v, mask_fn=M.causal,
                                         block_q=16, block_kv=16,
                                         interpret=True, int8_scores=True,
                                         int8_pv=True),
                       np.float32)
    np.testing.assert_allclose(got_m, want_m, rtol=0.1, atol=0.03)


@pytest.mark.parametrize("mask_name", [None, "causal", "decoder"])
def test_flash_backward_matches_reference_grads(mask_name):
    """The chunked flash backward (custom_vjp on the pallas path) must
    match autodiff through the dense oracle — the seam that makes
    production-length training possible (a dense backward materializes
    S^2; pallas_call has no autodiff rule)."""
    mask_fn = {None: None, "causal": M.causal,
               "decoder": M.video_decoder_mask(LAYOUT)}[mask_name]
    B, S, H, D = 2, LAYOUT.seq_len, 2, 16
    q, k, v = _rand_qkv(jax.random.PRNGKey(7), B, S, H, D)

    def loss_ref(q, k, v):
        return jnp.sum(A.mha_reference(q, k, v, mask_fn=mask_fn) ** 2)

    def loss_flash(q, k, v):
        return jnp.sum(A._flash_diff(q, k, v, mask_fn, None) ** 2)

    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-4)


def test_flash_backward_fully_masked_rows_zero_grads():
    """Regression: a fully-masked q row has L = NEG_INF - 69, so the
    backward's exp(s - L) alone is ~9e29, not 0 — p must be re-zeroed by
    the keep mask or garbage flows into dq/dk/dv."""
    L = LAYOUT
    B, H, D = 1, 1, 8
    S = L.seq_len + 5          # padding rows see nothing
    q, k, v = _rand_qkv(jax.random.PRNGKey(9), B, S, H, D)
    mask_fn = M.video_encoder_mask(L)

    def loss(q, k, v):
        return jnp.sum(A._flash_diff(q, k, v, mask_fn, None) ** 2)

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in (dq, dk, dv):
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() < 1e3
    # masked rows contribute nothing
    np.testing.assert_allclose(np.asarray(dq)[0, L.seq_len:], 0.0, atol=0)
    want = jax.grad(lambda q, k, v: jnp.sum(
        A.mha_reference(q, k, v, mask_fn=mask_fn) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    for g, w in zip((dq, dk, dv), want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("mask_name", [None, "decoder"])
def test_flash_backward_pallas_matches_xla_fallback(mask_name, monkeypatch):
    """The Pallas backward kernels (default) and the XLA double-scan
    fallback (LANDIFF_ATTN_BWD=xla) must agree — the fallback doubles as
    the gradient oracle on hardware where the kernels misbehave."""
    mask_fn = {None: None, "decoder": M.video_decoder_mask(LAYOUT)}[mask_name]
    B, S, H, D = 1, LAYOUT.seq_len, 2, 16
    q, k, v = _rand_qkv(jax.random.PRNGKey(11), B, S, H, D)

    def loss(q, k, v):
        return jnp.sum(A._flash_diff(q, k, v, mask_fn, None) ** 2)

    monkeypatch.setenv("LANDIFF_ATTN_BWD", "pallas")
    got = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    monkeypatch.setenv("LANDIFF_ATTN_BWD", "xla")
    want = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-4)
