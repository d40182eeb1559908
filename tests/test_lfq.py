"""LFQ parity vs an f64 numpy transcription of
lookup_free_quantization.py:63-327."""

import jax
import jax.numpy as jnp
import numpy as np

from landiff_tpu.models import lfq


def test_codebook_and_bit_mask():
    cfg = lfq.LFQConfig(codebook_size=16)
    cb = lfq.codebook(cfg)
    assert cb.shape == (16, 4)
    assert set(np.unique(cb)) == {-1.0, 1.0}
    # index 0 -> all bits off -> all -scale; index 15 -> all +scale
    np.testing.assert_array_equal(cb[0], [-1, -1, -1, -1])
    np.testing.assert_array_equal(cb[15], [1, 1, 1, 1])
    # big-endian: index 8 sets the FIRST dim
    np.testing.assert_array_equal(cb[8], [1, -1, -1, -1])


def test_inference_quantize_and_roundtrip():
    cfg = lfq.LFQConfig(codebook_size=256, dim=12)   # projections
    params = lfq.init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 5, 12)),
                    jnp.float32)
    out, idx, aux, bd = lfq.quantize(params, cfg, x)
    assert out.shape == (2, 5, 12)
    assert idx.shape == (2, 5) and idx.dtype == jnp.int32
    assert float(aux) == 0.0
    assert (np.asarray(idx) >= 0).all() and (np.asarray(idx) < 256).all()
    # inference output == indices_to_codes(indices)
    codes = lfq.indices_to_codes(params, cfg, idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(codes),
                               rtol=1e-5, atol=1e-6)


def test_training_losses_match_transcription():
    cfg = lfq.LFQConfig(codebook_size=16)            # no projections
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 6, 4))
    out, idx, aux, bd = lfq.quantize({}, cfg, jnp.asarray(x, jnp.float32),
                                     training=True)
    # transcription (f64): eq 3 quantize + entropy + commit
    q = np.where(x > 0, 1.0, -1.0)
    mask = 2 ** np.arange(3, -1, -1)
    want_idx = ((x > 0).astype(int) * mask).sum(-1)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)
    np.testing.assert_allclose(np.asarray(out), q, rtol=1e-6)  # ST value

    cb = lfq.codebook(cfg).astype(np.float64)
    dist = -2 * np.einsum("bnd,jd->bnj", x, cb)
    z = -dist * 100.0
    z = z - z.max(-1, keepdims=True)
    prob = np.exp(z) / np.exp(z).sum(-1, keepdims=True)
    prob = prob.reshape(12, 16)
    ent = lambda p: (-p * np.log(np.clip(p, 1e-5, None))).sum(-1)
    per_sample = ent(prob).mean()
    codebook_ent = ent(prob.mean(0)).mean()
    commit = ((x - q) ** 2).mean()
    want_aux = (per_sample - 1.0 * codebook_ent) * 0.1 + commit * 0.25
    np.testing.assert_allclose(float(bd["per_sample_entropy"]), per_sample,
                               rtol=1e-4)
    np.testing.assert_allclose(float(bd["codebook_entropy"]), codebook_ent,
                               rtol=1e-4)
    np.testing.assert_allclose(float(bd["commitment"]), commit, rtol=1e-5)
    np.testing.assert_allclose(float(aux), want_aux, rtol=1e-4)


def test_straight_through_gradient():
    cfg = lfq.LFQConfig(codebook_size=16, entropy_loss_weight=0.0,
                        commitment_loss_weight=0.0)

    def f(x):
        out, _, _, _ = lfq.quantize({}, cfg, x, training=True)
        return (out ** 2).sum()

    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 3, 4)),
                    jnp.float32)
    g = jax.grad(f)(x)
    # straight-through: d(out)/dx = 1, so grad = 2 * quantized
    q = np.where(np.asarray(x) > 0, 1.0, -1.0)
    np.testing.assert_allclose(np.asarray(g), 2 * q, rtol=1e-5)


def test_multi_codebook():
    cfg = lfq.LFQConfig(codebook_size=16, num_codebooks=2)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((1, 4, 8)),
                    jnp.float32)
    out, idx, _, _ = lfq.quantize({}, cfg, x)
    assert idx.shape == (1, 4, 2)
    codes = lfq.indices_to_codes({}, cfg, idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(codes),
                               rtol=1e-6)
