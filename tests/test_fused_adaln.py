"""Fused adaLN modulate kernel (ops/adaln.py): Pallas (interpret mode on
CPU) vs the XLA reference chain, ragged last block, gradient path, and the
LANDIFF_FUSED_ADALN env knob through the full DiT layer."""

import jax
import jax.numpy as jnp
import numpy as np

from landiff_tpu.ops import adaln


def _inputs(B=2, S=700, D=128, seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 7)
    x = jax.random.normal(ks[0], (B, S, D), dtype)
    w = 1.0 + 0.1 * jax.random.normal(ks[1], (D,), dtype)
    b = 0.1 * jax.random.normal(ks[2], (D,), dtype)
    pairs = [0.2 * jax.random.normal(k, (B, D), dtype) for k in ks[3:]]
    return (x, w, b, *pairs)


def test_fused_matches_xla_ragged():
    # S=700 with block 512: a full block + a ragged 188-row tail
    args = _inputs()
    want = adaln.adaln_modulate(*args, text_len=226, impl="xla")
    got = adaln._diff(*args, 226, 1e-6, 512, True)  # interpret mode
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_text_boundary_inside_block():
    # text/video switch at row 100, inside the first block
    args = _inputs(S=256, seed=1)
    want = adaln.adaln_modulate(*args, text_len=100, impl="xla")
    got = adaln._diff(*args, 100, 1e-6, 128, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_bf16_io():
    args = _inputs(S=512, seed=2, dtype=jnp.bfloat16)
    want = adaln.adaln_modulate(*args, text_len=64, impl="xla")
    got = adaln._diff(*args, 64, 1e-6, 256, True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_fused_gradients_match_xla():
    args = _inputs(S=256, seed=3)

    def f_fused(*a):
        return jnp.sum(adaln._diff(*a, 100, 1e-6, 128, True) ** 2)

    def f_xla(*a):
        return jnp.sum(adaln.adaln_modulate(*a, text_len=100,
                                            impl="xla") ** 2)

    g_fused = jax.grad(f_fused, argnums=tuple(range(7)))(*args)
    g_xla = jax.grad(f_xla, argnums=tuple(range(7)))(*args)
    for gf, gx in zip(g_fused, g_xla):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                                   rtol=2e-4, atol=2e-4)


def test_env_knob_layer_parity(monkeypatch):
    """LANDIFF_FUSED_ADALN=1 routes _layer's modulations through
    adaln_modulate; on CPU auto falls back to XLA, so the layer output must
    be bit-identical — the knob is wired, the math unchanged."""
    from landiff_tpu.config import tiny_test_config
    from landiff_tpu.models import dit as dit_lib
    from landiff_tpu.utils import fill_zero_leaves

    cfg = tiny_test_config().dit
    p = fill_zero_leaves(dit_lib.init(jax.random.PRNGKey(0), cfg),
                         jax.random.PRNGKey(1), scale=0.05)
    x = jax.random.normal(jax.random.PRNGKey(2),
                          (1, cfg.latent_frames, cfg.in_channels,
                           cfg.latent_height, cfg.latent_width))
    ts = jnp.zeros((1,), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(3),
                            (1, cfg.text_length, cfg.text_dim))
    monkeypatch.delenv("LANDIFF_FUSED_ADALN", raising=False)
    base = dit_lib.forward(p, x, ts, ctx, cfg, attn_impl="xla",
                           compute_dtype=jnp.float32)
    monkeypatch.setenv("LANDIFF_FUSED_ADALN", "1")
    fused = dit_lib.forward(p, x, ts, ctx, cfg, attn_impl="xla",
                            compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(fused))
