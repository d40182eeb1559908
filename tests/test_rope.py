"""RoPE parity: our sin/cos tables + pair rotation vs an independent
complex-arithmetic recomputation of the reference math
(landiff/modules/pos_emb.py)."""

import numpy as np
import pytest

from landiff_tpu.config import Rope1DConfig, Rope3DConfig
from landiff_tpu.ops import rope as R


def ref_freqs_cis_1d(dim, end, theta=10000.0):
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2)[: dim // 2] / dim))
    t = np.arange(end, dtype=np.float64)
    ang = np.outer(t, freqs)
    return np.exp(1j * ang)  # complex cis


def ref_apply_rope_complex(x, cis):
    # x: (..., H, D); cis: (..., D/2)
    xs = x.astype(np.float64)
    xc = xs[..., 0::2] + 1j * xs[..., 1::2]
    out = xc * cis[..., None, :]
    res = np.empty_like(xs)
    res[..., 0::2] = out.real
    res[..., 1::2] = out.imag
    return res


def test_rope1d_table_matches_complex():
    cfg = Rope1DConfig(dim=16, max_len=64)
    cos, sin = R.rope_1d_table(cfg)
    cis = ref_freqs_cis_1d(16, 64)
    np.testing.assert_allclose(cos, cis.real, rtol=0, atol=1e-6)
    np.testing.assert_allclose(sin, cis.imag, rtol=0, atol=1e-6)


def test_apply_rope_matches_complex_mul():
    rng = np.random.default_rng(0)
    cfg = Rope1DConfig(dim=16, max_len=32)
    cos, sin = R.rope_1d_table(cfg)
    x = rng.standard_normal((2, 32, 4, 16)).astype(np.float32)
    got = np.asarray(R.apply_rope(x, cos[None], sin[None]))
    cis = ref_freqs_cis_1d(16, 32)[None]
    want = ref_apply_rope_complex(x, cis)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def ref_3d_cis_multiple16(dim, t_pos, h_pos, w_pos, theta=10000.0):
    t_dim = dim // 4
    hw_dim = dim // 8 * 3
    t_r = np.arange(0, t_dim, 2)[: t_dim // 2]
    hw_r = np.arange(0, hw_dim, 2)[: hw_dim // 2]
    t_f = 1.0 / (theta ** (t_r / t_dim))
    hw_f = 1.0 / (theta ** (hw_r / hw_dim))
    t_ang = np.outer(t_pos, t_f)
    h_ang = np.outer(h_pos, hw_f)
    w_ang = np.outer(w_pos, hw_f)
    ang = np.concatenate([t_ang, h_ang, w_ang], axis=-1)
    return np.exp(1j * ang)


def ref_3d_cis_multiple6(dim, t_pos, h_pos, w_pos, theta=10000.0):
    n = dim // 6
    f = 1.0 / (theta ** (np.arange(0, dim, 6)[:n] / dim))
    t = np.outer(t_pos, f)[..., None]
    h = np.outer(h_pos, f)[..., None]
    w = np.outer(w_pos, f)[..., None]
    ang = np.concatenate([t, h, w], axis=-1).reshape(len(t_pos), -1)
    return np.exp(1j * ang)


@pytest.mark.parametrize("multiple", [6, 16])
def test_rope3d_grid_table(multiple):
    dim = 48 if multiple == 6 else 32
    cfg = Rope3DConfig(dim=dim, max_time=3, max_height=4, max_width=5,
                       one_dim_max_time=10, multiple=multiple)
    cos, sin = R.rope_3d_grid_table(cfg)
    T, H, W = 3, 4, 5
    flat = np.arange(T * H * W)
    t_pos, h_pos, w_pos = flat // (H * W), (flat % (H * W)) // W, flat % W
    ref_fn = ref_3d_cis_multiple6 if multiple == 6 else ref_3d_cis_multiple16
    cis = ref_fn(dim, t_pos, h_pos, w_pos).reshape(T, H, W, -1)
    np.testing.assert_allclose(cos, cis.real, atol=1e-6)
    np.testing.assert_allclose(sin, cis.imag, atol=1e-6)


def test_rope3d_by_index_text_routing():
    """t==h==w positions must use the 1-D text table (supports t >= max_time);
    masked positions get identity rotation."""
    cfg = Rope3DConfig(dim=32, max_time=3, max_height=4, max_width=5,
                       one_dim_max_time=20, multiple=16)
    idx = np.array([[0, 1, 2],    # grid position
                    [2, 2, 2],    # equal -> text table
                    [7, 7, 7],    # equal, beyond max_time -> text table
                    [1, 3, 4]])   # grid
    mask = np.array([True, True, True, False])
    cos, sin = R.rope_3d_by_index(cfg, idx, mask)
    cis_g = ref_3d_cis_multiple16(32, [0], [1], [2])[0]
    np.testing.assert_allclose(cos[0], cis_g.real, atol=1e-6)
    cis_t = ref_3d_cis_multiple16(32, [7], [7], [7])[0]
    np.testing.assert_allclose(cos[2], cis_t.real, atol=1e-6)
    np.testing.assert_allclose(sin[2], cis_t.imag, atol=1e-6)
    np.testing.assert_allclose(cos[3], np.ones(16), atol=0)
    np.testing.assert_allclose(sin[3], np.zeros(16), atol=0)


def test_index_helpers():
    idx = R.shape_to_index(2, 2, 2)
    assert idx.shape == (8, 3)
    np.testing.assert_array_equal(idx[0], [0, 0, 0])
    np.testing.assert_array_equal(idx[-1], [1, 1, 1])
    shifted, new_shift = R.shift_rope_index(idx, 2)
    np.testing.assert_array_equal(shifted[0], [2, 0, 0])
    assert new_shift == 4
    tr = R.len_to_rope_index(3)
    np.testing.assert_array_equal(tr, [[0, 0, 0], [1, 1, 1], [2, 2, 2]])
