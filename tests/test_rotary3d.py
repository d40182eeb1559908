"""Rotary3DPositionEmbeddingMixin parity (dit_video_concat.py:275-385).

The released LanDiff checkpoint ships Basic3D sincos, so rotary3d is
surface parity for the reference's positional alternative: tables and the
video-slice rotation are checked against a literal torch/einops
transcription of the reference construction (sat blocks a direct import —
`from sat.model.base_model import BaseMixin` at dit_video_concat.py:14),
wiring is checked by theta/rot_v sensitivity, shard-offset consistency,
the dead learnable `pos_embedding` quirk, and SP/TP mesh parity via the
existing harness."""

import dataclasses

import einops
import jax
import jax.numpy as jnp
import numpy as np
import torch

from landiff_tpu.config import MeshConfig, tiny_test_config
from landiff_tpu.models import dit
from landiff_tpu.parallel import mesh as mesh_lib
from landiff_tpu.utils import fill_zero_leaves

from test_sp_infer import _compare_sp_vs_single, _mesh

CFG0 = tiny_test_config()


def _rot_cfg(**kw):
    return dataclasses.replace(CFG0.dit, pos_embed="rotary3d", **kw)


# --- torch transcription of the reference construction --------------------


def ref_tables(Dk, theta, T, H, W):
    """Rotary3DPositionEmbeddingMixin.__init__ (dit_video_concat.py:
    291-330): per-axis freqs, repeat-interleave r=2, broadcat over the
    (T, H, W) grid."""
    dim_t = Dk // 4
    dim_h = Dk // 8 * 3
    dim_w = Dk // 8 * 3

    def fr(dim):
        idx = torch.arange(0, dim, 2)[: (dim // 2)].float()
        return 1.0 / (theta ** (idx / dim))

    ft = torch.einsum("..., f -> ... f",
                      torch.arange(T, dtype=torch.float32), fr(dim_t))
    fh = torch.einsum("..., f -> ... f",
                      torch.arange(H, dtype=torch.float32), fr(dim_h))
    fw = torch.einsum("..., f -> ... f",
                      torch.arange(W, dtype=torch.float32), fr(dim_w))
    ft = einops.repeat(ft, "... n -> ... (n r)", r=2)
    fh = einops.repeat(fh, "... n -> ... (n r)", r=2)
    fw = einops.repeat(fw, "... n -> ... (n r)", r=2)
    freqs = torch.cat([
        ft[:, None, None, :].expand(T, H, W, dim_t),
        fh[None, :, None, :].expand(T, H, W, dim_h),
        fw[None, None, :, :].expand(T, H, W, dim_w),
    ], dim=-1)
    freqs = einops.rearrange(freqs, "t h w d -> (t h w) d").contiguous()
    return freqs.cos(), freqs.sin()


def ref_rotate_half(x):
    # dit_video_concat.py:268-273
    x = einops.rearrange(x, "... (d r) -> ... d r", r=2)
    x1, x2 = x.unbind(dim=-1)
    x = torch.stack((-x2, x1), dim=-1)
    return einops.rearrange(x, "... d r -> ... (d r)")


def ref_apply(t, cos, sin, text_length):
    """attention_fn's in-place video-slice mutation on the hook layout
    (B, H, S, Dk) (dit_video_concat.py:352-371)."""
    out = t.clone()
    tv = t[:, :, text_length:]
    seq_len = tv.shape[2]
    c = cos[:seq_len].unsqueeze(0).unsqueeze(0)
    s = sin[:seq_len].unsqueeze(0).unsqueeze(0)
    out[:, :, text_length:] = tv * c + ref_rotate_half(tv) * s
    return out


def test_tables_match_reference_transcription():
    cfg = _rot_cfg()
    T = cfg.latent_frames
    hh = cfg.latent_height // cfg.patch_size
    ww = cfg.latent_width // cfg.patch_size
    got_c, got_s = dit.rotary3d_tables(cfg)
    want_c, want_s = ref_tables(cfg.head_dim, cfg.rope_theta, T, hh, ww)
    np.testing.assert_allclose(got_c, want_c.numpy(), atol=1e-6)
    np.testing.assert_allclose(got_s, want_s.numpy(), atol=1e-6)


def test_rotation_matches_reference_transcription():
    cfg = _rot_cfg()
    tl = cfg.text_length
    T = cfg.latent_frames
    hh = cfg.latent_height // cfg.patch_size
    ww = cfg.latent_width // cfg.patch_size
    S = tl + T * hh * ww
    B, H, Dk = 2, cfg.num_heads, cfg.head_dim
    rng = np.random.default_rng(0)
    q = rng.standard_normal((B, S, H, Dk)).astype(np.float32)
    k = rng.standard_normal((B, S, H, Dk)).astype(np.float32)
    v = rng.standard_normal((B, S, H, Dk)).astype(np.float32)

    gq, gk, gv = dit._maybe_rotary(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v), cfg, tl)
    cos, sin = ref_tables(Dk, cfg.rope_theta, T, hh, ww)

    def to_hook(a):  # (B, S, H, Dk) -> reference hook layout (B, H, S, Dk)
        return torch.from_numpy(a).permute(0, 2, 1, 3)

    for got, arr, rotated in ((gq, q, True), (gk, k, True), (gv, v, False)):
        want = (ref_apply(to_hook(arr), cos, sin, tl) if rotated
                else to_hook(arr))
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 2, 1, 3), want.numpy(), atol=1e-5)


def test_rot_v_rotates_value():
    cfg = _rot_cfg(rot_v=True)
    tl = cfg.text_length
    T = cfg.latent_frames
    hh = cfg.latent_height // cfg.patch_size
    ww = cfg.latent_width // cfg.patch_size
    S = tl + T * hh * ww
    v = np.random.default_rng(1).standard_normal(
        (1, S, cfg.num_heads, cfg.head_dim)).astype(np.float32)
    _, _, gv = dit._maybe_rotary(*(jnp.asarray(v),) * 3, cfg, tl)
    cos, sin = ref_tables(cfg.head_dim, cfg.rope_theta, T, hh, ww)
    want = ref_apply(torch.from_numpy(v).permute(0, 2, 1, 3), cos, sin, tl)
    np.testing.assert_allclose(np.asarray(gv).transpose(0, 2, 1, 3),
                               want.numpy(), atol=1e-5)
    # and rotation is norm-preserving on the video slice
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(gv)[:, tl:], axis=-1),
        np.linalg.norm(v[:, tl:], axis=-1), rtol=1e-5)


def test_shard_offset_consistency():
    """Gather+where form: per-shard application with offsets == full-seq
    application (what _layer_sp/_layer_tp rely on; shard boundaries fall
    inside the text slice and mid-video)."""
    cfg = _rot_cfg()
    tl = cfg.text_length
    S = tl + (cfg.latent_frames * (cfg.latent_height // cfg.patch_size)
              * (cfg.latent_width // cfg.patch_size))
    q = jnp.asarray(np.random.default_rng(2).standard_normal(
        (1, S, cfg.num_heads, cfg.head_dim)).astype(np.float32))
    full, _, _ = dit._maybe_rotary(q, q, q, cfg, tl)
    n = 4
    Sl = S // n
    parts = [dit._maybe_rotary(q[:, i * Sl:(i + 1) * Sl],
                               q[:, i * Sl:(i + 1) * Sl],
                               q[:, i * Sl:(i + 1) * Sl],
                               cfg, tl, offset=i * Sl)[0]
             for i in range(n)]
    np.testing.assert_allclose(np.asarray(jnp.concatenate(parts, axis=1)),
                               np.asarray(full), atol=1e-6)


def test_forward_uses_rotary_and_skips_sincos_table():
    """theta only enters through the rotary tables, so theta-sensitivity
    proves the rotation participates in the jitted forward; fresh-init
    zero-gating would make this vacuous -> fill_zero_leaves."""
    cfg = _rot_cfg()
    params = fill_zero_leaves(dit.init(jax.random.PRNGKey(0), cfg),
                              jax.random.PRNGKey(1), scale=0.05)
    x = jax.random.normal(jax.random.PRNGKey(2),
                          (1, cfg.latent_frames, cfg.in_channels,
                           cfg.latent_height, cfg.latent_width))
    t = jnp.array([3])
    ctx = jax.random.normal(jax.random.PRNGKey(3),
                            (1, cfg.text_length, cfg.text_dim))

    def run(c):
        return np.asarray(dit.forward(params, x, t, ctx, c,
                                      compute_dtype=jnp.float32))

    base = run(cfg)
    assert np.isfinite(base).all()
    assert not np.allclose(base, run(_rot_cfg(rope_theta=50.0)))
    assert not np.allclose(base, run(_rot_cfg(rot_v=True)))
    # sincos forward differs (no additive table under rotary3d)
    assert not np.allclose(base, run(CFG0.dit))


def test_learnable_pos_embedding_is_dead_checkpoint_key():
    """The reference creates the zeros (1, S, D) parameter (:336-341) but
    its position_embedding_forward returns None (:349-350) — the key must
    exist for checkpoint mapping yet never influence the forward."""
    cfg = _rot_cfg(learnable_pos_embed=True)
    params = fill_zero_leaves(dit.init(jax.random.PRNGKey(0), cfg),
                              jax.random.PRNGKey(1), scale=0.05)
    S = cfg.text_length + (cfg.latent_frames
                           * (cfg.latent_height // cfg.patch_size)
                           * (cfg.latent_width // cfg.patch_size))
    assert params["pos_embedding"].shape == (1, S, cfg.hidden_size)
    x = jax.random.normal(jax.random.PRNGKey(2),
                          (1, cfg.latent_frames, cfg.in_channels,
                           cfg.latent_height, cfg.latent_width))
    ctx = jax.random.normal(jax.random.PRNGKey(3),
                            (1, cfg.text_length, cfg.text_dim))
    a = dit.forward(params, x, jnp.array([3]), ctx, cfg,
                    compute_dtype=jnp.float32)
    params2 = dict(params, pos_embedding=jnp.full_like(
        params["pos_embedding"], 7.0))
    b = dit.forward(params2, x, jnp.array([3]), ctx, cfg,
                    compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _rot_full_cfg():
    return dataclasses.replace(CFG0, dit=_rot_cfg())


def test_sp_denoise_rotary3d_matches_single_chip():
    """Token-sharded (time=4) denoise with rotary3d == single chip: the
    traced shard-offset gather path in _layer_sp."""
    _compare_sp_vs_single(_rot_full_cfg(), _mesh(data=2, time=4))


def test_tp_denoise_rotary3d_matches_single_chip():
    """Head-sharded (model=4) denoise with rotary3d == single chip: the
    per-Dk tables apply identically on every head shard (_layer_tp)."""
    mesh = mesh_lib.make_mesh(MeshConfig(data=2, model=4, time=1),
                              jax.devices()[:8])
    _compare_sp_vs_single(_rot_full_cfg(), mesh)
