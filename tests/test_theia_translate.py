"""Theia feature-translator heads (models/theia_translate.py): torch
parity for the primitives (ConvTranspose2d semantics, bilinear interp +
MLP head) and shape/finiteness across the reference's LightConv cases
(theia_model.py:686-1310)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from landiff_tpu.models import theia_translate as tt


def test_conv_transpose_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 14, 14, 3)).astype(np.float32)
    w = rng.standard_normal((3, 3, 3, 5)).astype(np.float32) * 0.2
    b = rng.standard_normal((5,)).astype(np.float32)
    # torch requires output_padding < stride, so the reference's
    # pad-to-16 ConvTranspose2d(k3, s1, output_padding=14-H) only truly
    # supports H=14 (output_padding 0) despite the 12<=H<16 comment
    for stride, padding, outpad in [(1, 0, 0), (2, 1, 0), (2, 0, 1),
                                    (2, 1, 1)]:
        got = tt.conv_transpose2d({"w": jnp.asarray(w), "b": jnp.asarray(b)},
                                  jnp.asarray(x), stride=stride,
                                  padding=padding, output_padding=outpad)
        ct = torch.nn.ConvTranspose2d(3, 5, 3, stride=stride,
                                      padding=padding,
                                      output_padding=outpad)
        with torch.no_grad():
            # torch weight (Cin, Cout, kh, kw) <- ours (kh, kw, ci, co)
            ct.weight.copy_(torch.from_numpy(w.transpose(2, 3, 0, 1)))
            ct.bias.copy_(torch.from_numpy(b))
            want = ct(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(
            np.asarray(got), want.numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-4)


def test_mlp_head_matches_torch_transcription():
    """MLPAdapterHead: drop CLS, NEAREST resize (F.interpolate default —
    theia_model.py:683; verified against the real module in
    test_reference_oracles.py), 3-layer MLP with hidden 2*C
    (theia_model.py:723-805)."""
    rng = np.random.default_rng(1)
    cs, hs, ws = 8, 4, 4
    ct_, ht, wt = 6, 8, 8
    head = tt.mlp_head_init(jax.random.PRNGKey(0), (cs, hs, ws),
                            (ct_, ht, wt), num_layer=3)
    x = rng.standard_normal((2, 1 + hs * ws, cs)).astype(np.float32)
    got = np.asarray(tt.head_forward(head, jnp.asarray(x)))

    xt = torch.from_numpy(x)[:, 1:]
    grid = xt.reshape(2, hs, ws, cs).permute(0, 3, 1, 2)
    grid = torch.nn.functional.interpolate(grid, (ht, wt))  # default nearest
    y = grid.permute(0, 2, 3, 1).reshape(2, ht * wt, cs)
    for i, lin in enumerate(head["layers"]):
        if i:
            y = torch.nn.functional.relu(y)
        y = y @ torch.from_numpy(np.asarray(lin["w"])) \
            + torch.from_numpy(np.asarray(lin["b"]))
    np.testing.assert_allclose(got, y.numpy(), rtol=1e-4, atol=1e-4)


def test_light_conv_cases_shapes():
    key = jax.random.PRNGKey(2)
    B, cs = 2, 16
    cases = [
        ((cs, 16, 16), (12, 64, 64)),   # 16 -> 64 (transposed convs)
        ((cs, 16, 16), (12, 16, 16)),   # same size
        ((cs, 64, 64), (12, 16, 16)),   # 64 -> 16
        ((cs, 14, 14), (12, 7, 7)),     # 14 -> 7
        ((cs, 14, 14), (12, 64, 64)),   # pad 14 -> 16 -> 64
    ]
    for source, target in cases:
        head = tt.light_conv_head_init(key, source, target)
        n = source[1] * source[2]
        x = jax.random.normal(jax.random.PRNGKey(3), (B, 1 + n, cs))
        out = tt.head_forward(head, x)
        assert out.shape == (B, target[1] * target[2], target[0]), (
            source, target, out.shape)
        assert np.isfinite(np.asarray(out)).all()


def test_layer_norm_chw_matches_torch():
    """Full-tensor LayerNorm([C,H,W]) with (C,H,W) affine
    (theia_model.py:1023)."""
    rng = np.random.default_rng(3)
    c, h, w = 5, 4, 4
    x = rng.standard_normal((2, h, w, c)).astype(np.float32)
    g = rng.standard_normal((h, w, c)).astype(np.float32)
    b = rng.standard_normal((h, w, c)).astype(np.float32)
    got = np.asarray(tt.layer_norm_chw(
        {"g": jnp.asarray(g), "b": jnp.asarray(b)}, jnp.asarray(x)))
    ln = torch.nn.LayerNorm([c, h, w])
    with torch.no_grad():
        ln.weight.copy_(torch.from_numpy(g.transpose(2, 0, 1)))
        ln.bias.copy_(torch.from_numpy(b.transpose(2, 0, 1)))
        want = ln(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(got, want.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-4)


def test_translators_end_to_end():
    backbone = (16, 14, 14)
    targets = {"clip_cls": (24,), "dinov2": (12, 16, 16)}
    # light_conv: "_cls" -> linear head on CLS; others light-conv
    p = tt.init_translator(jax.random.PRNGKey(4), backbone,
                           {"clip_cls": (24, 1, 1),
                            "dinov2": (12, 16, 16)})
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 1 + 14 * 14, 16))
    out = tt.translate(p, x)
    assert out["clip_cls"].shape == (2, 24)
    assert out["dinov2"].shape == (2, 256, 12)
    # mlp translator
    pm = tt.init_translator(jax.random.PRNGKey(6), backbone,
                            {"sam": (8, 28, 28)}, kind="mlp",
                            hidden_size=32)
    outm = tt.translate(pm, x)
    assert outm["sam"].shape == (2, 28 * 28, 8)
    # distillation objective is finite and nonnegative
    teachers = {k: jnp.zeros_like(v) for k, v in out.items()}
    total, per = tt.distill_loss(out, teachers)
    assert np.isfinite(float(total)) and float(total) >= 0
