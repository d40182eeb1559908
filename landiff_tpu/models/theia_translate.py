"""Theia feature-translator heads (adapter/translator zoo).

Reference: tokenizer/models/feature_extractor/theia_model.py:686-1310 —
the distillation side of Theia training: backbone tokens are adapted and
translated into the feature spaces of the teacher models (CLIP / DINOv2 /
SAM / ...). Unused by LanDiff inference (the shipped checkpoint only runs
the backbone), but part of the Theia model surface:

  FeatureTranslator     = backbone_adapter -> stem -> per-target head
  LinearAdapterHead     (theia_model.py:686-720)  — CLS token -> linear
  MLPAdapterHead        (theia_model.py:723-805)  — drop CLS, bilinear
                          resize to target grid, MLP (hidden = 2*C_s)
  LightConvAdapterHead  (theia_model.py:935-1094) — drop CLS, optional
                          pad-to-16 transposed conv, then the case-matched
                          [full-tensor LayerNorm, (transposed) conv 3x3,
                          ReLU] x2 stack + final linear
  MLPFeatureTranslator / LightConvFeatureTranslator
                        (theia_model.py:1189-1310) — LN(C)+linear adapter
                          (identity for light_conv), heads per target;
                          "_cls" targets get the linear head

TPU-first shape notes: all convs run NHWC (implicit GEMM on the MXU);
the torch ConvTranspose2d is expressed as an lhs-dilated conv; the
reference's full-tensor nn.LayerNorm([C, H, W]) normalizes over ALL of
(C, H, W) with a (C, H, W) affine — replicated exactly (stats in f32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _linear(p, x):
    return x @ p["w"].astype(x.dtype) + p["b"].astype(x.dtype)


def _linear_init(key, cin, cout, dtype=jnp.float32):
    std = (1.0 / cin) ** 0.5
    return {"w": (jax.random.normal(key, (cin, cout)) * std).astype(dtype),
            "b": jnp.zeros((cout,), dtype)}


def layer_norm_chw(p, x, eps=1e-5):
    """Full-tensor LayerNorm over (C, H, W) with (C, H, W) affine
    (torch nn.LayerNorm(source_size), theia_model.py:1023 etc).
    x: (B, H, W, C) NHWC; affine params stored (H, W, C)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2, 3), keepdims=True)
    var = jnp.var(xf, axis=(1, 2, 3), keepdims=True)
    out = (xf - mean) / jnp.sqrt(var + eps)
    return (out.astype(x.dtype) * p["g"].astype(x.dtype)
            + p["b"].astype(x.dtype))


def _ln_chw_init(h, w, c, dtype=jnp.float32):
    return {"g": jnp.ones((h, w, c), dtype), "b": jnp.zeros((h, w, c), dtype)}


def conv2d(p, x, *, stride=1, padding=1):
    """NHWC conv, weights (kh, kw, ci, co)."""
    return jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"].astype(x.dtype)


def conv_transpose2d(p, x, *, stride=1, padding=0, output_padding=0):
    """torch ConvTranspose2d semantics as an lhs-dilated conv:
    out = (H-1)*stride - 2*padding + k + output_padding."""
    w = p["w"].astype(x.dtype)            # (kh, kw, ci, co)
    kh, kw = w.shape[:2]
    w = w[::-1, ::-1]                     # flipped kernel
    pad_h = (kh - 1 - padding, kh - 1 - padding + output_padding)
    pad_w = (kw - 1 - padding, kw - 1 - padding + output_padding)
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), [pad_h, pad_w], lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + p["b"].astype(x.dtype)


def _conv_init(key, kh, kw, ci, co, dtype=jnp.float32):
    std = (1.0 / (kh * kw * ci)) ** 0.5
    return {"w": (jax.random.normal(key, (kh, kw, ci, co)) * std
                  ).astype(dtype),
            "b": jnp.zeros((co,), dtype)}


# ---------------------------------------------------------------------------
# heads


def linear_head_init(key, source_c, target_c, dtype=jnp.float32):
    return {"kind": "linear", "lin": _linear_init(key, source_c, target_c,
                                                  dtype)}


def mlp_head_init(key, source, target, num_layer, dtype=jnp.float32):
    """source/target: (C, H, W). MLP hidden = 2*C_s
    (theia_model.py:778-791)."""
    cs, hs, ws = source
    ct, ht, wt = target
    hidden = cs * 2
    ks = iter(jax.random.split(key, num_layer + 1))
    if num_layer == 1:
        layers = [_linear_init(next(ks), cs, ct, dtype)]
    else:
        layers = [_linear_init(next(ks), cs, hidden, dtype)]
        for _ in range(num_layer - 2):
            layers.append(_linear_init(next(ks), hidden, hidden, dtype))
        layers.append(_linear_init(next(ks), hidden, ct, dtype))
    return {"kind": "mlp", "source": source, "target": target,
            "layers": layers}


def light_conv_head_init(key, source, target, hidden_factor=1.0,
                         dtype=jnp.float32):
    """source (C,H,W) in {(*,12..14,*) pad->16, (*,16,*), (*,64,*)};
    target H in {7, 14, 16, 64} per the reference cases
    (theia_model.py:991-1085)."""
    cs, hs, ws = source
    ct, ht, wt = target
    hidden = int(cs * hidden_factor)
    ks = iter(jax.random.split(key, 8))
    p = {"kind": "light_conv", "source": source, "target": target}
    if hs < 16 and ht >= 16:                       # pad any<=14 -> 16
        p["pad"] = _conv_init(next(ks), 3, 3, cs, cs, dtype)
        p["pad_out"] = 14 - hs
        hs = ws = 16
    if hs == 16 and ht == 64:
        p["stack"] = [
            ("ln", _ln_chw_init(16, 16, cs, dtype)),
            ("convt", _conv_init(next(ks), 3, 3, cs, hidden, dtype),
             dict(stride=2, padding=1)),                       # 31
            ("ln", _ln_chw_init(31, 31, hidden, dtype)),
            ("convt", _conv_init(next(ks), 3, 3, hidden, hidden, dtype),
             dict(stride=2, padding=0, output_padding=1)),     # 64
            ("ln", _ln_chw_init(64, 64, hidden, dtype)),
        ]
    elif hs == ht:                                  # same-size
        p["stack"] = [
            ("ln", _ln_chw_init(hs, ws, cs, dtype)),
            ("conv", _conv_init(next(ks), 3, 3, cs, hidden, dtype),
             dict(stride=1, padding=1)),
            ("ln", _ln_chw_init(hs, ws, hidden, dtype)),
            ("conv", _conv_init(next(ks), 3, 3, hidden, hidden, dtype),
             dict(stride=1, padding=1)),
            ("ln", _ln_chw_init(hs, ws, hidden, dtype)),
        ]
    elif hs == 64 and ht == 16:
        p["stack"] = [
            ("ln", _ln_chw_init(64, 64, cs, dtype)),
            ("conv", _conv_init(next(ks), 3, 3, cs, hidden, dtype),
             dict(stride=2, padding=1)),                       # 32
            ("ln", _ln_chw_init(32, 32, hidden, dtype)),
            ("conv", _conv_init(next(ks), 3, 3, hidden, hidden, dtype),
             dict(stride=2, padding=1)),                       # 16
            ("ln", _ln_chw_init(16, 16, hidden, dtype)),
        ]
    elif ht == 7:                                   # 14x14 -> 7x7
        p["stack"] = [
            ("ln", _ln_chw_init(hs, ws, cs, dtype)),
            ("conv", _conv_init(next(ks), 4, 4, cs, hidden, dtype),
             dict(stride=2, padding=1)),                       # 7
            ("ln", _ln_chw_init(7, 7, hidden, dtype)),
        ]
    else:
        raise NotImplementedError((source, target))
    p["out"] = _linear_init(next(ks), hidden, ct, dtype)
    return p


def head_forward(p, x, *, no_cls=False):
    """x: (B, (1+)H*W, C) backbone tokens -> target feature map.

    linear -> (B, C_t) from the CLS token; mlp/light_conv ->
    (B, H_t*W_t, C_t)."""
    kind = p["kind"]
    if kind == "linear":
        assert not no_cls, "linear head needs the CLS token"
        return _linear(p["lin"], x[:, 0])
    if not no_cls:
        x = x[:, 1:]
    cs, hs, ws = p["source"]
    ct, ht, wt = p["target"]
    B = x.shape[0]
    if kind == "mlp":
        grid = x.reshape(B, hs, ws, cs)
        if (hs, ws) != (ht, wt):
            # MLPAdapterHead interpolates with F.interpolate's DEFAULT mode
            # — 'nearest', src index floor(i*src/dst) (theia_model.py:
            # 670-684, Interpolation wraps interpolate(x, size) bare) —
            # not bilinear, and not jax's half-pixel 'nearest'.
            hi = jnp.floor(jnp.arange(ht) * (hs / ht)).astype(jnp.int32)
            wi = jnp.floor(jnp.arange(wt) * (ws / wt)).astype(jnp.int32)
            grid = grid[:, hi][:, :, wi]
        out = grid.reshape(B, ht * wt, cs)
        for i, lin in enumerate(p["layers"]):
            if i:
                out = jax.nn.relu(out)
            out = _linear(lin, out)
        return out
    assert kind == "light_conv"
    grid = x.reshape(B, hs, ws, cs)
    if "pad" in p:
        grid = conv_transpose2d({"w": p["pad"]["w"], "b": p["pad"]["b"]},
                                grid, stride=1, padding=0,
                                output_padding=p["pad_out"])
    # LightConvAdapterHead stacks are LN -> (Conv, ReLU) -> LN -> ... -> LN
    # -> Linear: every conv is followed IMMEDIATELY by ReLU, then the next
    # LayerNorm; no activation before the output linear
    # (theia_model.py:1022-1085).
    for item in p["stack"]:
        if item[0] == "ln":
            grid = layer_norm_chw(item[1], grid)
        else:
            kwargs = item[2]
            if item[0] == "convt":
                grid = conv_transpose2d(item[1], grid, **kwargs)
            else:
                grid = conv2d(item[1], grid, **kwargs)
            grid = jax.nn.relu(grid)
    out = grid.reshape(B, -1, grid.shape[-1])
    return _linear(p["out"], out)


# ---------------------------------------------------------------------------
# translators


def init_translator(key, backbone, targets, *, kind="light_conv",
                    hidden_size=1024, n_layer=3, hidden_factor=1.0,
                    dtype=jnp.float32):
    """backbone: (C, H, W); targets: dict name -> (C, H, W).

    kind='mlp'        -> MLPFeatureTranslator (LN+linear adapter to
                         hidden_size, MLP heads, theia_model.py:1189-1227)
    kind='light_conv' -> LightConvFeatureTranslator (identity adapter,
                         light-conv heads; '_cls' targets -> linear head,
                         theia_model.py:1263-1310)
    """
    ks = iter(jax.random.split(key, len(targets) + 2))
    p = {"kind": kind, "backbone": backbone, "heads": {}}
    c = backbone[0]
    if kind == "mlp":
        p["adapter_ln"] = {"g": jnp.ones((c,), dtype),
                           "b": jnp.zeros((c,), dtype)}
        p["adapter_lin"] = _linear_init(next(ks), c, hidden_size, dtype)
        source = (hidden_size, backbone[1], backbone[2])
        for name, tgt in targets.items():
            p["heads"][name] = mlp_head_init(next(ks), source, tgt, n_layer,
                                             dtype)
    elif kind == "light_conv":
        for name, tgt in targets.items():
            if "_cls" in name:
                p["heads"][name] = linear_head_init(next(ks), c, tgt[0],
                                                    dtype)
            else:
                p["heads"][name] = light_conv_head_init(
                    next(ks), backbone, tgt, hidden_factor, dtype)
    else:
        raise ValueError(kind)
    return p


def translate(p, x, *, target_names=None, no_cls=False):
    """x: (B, (1+)H*W, C) backbone tokens -> {target: features}
    (FeatureTranslator.forward, theia_model.py:1154-1187)."""
    if p["kind"] == "mlp":
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        ln = ((xf - mu) / jnp.sqrt(var + 1e-5)).astype(x.dtype)
        ln = ln * p["adapter_ln"]["g"].astype(x.dtype) \
            + p["adapter_ln"]["b"].astype(x.dtype)
        x = _linear(p["adapter_lin"], ln)
    names = target_names if target_names is not None else list(p["heads"])
    return {t: head_forward(p["heads"][t], x, no_cls=no_cls) for t in names}


def distill_loss(pred, teacher_feats, *, beta=1.0):
    """Per-target cosine + smooth-L1 distillation objective (the Theia
    recipe; the reference repo vendors only the model side, so this is the
    framework's training-utility counterpart, not a transcription).
    Returns (total, per_target dict)."""
    per = {}
    for name, yhat in pred.items():
        y = teacher_feats[name].astype(jnp.float32)
        yh = yhat.astype(jnp.float32)
        cos = 1.0 - jnp.mean(jnp.sum(yh * y, -1)
                             / (jnp.linalg.norm(yh, axis=-1)
                                * jnp.linalg.norm(y, axis=-1) + 1e-8))
        diff = jnp.abs(yh - y)
        sl1 = jnp.mean(jnp.where(diff < beta, 0.5 * diff ** 2 / beta,
                                 diff - 0.5 * beta))
        per[name] = cos + sl1
    total = sum(per.values()) / max(len(per), 1)
    return total, per
