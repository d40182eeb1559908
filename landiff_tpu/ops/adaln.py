"""Fused adaLN modulate: LayerNorm (no-affine stats in f32) + per-token
text/video shift-scale selection in ONE pass over HBM.

Reference chain (dit_video_concat.py:539-664): every DiT layer computes
LayerNorm(x) then modulates the text and video slices with separate
(shift, scale) pairs (:577-588). Our XLA path position-selects the pair per
token (models/dit.py _adaln_sel) so the modulation fuses into neighbouring
elementwise ops; this kernel additionally fuses the LayerNorm itself, so x
is read from HBM exactly once and h written once — targeting the
non-attention bucket of the denoise step (PARITY.md "Measured").

MEASURED (r4, 1x v5e, production shape B=2 S=17776 D=3072 bf16, 64-call
chains): Pallas 1.87 ms/call at every block size in {256, 512, 1024} vs
XLA 1.44 ms/call — the kernel is ~30% SLOWER standalone, and inside the
step XLA additionally fuses the modulate into neighbouring ops, so this is
a numbered REJECTION (PARITY.md "tried and rejected"); the knob
LANDIFF_FUSED_ADALN=1 stays available for archaeology but must not be
enabled. Anything under jax.grad uses the XLA path by construction (the
kernel's custom_vjp backward is the XLA expression).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, b_ref, ts_ref, tc_ref, vs_ref, vc_ref, o_ref, *,
            text_len: int, eps: float, block_s: int):
    xs = x_ref[0].astype(jnp.float32)                    # (block_s, D)
    mu = jnp.mean(xs, axis=-1, keepdims=True)
    xc = xs - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    h = xc * jax.lax.rsqrt(var + eps)
    h = h * w_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    start = pl.program_id(1) * block_s
    rows = start + jax.lax.broadcasted_iota(jnp.int32, (block_s, 1), 0)
    is_text = rows < text_len                            # (block_s, 1)
    shift = jnp.where(is_text, ts_ref[0].astype(jnp.float32),
                      vs_ref[0].astype(jnp.float32))
    scale = jnp.where(is_text, tc_ref[0].astype(jnp.float32),
                      vc_ref[0].astype(jnp.float32))
    o_ref[0] = (h * (1.0 + scale) + shift).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("text_len", "eps", "block_s",
                                    "interpret"))
def _fused(x, w, b, t_shift, t_scale, v_shift, v_scale, text_len, eps,
           block_s, interpret=False):
    B, S, D = x.shape
    grid = (B, pl.cdiv(S, block_s))
    # (B, D) pairs -> (B, 1, D): Mosaic requires the last two block dims be
    # (mult-of-8|full, mult-of-128|full); a (1, D) slice of (B, D) is
    # neither, but (1, 1, D) of (B, 1, D) is full x full
    t_shift, t_scale, v_shift, v_scale = (
        a[:, None] for a in (t_shift, t_scale, v_shift, v_scale))
    return pl.pallas_call(
        functools.partial(_kernel, text_len=text_len, eps=eps,
                          block_s=block_s),
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((1, block_s, D), lambda bi, si: (bi, si, 0)),
            pl.BlockSpec((D,), lambda bi, si: (0,)),
            pl.BlockSpec((D,), lambda bi, si: (0,)),
            pl.BlockSpec((1, 1, D), lambda bi, si: (bi, 0, 0)),
            pl.BlockSpec((1, 1, D), lambda bi, si: (bi, 0, 0)),
            pl.BlockSpec((1, 1, D), lambda bi, si: (bi, 0, 0)),
            pl.BlockSpec((1, 1, D), lambda bi, si: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_s, D), lambda bi, si: (bi, si, 0)),
        out_shape=jax.ShapeDtypeStruct((B, S, D), x.dtype),
        # f32 LN intermediates at (block_s, D) + double-buffered bf16 in/out
        # blocks exceed the 16 MB default scoped-vmem at block 512 x 3072
        # (29.9 MB measured); the chip has 128 MB physical VMEM — same
        # pattern as the flash backward (ops/attention.py:759)
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(x, w, b, t_shift, t_scale, v_shift, v_scale)


def _xla(x, w, b, t_shift, t_scale, v_shift, v_scale, text_len, eps):
    """Reference path — identical math via XLA (models/dit.py chain)."""
    from landiff_tpu.ops.norms import layer_norm

    S = x.shape[1]
    is_text = (jnp.arange(S) < text_len)[None, :, None]
    h = layer_norm(x, w, b, eps)
    shift = jnp.where(is_text, t_shift[:, None], v_shift[:, None])
    scale = jnp.where(is_text, t_scale[:, None], v_scale[:, None])
    return h * (1.0 + scale.astype(h.dtype)) + shift.astype(h.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _diff(x, w, b, t_shift, t_scale, v_shift, v_scale, text_len, eps,
          block_s, interpret):
    return _fused(x, w, b, t_shift, t_scale, v_shift, v_scale, text_len,
                  eps, block_s, interpret)


def _diff_fwd(x, w, b, t_shift, t_scale, v_shift, v_scale, text_len, eps,
              block_s, interpret):
    out = _fused(x, w, b, t_shift, t_scale, v_shift, v_scale, text_len,
                 eps, block_s, interpret)
    return out, (x, w, b, t_shift, t_scale, v_shift, v_scale)


def _diff_bwd(text_len, eps, block_s, interpret, res, g):
    # backward through the (cheap, fusable) XLA expression — the fused
    # kernel is an inference speedup, gradients need no Pallas backward
    x, w, b, ts, tc, vs, vc = res
    _, vjp = jax.vjp(
        lambda *a: _xla(*a, text_len, eps), x, w, b, ts, tc, vs, vc)
    return vjp(g)


_diff.defvjp(_diff_fwd, _diff_bwd)


def adaln_modulate(x, w, b, t_shift, t_scale, v_shift, v_scale, *,
                   text_len: int, eps: float = 1e-6, impl: str = "auto",
                   block_s: int = 512, interpret: bool = False):
    """LayerNorm(x)*(1+scale_sel)+shift_sel with the text/video pair
    selected by token position (< text_len -> text pair).

    Args:
      x: (B, S, D); w, b: (D,) LN affine; *_shift/*_scale: (B, D).
      impl: 'pallas' | 'xla' | 'auto' (pallas on TPU when the shape tiles).
    """
    B, S, D = x.shape
    if impl == "auto":
        on_tpu = jax.devices()[0].platform == "tpu"
        ok = D % 128 == 0 and S >= block_s
        impl = "pallas" if (on_tpu and ok) else "xla"
    if impl == "xla":
        return _xla(x, w, b, t_shift, t_scale, v_shift, v_scale, text_len,
                    eps)
    return _diff(x, w, b, t_shift, t_scale, v_shift, v_scale, text_len,
                 eps, block_s, interpret)
