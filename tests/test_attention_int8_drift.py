"""Golden-output gate for the int8-scores INFERENCE default.

The int8-scores flash kernel (per-row q / per-kv-position k absmax
quantization of the scores matmul) is 1.065x on v5e at DiT shapes with
single-call corr 0.99996 vs the exact kernel (PARITY.md). Promoting it to
the inference default (VERDICT r2 #5) needs a compound-drift gate: 45
layer-calls x 50 steps could amplify per-call noise. This test chains
multiple FULL DiT CFG denoise steps (main + control + adaLN + residuals,
models/dit.py) through the pallas attention path with int8 on vs exact,
and bounds the end-output drift.

Geometry note: the int8 path only engages on the K/V-resident kernel
(nq > 1), so the latent grid here is sized to S = 776 > block_q = 512 —
a tiny config would silently compare exact vs exact.

Training is unaffected by design: anything under jax.grad pins exact f32
scores (ops/attention._flash_diff_fwd).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from landiff_tpu.config import DiTConfig
from landiff_tpu.models import dit as dit_lib


def _mid_cfg():
    # S = text 8 + 3 * (32/2) * (32/2) = 776 -> nq=2 at block_q=512
    return DiTConfig(num_layers=2, hidden_size=64, num_heads=1,
                     patch_size=2, in_channels=4, out_channels=4,
                     latent_frames=3, latent_height=32, latent_width=32,
                     text_dim=32, text_length=8, time_embed_dim=32,
                     adm_in_channels=16, control_layers=1)


def _run_steps(cfg, params, ctrl, x0, ctx, sem, *, int8, pv=False, steps=3):
    # the env knob is read by ops.attention.attention at trace time; these
    # eager (unjitted) calls re-read it every step
    import os

    os.environ["LANDIFF_ATTN_INT8"] = "1" if int8 else "0"
    os.environ["LANDIFF_ATTN_INT8_PV"] = "1" if pv else "0"
    try:
        x = x0
        for i in range(steps):
            ts = jnp.full((x.shape[0],), 999.0 - 200.0 * i, jnp.float32)
            net = dit_lib.control_warp_forward(
                params, ctrl, x, ts, ctx, cfg, sem, attn_impl="pallas",
                compute_dtype=jnp.float32)
            x = 0.9 * x + 0.1 * net  # toy update rule: compounds drift
        return np.asarray(x, np.float32)
    finally:
        del os.environ["LANDIFF_ATTN_INT8"]
        del os.environ["LANDIFF_ATTN_INT8_PV"]


def test_dit_multistep_int8_drift_bounded():
    from landiff_tpu.utils import fill_zero_leaves

    cfg = _mid_cfg()
    # fill the zero-init adaLN gates: at raw init they multiply the
    # attention contribution by exactly 0 and the drift comparison would
    # be vacuous (utils.fill_zero_leaves docstring)
    params = fill_zero_leaves(dit_lib.init(jax.random.PRNGKey(0), cfg),
                              jax.random.PRNGKey(10), scale=0.05)
    ctrl = fill_zero_leaves(
        dit_lib.init(jax.random.PRNGKey(1), cfg, control=True),
        jax.random.PRNGKey(11), scale=0.05)
    B = 2
    x = jax.random.normal(jax.random.PRNGKey(2),
                          (B, cfg.latent_frames, cfg.in_channels,
                           cfg.latent_height, cfg.latent_width))
    ctx = jax.random.normal(jax.random.PRNGKey(3),
                            (B, cfg.text_length, cfg.text_dim))
    sem = jax.random.normal(jax.random.PRNGKey(4), x.shape) * 0.1

    exact = _run_steps(cfg, params, ctrl, x, ctx, sem, int8=False)
    quant = _run_steps(cfg, params, ctrl, x, ctx, sem, int8=True)

    # the int8 path must actually have engaged (outputs differ)...
    assert np.abs(exact - quant).max() > 0
    # ...but compound drift stays negligible for generation quality
    corr = np.corrcoef(exact.ravel(), quant.ravel())[0, 1]
    assert corr > 0.9995, corr
    rel = np.abs(exact - quant).mean() / (np.abs(exact).mean() + 1e-9)
    assert rel < 0.02, rel


def test_dit_multistep_int8_pv_drift_bounded():
    """Compound-drift gate for the int8 p@v extension (opt-in,
    LANDIFF_ATTN_INT8_PV=1 on top of int8 scores)."""
    from landiff_tpu.utils import fill_zero_leaves

    cfg = _mid_cfg()
    params = fill_zero_leaves(dit_lib.init(jax.random.PRNGKey(0), cfg),
                              jax.random.PRNGKey(10), scale=0.05)
    ctrl = fill_zero_leaves(
        dit_lib.init(jax.random.PRNGKey(1), cfg, control=True),
        jax.random.PRNGKey(11), scale=0.05)
    B = 2
    x = jax.random.normal(jax.random.PRNGKey(2),
                          (B, cfg.latent_frames, cfg.in_channels,
                           cfg.latent_height, cfg.latent_width))
    ctx = jax.random.normal(jax.random.PRNGKey(3),
                            (B, cfg.text_length, cfg.text_dim))
    sem = jax.random.normal(jax.random.PRNGKey(4), x.shape) * 0.1

    exact = _run_steps(cfg, params, ctrl, x, ctx, sem, int8=False)
    quant = _run_steps(cfg, params, ctrl, x, ctx, sem, int8=True, pv=True)

    assert np.abs(exact - quant).max() > 0
    corr = np.corrcoef(exact.ravel(), quant.ravel())[0, 1]
    assert corr > 0.999, corr
    rel = np.abs(exact - quant).mean() / (np.abs(exact).mean() + 1e-9)
    assert rel < 0.03, rel
