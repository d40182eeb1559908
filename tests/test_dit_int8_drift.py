"""Drift gate for the W8A8 int8 DiT linears (dit.quantize_int8).

v5e int8 MXU peak is 2x bf16 and the DiT's big linears are MXU-bound
(PARITY.md), so W8A8 (per-token dynamic activation scales x per-output-
channel weight scales, s32 accumulation) halves their time. It is opt-in
(LANDIFF_DIT_INT8=1, pipeline/dif_infer.py) and must keep compound drift
over chained full CFG denoise steps negligible — same gate methodology as
tests/test_attention_int8_drift.py for the int8-scores attention.

The reference ships no quantized inference path (SURVEY §2.9: bf16
autocast only); this is a TPU-side extension, so the oracle is our own
bf16/f32 forward, not reference numerics.
"""

import jax
import jax.numpy as jnp
import numpy as np

from landiff_tpu.config import DiTConfig
from landiff_tpu.models import dit as dit_lib


def _mid_cfg():
    return DiTConfig(num_layers=2, hidden_size=64, num_heads=2,
                     patch_size=2, in_channels=4, out_channels=4,
                     latent_frames=3, latent_height=32, latent_width=32,
                     text_dim=32, text_length=8, time_embed_dim=32,
                     adm_in_channels=16, control_layers=1)


def _run_steps(cfg, params, ctrl, x0, ctx, sem, *, steps=3):
    x = x0
    for i in range(steps):
        ts = jnp.full((x.shape[0],), 999.0 - 200.0 * i, jnp.float32)
        net = dit_lib.control_warp_forward(
            params, ctrl, x, ts, ctx, cfg, sem, attn_impl="xla",
            compute_dtype=jnp.float32)
        x = 0.9 * x + 0.1 * net  # toy update rule: compounds drift
    return np.asarray(x, np.float32)


def _setup():
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
    return cfg, params, ctrl, x, ctx, sem


def test_dit_w8a8_multistep_drift_bounded():
    cfg, params, ctrl, x, ctx, sem = _setup()
    exact = _run_steps(cfg, params, ctrl, x, ctx, sem)
    qp = dit_lib.quantize_int8(params)
    qc = dit_lib.quantize_int8(ctrl)
    quant = _run_steps(cfg, qp, qc, x, ctx, sem)

    # the int8 path must actually have engaged (outputs differ)...
    assert np.abs(exact - quant).max() > 0
    # ...but compound drift stays negligible for generation quality
    corr = np.corrcoef(exact.ravel(), quant.ravel())[0, 1]
    assert corr > 0.999, corr
    rel = np.abs(exact - quant).mean() / (np.abs(exact).mean() + 1e-9)
    assert rel < 0.03, rel


def test_dit_w8a8_single_matmul_close():
    # unit-level: _w8a8_matmul vs exact on a well-conditioned matrix
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    x = jax.random.normal(k1, (4, 64, 96), jnp.float32)
    w = jax.random.normal(k2, (96, 128), jnp.float32) * 0.02
    want = np.asarray(x @ w)
    q = dit_lib.quantize_int8(
        {"layers": [{"qkv_w": w}]})["layers"][0]["qkv_w"]
    got = np.asarray(dit_lib._w8a8_matmul(x, q["q"], q["s"]))
    rel = np.abs(got - want).mean() / (np.abs(want).mean() + 1e-9)
    assert rel < 0.015, rel


def test_dit_int8_pipeline_env_knob():
    """LANDIFF_DIT_INT8=1 quantizes the wrapper's main/control params and
    the e2e output stays close to the bf16 wrapper's."""
    import dataclasses
    import os

    from landiff_tpu.config import tiny_test_config
    from landiff_tpu.pipeline import dif_infer

    cfg = tiny_test_config()
    params = dif_infer.init_params(jax.random.PRNGKey(0), cfg)
    tokens = np.zeros((cfg.tokenizer.titok.latent_tokens,), np.int32)
    task = dif_infer.VideoTask(save_file_name="t.mp4", prompt="a cat",
                               seed=3, semantic_token=tokens)
    base = dif_infer.CogModelInferWrapper(params, cfg,
                                          compute_dtype=jnp.float32,
                                          attn_impl="xla")
    out_base = base(dataclasses.replace(task))
    os.environ["LANDIFF_DIT_INT8"] = "1"
    try:
        quant = dif_infer.CogModelInferWrapper(params, cfg,
                                               compute_dtype=jnp.float32,
                                               attn_impl="xla")
        assert isinstance(quant.params["main"]["layers"][0]["qkv_w"], dict)
        out_q = quant(dataclasses.replace(task))
    finally:
        del os.environ["LANDIFF_DIT_INT8"]
    corr = np.corrcoef(out_base.latent.ravel(), out_q.latent.ravel())[0, 1]
    assert corr > 0.999, corr
