"""Measure the FULL per-chip SP (sequence-parallel) shard-shape CFG
denoise step on ONE v5e.

bench.py's SP projection (`--mesh data=2,time=4`: ring attention over the
`time` axis, weights replicated — parallel/ring_attention.py) previously
combined a MEASURED per-hop attention kernel time (4.8 ms at the
(B=1, H=30, S=4444) hop shape) with an IDEAL-/8 scaling assumption for the
non-attention work — the same assumption benchmarks/bench_tp_shard_step.py
removed for the TP layout in r4.

This benchmark removes it for SP: it runs the COMPLETE per-device program
of the `data=2,time=4` serving layout on one real chip —

  - one CFG row (B_local = 1; rows ride the data axis),
  - FULL replicated main+control weights (the SP design: tokens shard,
    weights don't),
  - full-sequence embeddings then the shard-0 token slice S/4 = 4444
    (dit.forward_sp runs patchify/text-proj replicated, then slices),
  - every _layer_sp with the ring attention FORCED to n_time local hops:
    each hop re-runs the lse-returning flash kernel on the local K/V
    shard and lse-merges, exactly the per-hop compute of
    ring_attention._ring_fwd with the ppermute replaced by reuse of the
    local block (identical shapes/FLOPs, zero wire — bench.py adds the
    wire/overlap model on top). Hop quantization mirrors the PRIMAL
    inference path ring_attention_diff: int8-scores hops ON by default
    on the pallas impl, opt-out LANDIFF_ATTN_INT8=0, p@v opt-in —
    note only the DIFFERENTIATED (training) ring pins exact f32 hops,
  - control taps stay local shards (no gather — control_forward_sp),
  - the one all_gather before the final head emulated by tiling the local
    shard to full S, so the replicated final-head/unpatchify cost at full
    S is included (its wire cost is counted by bench.py).

Result feeds bench.py mesh mode via LANDIFF_BENCH_SPSHARD_MS.

Reference for the layout being projected: the reference has NO
sequence-parallel DiT at all (its CP covers only the VAE,
vae_modules/cp_enc_dec.py — SURVEY §2.8); SP is the TPU scaling mode for
chip counts past the 30-head TP cap and for long-video sequences.
"""

import dataclasses
import functools
import json
import math
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from landiff_tpu.utils import enable_compile_cache
enable_compile_cache()

from landiff_tpu.config import DiTConfig  # noqa: E402
from landiff_tpu.models import dit as dit_lib  # noqa: E402
from landiff_tpu.parallel import ring_attention as ra  # noqa: E402


def forced_ring_local(n_hops: int):
    """ring_attention_local stand-in that executes `n_hops` local hops on
    one chip: hop 0 + (n_hops-1) scan iterations of [local attention +
    lse merge], i.e. _ring_fwd with the ppermute'd K/V block replaced by
    the resident one (same shapes -> same compute; wire is modeled by the
    caller). Hop kernels follow ring_attention_diff's PRIMAL env logic:
    int8-scores ON by default on the pallas impl (LANDIFF_ATTN_INT8,
    p@v via LANDIFF_ATTN_INT8_PV) — the serving default this projection
    is for; exact f32 hops are the LANDIFF_ATTN_INT8=0 variant."""

    def ring(q, k, v, axis, *, scale=None, impl="xla"):
        del axis
        if scale is None:
            scale = 1.0 / math.sqrt(q.shape[-1])
        if impl == "pallas":
            int8 = os.environ.get("LANDIFF_ATTN_INT8", "1") == "1"
            local = functools.partial(
                ra._local_attn_flash, int8_scores=int8,
                int8_pv=int8 and os.environ.get("LANDIFF_ATTN_INT8_PV")
                == "1")
            merge = functools.partial(ra._merge, exp=jnp.exp2, log=jnp.log2)
        else:
            local, merge = ra._local_attn, ra._merge
        out, lse = local(q, k, v, scale)

        def body(carry, _):
            o, l = carry
            o2, l2 = local(q, k, v, scale)
            return merge(o, l, o2, l2), None

        (out, lse), _ = jax.lax.scan(body, (out, lse), None,
                                     length=n_hops - 1)
        return out.astype(q.dtype)

    return ring


def main():
    n_time = int(os.environ.get("LANDIFF_BENCH_SP", "4"))
    attn = os.environ.get("LANDIFF_BENCH_ATTN", "auto")
    cfg = DiTConfig()
    scale = float(os.environ.get("LANDIFF_BENCH_SCALE", "1.0"))
    if scale < 1.0:  # CPU smoke path (plumbing check, not a timing)
        cfg = dataclasses.replace(
            cfg, num_layers=max(2, int(cfg.num_layers * scale)),
            control_layers=max(1, int(cfg.control_layers * scale)),
            hidden_size=max(128, int(cfg.hidden_size * scale) // 64 * 64),
            num_heads=max(2, int(cfg.num_heads * scale)),
            latent_frames=2, latent_height=12, latent_width=18,
            text_length=14)
    dt = jnp.bfloat16

    S = cfg.text_length + cfg.latent_frames \
        * (cfg.latent_height // cfg.patch_size) \
        * (cfg.latent_width // cfg.patch_size)
    assert S % n_time == 0, (S, n_time)
    s_loc = S // n_time

    # the per-chip SP program sees the FULL replicated weights
    def build():
        mp = dit_lib.init(jax.random.PRNGKey(0), cfg, dtype=dt)
        cp = dit_lib.init(jax.random.PRNGKey(1), cfg, control=True, dtype=dt)
        return mp, cp

    main_p, ctrl_p = jax.jit(build)()

    ra.ring_attention_local = forced_ring_local(n_time)

    # per-chip inputs of the data=2 x time=n layout: ONE CFG row
    B = 1
    x = jax.random.normal(jax.random.PRNGKey(2),
                          (B, cfg.latent_frames, cfg.in_channels,
                           cfg.latent_height, cfg.latent_width), dt)
    ts = jnp.full((B,), 999.0, jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(3),
                            (B, cfg.text_length, cfg.text_dim), dt)
    sem = jnp.zeros_like(x)

    ctrl_cfg = dataclasses.replace(cfg, num_layers=cfg.control_layers)

    def local_net(mp, cp, x2, ts2, ctx2, sem2):
        """The complete per-chip program of control_warp_forward_sp at
        shard 0 (offset 0, tokens [0, S/n)): replicated embeddings ->
        local token slice -> _layer_sp stack (forced local ring) ->
        local control taps -> tiled stand-in for the one all_gather ->
        replicated full-S final head."""
        xs = x2.astype(dt) + sem2.astype(dt)
        h, emb = dit_lib._embed_inputs(cp, xs, ts2, ctx2, ctrl_cfg, dt)
        h = h[:, :s_loc]
        taps = []
        for p in cp["layers"]:
            h = dit_lib._layer_sp(p, h, emb, ctrl_cfg, attn, "time", 0)
            taps.append(h @ p["zero_linear_w"].astype(h.dtype))
        h, emb = dit_lib._embed_inputs(mp, x2, ts2, ctx2, cfg, dt)
        h = h[:, :s_loc]
        for i, p in enumerate(mp["layers"]):
            h = dit_lib._layer_sp(p, h, emb, cfg, attn, "time", 0)
            if i < len(taps):
                h = h + taps[i].astype(h.dtype)
        h = jnp.concatenate([h] * n_time, axis=1)   # all_gather stand-in
        return dit_lib._final_head(mp, h, emb, cfg)

    def denoise_step(mp, cp, xc, ts2, ctx2, sem2):
        out = local_net(mp, cp, xc, ts2, ctx2, sem2)
        alpha = jnp.float32(0.5)
        return out.astype(jnp.float32) * (-jnp.sqrt(1 - alpha ** 2)) \
            + xc.astype(jnp.float32) * alpha

    N = int(os.environ.get("LANDIFF_BENCH_STEPS", "8"))

    @jax.jit
    def chained(mp, cp, x, ts, ctx, sem):
        def body(_, xc):
            return denoise_step(mp, cp, xc.astype(dt), ts, ctx,
                                sem).astype(dt)
        out = jax.lax.fori_loop(0, N, body, x)
        return jnp.sum(out.astype(jnp.float32))

    t0 = time.time()
    float(np.asarray(chained(main_p, ctrl_p, x, ts, ctx, sem)))
    compile_s = time.time() - t0
    times = []
    for _ in range(3):
        t = time.time()
        float(np.asarray(chained(main_p, ctrl_p, x, ts, ctx, sem)))
        times.append((time.time() - t) / N)
    step_ms = sorted(times)[len(times) // 2] * 1e3
    print(json.dumps({
        "metric": f"dit_cfg_step_sp{n_time}_shard_shape_per_chip_ms",
        "value": round(step_ms, 2),
        "unit": "ms",
        "layout": f"B_local=1 (data=2), tokens {S}//{n_time}={s_loc}, "
                  f"weights replicated, {n_time} forced local ring hops "
                  "per layer, zero wire (bench.py adds the overlap/wire "
                  "model)",
        "int8_scores_hops": os.environ.get("LANDIFF_ATTN_INT8", "1") == "1"
        and jax.default_backend() == "tpu",
    }))
    print(f"# compile {compile_s:.1f}s, per-step runs "
          f"{['%.3f' % t for t in times]}, attn={attn}")


if __name__ == "__main__":
    main()
