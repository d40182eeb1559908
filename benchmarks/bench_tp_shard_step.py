"""Measure the FULL per-chip TP shard-shape CFG denoise step on ONE v5e.

The v5e-8 projection (bench.py mesh mode) previously combined a MEASURED
per-chip attention time (11.69 ms/call at the TP=4 shard shape) with an
IDEAL /8 scaling assumption for everything else. That assumption is not
conservative: under Megatron TP the LayerNorm/modulate/elementwise work
runs on REPLICATED activations — it shards over `data` (B 2->1) but not
over `model`, so its per-chip cost is /2, not /8.

This benchmark removes the assumption: it runs the COMPLETE per-device
program of the `--mesh data=2,model=4` serving layout
(dit.control_warp_forward_tp — the exact function tp_infer's shard_map
invokes, 30 main + 15 control layers) on one real chip, with the true
per-chip shard of everything:

  - one CFG row (B_local = 1; the rows ride the data axis),
  - tp-prepped layer weights sliced to ONE model shard (8 of the 32
    zero-padded heads, mlp hidden /4) via the same prep_dit_tp +
    dit_tp_specs the serving path uses,
  - psums executed over a size-1 `model` axis (identity -> no wire), so
    the measurement is pure per-chip compute; bench.py adds the counted
    all-reduces at the documented ring-ICI model on top.

Result feeds bench.py mesh mode via LANDIFF_BENCH_TPSHARD_MS.

Measured (1x v5e, bf16, int8-scores attention default, r4): see PARITY.md
"Measured" and the default recorded in bench.py.
"""

import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from landiff_tpu.utils import enable_compile_cache
enable_compile_cache()

from landiff_tpu.config import DiTConfig  # noqa: E402
from landiff_tpu.models import dit as dit_lib  # noqa: E402
from landiff_tpu.parallel import tp_infer  # noqa: E402


def shard_slice(tree, specs, tp: int, index: int = 0):
    """Take one model shard of a tp-prepped param tree: slice 1/tp of any
    axis whose PartitionSpec names the TP axis (shard `index`; shard 0
    holds 8 REAL heads of the 30+2pad layout — pad lives in the last
    shard; for timing the values are irrelevant anyway)."""
    def one(x, spec):
        for ax, names in enumerate(spec):
            if names is None:
                continue
            names = names if isinstance(names, tuple) else (names,)
            if tp_infer.TP_AXIS in names:
                n = x.shape[ax] // tp
                return jax.lax.slice_in_dim(x, index * n, (index + 1) * n,
                                            axis=ax)
        return x

    return jax.tree_util.tree_map(one, tree, specs,
                                  is_leaf=lambda v: isinstance(v, jnp.ndarray)
                                  or isinstance(v, np.ndarray))


def main():
    tp = int(os.environ.get("LANDIFF_BENCH_TP", "4"))
    attn = os.environ.get("LANDIFF_BENCH_ATTN", "auto")
    cfg = DiTConfig()
    scale = float(os.environ.get("LANDIFF_BENCH_SCALE", "1.0"))
    if scale < 1.0:  # CPU smoke path (plumbing check, not a timing)
        cfg = dataclasses.replace(
            cfg, num_layers=max(2, int(cfg.num_layers * scale)),
            control_layers=max(1, int(cfg.control_layers * scale)),
            hidden_size=max(128, int(cfg.hidden_size * scale) // 64 * 64),
            num_heads=max(tp, int(cfg.num_heads * scale)),
            latent_frames=2, latent_height=12, latent_width=18,
            text_length=16)
    dt = jnp.bfloat16

    int8 = os.environ.get("LANDIFF_DIT_INT8") == "1"

    # Build init -> tp-prep (-> int8 quantize) -> one-shard slice inside a
    # single jit program: holding the full bf16 trees AND the prepped
    # copies as separate live buffers OOMs the 16 GB chip in the int8
    # variant; under jit XLA frees each layer's intermediates as the
    # slices are produced.
    def build_local():
        main_p = dit_lib.init(jax.random.PRNGKey(0), cfg, dtype=dt)
        ctrl_p = dit_lib.init(jax.random.PRNGKey(1), cfg, control=True,
                              dtype=dt)
        mp = tp_infer.prep_dit_tp(main_p, cfg, tp, int8=int8)
        cp = tp_infer.prep_dit_tp(ctrl_p, cfg, tp, int8=int8)
        return (shard_slice(mp, tp_infer.dit_tp_specs(mp), tp),
                shard_slice(cp, tp_infer.dit_tp_specs(cp), tp))

    main_local, ctrl_local = jax.jit(build_local)()

    # per-chip inputs of the data=2 x model=tp layout: ONE CFG row
    B = 1
    x = jax.random.normal(jax.random.PRNGKey(2),
                          (B, cfg.latent_frames, cfg.in_channels,
                           cfg.latent_height, cfg.latent_width), dt)
    ts = jnp.full((B,), 999.0, jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(3),
                            (B, cfg.text_length, cfg.text_dim), dt)
    sem = jnp.zeros_like(x)

    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                (tp_infer.DATA_AXIS, tp_infer.TP_AXIS))

    def local_net(mp, cp, x2, ts2, ctx2, sem2):
        return dit_lib.control_warp_forward_tp(
            mp, cp, x2, ts2, ctx2, cfg, sem2, axis=tp_infer.TP_AXIS,
            attn_impl=attn, compute_dtype=dt)

    rep = jax.tree_util.tree_map(lambda _: P(), (main_local, ctrl_local,
                                                 x, ts, ctx, sem))
    net = jax.shard_map(local_net, mesh=mesh, in_specs=rep, out_specs=P(),
                        check_vma=False)

    def denoise_step(mp, cp, xc, ts2, ctx2, sem2):
        out = net(mp, cp, xc, ts2, ctx2, sem2)
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
    float(np.asarray(chained(main_local, ctrl_local, x, ts, ctx, sem)))
    compile_s = time.time() - t0
    times = []
    for _ in range(3):
        t = time.time()
        float(np.asarray(chained(main_local, ctrl_local, x, ts, ctx, sem)))
        times.append((time.time() - t) / N)
    step_ms = sorted(times)[len(times) // 2] * 1e3
    print(json.dumps({
        "metric": f"dit_cfg_step_tp{tp}_shard_shape_per_chip_ms",
        "value": round(step_ms, 2),
        "unit": "ms",
        "layout": f"B_local=1 (data=2), heads {tp_infer.pad_heads(cfg.num_heads, tp)}//{tp}, "
                  f"mlp {4 * cfg.hidden_size}//{tp}, psum over size-1 axis "
                  "(compute only; bench.py adds the counted-AR ICI model)",
        "int8_w8a8": int8,
    }))
    print(f"# compile {compile_s:.1f}s, per-step runs "
          f"{['%.3f' % t for t in times]}, attn={attn}")


if __name__ == "__main__":
    main()
