"""Subprocess worker for tests/test_multihost.py — a REAL multi-process
rendezvous (jax.distributed.initialize on localhost) with 4 virtual CPU
devices per process, exercising multihost.initialize / global_mesh /
make_global_batch / barrier over the global mesh (reference behavior:
arguments.py:215-299 torch.distributed rendezvous; the diffusion side's
distributed init is the same code path).

Modes:
  train      — one actual stage-1 LM train step (DP over the global mesh);
               prints "LOSS <float>".
  tp_denoise — the TP/DP DiT denoise shard_map program (the v5e-8 serving
               program, parallel/tp_infer.py) with the inference batch
               assembled via make_global_batch, i.e. the reference's
               broadcast semantics (diffusion_video.py:291-297) crossing a
               real process boundary; prints "STATS <mean> <mabs> <maxabs>".

Usage: python multihost_worker.py <process_id> <num_processes> <port> [mode]
"""

import os
import sys

if __name__ == "__main__":
    # env BEFORE jax import (script mode only; as an import the test
    # process's jax is already initialized and these would be no-ops)
    _pid, _nproc = int(sys.argv[1]), int(sys.argv[2])
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=4").strip()
    os.environ.setdefault("LANDIFF_SKIP_INIT", "1")

import jax  # noqa: E402

if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from landiff_tpu.config import MeshConfig, tiny_test_config  # noqa: E402
from landiff_tpu.models import lm  # noqa: E402
from landiff_tpu.parallel import multihost  # noqa: E402
from landiff_tpu.training import lm_train  # noqa: E402


def train_mode(mesh):
    cfg = tiny_test_config().llm
    params = lm.init(jax.random.PRNGKey(0), cfg, t5_dim=24)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    micro = {"frames": cfg.frames_per_segment, "motion_score": 0.1}
    step = lm_train.make_cond_train_step(opt, cfg, micro, cfg_drop_prob=0.5)

    B_global, n_text = 8, 3
    sched = lm.build_schedule(cfg, 1 + 2 + n_text + 1,
                              cfg.frames_per_segment)
    rng = np.random.default_rng(0)  # SAME global batch on every process
    t5_g = rng.standard_normal((B_global, n_text, 24)).astype(np.float32)
    codes_g = rng.integers(0, cfg.codebook_size,
                           (B_global, sched.num_visual)).astype(np.int32)

    # each process contributes ITS OWN addressable slice of the data axis
    nproc, pid = jax.process_count(), jax.process_index()
    rows = B_global // nproc
    sl = slice(pid * rows, (pid + 1) * rows)
    bsh = NamedSharding(mesh, P("data"))
    with mesh:
        batch = multihost.make_global_batch(
            {"t5": t5_g[sl], "codes": codes_g[sl]}, bsh)
        multihost.barrier("batch_ready")
        params, opt_state, loss = step(params, opt_state, batch["t5"],
                                       batch["codes"],
                                       jax.random.PRNGKey(42))
        loss = float(loss)
    multihost.barrier("step_done")
    assert np.isfinite(loss)
    print(f"LOSS {loss:.8f}", flush=True)


def tp_denoise_stats(mesh):
    """Build the tiny-config TP/DP denoise program on `mesh` and run ONE
    denoise call; returns (mean, mean|.|, max|.|) floats. Deterministic in
    the mesh-independent inputs, so a 2-process global (2,4) mesh must
    reproduce the single-process 8-device value. Shared by the worker
    (multi-process) and the in-test single-process ground truth."""
    from landiff_tpu.diffusion import schedule
    from landiff_tpu.models import dit as dit_lib
    from landiff_tpu.models import semantic_cond as sc_lib
    from landiff_tpu.parallel import tp_infer
    from landiff_tpu.utils import fill_zero_leaves

    cfg = tiny_test_config()
    d, t = cfg.dit, cfg.tokenizer
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    params = {
        "main": fill_zero_leaves(dit_lib.init(ks[0], d),
                                 jax.random.PRNGKey(20), scale=0.05),
        "control": fill_zero_leaves(
            dit_lib.init(ks[1], d, control=True),
            jax.random.PRNGKey(21), scale=0.05),
        "semantic": fill_zero_leaves(
            sc_lib.init(ks[2], t, cfg.semantic_cond),
            jax.random.PRNGKey(22), scale=0.05),
    }
    ctx = jax.random.normal(jax.random.PRNGKey(7),
                            (1, d.text_length, d.text_dim), jnp.float32)
    tokens = jnp.zeros((1, t.titok.latent_tokens), jnp.int32)
    x_host = np.asarray(jax.random.normal(
        ks[3], (1, d.latent_frames, d.in_channels, d.latent_height,
                d.latent_width), jnp.float32))
    tab = schedule.sampler_tables(cfg.sampler)
    step = {"alpha": jnp.float32(tab["alpha"][0]),
            "timestep": jnp.int32(tab["timestep"][0]),
            "idx": jnp.int32(tab["idx"][0]),
            "cfg_scale": jnp.float32(tab["cfg_scale"][0])}
    with mesh:
        dfn, b = tp_infer.make_tp_denoise_fn(
            params, mesh, d, cfg.sampler, t, cfg.semantic_cond, ctx,
            jnp.zeros_like(ctx), tokens, compute_dtype=jnp.float32,
            attn_impl="xla", int8=False)
        # the inference "global batch": initial noise is replicated on
        # every process (each passes the full array), the multi-process
        # analogue of the reference's rank-0 broadcast
        x = multihost.make_global_batch({"x": x_host},
                                        NamedSharding(mesh, P()))["x"]
        out = jax.jit(dfn)(x, step, b)
        stats = jax.jit(lambda o: (jnp.mean(o), jnp.mean(jnp.abs(o)),
                                   jnp.max(jnp.abs(o))))(out)
        return tuple(float(s) for s in stats)


def tp_denoise_mode(mesh):
    stats = tp_denoise_stats(mesh)
    multihost.barrier("denoise_done")
    print("STATS " + " ".join(f"{s:.8f}" for s in stats), flush=True)


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "train"
    is_multi = multihost.initialize(f"localhost:{port}", nproc, pid)
    assert is_multi, "rendezvous reported single-process"
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.local_devices()) == 4
    assert len(jax.devices()) == 4 * nproc
    assert multihost.is_primary() == (pid == 0)

    mesh = multihost.global_mesh(MeshConfig(data=2, model=4))
    assert mesh.devices.size == 8
    {"train": train_mode, "tp_denoise": tp_denoise_mode}[mode](mesh)


if __name__ == "__main__":
    main()
