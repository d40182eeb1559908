"""multihost.py: env-hint parsing (ADVICE r3), single-process degradation,
global_mesh single-slice equivalence, and a REAL 2-process localhost
rendezvous running one train step over the global mesh (VERDICT r3 #4)."""

import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from landiff_tpu.config import MeshConfig, tiny_test_config
from landiff_tpu.parallel import multihost
from landiff_tpu.parallel import mesh as mesh_lib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_initialize_noop_without_env(monkeypatch):
    for k in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
              "MASTER_ADDR", "MASTER_PORT", "RANK", "WORLD_SIZE",
              "NUM_PROCESSES", "PROCESS_ID", "TPU_WORKER_HOSTNAMES",
              "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(k, raising=False)
    assert multihost.initialize() is False


def test_stray_master_addr_is_ignored(monkeypatch):
    """A leaked MASTER_ADDR without RANK/WORLD_SIZE must NOT trigger a
    rendezvous (it would block a single-process run forever)."""
    for k in ("RANK", "WORLD_SIZE", "JAX_COORDINATOR_ADDRESS",
              "COORDINATOR_ADDRESS"):
        monkeypatch.delenv(k, raising=False)
    monkeypatch.setenv("MASTER_ADDR", "10.0.0.99")
    assert multihost.initialize() is False


def test_master_addr_gets_default_port(monkeypatch):
    """MASTER_ADDR + RANK/WORLD_SIZE but no MASTER_PORT must produce a
    host:port coordinator address (not a portless one)."""
    captured = {}

    def fake_init(coordinator_address=None, num_processes=None,
                  process_id=None, local_device_ids=None):
        captured.update(addr=coordinator_address, n=num_processes,
                        pid=process_id)
        raise RuntimeError("already initialized")  # idempotence path

    monkeypatch.setenv("MASTER_ADDR", "10.0.0.7")
    monkeypatch.delenv("MASTER_PORT", raising=False)
    monkeypatch.setenv("RANK", "1")
    monkeypatch.setenv("WORLD_SIZE", "2")
    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    multihost.initialize()
    assert captured["addr"] == "10.0.0.7:29500"
    assert captured["n"] == 2 and captured["pid"] == 1


def test_global_mesh_single_slice_matches_make_mesh():
    cfg = MeshConfig(data=2, model=4)
    got = multihost.global_mesh(cfg)
    want = mesh_lib.make_mesh(cfg, jax.devices())
    assert got.axis_names == want.axis_names
    assert got.devices.shape == want.devices.shape
    np.testing.assert_array_equal(
        np.vectorize(lambda d: d.id)(got.devices),
        np.vectorize(lambda d: d.id)(want.devices))


def test_make_global_batch_single_process():
    mesh = mesh_lib.make_mesh(MeshConfig(data=2, model=4), jax.devices())
    sh = NamedSharding(mesh, P("data"))
    x = np.arange(32, dtype=np.float32).reshape(8, 4)
    out = multihost.make_global_batch({"x": x}, sh)
    assert out["x"].sharding == sh
    np.testing.assert_array_equal(np.asarray(out["x"]), x)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(mode, marker):
    """Launch 2 REAL processes x 4 virtual CPU devices, rendezvous via
    jax.distributed.initialize over the global (2,4) mesh; return each
    worker's last `marker`-prefixed output line split into floats."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device flag
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    worker = os.path.join(REPO, "tests", "multihost_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", str(port), mode],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
    rows = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith(marker)]
        assert lines, out[-4000:]
        rows.append([float(v) for v in lines[-1].split()[1:]])
    return rows


def test_two_process_rendezvous_train_step():
    """2-process global-mesh stage-1 train step — both processes must
    report the SAME finite loss, equal to the single-process value."""
    outs = _run_workers("train", "LOSS")
    losses = [row[0] for row in outs]
    assert np.isfinite(losses).all()
    # both processes computed the same global loss
    assert abs(losses[0] - losses[1]) < 1e-6, losses

    # single-process ground truth on the 8-virtual-device mesh
    from landiff_tpu.models import lm
    from landiff_tpu.training import lm_train

    cfg = tiny_test_config().llm
    params = lm.init(jax.random.PRNGKey(0), cfg, t5_dim=24)
    opt = optax.adam(1e-3)
    micro = {"frames": cfg.frames_per_segment, "motion_score": 0.1}
    step = lm_train.make_cond_train_step(opt, cfg, micro, cfg_drop_prob=0.5)
    sched = lm.build_schedule(cfg, 1 + 2 + 3 + 1, cfg.frames_per_segment)
    rng = np.random.default_rng(0)
    t5 = rng.standard_normal((8, 3, 24)).astype(np.float32)
    codes = rng.integers(0, cfg.codebook_size,
                         (8, sched.num_visual)).astype(np.int32)
    _, _, loss = step(params, opt.init(params), jnp.asarray(t5),
                      jnp.asarray(codes), jax.random.PRNGKey(42))
    assert abs(float(loss) - losses[0]) < 5e-6, (float(loss), losses[0])


def test_two_process_tp_denoise_inference():
    """VERDICT r4 #7: the TP/DP DiT denoise shard_map program (the v5e-8
    SERVING program, parallel/tp_infer.py) crossing a real process
    boundary — 2 processes x 4 CPU devices, global (2,4) mesh, inference
    batch via make_global_batch (reference broadcast semantics,
    diffusion_video.py:291-297 + arguments.py:215-299's diffusion-side
    distributed init). Both processes must report identical output stats,
    equal to the single-process 8-device run of the SAME builder."""
    outs = _run_workers("tp_denoise", "STATS")
    assert np.isfinite(outs).all(), outs
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-6, atol=1e-7)

    import multihost_worker

    mesh = mesh_lib.make_mesh(MeshConfig(data=2, model=4), jax.devices())
    want = multihost_worker.tp_denoise_stats(mesh)
    np.testing.assert_allclose(outs[0], want, rtol=2e-5, atol=1e-6)
