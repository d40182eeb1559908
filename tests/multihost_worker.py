"""Subprocess worker for tests/test_multihost.py — a REAL multi-process
rendezvous (jax.distributed.initialize on localhost) with 4 virtual CPU
devices per process, exercising multihost.initialize / global_mesh /
make_global_batch / barrier and one actual stage-1 train step over the
global mesh (reference behavior: arguments.py:215-299 torch.distributed
rendezvous).

Usage: python multihost_worker.py <process_id> <num_processes> <port>
Prints "LOSS <float>" on success.
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=4").strip()
os.environ.setdefault("LANDIFF_SKIP_INIT", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from landiff_tpu.config import MeshConfig, tiny_test_config  # noqa: E402
from landiff_tpu.models import lm  # noqa: E402
from landiff_tpu.parallel import multihost  # noqa: E402
from landiff_tpu.training import lm_train  # noqa: E402


def main():
    is_multi = multihost.initialize(f"localhost:{port}", nproc, pid)
    assert is_multi, "rendezvous reported single-process"
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.local_devices()) == 4
    assert len(jax.devices()) == 4 * nproc
    assert multihost.is_primary() == (pid == 0)

    mesh = multihost.global_mesh(MeshConfig(data=2, model=4))
    assert mesh.devices.size == 8

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


if __name__ == "__main__":
    main()
