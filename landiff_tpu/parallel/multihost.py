"""Multi-host (TPU pod / multi-slice) runtime initialization.

TPU-native replacement for the reference's distributed bring-up: the
torch.distributed TCP-rendezvous init (reference arguments.py:215-299,
MASTER_ADDR/RANK env plumbing + SAT mpu group construction) and DeepSpeed's
init_distributed (arguments.py:271-281). Here there are no process groups to
carve: `jax.distributed.initialize` performs the rendezvous, after which
every process sees the GLOBAL device list, runs the SAME jitted SPMD program
over one `jax.sharding.Mesh`, and XLA lays collectives onto ICI within a
slice and DCN across slices. The only genuinely per-process concerns left
are data feeding (each host loads its disjoint shard slice —
`make_global_batch`) and primary-gated side effects (logging/metrics).

Single-process (including this machine's 1-chip tunnel and the CPU test
mesh) everything degrades to a no-op: `initialize()` returns False and
`make_global_batch` is exactly `jax.device_put(batch, sharding)`.
"""

from __future__ import annotations

import logging
import os

import jax

logger = logging.getLogger("landiff_tpu.multihost")

# env hints that indicate a coordinated multi-process launch. JAX's own
# cluster auto-detection covers Cloud TPU pods (megascale coordinator);
# these cover manual `--multihost` launches (torchrun-style env scheme,
# matching the reference's MASTER_ADDR plumbing, arguments.py:238-255).
_ENV_COORD = ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
              "MASTER_ADDR")


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None) -> bool:
    """Rendezvous if this looks like (or is declared as) a multi-process
    launch; idempotent. Returns True iff running multi-process afterwards.

    Explicit args win; otherwise env hints (JAX_COORDINATOR_ADDRESS /
    MASTER_ADDR + NUM_PROCESSES/WORLD_SIZE + PROCESS_ID/RANK); otherwise,
    on Cloud TPU pods, jax.distributed.initialize()'s own auto-detection.
    Plain single-process runs (no args, no env) skip the rendezvous
    entirely — they must not block waiting for a coordinator.
    """
    if coordinator_address is None:
        for k in _ENV_COORD:
            if os.environ.get(k):
                if k == "MASTER_ADDR" and not (os.environ.get("RANK")
                                               and os.environ.get(
                                                   "WORLD_SIZE")):
                    # a stray MASTER_ADDR (e.g. leaked from a torch
                    # launcher wrapper) without RANK/WORLD_SIZE is not a
                    # genuine torchrun-style launch — honoring it would
                    # block a single-process run in rendezvous
                    continue
                host = os.environ[k]
                if ":" in host:
                    coordinator_address = host
                else:
                    # jax.distributed.initialize needs host:port; default
                    # the torch launcher's conventional port when only
                    # MASTER_ADDR is set
                    port = os.environ.get("MASTER_PORT", "29500")
                    coordinator_address = f"{host}:{port}"
                break
    if num_processes is None:
        for k in ("NUM_PROCESSES", "WORLD_SIZE"):
            if os.environ.get(k):
                num_processes = int(os.environ[k])
                break
    if process_id is None:
        for k in ("PROCESS_ID", "RANK"):
            if os.environ.get(k):
                process_id = int(os.environ[k])
                break
    # TPU_WORKER_HOSTNAMES lists ALL pod workers comma-separated; a single
    # hostname is a single-host runtime (the axon tunnel plugin sets
    # TPU_WORKER_HOSTNAMES=localhost in-process) and must not trigger a
    # rendezvous that would block forever.
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    on_tpu_pod = ("," in hostnames
                  or bool(os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")))
    if coordinator_address is None and not on_tpu_pod:
        return False  # single-process launch: nothing to rendezvous
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id,
            local_device_ids=local_device_ids)
    except RuntimeError as e:  # already initialized (idempotence)
        if "already" not in str(e).lower():
            raise
    logger.info("multihost: process %d/%d, %d global / %d local devices",
                jax.process_index(), jax.process_count(),
                len(jax.devices()), len(jax.local_devices()))
    return jax.process_count() > 1


def is_primary() -> bool:
    return jax.process_index() == 0


def barrier(name: str = "landiff_barrier"):
    """Block until every process reaches this point (replaces
    torch.distributed.barrier; uses a tiny psum under the hood)."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def global_mesh(cfg=None):
    """Mesh over the GLOBAL device list, DCN-aware across slices.

    Within one slice this matches `mesh.make_mesh`. Across slices
    (multi-slice pods connected by DCN), the `data` axis is factored so
    the inter-slice dimension carries only DP all-reduces (gradient-sized,
    once per step) while `model`/`time` collectives stay on ICI — the
    layout SURVEY §5 prescribes ("DCN only across slices").
    """
    from landiff_tpu.config import MeshConfig
    from landiff_tpu.parallel import mesh as mesh_lib

    devices = jax.devices()
    if cfg is None:
        cfg = MeshConfig(data=len(devices), model=1)
    slices = sorted({getattr(d, "slice_index", 0) for d in devices})
    n_slices = len(slices)
    if n_slices <= 1:
        return mesh_lib.make_mesh(cfg, devices)
    assert cfg.num_devices == len(devices), (cfg, len(devices))
    assert cfg.data % n_slices == 0, (
        f"data axis {cfg.data} must divide over {n_slices} slices "
        "(the DCN dimension is carved out of data parallelism)")
    from jax.experimental import mesh_utils

    arr = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(cfg.data // n_slices, cfg.model, cfg.time),
        dcn_mesh_shape=(n_slices, 1, 1), devices=devices)
    return jax.sharding.Mesh(arr, mesh_lib.AXES)


def make_global_batch(batch, sharding):
    """Assemble per-process host batches into one globally-sharded array
    tree. Each process passes ITS OWN slice of the global batch (the
    loader's dp_rank/dp_size assignment); the result behaves like a single
    global array inside jit. Single-process this is jax.device_put."""
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), batch)
