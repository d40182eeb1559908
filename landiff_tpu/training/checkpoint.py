"""Training checkpoint save/restore via orbax — the resume story the
reference leaves to DeepSpeed (SURVEY §5: "no training resume logic
in-tree"). Saves params + optimizer state + step atomically; restores onto
the current mesh/shardings."""

from __future__ import annotations

import logging
from pathlib import Path

logger = logging.getLogger("landiff_tpu.training")


def save_checkpoint(ckpt_dir: str | Path, step: int, params, opt_state,
                    extra: dict | None = None):
    import orbax.checkpoint as ocp

    ckpt_dir = Path(ckpt_dir).absolute()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    with ocp.CheckpointManager(str(ckpt_dir)) as mgr:
        payload = {"params": params, "opt_state": opt_state}
        if extra:
            payload["extra"] = extra
        mgr.save(step, args=ocp.args.StandardSave(payload))
        mgr.wait_until_finished()
    logger.info("saved checkpoint step %d to %s", step, ckpt_dir)


def restore_checkpoint(ckpt_dir: str | Path, template=None,
                       step: int | None = None):
    """Restore the latest (or given) step. `template` is a pytree of the
    expected structure (e.g. {'params': ..., 'opt_state': ...}); when given,
    restored arrays adopt its shardings/dtypes."""
    import orbax.checkpoint as ocp

    ckpt_dir = Path(ckpt_dir).absolute()
    with ocp.CheckpointManager(str(ckpt_dir)) as mgr:
        if step is None:
            step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
        if template is not None:
            restored = mgr.restore(
                step, args=ocp.args.StandardRestore(template))
        else:
            restored = mgr.restore(step)
    logger.info("restored checkpoint step %d from %s", step, ckpt_dir)
    return step, restored
