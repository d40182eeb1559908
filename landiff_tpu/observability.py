"""Observability: profiling traces, named scopes, step timers, determinism.

The reference has a single torch.profiler annotation and tqdm bars
(SURVEY §5); the TPU-native kit is the jax profiler + named scopes plus a
tiny metrics registry for loss dicts (replacing sgm's print_rank0 and the
ExtraLossRegistry reporting in loss.py:186-202).
"""

from __future__ import annotations

import contextlib
import json
import logging
import time
from collections import defaultdict
from pathlib import Path

import jax
import numpy as np

logger = logging.getLogger("landiff_tpu")


@contextlib.contextmanager
def trace(trace_dir: str = "/tmp/landiff_trace"):
    """Capture a jax profiler trace (view with xprof/tensorboard)."""
    jax.profiler.start_trace(trace_dir)
    try:
        yield trace_dir
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", trace_dir)


def named_scope(name: str):
    """Annotate a region for the profiler (the jax analogue of the
    reference's @torch.profiler.record_function, blocks.py:143)."""
    return jax.named_scope(name)


class StepTimer:
    """Wall-clock step timer with EMA; device-sync via block_until_ready on
    a representative output."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.avg_s: float | None = None
        self._t0: float | None = None

    def start(self):
        self._t0 = time.time()

    def stop(self, sync_on=None) -> float:
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        dt = time.time() - self._t0
        self.avg_s = dt if self.avg_s is None else (
            self.ema * self.avg_s + (1 - self.ema) * dt)
        return dt


class MetricsLogger:
    """Accumulate scalar metrics per step; dump JSONL (wandb-free
    observability; the reference lists wandb as a dep but never imports it)."""

    def __init__(self, path: str | None = None):
        self.path = Path(path) if path else None
        self.history: list[dict] = []
        self._accum = defaultdict(list)

    def log(self, step: int, **metrics):
        row = {"step": step}
        for k, v in metrics.items():
            row[k] = float(np.asarray(v))
        self.history.append(row)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(row) + "\n")

    def last(self) -> dict:
        return self.history[-1] if self.history else {}


def device_memory_stats(device=None) -> dict:
    """HBM usage snapshot (bytes_in_use / peak / limit where the backend
    reports them)."""
    if device is None:
        device = jax.devices()[0]
    try:
        stats = device.memory_stats() or {}
    except Exception:
        stats = {}
    return {k: stats[k] for k in ("bytes_in_use", "peak_bytes_in_use",
                                  "bytes_limit") if k in stats}


def set_deterministic(seed: int):
    """Determinism knobs (reference set_seed_for_single_process,
    utils.py:409-414): jax is deterministic by construction given keys; this
    seeds numpy for any host-side randomness and returns a root PRNG key."""
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
