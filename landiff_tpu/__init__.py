"""landiff-tpu: TPU-native (JAX/XLA/Pallas) text-to-video framework with the
capabilities of LanDiff (arXiv:2503.04606).

Checkpoint bootstrap mirrors the reference (landiff/__init__.py:31-50):
importing the package resolves LANDIFF_HOME -> ./ckpts/LanDiff -> HF download,
verifies the MD5 manifest and exposes `landiff_tpu.MODEL_PATH`. The bootstrap
is lazy-by-default here (set LANDIFF_EAGER_INIT=1 for reference behavior) so
that unit tests and offline use never touch the network.
"""

from __future__ import annotations

import logging
import os

__version__ = "0.1.0"

logger = logging.getLogger("landiff_tpu")

MODEL_PATH: str | None = None


def initialize_model_path(required: bool = False) -> str | None:
    """Resolve and cache the checkpoint directory (see ckpt/resolve.py)."""
    global MODEL_PATH
    if MODEL_PATH is not None:
        return MODEL_PATH
    from landiff_tpu.ckpt.resolve import initialize_landiff_model_path

    try:
        MODEL_PATH = initialize_landiff_model_path()
    except Exception as e:  # mirror reference graceful degradation (__init__.py:40-46)
        if required:
            raise
        logger.warning("landiff-tpu checkpoint bootstrap failed: %s", e)
        MODEL_PATH = None
    return MODEL_PATH


if os.environ.get("LANDIFF_EAGER_INIT", "0") == "1" and os.environ.get(
        "LANDIFF_SKIP_INIT", "0") != "1":
    initialize_model_path(required=False)
