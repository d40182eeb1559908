"""Shared utilities (reference: landiff/utils.py).

Pure-JAX / stdlib; no torch at runtime.
"""

from __future__ import annotations

import hashlib
import logging
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("landiff_tpu")


# LANDIFF_FAST — the measured serving fast presets (DEPLOYMENT.md), tiered:
#   level 1: every quantization knob whose compound drift is test-gated.
#     int8-scores attention is already the inference default; adds W8A8 DiT
#     linears (-4.1% step time measured, tests/test_dit_int8_drift.py) and
#     weight-only int8 stage-1 decode (8.3 s vs 11.7 s measured,
#     tests/test_fast_preset.py gates the combination).
#   level 2 ("turbo"): level 1 + the quality-traded SCHEDULE accelerators
#     measured at production shape (r5, benchmarks/bench_step_reuse.py /
#     bench_cfg_window.py, PARITY.md): cross-step model-output reuse
#     (LANDIFF_STEP_REUSE=2 — 28/50 model calls, latent corr 0.9995 vs
#     exact) and the guidance window (LANDIFF_CFG_WINDOW=2,44 — cond-only
#     rows outside the interval, phase 204.4 s vs 222.1 exact = 1.087x,
#     corr 0.99995; static segment programs, samplers.py).
# An explicitly-set knob always wins over any preset level.
_FAST_PRESET = {"LANDIFF_DIT_INT8": (1, True),
                "LANDIFF_DECODE_INT8": (1, True)}
_FAST_VALUES = {"LANDIFF_STEP_REUSE": (2, "2"),
                "LANDIFF_CFG_WINDOW": (2, "2,44")}


def fast_level() -> int:
    """Numeric LANDIFF_FAST level (0 = off; legacy truthy strings = 1)."""
    v = os.environ.get("LANDIFF_FAST", "")
    if not v:
        return 0
    try:
        return int(v)
    except ValueError:
        return 0 if v.lower() in ("0", "false", "no") else 1


def stable_hash(key: str) -> int:
    """Run-stable hash (reference utils.py:317-324): first 20 hex digits of
    sha256, as an int. Used to derive per-prompt seeds."""
    return int(hashlib.sha256(key.encode()).hexdigest()[:20], 16)


def seed_from_text(text: str, seed: int) -> int:
    """Combined seed used by the diffusion stage (dif_infer.py:190-194)."""
    return (stable_hash(text) + seed) % (2**31)


def top_p_filter_probs(probs: jax.Array, top_p: float) -> jax.Array:
    """Nucleus filtering over a probability vector (utils.py:345-360).

    Keeps the smallest prefix of descending-sorted probs whose cumsum is
    < top_p, always keeping the top-1; renormalizes. Jit-safe.
    """
    sorted_probs = jnp.sort(probs, axis=-1)[..., ::-1]
    cum = jnp.cumsum(sorted_probs, axis=-1)
    # reference: remove where shifted cumsum >= top_p (first element kept)
    remove_sorted = cum >= top_p
    remove_sorted = jnp.concatenate(
        [jnp.zeros_like(remove_sorted[..., :1]), remove_sorted[..., :-1]], axis=-1)
    # threshold value: smallest kept prob
    kept = jnp.where(remove_sorted, jnp.inf, sorted_probs)
    thresh = jnp.min(kept, axis=-1, keepdims=True)
    out = jnp.where(probs >= thresh, probs, 0.0)
    return out / jnp.sum(out, axis=-1, keepdims=True)


def top_k_filter_logits(logits: jax.Array, k: int) -> jax.Array:
    """Standard top-k: logits below the k-th largest -> -inf. k<=0 disables.
    Note `k` must be static under jit."""
    if k <= 0:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, -jnp.inf, logits)


def cthw_to_uint8(video: np.ndarray) -> np.ndarray:
    """(C,T,H,W) float in [0,1] -> (T,H,W,C) uint8 (utils.py:328-332)."""
    assert video.ndim == 4
    imgs = np.transpose(np.asarray(video), (1, 2, 3, 0)) * 255.0
    return np.clip(imgs, 0, 255).astype(np.uint8)


def save_video_tensor(video, video_path: str, fps: int = 8) -> Path:
    """Write a (C,T,H,W) float video in [0,1] to mp4 (utils.py:334-343).
    Falls back to GIF when no ffmpeg backend is available (offline images);
    returns the path actually written."""
    import imageio

    images = cthw_to_uint8(np.asarray(video))
    path = Path(video_path)
    path.parent.mkdir(parents=True, exist_ok=True)
    try:
        with open(path, "wb") as f:
            with imageio.get_writer(f, format="mp4", fps=fps) as writer:
                for image in images:
                    writer.append_data(image)
        return path
    except Exception as e:  # no ffmpeg plugin: pure-python MJPEG-AVI muxer
        from landiff_tpu.video_io import write_mjpeg_avi

        logger.warning("mp4 writer unavailable (%s); writing MJPEG AVI", e)
        path.unlink(missing_ok=True)
        return write_mjpeg_avi(images, path.with_suffix(".avi"), fps)


def count_params(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def tree_cast(params, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        params)


def fill_zero_leaves(tree, key, scale: float = 0.02):
    """Replace all-zero floating array leaves with small random normals.

    Test/bench helper: LanDiff zero-inits its gating params (DiT adaLN
    tables, ControlNet zero_linears, semantic-conditioner conv_out —
    dit_video_concat.py:1210-1218, cogvideox yaml zero-init convention),
    so a freshly-`init`ed model's output is INDEPENDENT of the attention /
    MLP / control subpaths — gates multiply them by exactly 0. Any parity
    check (TP sharding, quantized kernels) run on raw init params would
    pass vacuously. Fill the zeros before asserting parity."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(key, max(len(leaves), 1))
    out = []
    for k, leaf in zip(keys, leaves):
        if (hasattr(leaf, "dtype") and hasattr(leaf, "shape")
                and jnp.issubdtype(leaf.dtype, jnp.floating)
                and leaf.size > 0 and not bool(jnp.any(leaf != 0))):
            leaf = jax.random.normal(k, leaf.shape, leaf.dtype) * scale
        out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def freeze_tree(params):
    """Gradient-freeze a param subtree (the reference's freeze_model,
    utils.py:220-275, whose purpose is (a) no grads and (b) exclusion from
    saved state): wrap leaves in stop_gradient at use. For (b), exclude the
    subtree from the pytree passed to the optimizer/checkpointer."""
    return jax.tree_util.tree_map(jax.lax.stop_gradient, params)


def enable_compile_cache() -> str:
    """Point XLA's persistent compilation cache at a directory that
    SURVIVES across sessions/rounds.

    Every bench/pipeline process used /tmp/landiff_jax_cache, but /tmp is
    wiped between rounds — which is exactly the BENCH_r04 "compile-time
    regression" (943 s vs 161 s for the same program): r4's first bench
    process paid a full cold compile of the 45-layer program because the
    r3 cache no longer existed. Default is <repo>/.jax_cache (gitignored);
    LANDIFF_JAX_CACHE_DIR overrides; LANDIFF_CACHE_DEBUG=1 additionally
    logs why any compile misses the cache."""
    path = os.environ.get("LANDIFF_JAX_CACHE_DIR")
    if not path:
        path = str(Path(__file__).resolve().parent.parent / ".jax_cache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    if os.environ.get("LANDIFF_CACHE_DEBUG") == "1":
        jax.config.update("jax_explain_cache_misses", True)
    return path


def env_flag(name: str, default: bool = False) -> bool:
    """Read a boolean env knob. An explicit setting always wins; otherwise
    LANDIFF_FAST>=level turns on the knobs in its preset (see
    _FAST_PRESET); otherwise `default`."""
    v = os.environ.get(name)
    if v is None:
        if name in _FAST_PRESET and fast_level() >= _FAST_PRESET[name][0]:
            return _FAST_PRESET[name][1]
        return default
    return v.lower() not in ("0", "false", "no", "")


def env_value(name: str, default: str = "") -> str:
    """Read a string-valued env knob with fast-preset fallback: an explicit
    setting always wins; otherwise LANDIFF_FAST>=level supplies the preset
    value (see _FAST_VALUES); otherwise `default`."""
    v = os.environ.get(name)
    if v is not None:
        return v
    if name in _FAST_VALUES and fast_level() >= _FAST_VALUES[name][0]:
        return _FAST_VALUES[name][1]
    return default
