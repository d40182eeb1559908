"""Samplers: VPSDE-DPM++2M (the LanDiff default) and Video-DDIM, as pure
scan loops over host-precomputed f64 coefficient tables.

Reference: sgm/modules/diffusionmodules/sampling.py — VideoDDIMSampler
(:538-675), VPSDEDPMPP2MSampler (:678-837). The reference's per-step Python
loop with tqdm becomes one `lax.scan` over stacked per-step coefficients;
the `fixed_frames` prefix splice (the streaming/long-video mechanism,
:800-817, 834-836) happens inside the scan body.

denoise_fn contract (provided by the engine):
    denoised = denoise_fn(x, step) -> fp32 array like x
where `step` is a dict of per-step scalars:
    {"alpha": f32, "timestep": i32, "idx": i32, "cfg_scale": f32}
The engine closes over cond/uc and implements CFG batching + the
DiscreteDenoiser wrapping (denoiser.py:25-77).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from landiff_tpu.config import SamplerConfig
from landiff_tpu.diffusion import schedule as sched

# Always-compute window defaults for cross-step model-output reuse
# (LANDIFF_STEP_REUSE). Single source of truth — benchmarks and tests that
# need the compute schedule must call reuse_compute_schedule, not re-derive.
REUSE_HEAD_DEFAULT = 3
REUSE_TAIL_DEFAULT = 3


def reuse_compute_schedule(n: int, reuse_every: int,
                           head: int = REUSE_HEAD_DEFAULT,
                           tail: int = REUSE_TAIL_DEFAULT) -> np.ndarray:
    """Per-step compute mask for LANDIFF_STEP_REUSE (bool[n]; True = call
    the model, False = reuse the cached residual).

    head is clamped >= 1 (step 0 must compute — the residual carry is
    zeros-initialised) and tail is clamped >= 1 (the final is_last step
    passes `denoised` through as the sample output; skipping it would
    return a pure first-order extrapolation — a far larger quality cliff
    than any middle-step reuse)."""
    head = max(1, int(head))
    tail = max(1, int(tail))
    compute = np.ones(n, bool)
    for i in range(head, n - tail):
        compute[i] = (i - head) % int(reuse_every) == 0
    return compute


def _per_step_arrays(cfg: SamplerConfig):
    t = sched.sampler_tables(cfg)
    n = cfg.num_steps
    m1 = np.zeros(n)
    m2 = np.zeros(n)
    m3 = np.zeros(n)
    m4 = np.zeros(n)
    mn = np.zeros(n)
    first_order = np.zeros(n, bool)
    for i in range(n):
        a, an, ap = t["alpha"][i], t["alpha_next"][i], t["alpha_prev"][i]
        c1, c2, c3, c4, cn = sched.dpmpp2m_coeffs(a, an, ap)
        m1[i], m2[i], mn[i] = c1, c2, cn
        if c3 is None or an < 1e-14:
            first_order[i] = True
        else:
            m3[i], m4[i] = c3, c4
    return t, {
        "m1": m1, "m2": m2, "m3": m3, "m4": m4, "mn": mn,
        "first_order": first_order,
        "is_last": t["idx"] == 1,
        "alpha": t["alpha"],
        "timestep": t["timestep"],
        "idx": t["idx"],
        "cfg_scale": t["cfg_scale"],
    }


def cfg_window_schedule(n: int, lo: int, hi: int) -> np.ndarray:
    """Per-step guidance mask for LANDIFF_CFG_WINDOW (bool[n]; True = run
    both CFG rows, False = cond-only row). Guidance applies on steps in
    [lo, hi); negative hi counts from the end (hi=-3 -> n-3)."""
    hi = hi if hi >= 0 else n + hi
    mask = np.zeros(n, bool)
    mask[max(0, lo):max(0, min(n, hi))] = True
    return mask


@functools.lru_cache(maxsize=16)
def _dpmpp2m_chunk_program(denoise_fn, fixed_frames: int, sdedit: bool,
                           pass_params: bool, reuse: bool = False,
                           row_mode: str = "full"):
    """Build the jitted chunked-scan program for one denoise_fn.

    Cached so repeated sampler invocations with the same denoise_fn (warm
    pass then timed pass; one call per long-video segment) reuse the SAME
    jit wrapper — a fresh `jax.jit` closure per call re-traces the whole
    45-layer DiT body every time (seconds of host time per sample_latents
    call at production scale, silently attributed to "diffusion").
    denoise_fn must not capture model weights (the engine passes them via
    `params` precisely for this; see make_denoise_fn's bundle contract).

    `reuse=True` builds the cross-step model-output-reuse variant
    (LANDIFF_STEP_REUSE, see vpsde_dpmpp2m_sample): the carry grows a
    cached residual (denoised − x) and each step's per-step boolean
    `step["compute"]` selects, via lax.cond, between the real model call
    and the cached first-order extrapolation `x + resid`. The reuse=False
    program is byte-identical to the pre-feature one so the serving
    default's compiled programs (and their measured timings) are
    untouched.

    `row_mode="cond"` builds the guidance-window companion program
    (LANDIFF_CFG_WINDOW): every step in this program calls
    `denoise_fn.cond_only` (half the model rows) instead of the full
    two-row CFG call — STATICALLY. The sampler partitions the schedule
    into contiguous window segments and dispatches the matching program
    per segment; there is NO per-step lax.cond. (A per-step-branch
    variant was built and MEASURED SLOWER than exact at production shape
    — 284.7 vs 244.8 s for 8 skipped uncond rows — while the cond-only
    row in isolation costs exactly half a full step, 2.23 vs 4.44 s: the
    two-branch scan body defeated XLA/Mosaic cross-step optimization.
    Static segmentation keeps both programs at their measured speeds;
    PARITY.md.) Composes with reuse (a reused step calls no model at
    all; a computed step then uses this program's row count).
    """
    cond_only = getattr(denoise_fn, "cond_only", None)
    if row_mode == "cond" and cond_only is None:
        raise ValueError(
            "cfg_window requested but denoise_fn has no .cond_only variant "
            "(engine.make_denoise_fn provides one; mesh paths: tp_infer)")

    def body(params, prefix, carry, step):
        if reuse:
            x, old_d, resid, key = carry
        else:
            x, old_d, key = carry
        key, k_noise, k_prefix = jax.random.split(key, 3)
        if fixed_frames > 0:
            if sdedit:
                rd = jax.random.normal(k_prefix, prefix.shape, jnp.float32)
                noised = (step["alpha"] * prefix
                          + rd * jnp.sqrt(1.0 - step["alpha"] ** 2))
                x = jnp.concatenate([noised, x[:, fixed_frames:]], axis=1)
            else:
                x = jnp.concatenate([prefix, x[:, fixed_frames:]], axis=1)

        def call_model(x):
            fn = cond_only if row_mode == "cond" else denoise_fn
            if pass_params:
                return fn(x, step, params).astype(jnp.float32)
            return fn(x, step).astype(jnp.float32)

        if reuse:
            denoised, resid = jax.lax.cond(
                step["compute"],
                lambda x, r: (lambda d: (d, d - x))(call_model(x)),
                lambda x, r: (x + r, r),
                x, resid)
        else:
            denoised = call_model(x)
        noise = jax.random.normal(k_noise, x.shape, jnp.float32)
        x_std = step["m1"] * x - step["m2"] * denoised + step["mn"] * noise
        denoised_d = step["m3"] * denoised - step["m4"] * old_d
        x_adv = step["m1"] * x - step["m2"] * denoised_d + step["mn"] * noise
        x_new = jnp.where(step["first_order"], x_std, x_adv)
        x_new = jnp.where(step["is_last"], denoised, x_new)
        if reuse:
            return (x_new, denoised, resid, key), None
        return (x_new, denoised, key), None

    @functools.partial(jax.jit, static_argnames=("m",))
    def scan_chunk(params, prefix, carry, coeffs, s0, *, m):
        # slice the per-step coefficient tables INSIDE the compiled
        # program: host-side tree_map slicing of device arrays costs ~10
        # tiny executions per chunk, each paying the remote-tunnel
        # dispatch latency (~35 ms) — measurable at production scale
        # (50 steps, chunk 5 => 100 extra dispatches)
        sl = jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_slice_in_dim(a, s0, m, 0), coeffs)
        return jax.lax.scan(
            lambda cc, ss: body(params, prefix, cc, ss), carry, sl)[0]

    return scan_chunk


def vpsde_dpmpp2m_sample(
    denoise_fn: Callable,
    x: jax.Array,
    cfg: SamplerConfig,
    *,
    key: jax.Array,
    fixed_frames: int = 0,
    sdedit: bool = False,
    max_steps_per_call: int | None = None,
    params=None,
    reuse_every: int = 0,
    reuse_head: int = REUSE_HEAD_DEFAULT,
    reuse_tail: int = REUSE_TAIL_DEFAULT,
    cfg_window: tuple[int, int] | None = None,
) -> jax.Array:
    """DPM-Solver++(2M) SDE in VP parameterization.

    Args:
      x: (B, T, C, H, W) — initial noise; if fixed_frames > 0, x[:, :f] are
        the clean prefix latents (spliced back every step).
      max_steps_per_call: run the scan in chunks of at most this many steps
        per device execution (remote-attached runtimes can kill very long
        single executions); None = one scan.
      params: optional pytree passed through to denoise_fn(x, step, params)
        as an explicit jit argument — REQUIRED for big models so weights
        enter the compiled step as inputs, not multi-GB captured constants.
      reuse_every: cross-step model-output reuse (TPU serving accelerator
        beyond the reference; quality-affecting, OFF by default — the
        FORA/TeaCache family of training-free DiT caches). k>1 means: in
        the middle of the schedule only every k-th step calls the model;
        the others reuse the last computed residual (denoised − x) as a
        first-order extrapolation `x + resid`. The first `reuse_head` and
        last `reuse_tail` steps always compute (the 2M multistep warms up
        on real outputs; the final steps set the output's detail and the
        is_last denoised passthrough). The stochastic path (noise draws)
        is identical to the exact sampler, so drift is purely the model
        approximation.
      reuse_head/reuse_tail: always-compute windows (head clamped ≥ 1:
        step 0 must compute or the residual would be the zeros init; tail
        clamped ≥ 1: the is_last step's denoised passthrough IS the sample
        output and must come from a real model call).
      cfg_window: optional (lo, hi) guidance interval (LANDIFF_CFG_WINDOW;
        quality-affecting, OFF by default — the training-free
        guidance-interval technique, Kynkäänniemi et al. 2024). Steps in
        [lo, hi) run full two-row CFG; outside, only the cond row runs
        (HALF the model rows, equivalent to cfg_scale=1 there). hi < 0
        counts from the end. Requires denoise_fn.cond_only. Composes with
        reuse_every. Windows the reference's DynamicCFG (guiders.py:58-79).
    """
    _, c = _per_step_arrays(cfg)
    n = cfg.num_steps
    reuse = reuse_every is not None and reuse_every > 1
    gw = cfg_window is not None
    if reuse:
        c = dict(c)
        c["compute"] = reuse_compute_schedule(n, reuse_every, reuse_head,
                                              reuse_tail)
    dev = lambda a, dt=jnp.float32: jnp.asarray(a, dt)
    coeffs = {k: dev(v, jnp.float32 if v.dtype != bool else jnp.bool_)
              for k, v in c.items() if k not in ("timestep", "idx")}
    coeffs["timestep"] = dev(c["timestep"], jnp.int32)
    coeffs["idx"] = dev(c["idx"], jnp.int32)

    prefix = x[:, :fixed_frames] if fixed_frames > 0 else None
    x = x.astype(jnp.float32)

    make_prog = lambda mode: _dpmpp2m_chunk_program(
        denoise_fn, fixed_frames, bool(sdedit), params is not None, reuse,
        mode)
    if gw:
        # STATIC window segmentation: contiguous runs of equal window
        # membership each dispatch their own (full | cond-only) program —
        # no per-step branching, the in-window program is the exact
        # default one (see _dpmpp2m_chunk_program docstring)
        mask = cfg_window_schedule(n, *cfg_window)
        scan_full, scan_cond = make_prog("full"), make_prog("cond")
        segments = []
        s0 = 0
        for i in range(1, n + 1):
            if i == n or mask[i] != mask[s0]:
                segments.append((s0, i, bool(mask[s0])))
                s0 = i
    else:
        scan_full = make_prog("full")
        segments = [(0, n, True)]

    if reuse:
        carry = (x, jnp.zeros_like(x), jnp.zeros_like(x), key)
    else:
        carry = (x, jnp.zeros_like(x), key)
    chunk = n if max_steps_per_call is None else max_steps_per_call
    for seg_lo, seg_hi, in_window in segments:
        prog = scan_full if in_window else scan_cond
        for s0 in range(seg_lo, seg_hi, chunk):
            m = min(chunk, seg_hi - s0)
            carry = prog(params, prefix, carry, coeffs, jnp.int32(s0), m=m)
    x = carry[0]
    if prefix is not None:
        x = jnp.concatenate([prefix, x[:, fixed_frames:]], axis=1)
    return x


def vpode_dpmpp2m_sample(
    denoise_fn: Callable,
    x: jax.Array,
    cfg: SamplerConfig,
    *,
    key: jax.Array | None = None,
    fixed_frames: int = 0,
) -> jax.Array:
    """Deterministic DPM-Solver++(2M) ODE (VPODEDPMPP2MSampler,
    sampling.py:840-951)."""
    t = sched.sampler_tables(cfg)
    n = cfg.num_steps
    m1 = np.zeros(n)
    m2 = np.zeros(n)
    m3 = np.zeros(n)
    m4 = np.zeros(n)
    first_order = np.zeros(n, bool)
    for i in range(n):
        a, an, ap = t["alpha"][i], t["alpha_next"][i], t["alpha_prev"][i]
        c1, c2, c3, c4 = sched.dpmpp2m_ode_coeffs(a, an, ap)
        m1[i], m2[i] = c1, c2
        if c3 is None or an < 1e-14:
            first_order[i] = True
        else:
            m3[i], m4[i] = c3, c4
    coeffs = {
        "m1": jnp.asarray(m1, jnp.float32), "m2": jnp.asarray(m2, jnp.float32),
        "m3": jnp.asarray(m3, jnp.float32), "m4": jnp.asarray(m4, jnp.float32),
        "first_order": jnp.asarray(first_order),
        "is_last": jnp.asarray(t["idx"] == 1),
        "alpha": jnp.asarray(t["alpha"], jnp.float32),
        "timestep": jnp.asarray(t["timestep"], jnp.int32),
        "idx": jnp.asarray(t["idx"], jnp.int32),
        "cfg_scale": jnp.asarray(t["cfg_scale"], jnp.float32),
    }
    prefix = x[:, :fixed_frames] if fixed_frames > 0 else None
    x = x.astype(jnp.float32)

    def body(carry, step):
        x, old_d = carry
        if prefix is not None:
            x = jnp.concatenate([prefix, x[:, fixed_frames:]], axis=1)
        denoised = denoise_fn(x, step).astype(jnp.float32)
        x_std = step["m1"] * x - step["m2"] * denoised
        denoised_d = step["m3"] * denoised - step["m4"] * old_d
        x_adv = step["m1"] * x - step["m2"] * denoised_d
        x_new = jnp.where(step["first_order"], x_std, x_adv)
        x_new = jnp.where(step["is_last"], denoised, x_new)
        return (x_new, denoised), None

    (x, _), _ = jax.lax.scan(body, (x, jnp.zeros_like(x)), coeffs, length=n)
    if prefix is not None:
        x = jnp.concatenate([prefix, x[:, fixed_frames:]], axis=1)
    return x


def video_ddim_sample(
    denoise_fn: Callable,
    x: jax.Array,
    cfg: SamplerConfig,
    *,
    key: jax.Array | None = None,
    fixed_frames: int = 0,
) -> jax.Array:
    """Deterministic Video-DDIM (sampling.py:611-621):
    x <- a_t x + b_t denoised with a_t = sqrt((1-an^2)/(1-a^2)),
    b_t = an - a*a_t."""
    t = sched.sampler_tables(cfg)
    n = cfg.num_steps
    a = t["alpha"]
    an = t["alpha_next"]
    a_t = np.sqrt((1 - an ** 2) / (1 - a ** 2))
    b_t = an - a * a_t
    coeffs = {
        "a_t": jnp.asarray(a_t, jnp.float32),
        "b_t": jnp.asarray(b_t, jnp.float32),
        "alpha": jnp.asarray(t["alpha"], jnp.float32),
        "timestep": jnp.asarray(t["timestep"], jnp.int32),
        "idx": jnp.asarray(t["idx"], jnp.int32),
        "cfg_scale": jnp.asarray(t["cfg_scale"], jnp.float32),
    }
    prefix = x[:, :fixed_frames] if fixed_frames > 0 else None
    x = x.astype(jnp.float32)

    def body(carry, step):
        x = carry
        if prefix is not None:
            x = jnp.concatenate([prefix, x[:, fixed_frames:]], axis=1)
        denoised = denoise_fn(x, step).astype(jnp.float32)
        return step["a_t"] * x + step["b_t"] * denoised, None

    x, _ = jax.lax.scan(body, x, coeffs, length=n)
    if prefix is not None:
        x = jnp.concatenate([prefix, x[:, fixed_frames:]], axis=1)
    return x
