"""Stochastic-rounding bf16 parameter updates.

Pure-bf16 master weights stall: once an optimizer update is smaller than
~2^-8 of the parameter (bf16's 8 mantissa bits), round-to-nearest throws
it away every step and the loss plateaus — measured at production shape
in benchmarks/bench_train_overfit.py (bf16 masters flatline at ~1.65x
loss drop; f32 masters OOM a 16 GB v5e by 125 MB). Stochastic rounding
keeps the masters in bf16 (ZERO extra HBM) while making the rounding
unbiased, so sub-ulp updates accumulate in expectation — the standard
TPU mixed-precision alternative to f32 master copies (the hardware's own
matmul SR exists for the same reason; here it is applied to the
optimizer apply step, which jax exposes no hardware SR for).

Mechanism: add uniform random low bits to the f32 bit pattern, then
TRUNCATE the mantissa to bf16's 7 explicit bits. Truncation after adding
uniform(0, ulp) noise == unbiased stochastic rounding; mantissa carries
propagate into the exponent, which is exactly "round up to the next
representable" at binade boundaries.

The reference has no training code at all (SURVEY §2.2/§7); this backs
the training stack's bf16 memory budget on 16 GB chips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def stochastic_round_bf16(v, key):
    """f32 array -> bf16 with unbiased stochastic rounding."""
    v = v.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(v, jnp.uint32)
    noise = jax.random.bits(key, v.shape, jnp.uint32) & jnp.uint32(0xFFFF)
    # keep NaN/Inf exact: adding noise to an all-ones exponent pattern
    # could turn Inf into NaN or perturb NaN payloads
    finite = jnp.isfinite(v)
    rounded = (bits + noise) & jnp.uint32(0xFFFF0000)
    out = jax.lax.bitcast_convert_type(
        jnp.where(finite, rounded, bits & jnp.uint32(0xFFFF0000)),
        jnp.float32)
    return out.astype(jnp.bfloat16)


def apply_updates_sr(params, updates, key):
    """optax.apply_updates with stochastic rounding on bf16 leaves.

    f32 (and other) leaves get the plain add; each bf16 leaf computes
    param + update in f32 and stochastically rounds the result back to
    bf16 with its own fold_in subkey."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    upd_leaves = treedef.flatten_up_to(updates)
    out = []
    for i, (p, u) in enumerate(zip(leaves, upd_leaves)):
        if u is None:
            out.append(p)
        elif p.dtype == jnp.bfloat16:
            new = p.astype(jnp.float32) + u.astype(jnp.float32)
            out.append(stochastic_round_bf16(new, jax.random.fold_in(key, i)))
        else:
            out.append(optax.apply_updates(p, u))
    return jax.tree_util.tree_unflatten(treedef, out)
