"""Parameter EMA — the functional LitEma equivalent.

Reference: sgm/modules/ema.py:1-88 (LitEma). The torch version keeps shadow
buffers inside a module and mutates them in-place; here the shadow is an
explicit pytree in an `EmaState`, updated by a pure function that can live
inside a jitted train step.

Semantics preserved:
  - warmup schedule: effective decay = min(decay, (1+n)/(10+n)) while
    num_updates >= 0 (ema.py:38-40); pass use_num_updates=False to pin the
    decay constant (num_updates = -1).
  - update rule: shadow -= (1-decay) * (shadow - param) (ema.py:42-54).
  - copy_to == `state.shadow`; store/restore are trivial in functional
    style (keep the old params pytree around).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EmaState(NamedTuple):
    shadow: Any              # pytree like params (f32 shadows)
    num_updates: jax.Array   # () int32; -1 disables the warmup schedule


def init_ema(params, use_num_updates: bool = True) -> EmaState:
    shadow = jax.tree_util.tree_map(
        lambda p: jnp.asarray(p, jnp.float32), params)
    return EmaState(shadow=shadow,
                    num_updates=jnp.asarray(0 if use_num_updates else -1,
                                            jnp.int32))


def ema_update(state: EmaState, params, decay: float = 0.9999) -> EmaState:
    """One EMA step (LitEma.forward, ema.py:35-54). Pure; jit-safe."""
    n = jnp.where(state.num_updates >= 0, state.num_updates + 1,
                  state.num_updates)
    eff = jnp.where(
        n >= 0,
        jnp.minimum(jnp.float32(decay), (1.0 + n) / (10.0 + n)),
        jnp.float32(decay))
    one_minus = 1.0 - eff

    def upd(s, p):
        return s - one_minus * (s - p.astype(jnp.float32))

    return EmaState(shadow=jax.tree_util.tree_map(upd, state.shadow, params),
                    num_updates=n)


def copy_to(state: EmaState, params):
    """LitEma.copy_to: return the shadow cast back to each param's dtype."""
    return jax.tree_util.tree_map(
        lambda s, p: s.astype(jnp.asarray(p).dtype), state.shadow, params)
