"""Radial force fields.

Equivalent of the reference's only shipped FleX extension source
(PyFleX/extensions/cuda/flexExt.cu NvFlexExtApplyForceFields, 198 LoC):
apply radial impulse/force/velocity-change fields to particles. Not used
by the pile-manipulation workload (SURVEY.md §2.1) but part of the solver
surface.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.types import SimState

MODE_FORCE = 0
MODE_IMPULSE = 1
MODE_VELOCITY_CHANGE = 2


def apply_force_field(state: SimState, center, radius, strength,
                      mode: int = MODE_FORCE, linear_falloff: bool = True,
                      dt: float = 1.0 / 60.0) -> SimState:
    """Apply one radial field to all particles within ``radius``.

    mode: FORCE (a = f*invm*dt), IMPULSE (dv = f*invm), VELOCITY_CHANGE
    (dv = f), matching NvFlexExtForceMode semantics.
    """
    center = jnp.asarray(center, jnp.float32)
    diff = state.x - center[None, :]
    dist = jnp.linalg.norm(diff, axis=-1)
    inside = (dist < radius) & state.active
    dirn = diff / jnp.maximum(dist, 1e-9)[:, None]
    fall = jnp.where(linear_falloff,
                     jnp.maximum(0.0, 1.0 - dist / radius), 1.0)
    mag = strength * fall
    if mode == MODE_FORCE:
        dv = mag[:, None] * dirn * state.invm[:, None] * dt
    elif mode == MODE_IMPULSE:
        dv = mag[:, None] * dirn * state.invm[:, None]
    elif mode == MODE_VELOCITY_CHANGE:
        dv = mag[:, None] * dirn
    else:
        raise ValueError(f"unknown force mode {mode}")
    v = jnp.where(inside[:, None], state.v + dv, state.v)
    return state.replace(v=v)
