"""Quantitative physics acceptance: pile statistics tied to FleX-scale
observable behavior (SURVEY §7), plus the known-risk low-friction dense
block regime (CLAUDE.md physics lessons).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from dyn_res_pile_manip_tpu.core.types import Colliders, SimParams, SimState
from dyn_res_pile_manip_tpu.sim import pbd


def free_block(n_side, spacing_factor, sp, capacity, height=0.3, seed=0):
    rng = np.random.default_rng(seed)
    d = float(sp.radius) * spacing_factor
    g = np.stack(np.meshgrid(*[np.arange(n_side)] * 3, indexing="ij"),
                 axis=-1).reshape(-1, 3).astype(np.float64) * d
    g -= g.mean(axis=0, keepdims=True) * np.array([1.0, 0.0, 1.0])
    g[:, 1] += height
    g += rng.normal(0, 0.02 * float(sp.radius), g.shape)
    n = g.shape[0]
    x = np.zeros((capacity, 3), np.float32)
    x[:n] = g
    return SimState(
        x=jnp.asarray(x), v=jnp.zeros((capacity, 3)),
        invm=jnp.where(jnp.arange(capacity) < n, 0.2, 0.0),
        group=jnp.full((capacity,), -1, jnp.int32),
        active=jnp.arange(capacity) < n,
        rest=jnp.zeros((capacity, 3)),
        group_quat=jnp.tile(jnp.array([1.0, 0, 0, 0]), (1, 1)),
    ), n


def settle(state, sp, frames):
    col = Colliders.ground_only(num_boxes=1)
    st = state
    cache = None
    for i in range(frames):
        if i % 2 == 0 or cache is None:
            st, cache = pbd.build_cache(st, sp, colliders=col)
        st = pbd._step_sorted(st, sp, col, cache, use_pallas=False)
    return pbd.unsort_state(st)


def test_poured_pile_angle_of_repose():
    """A tall dropped column must slump into a cone whose repose angle is
    in the physical range for high-friction granular media (FleX piles
    with sFriction ~1 hold steep but finite slopes) and must not scatter
    outliers ('popcorn' — CLAUDE.md failure symptom)."""
    sp = SimParams.granular(radius=0.075, static_friction=1.0,
                            dynamic_friction=0.9)
    st, n = free_block(7, 1.05, sp, capacity=512, height=0.6)
    st = settle(st, sp, 270)
    xs0 = np.asarray(st.x)[:n].copy()
    st = settle(st, sp, 50)
    xs = np.asarray(st.x)[:n]
    assert not np.isnan(xs).any()
    # KNOWN ISSUE (documented): dense free-particle columns simmer — a few
    # grains keep micro-avalanching with intermittent velocity spikes
    # instead of reaching exact rest (same trace with the full solver, so
    # it is base-solver behavior, not an active-set artifact). The pile
    # SHAPE must still be statistically at rest:
    disp = np.linalg.norm(xs - xs0, axis=1)
    assert np.percentile(disp, 95) < 0.075   # 95% moved < r in 50f
    r_xy = np.linalg.norm(xs[:, [0, 2]] - xs[:, [0, 2]].mean(0), axis=1)
    h = xs[:, 1].max() - float(sp.collision_distance)
    r95 = np.percentile(r_xy, 95)
    angle = np.degrees(np.arctan2(h, r95))
    assert 10.0 < angle < 75.0
    # no popcorn: every particle within a sane footprint, none airborne
    assert r_xy.max() < 6.0 * 0.075 * 7      # < 6 block widths
    assert xs[:, 1].min() > float(sp.collision_distance) - 0.02
    assert xs[:, 1].max() < 0.6 + 0.2        # collapsed below drop height


def test_low_friction_dense_block_stays_bounded():
    """The known-risk regime (CLAUDE.md): frictionless dense free-particle
    blocks must not pump energy. Energy must decay, nothing may launch."""
    sp = SimParams.granular(radius=0.075, static_friction=0.1,
                            dynamic_friction=0.05)
    st, n = free_block(9, 1.001, sp, capacity=1024, height=0.15, seed=2)
    top0 = float(np.asarray(st.x)[:n, 1].max())

    col = Colliders.ground_only(num_boxes=1)
    cache = None
    ke = []
    for i in range(300):
        if i % 2 == 0 or cache is None:
            st, cache = pbd.build_cache(st, sp, colliders=col)
        st = pbd._step_sorted(st, sp, col, cache, use_pallas=False)
        if i % 20 == 19:
            v = np.asarray(st.v)
            a = np.asarray(st.active)
            ke.append(float((v[a] ** 2).sum()))
    st = pbd.unsort_state(st)
    xs = np.asarray(st.x)[:n]
    assert not np.isnan(xs).any()
    # nothing launched above the initial top + one diameter
    assert xs[:, 1].max() < top0 + 4 * float(sp.radius)
    # kinetic energy decays to (near) zero — no pumping
    assert ke[-1] < 0.05 * (max(ke[0], 1e-9))
    assert ke[-1] < 0.02
    # near-frictionless grains legitimately skate far while collapsing to
    # a monolayer — bound the footprint at workspace scale (no teleports)
    r_xy = np.linalg.norm(xs[:, [0, 2]] - xs[:, [0, 2]].mean(0), axis=1)
    assert r_xy.max() < 6.0
