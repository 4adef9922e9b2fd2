"""Active-set (sleeping) solver: frozen particles are untouched, woken
particles match the full solve, prefix branches engage and stay stable.

Covers the FleX sleeping model (NvFlexParams::sleepThreshold,
NvFlex.h:95-154) as realized by sim/pbd.py's sorted-prefix active set.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dyn_res_pile_manip_tpu.core.types import Colliders, SimParams, SimState
from dyn_res_pile_manip_tpu.sim import pbd


def two_piles(capacity=1536, n_side=5, sep=8.0, seed=0):
    """Two identical grid piles of n_side^3 free particles, sep apart in x."""
    rng = np.random.default_rng(seed)
    sp = SimParams.granular(radius=0.075)
    d = 0.075 * 1.05
    g = np.stack(np.meshgrid(*[np.arange(n_side)] * 3, indexing="ij"),
                 axis=-1).reshape(-1, 3) * d
    g = g + rng.normal(0, 0.003, g.shape)
    n = 2 * g.shape[0]
    x = np.zeros((capacity, 3), np.float32)
    x[:g.shape[0]] = g + np.array([-sep / 2, 0.2, 0.0])
    x[g.shape[0]:n] = g + np.array([sep / 2, 0.2, 0.0])
    st = SimState(
        x=jnp.asarray(x), v=jnp.zeros((capacity, 3)),
        invm=jnp.where(jnp.arange(capacity) < n, 0.2, 0.0),
        group=jnp.full((capacity,), -1, jnp.int32),
        active=jnp.arange(capacity) < n,
        rest=jnp.zeros((capacity, 3)),
        group_quat=jnp.tile(jnp.array([1.0, 0, 0, 0]), (1, 1)),
    )
    return st, sp


def run_push(state, sp, n_frames, active_set, pusher_x=None):
    """Step with per-frame cache rebuilds; optionally sweep a pusher
    through the left pile along +x."""
    col0 = Colliders.ground_only(num_boxes=1)
    st = state
    cache = None
    sels = []
    for i in range(n_frames):
        if pusher_x is not None:
            cx = pusher_x + 0.02 * i
            col = col0.with_box(0, (cx, 0.15, 0.0), (0.06, 0.3, 0.6),
                                vel=(1.2, 0.0, 0.0))
        else:
            col = col0
        if i % 2 == 0 or cache is None:
            st, cache = pbd.build_cache(st, sp, colliders=col,
                                        active_set=active_set)
            sels.append(int(cache["sel"]))
        st = pbd._step_sorted(st, sp, col, cache, use_pallas=False)
    return pbd.unsort_state(st), sels


@pytest.fixture(scope="module")
def settled():
    st, sp = two_piles()
    st, _ = run_push(st, sp, 120, active_set=True)
    return st, sp


def test_settles_and_sleeps(settled):
    st, sp = settled
    act = np.asarray(st.active)
    assert np.abs(np.asarray(st.v)[act]).max() == 0.0
    assert np.asarray(st.slept)[act].all()


def test_frozen_pile_bit_identical(settled):
    """Pushing the left pile must leave the sleeping right pile's
    positions EXACTLY unchanged (the frozen path never touches them)."""
    st, sp = settled
    before = np.asarray(st.x).copy()
    right = (np.asarray(st.active)) & (before[:, 0] > 2.0)
    assert right.sum() > 100
    pushed, _ = run_push(st, sp, 40, active_set=True, pusher_x=-4.6)
    after = np.asarray(pushed.x)
    np.testing.assert_array_equal(after[right], before[right])
    # and the left pile actually moved
    left = (np.asarray(st.active)) & (before[:, 0] < 0.0)
    assert np.abs(after[left] - before[left]).max() > 0.01


def test_active_set_matches_full_solve(settled):
    """The pushed pile's trajectory under the active set stays close to
    the full solve (identical physics, frozen-support approximation)."""
    st, sp = settled
    a, _ = run_push(st, sp, 40, active_set=True, pusher_x=-4.6)
    b, _ = run_push(st, sp, 40, active_set=False, pusher_x=-4.6)
    act = np.asarray(st.active)
    xa, xb = np.asarray(a.x)[act], np.asarray(b.x)[act]
    assert not np.isnan(xa).any() and not np.isnan(xb).any()
    # statistically equal: COMs within a third of a radius, spreads close
    np.testing.assert_allclose(xa.mean(0), xb.mean(0), atol=0.025)
    np.testing.assert_allclose(xa.std(0), xb.std(0), rtol=0.1, atol=0.01)
    # per-particle agreement within a couple of radii for the vast majority
    err = np.linalg.norm(xa - xb, axis=1)
    assert np.percentile(err, 95) < 2.5 * 0.075


def test_prefix_branch_engages():
    """With small A_TIERS the rebuild selects a prefix branch for a
    local disturbance and the result stays finite and consistent.

    Uses a capacity not exercised elsewhere (1792) so the patched branch
    plan gets a fresh jit trace (the plan is a module global, not part of
    the jit cache key)."""
    old = pbd.A_TIERS
    pbd.A_TIERS = (512,)
    try:
        st, sp = two_piles(capacity=1792, seed=1)
        st, _ = run_push(st, sp, 120, active_set=True)
        pushed, sels = run_push(st, sp, 30, active_set=True, pusher_x=-4.6)
        assert 0 in sels  # prefix branch used at least once
        xs = np.asarray(pushed.x)[np.asarray(pushed.active)]
        assert not np.isnan(xs).any()
        assert xs[:, 1].min() > float(sp.collision_distance) - 0.02
    finally:
        pbd.A_TIERS = old


def test_12288_tier_parity_at_production_capacity():
    """The 12288 prefix tier, exercised at the PRODUCTION capacity
    (19456 — the 19.4k push scenes), matches the full-body solve.

    The small-capacity tier tests monkeypatch A_TIERS, so `_branch_plan`
    filters 12288 out and the real branch never compiles there (ADVICE
    r3). Here a pre-slept 150x128 resting monolayer with a 89x89 mover
    block yields ~11.4k candidates — inside (8192, 12288], so the rebuild
    must select the 12288 branch — and six frames under the prefix solve
    reproduce the full solve (measured bit-exact on CPU; the frozen path
    is bit-exact by design, the awake path is the same program on a
    prefix slice). ~3 min on a cold 1-core CPU host (one 19456-row
    switch compile); full tier only, not `-m quick`."""
    cap, nx, nz = 19456, 150, 128
    sp = SimParams.granular(radius=0.075)
    gx, gz = np.meshgrid(np.arange(nx), np.arange(nz), indexing="ij")
    n = nx * nz
    pos = np.zeros((cap, 3), np.float32)
    pos[:n, 0] = (gx.ravel() - nx / 2) * 0.165   # > contact distance:
    pos[:n, 2] = (gz.ravel() - nz / 2) * 0.165   # each rests on ground alone
    pos[:n, 1] = float(sp.collision_distance)
    v = np.zeros((cap, 3), np.float32)
    movers = ((np.abs(gx.ravel() - nx // 2) < 45)
              & (np.abs(gz.ravel() - nz // 2) < 45))
    v[:n][movers] = np.array([1e-3, 0.0, 0.0], np.float32)

    def fresh():
        return SimState(
            x=jnp.asarray(pos), v=jnp.asarray(v),
            invm=jnp.where(jnp.arange(cap) < n, 0.2, 0.0),
            group=jnp.full((cap,), -1, jnp.int32),
            active=jnp.arange(cap) < n,
            rest=jnp.zeros((cap, 3)),
            group_quat=jnp.tile(jnp.array([1.0, 0, 0, 0]), (1, 1)),
            slept=jnp.ones((cap,), bool))

    col = Colliders.ground_only(num_boxes=1)

    def run(active_set):
        st, cache, sels = fresh(), None, []
        for i in range(6):
            if i % 2 == 0:
                st, cache = pbd.build_cache(st, sp, colliders=col,
                                            active_set=active_set)
                sels.append(int(cache["sel"]))
            st = pbd._step_sorted(st, sp, col, cache, use_pallas=False)
        return pbd.unsort_state(st), sels

    n_c = int(pbd.wake_masks(fresh(), sp, None)[1].sum())
    assert 8192 < n_c <= 12288, n_c
    a, sels_a = run(True)
    b, _ = run(False)
    assert sels_a[0] == pbd._branch_plan(cap).index(12288)
    act = np.asarray(fresh().active)
    xa, xb = np.asarray(a.x)[act], np.asarray(b.x)[act]
    assert not np.isnan(xa).any() and not np.isnan(xb).any()
    np.testing.assert_allclose(xa, xb, atol=1e-5)


def test_fresh_scene_falls():
    """slept=None scenes must not freeze mid-air: everything integrates."""
    st, sp = two_piles(seed=3)
    x0 = np.asarray(st.x).copy()
    out, _ = run_push(st, sp, 10, active_set=True)
    act = np.asarray(st.active)
    dy = x0[act, 1] - np.asarray(out.x)[act, 1]
    assert dy.min() > 0.0  # every particle fell
