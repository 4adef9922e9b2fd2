"""Sorted-window contact solver vs dense all-pairs brute force.

The production contact path (sim/pbd.py solve_contacts_window) builds its
candidate set from tile shifts of an x-sorted state. These tests check one
projection sweep against a dense (N, N) reference implementing the same
constraint math, and the window-coverage diagnostic on a real scene.
"""
import jax.numpy as jnp
import numpy as np

from dyn_res_pile_manip_tpu.core.types import SimParams, SimState
from dyn_res_pile_manip_tpu.sim import pbd


def _dense_sweep(xp, x0, wi, active, group, params):
    """Brute-force Jacobi sweep: every pair, same math as the window path."""
    n = xp.shape[0]
    rest_d = params.radius
    diff = xp[:, None, :] - xp[None, :, :]
    dist = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, -1), 1e-18))
    pen = rest_d - dist
    same = (group[:, None] == group[None, :]) & (group[:, None] >= 0)
    eye = jnp.eye(n, dtype=bool)
    contact = ((pen > 0) & active[None, :] & active[:, None] & ~same & ~eye)
    nrm = diff / dist[..., None]
    h = (xp[None, :, 1] - xp[:, 1, None]) / rest_d
    wi_eff = wi[:, None] * jnp.exp(
        -params.shock_propagation * jnp.maximum(h, 0.0))
    wj_eff = wi[None, :] * jnp.exp(
        -params.shock_propagation * jnp.maximum(-h, 0.0))
    ratio = wi_eff / jnp.maximum(wi_eff + wj_eff, 1e-9)
    push = (ratio * pen)[..., None] * nrm
    dmove = (xp - x0)[:, None, :] - (xp - x0)[None, :, :]
    dt_tan = dmove - jnp.sum(dmove * nrm, -1, keepdims=True) * nrm
    tan_len = jnp.linalg.norm(dt_tan, axis=-1, keepdims=True)
    static_ok = tan_len < params.static_friction * pen[..., None]
    scale = jnp.where(
        static_ok, 1.0,
        jnp.minimum(1.0, params.dynamic_friction * pen[..., None]
                    / jnp.maximum(tan_len, 1e-9)))
    fric = -dt_tan * scale * ratio[..., None]
    delta = jnp.where(contact[..., None], push + fric, 0.0)
    cnt = jnp.sum(contact, axis=1)
    dx = jnp.sum(delta, axis=1) / jnp.maximum(cnt, 1)[:, None]
    return xp + params.relaxation_factor * dx


def _rand_state(rng, n, cap, spread=0.35):
    """Dense random cloud with rigid groups; positions pre-sorted into
    solver order via sort_state."""
    x = np.zeros((cap, 3), np.float32)
    x[:n] = rng.uniform(-spread, spread, (n, 3))
    x[:n, 1] = rng.uniform(0.0, 0.25, n)
    x[n:] = [0.0, -1000.0, 0.0]
    group = np.full(cap, -1, np.int32)
    group[:n] = rng.integers(-1, 5, n)
    state = SimState(
        x=jnp.asarray(x), v=jnp.zeros((cap, 3), jnp.float32),
        invm=jnp.asarray((np.arange(cap) < n).astype(np.float32) * 0.2),
        group=jnp.asarray(group),
        active=jnp.asarray(np.arange(cap) < n),
        rest=jnp.zeros((cap, 3), jnp.float32),
        group_quat=jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (8, 1)))
    return pbd.sort_state(state)


def test_window_sweep_matches_dense():
    rng = np.random.default_rng(3)
    sp = SimParams.granular(0.075)
    for trial in range(3):
        n, cap = 300 + 40 * trial, 512
        st = _rand_state(rng, n, cap)
        st, cache = pbd.build_cache(st, sp)
        assert bool(cache["window_ok"])
        w_tiles = pbd.W_TIERS[int(cache["sel"])]
        x0 = st.x
        # a displaced prediction so friction terms are non-trivial
        xp = st.x + jnp.asarray(
            rng.normal(0, 0.01, (cap, 3)).astype(np.float32))
        x0w = pbd._window(x0, pbd._PAD_POS, w_tiles)
        got = pbd.solve_contacts_window(
            xp, x0, x0w, st.invm, st.active, st.group, cache, sp, w_tiles)
        want = _dense_sweep(xp, x0, st.invm, st.active, st.group, sp)
        act = np.asarray(st.active)
        np.testing.assert_allclose(
            np.asarray(got)[act], np.asarray(want)[act],
            rtol=1e-4, atol=1e-6)


def test_window_step_matches_dense_rollout():
    """30 full frames through step_frame land on the same settled
    statistics as a dense-sweep Jacobi integrator (the production path
    uses red-black tile coloring, so trajectories differ chaotically;
    resting structure must agree)."""
    import os

    import pytest

    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        # compiling this dense-rollout program SEGFAULTS XLA:CPU's
        # backend codegen on this host when the TPU plugin env is absent
        # (reproduced twice at the same point; every other test file
        # passes chip-free). Under the normal axon env it compiles and
        # passes — keep the parity check there.
        pytest.skip("XLA:CPU codegen segfault on this host without the "
                    "TPU plugin env (see CLAUDE.md)")
    from dyn_res_pile_manip_tpu.core.types import Colliders

    rng = np.random.default_rng(7)
    sp = SimParams.granular(0.075)
    n, cap = 200, 256
    st0 = _rand_state(rng, n, cap, spread=0.3)
    col = Colliders.ground_only(num_boxes=1)

    n_frames = 60  # long enough for the cloud to fully settle

    # window path
    st = pbd.unsort_state(st0)
    for _ in range(n_frames):
        st = pbd.step_frame(st, sp, col)

    # dense path: replicate step_frame with _dense_sweep as contacts
    def dense_frame(state):
        sdt = jnp.float32(sp.dt / sp.num_substeps)
        onehot = pbd.group_onehot(state)
        inv_counts = 1.0 / jnp.maximum(jnp.sum(onehot, axis=1), 1.0)
        quat = state.group_quat
        for _ in range(sp.num_substeps):
            free = state.invm > 0
            v = state.v + sdt * jnp.array([0.0, 1.0, 0.0]) * sp.gravity_y
            v = v * jnp.maximum(0.0, 1.0 - sp.damping * sdt)
            speed = jnp.linalg.norm(v, axis=-1, keepdims=True)
            vcap = jnp.minimum(sp.max_speed, sp.radius / sdt)
            v = v * jnp.minimum(1.0, vcap / jnp.maximum(speed, 1e-9))
            v = jnp.where(free[:, None], v, 0.0)
            x0 = state.x
            xp = x0 + sdt * v
            for _ in range(sp.num_iterations):
                xp = _dense_sweep(xp, x0, state.invm, state.active,
                                  state.group, sp)
                xp = pbd.collide_static(xp, x0, col, sp, sdt)
                xp, quat = pbd.shape_match(xp, state, sp, quat, onehot,
                                           inv_counts)
            v_new = (xp - x0) / sdt
            vmag = jnp.linalg.norm(v_new, axis=-1, keepdims=True)
            v_new = jnp.where(vmag < sp.sleep_threshold, 0.0, v_new)
            v_new = jnp.where(free[:, None], v_new, 0.0)
            xp = jnp.where(free[:, None], xp, x0)
            state = state.replace(x=xp, v=v_new)
        return state.replace(group_quat=quat)

    std = pbd.unsort_state(st0)
    for _ in range(n_frames):
        std = dense_frame(std)

    act = np.asarray(std.active)
    xw = np.asarray(st.x)[act]
    xd = np.asarray(std.x)[act]
    assert not np.isnan(xw).any()
    # settled structure agrees to within ~2 radii (the production path is
    # red-black GS, the reference dense Jacobi — statistically equivalent
    # piles, not identical trajectories)
    assert abs(xw[:, 1].max() - xd[:, 1].max()) < 0.15
    assert abs(xw[:, 1].mean() - xd[:, 1].mean()) < 0.04
    for k in (0, 2):
        assert abs(xw[:, k].mean() - xd[:, k].mean()) < 0.15
        assert abs(xw[:, k].std() - xd[:, k].std()) < 0.10
    # at rest, non-penetrating, no energy blowup
    assert np.abs(np.asarray(st.v)[act]).max() < 0.2
    assert xw[:, 1].min() > -0.01
    assert xw[:, 1].max() < 0.6


def test_window_coverage_on_scene():
    from dyn_res_pile_manip_tpu.env import scene as scene_lib

    params20 = np.array([
        0.36, 0.36, -1.2, 0.5, -1.2, 1.0, 0.9, 1.0,
        88, 10.0, 20.0, 6, 10, 6, 0.72, 0.0, -1, -1, -1, 0.0])
    state, sp, _ = scene_lib.set_scene(22, params20, seed=0)
    _, cache = pbd.build_cache(state, sp)
    assert bool(cache["window_ok"])


def test_sort_unsort_roundtrip():
    rng = np.random.default_rng(11)
    st = _rand_state(rng, 300, 512)      # already sorted
    back = pbd.unsort_state(st)
    again = pbd.sort_state(back)
    np.testing.assert_array_equal(np.asarray(st.x), np.asarray(again.x))
    np.testing.assert_array_equal(np.asarray(st.group),
                                  np.asarray(again.group))
    # unsorted state has order = identity
    np.testing.assert_array_equal(np.asarray(back.order), np.arange(512))
