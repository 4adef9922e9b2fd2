"""PBD solver invariants: settling, non-penetration, rigid-shape
preservation, neighbor-search correctness vs brute force."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dyn_res_pile_manip_tpu.core.types import Colliders
from dyn_res_pile_manip_tpu.env import scene as scene_lib
from dyn_res_pile_manip_tpu.sim import pbd

GS = 24.0
SMALL_CARROTS = np.array([
    0.36, 0.36, -1.2, 0.5, -1.2,   # max/min scale, x, y, z
    1.0, 0.9, 1.0,                 # sFriction, dFriction, draw_skin
    8,                             # num_carrots
    10.0, 20.0,                    # min/max kdop dist
    3, 10, 3,                      # num_x, num_y, num_z
    0.72,                          # inter_space
    0.0, -1, -1, -1, 0.0,          # singular/noise
])


@pytest.fixture(scope="module")
def settled():
    state, sp, build = scene_lib.set_scene(
        22, SMALL_CARROTS, seed=0, capacity_multiple=256, group_multiple=32)
    col = scene_lib.make_colliders_with_walls(GS)
    lower, dims = pbd.default_grid(GS)
    st = state
    for _ in range(250):
        st = pbd.step_frame(st, sp, col, lower, dims)
    return state, st, sp, build


def test_scene_build_layout():
    state, sp, build = scene_lib.set_scene(
        22, SMALL_CARROTS, seed=0, capacity_multiple=256, group_multiple=32)
    act = np.asarray(state.active)
    assert act.sum() > 50
    grp = np.asarray(state.group)[act]
    assert grp.min() == 0 and grp.max() == build.num_groups - 1
    # deterministic under the seed
    state2, _, _ = scene_lib.set_scene(
        22, SMALL_CARROTS, seed=0, capacity_multiple=256, group_multiple=32)
    np.testing.assert_array_equal(np.asarray(state.x), np.asarray(state2.x))


def test_settles_to_rest(settled):
    _, st, sp, _ = settled
    act = np.asarray(st.active)
    xs = np.asarray(st.x)[act]
    vs = np.asarray(st.v)[act]
    assert not np.isnan(xs).any()
    # at rest: sleeping killed all velocities
    assert np.abs(vs).max() < 0.05
    # non-penetration: no particle below the floor offset (small tolerance)
    assert xs[:, 1].min() > float(sp.collision_distance) - 0.02
    # the pile collapsed from its drop height
    assert xs[:, 1].max() < 1.5


def test_rigid_shape_preserved(settled):
    state0, st, _, build = settled
    act = np.asarray(state0.active)
    grp = np.asarray(state0.group)[act]
    x0 = np.asarray(state0.x)[act]
    x1 = np.asarray(st.x)[act]
    for g in range(build.num_groups):
        p0, p1 = x0[grp == g], x1[grp == g]
        if p0.shape[0] < 3:
            continue
        # centered second moments are rotation-invariant
        e0 = np.sort(np.linalg.eigvalsh(np.cov(p0.T)))
        e1 = np.sort(np.linalg.eigvalsh(np.cov(p1.T)))
        np.testing.assert_allclose(e1, e0, rtol=0.15, atol=1e-4)


def test_neighbors_match_bruteforce():
    rng = np.random.default_rng(0)
    n = 200
    x = rng.uniform(-1.0, 1.0, (n, 3)).astype(np.float32)
    x[:, 1] = rng.uniform(0, 0.3, n)
    cell = 0.09375
    lower = jnp.array([-2.0, -1.0, -2.0], jnp.float32)
    dims = (48, 24, 48)
    group = np.full(n, -1, np.int32)
    idx, ok = pbd.find_neighbors(
        jnp.asarray(x), jnp.ones(n, bool), jnp.asarray(group),
        jnp.float32(cell), lower, dims, 24)
    idx, ok = np.asarray(idx), np.asarray(ok)
    d = np.linalg.norm(x[:, None] - x[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    for i in range(n):
        expected = set(np.flatnonzero(d[i] < cell))
        got = set(idx[i][ok[i]])
        assert got == expected, f"particle {i}: {got} vs {expected}"


def test_same_group_pairs_excluded():
    x = np.array([[0, 0.1, 0], [0.03, 0.1, 0], [0.3, 0.1, 0.0]], np.float32)
    group = np.array([5, 5, -1], np.int32)
    lower = jnp.array([-1.0, -1.0, -1.0], jnp.float32)
    idx, ok = pbd.find_neighbors(
        jnp.asarray(x), jnp.ones(3, bool), jnp.asarray(group),
        jnp.float32(0.09375), lower, (32, 32, 32), 8)
    ok = np.asarray(ok)
    # particles 0,1 share a rigid group -> no contact pair between them
    assert not ok[0].any()
    assert not ok[1].any()


def test_kinematic_box_pushes_particles():
    """A box sweeping through a few grains displaces them along the push."""
    n = 64
    rng = np.random.default_rng(1)
    from dyn_res_pile_manip_tpu.core import geometry
    pts = geometry.grid_block_particles(
        np.array([-0.15, 0.0, -0.15]), (4, 4, 4), 0.0751, rng, 0.0)
    cap = 256
    x = np.zeros((cap, 3), np.float32)
    x[:n] = pts
    x[n:] = [0, -1000, 0]
    from dyn_res_pile_manip_tpu.core.types import SimParams, SimState
    state = SimState(
        x=jnp.asarray(x), v=jnp.zeros((cap, 3), jnp.float32),
        invm=jnp.asarray(np.where(np.arange(cap) < n, 1.0, 0.0
                                  ).astype(np.float32)),
        group=jnp.full((cap,), -1, jnp.int32),
        active=jnp.asarray(np.arange(cap) < n),
        rest=jnp.zeros((cap, 3), jnp.float32),
        group_quat=jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (8, 1)))
    sp = SimParams.granular(0.075)
    lower, dims = pbd.default_grid(4.0)
    col = Colliders.ground_only(num_boxes=1)
    # box starts left of the grains, sweeps +x at 1.5 units/s
    speed = 1.5
    centers = -0.6 + np.arange(60) * speed / 60.0
    st = state
    for c in centers:
        colt = col.with_box(0, (c, 1.0, 0.0), (0.1, 1.0, 0.8),
                            vel=(speed, 0.0, 0.0))
        st = pbd.step_frame(st, sp, colt, lower, dims)
    xs = np.asarray(st.x)[:n]
    assert not np.isnan(xs).any()
    # grains were pushed in +x beyond their initial extent
    assert xs[:, 0].mean() > pts[:, 0].mean() + 0.2
    # nothing tunneled through the box (box face ended near +0.9)
    assert xs[:, 0].min() > -0.5


def test_capsule_collider_supports_particles():
    """Grains rest on a horizontal kinematic capsule instead of falling
    through (AddCapsule parity, helpers.h:713-760)."""
    import jax.numpy as jnp

    from dyn_res_pile_manip_tpu.core import geometry
    from dyn_res_pile_manip_tpu.core.types import SimParams, SimState

    rng = np.random.default_rng(0)
    pts = geometry.grid_block_particles(
        np.array([-0.15, 1.2, -0.15]), (4, 2, 4), 0.0751, rng, 0.0)
    n, cap = pts.shape[0], 256
    x = np.full((cap, 3), [0, -1000, 0], np.float32)
    x[:n] = pts
    state = SimState(
        x=jnp.asarray(x), v=jnp.zeros((cap, 3), jnp.float32),
        invm=jnp.asarray((np.arange(cap) < n).astype(np.float32)),
        group=jnp.full((cap,), -1, jnp.int32),
        active=jnp.asarray(np.arange(cap) < n),
        rest=jnp.zeros((cap, 3), jnp.float32),
        group_quat=jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (8, 1)))
    sp = SimParams.granular(0.075)
    lower, dims = pbd.default_grid(4.0)
    col = Colliders.ground_only(num_boxes=1).with_capsule(
        0, (-1.0, 0.8, 0.0), (1.0, 0.8, 0.0), 0.3)
    st = state
    for _ in range(90):
        st = pbd.step_frame(st, sp, col, lower, dims)
    xs = np.asarray(st.x)[:n]
    # some grains rest on top of the capsule (y ~ 0.8 + 0.3 + offsets)
    assert xs[:, 1].max() > 1.05
    # none inside the capsule core
    t = np.clip((xs[:, 0] + 1.0) / 2.0, 0, 1)
    closest = np.stack([t * 2.0 - 1.0, np.full(n, 0.8), np.zeros(n)], 1)
    d = np.linalg.norm(xs - closest, axis=1)
    assert d.min() > 0.3


def test_force_field_impulse():
    from dyn_res_pile_manip_tpu.sim import force_fields

    state, sp, build = scene_lib.set_scene(
        22, SMALL_CARROTS, seed=0, capacity_multiple=256, group_multiple=32)
    st = force_fields.apply_force_field(
        state, center=(0.0, 0.0, 0.0), radius=100.0, strength=2.0,
        mode=force_fields.MODE_VELOCITY_CHANGE)
    vs = np.asarray(st.v)[np.asarray(st.active)]
    assert (np.linalg.norm(vs, axis=1) > 1.0).all()


def test_tilted_box_collider_deflects_particles():
    """Full-quat box orientation (types.py box_quat, composed on yaw):
    grains dropped onto a 45-degree-tilted box slide off along the tilt's
    downhill direction; the same box untilted supports them on top.
    Enables the reference's tilting-container choreography
    (PyFleX/bindings/examples/test_FluidPour.py pourer angle sweep)."""
    n = 27
    rng = np.random.default_rng(2)
    from dyn_res_pile_manip_tpu.core import geometry
    pts = geometry.grid_block_particles(
        np.array([-0.12, 1.2, -0.12]), (3, 3, 3), 0.0751, rng, 0.0)
    cap = 256
    x = np.zeros((cap, 3), np.float32)
    x[:n] = pts
    x[n:] = [0, -1000, 0]
    from dyn_res_pile_manip_tpu.core.types import SimParams, SimState
    state = SimState(
        x=jnp.asarray(x), v=jnp.zeros((cap, 3), jnp.float32),
        invm=jnp.asarray(np.where(np.arange(cap) < n, 1.0, 0.0
                                  ).astype(np.float32)),
        group=jnp.full((cap,), -1, jnp.int32),
        active=jnp.asarray(np.arange(cap) < n),
        rest=jnp.zeros((cap, 3), jnp.float32),
        group_quat=jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (8, 1)))
    sp = SimParams.granular(0.075)
    lower, dims = pbd.default_grid(4.0)
    col = Colliders.ground_only(num_boxes=1)

    def run(quat):
        colt = col.with_box(0, (0.0, 0.6, 0.0), (0.45, 0.05, 0.45),
                            quat=quat)
        st = state
        for _ in range(90):
            st = pbd.step_frame(st, sp, colt, lower, dims)
        return np.asarray(st.x)[:n]

    flat = run((1.0, 0.0, 0.0, 0.0))
    a = np.pi / 4
    tilted = run((np.cos(a / 2), 0.0, 0.0, np.sin(a / 2)))  # 45 deg about z
    assert not np.isnan(flat).any() and not np.isnan(tilted).any()
    # flat box supports the grains near its top face (y ~ 0.65 + radius)
    assert flat[:, 1].min() > 0.55
    # tilted box sheds them: they slide downhill (-x for +z-axis tilt)
    # and end at ground level
    assert tilted[:, 1].min() < 0.2
    assert tilted[:, 0].mean() < flat[:, 0].mean() - 0.2
