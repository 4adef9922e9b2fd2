"""Triangle-mesh kinematic colliders (SDF proxies, sim/sdf.py).

Covers the reference's AddTriangleMesh path (helpers.h:713-760): load a
mesh, register it as a kinematic collider, particles rest on it.
"""
import os

import numpy as np
import pytest

from dyn_res_pile_manip_tpu.core.types import Colliders, SimParams, SimState
from dyn_res_pile_manip_tpu.sim import pbd
from dyn_res_pile_manip_tpu.sim.sdf import build_mesh_sdf, sdf_from_occupancy

CUBE_VERTS = np.array([
    [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
    [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
], dtype=np.float64)
CUBE_FACES = np.array([
    [0, 2, 1], [0, 3, 2],  # z=0
    [4, 5, 6], [4, 6, 7],  # z=1
    [0, 1, 5], [0, 5, 4],  # y=0
    [3, 6, 2], [3, 7, 6],  # y=1
    [0, 4, 7], [0, 7, 3],  # x=0
    [1, 2, 6], [1, 6, 5],  # x=1
], dtype=np.int32)


def write_cube_obj(path):
    with open(path, "w") as f:
        for v in CUBE_VERTS:
            f.write("v %g %g %g\n" % tuple(v))
        for face in CUBE_FACES:
            f.write("f %d %d %d\n" % tuple(face + 1))


def test_sdf_matches_analytic_box():
    sdf, lower, spacing = build_mesh_sdf(CUBE_VERTS, CUBE_FACES, res=64)
    res = sdf.shape[0]
    ii = np.arange(res)
    centers = lower[None, :] + spacing * (np.stack(np.meshgrid(
        ii, ii, ii, indexing="ij"), axis=-1).reshape(-1, 3) + 0.5)
    # analytic SDF of the unit cube [0,1]^3
    q = np.abs(centers - 0.5) - 0.5
    d_out = np.linalg.norm(np.maximum(q, 0.0), axis=-1)
    d_in = np.minimum(q.max(axis=-1), 0.0)
    ref = d_out + d_in
    err = np.abs(sdf.reshape(-1) - ref)
    assert np.percentile(err, 99) < 1.5 * spacing
    assert err.mean() < 0.75 * spacing


def test_edt_simple():
    occ = np.zeros((8, 8, 8), bool)
    occ[4, 4, 4] = True
    sdf = sdf_from_occupancy(occ, 1.0)
    assert sdf[4, 4, 4] < 0
    np.testing.assert_allclose(sdf[4, 4, 7], 3.0 - 0.5, atol=1e-6)
    np.testing.assert_allclose(sdf[4, 7, 7],
                               np.sqrt(18.0) - 0.5, atol=1e-6)


def test_particles_rest_on_mesh():
    """Particles dropped over a unit-cube mesh settle on its top face."""
    sdf, lower, spacing = build_mesh_sdf(CUBE_VERTS, CUBE_FACES, res=64)
    col = Colliders.ground_only(num_boxes=1).with_mesh(
        sdf, lower, spacing, pos=(0.0, 0.0, 0.0))
    sp = SimParams.granular(radius=0.075)

    n, cap = 16, 256
    rng = np.random.default_rng(3)
    x = np.zeros((cap, 3), np.float32)
    x[:n, 0] = rng.uniform(0.3, 0.7, n)
    x[:n, 2] = rng.uniform(0.3, 0.7, n)
    x[:n, 1] = 1.4 + 0.09 * np.arange(n)
    import jax.numpy as jnp
    state = SimState(
        x=jnp.asarray(x), v=jnp.zeros((cap, 3)),
        invm=jnp.where(jnp.arange(cap) < n, 0.2, 0.0),
        group=jnp.full((cap,), -1, jnp.int32),
        active=jnp.arange(cap) < n,
        rest=jnp.zeros((cap, 3)),
        group_quat=jnp.tile(jnp.array([1.0, 0, 0, 0]), (1, 1)),
    )
    lo, dims = pbd.default_grid(24.0)
    for _ in range(160):
        state = pbd.step_frame(state, sp, col, lo, dims)
    xs = np.asarray(state.x)[:n]
    assert not np.isnan(xs).any()
    inside = ((xs[:, 0] > 0.15) & (xs[:, 0] < 0.85)
              & (xs[:, 2] > 0.15) & (xs[:, 2] < 0.85))
    # particles above the cube footprint rest near y = 1 + collision dist
    on_top = xs[inside]
    assert on_top.shape[0] >= n // 2
    cd = float(sp.collision_distance)
    assert on_top[:, 1].min() > 1.0 + cd - 2.5 * spacing
    assert on_top[:, 1].max() < 1.0 + cd + 6 * 0.075


def test_shim_add_mesh_and_pose(tmp_path):
    import dyn_res_pile_manip_tpu.pyflex_shim as pyflex

    path = os.path.join(tmp_path, "cube.obj")
    write_cube_obj(path)
    pyflex.set_scene(22, np.array([
        0.36, 0.36, -1.2, 0.5, -1.2, 1.0, 0.9, 1.0, 4,
        10.0, 20.0, 2, 4, 2, 0.72, 0.0, -1, -1, -1, 0.0]))
    h = pyflex.add_mesh(path, 2.0)
    assert h >= 0
    states = pyflex.get_shape_states()
    assert states.shape[0] == 1
    # drive the mesh pose kinematically
    row = np.zeros(14)
    row[:3] = [3.0, 0.5, -1.0]
    row[6:10] = [0, 0, 0, 1]
    row[10:14] = [0, 0, 0, 1]
    pyflex.set_shape_states(row[None])
    states = pyflex.get_shape_states()
    np.testing.assert_allclose(states[0, :3], [3.0, 0.5, -1.0], atol=1e-6)
    pyflex.step()
    assert not np.isnan(pyflex.get_positions()).any()
    pyflex.clean()
