"""Native C++ geometry core: build + parity with the NumPy path."""
import os

import numpy as np
import pytest

from dyn_res_pile_manip_tpu import native
from dyn_res_pile_manip_tpu.core import geometry

pytestmark = pytest.mark.quick


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available():
        from dyn_res_pile_manip_tpu.native.build import build
        if not build() or not native.available():
            pytest.skip("native toolchain unavailable")


def test_kdop_vertices_parity():
    rng = np.random.default_rng(3)
    for _ in range(4):
        chunk_np = None
        os.environ["DYNRES_NO_NATIVE"] = "1"
        try:
            n_planes = int(rng.integers(6, 13))
            offsets = rng.uniform(10, 20, n_planes)
            normals = geometry.KDOP_DIRECTIONS[:n_planes]
            v_np = geometry._convex_vertices(normals, offsets)
        finally:
            del os.environ["DYNRES_NO_NATIVE"]
        v_na = np.unique(np.round(native.kdop_vertices(normals, offsets), 9),
                         axis=0)
        assert v_np.shape == v_na.shape
        np.testing.assert_allclose(np.sort(v_np, axis=0),
                                   np.sort(v_na, axis=0), atol=1e-7)


def test_convex_fill_parity():
    rng = np.random.default_rng(4)
    for trial in range(3):
        chunk = geometry.random_convex(rng, int(rng.integers(6, 13)),
                                       10.0, 20.0)
        os.environ["DYNRES_NO_NATIVE"] = "1"
        try:
            p_np = geometry.fill_convex_with_particles(
                chunk, np.zeros(3), 0.36, 0.075075,
                np.random.default_rng(1), jitter=0.0)
        finally:
            del os.environ["DYNRES_NO_NATIVE"]
        p_na = geometry.fill_convex_with_particles(
            chunk, np.zeros(3), 0.36, 0.075075,
            np.random.default_rng(1), jitter=0.0)
        assert p_np.shape == p_na.shape
        np.testing.assert_allclose(np.sort(p_np.round(7), axis=0),
                                   np.sort(p_na.round(7), axis=0), atol=1e-6)


def _cube_mesh():
    verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                      [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], float)
    faces = np.array([[0, 1, 2], [0, 2, 3], [4, 6, 5], [4, 7, 6],
                      [0, 5, 1], [0, 4, 5], [1, 5, 6], [1, 6, 2],
                      [2, 6, 7], [2, 7, 3], [3, 7, 4], [3, 4, 0]], np.int32)
    return verts, faces


def test_voxelize_cube():
    verts, faces = _cube_mesh()
    occ = native.voxelize_mesh(verts, faces,
                               np.array([-0.25, -0.25, -0.25]), 0.25,
                               (7, 7, 7))
    assert occ.sum() == 64
    assert occ[1:5, 1:5, 1:5].all()


def test_sdf_monotone():
    verts, faces = _cube_mesh()
    occ = native.voxelize_mesh(verts, faces,
                               np.array([-0.5, -0.5, -0.5]), 0.25,
                               (9, 9, 9))
    sdf = native.occupancy_sdf(occ)
    assert sdf[occ].max() == 0.0
    # corners farther from the cube than face-adjacent voxels
    assert sdf[0, 0, 0] > sdf[4, 4, 0]


def test_mesh_fill_and_io(tmp_path):
    from dyn_res_pile_manip_tpu.utils.mesh import (fill_mesh_with_particles,
                                                   import_mesh)

    verts, faces = _cube_mesh()
    obj = tmp_path / "cube.obj"
    with open(obj, "w") as f:
        for v in verts:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for fc in faces:
            f.write(f"f {fc[0]+1} {fc[1]+1} {fc[2]+1}\n")
    v2, f2 = import_mesh(str(obj))
    assert v2.shape == (8, 3) and f2.shape == (12, 3)
    rng = np.random.default_rng(0)
    pts = fill_mesh_with_particles(v2, f2, np.zeros(3), 0.36, 0.075075, rng)
    assert pts.shape[0] > 20
    # all particles inside the scaled cube AABB (+ tolerance)
    assert pts.min() > -0.05 and pts.max() < 0.41
    # parity: numpy voxelizer fallback gives the same count
    from dyn_res_pile_manip_tpu.utils import mesh as mesh_mod
    occ_np = mesh_mod._voxelize_np((v2 - v2.min(0)) * 0.36, f2,
                                   *_fill_grid(0.36, 0.075075))
    occ_na = native.voxelize_mesh((v2 - v2.min(0)) * 0.36, f2,
                                  *_fill_grid(0.36, 0.075075, dims=True))
    np.testing.assert_array_equal(occ_np, occ_na)


def _fill_grid(scale, spacing, dims=False):
    edges = np.full(3, scale)
    spacing_eps = spacing * (1.0 - 1e-4)
    d = np.maximum(1, (edges / spacing_eps).astype(np.int64))
    max_dim = int(d.max()) + 4
    grid_lower = (np.zeros(3) - 2.0 * spacing
                  - 0.5 * (spacing - (edges - (d - 1) * spacing)))
    if dims:
        return grid_lower, spacing, (max_dim, max_dim, max_dim)
    return grid_lower, spacing, max_dim
