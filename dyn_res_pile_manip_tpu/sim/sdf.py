"""Signed-distance-field proxies for triangle-mesh kinematic colliders.

The reference registers triangle meshes as kinematic collision shapes via
AddTriangleMesh (PyFleX/bindings/helpers.h:713-760), which hands FleX a
triangle BVH. A per-triangle BVH walk is a pointer-chasing workload that
maps terribly onto the TPU (data-dependent gathers every narrow-phase
test), so the TPU-native design bakes each mesh into a dense SDF grid once
at scene-build time (host, NumPy) and collides particles against trilinear
SDF samples inside the jitted solver — 8 lane-aligned gathers per particle
per mesh, with the contact normal taken from the analytic gradient of the
trilinear interpolant (no extra samples). Meshes are kinematic: a pose
(pos, quat) and surface velocity are carried per mesh and updated per
frame, matching the reference's per-link robot-mesh mirroring
(env/flex_env.py:84-111).
"""
from __future__ import annotations

import numpy as np

SDF_RES = 64  # fixed grid resolution; all mesh SDFs share one (M, R, R, R)


def _edt_sq_1d(d2: np.ndarray, step: float = 1.0) -> np.ndarray:
    """Exact 1-D squared Euclidean distance transform along the last axis.

    d2 holds current squared distances (0 on seeds, +inf elsewhere);
    returns min_j d2[..., j] + ((i-j)*step)^2 — vectorized O(n^2), fine for
    n = SDF_RES.
    """
    n = d2.shape[-1]
    i = np.arange(n, dtype=np.float64)
    pair = ((i[:, None] - i[None, :]) * step) ** 2          # (n, n)
    return (d2[..., None, :] + pair).min(axis=-1)


def edt_sq(seeds: np.ndarray) -> np.ndarray:
    """Exact squared Euclidean distance (in voxel units) to the nearest
    True voxel, via three separable 1-D passes."""
    d2 = np.where(seeds, 0.0, np.inf)
    d2 = _edt_sq_1d(np.moveaxis(d2, 0, -1))
    d2 = np.moveaxis(d2, -1, 0)
    d2 = _edt_sq_1d(np.moveaxis(d2, 1, -1))
    d2 = np.moveaxis(d2, -1, 1)
    return _edt_sq_1d(d2)


def sdf_from_occupancy(occ: np.ndarray, spacing: float,
                       exact: bool = False) -> np.ndarray:
    """SDF (world units, negative inside) from a boolean occupancy grid.

    Distances are voxel-center to voxel-center; the half-voxel correction
    places the zero level set on the occupancy boundary. Uses the native
    C++ chamfer transform (geometry.cpp occupancy_sdf, ~2% distance error)
    when built, else the exact separable EDT.
    """
    from .. import native

    if native.available() and not exact:
        d_out = native.occupancy_sdf(occ)
        d_in = native.occupancy_sdf(~occ)
    else:
        d_out = np.sqrt(edt_sq(occ))        # distance to nearest solid
        d_in = np.sqrt(edt_sq(~occ))        # distance to nearest empty
    sdf = np.where(occ, -(d_in - 0.5), d_out - 0.5) * spacing
    return sdf.astype(np.float32)


def build_mesh_sdf(verts: np.ndarray, faces: np.ndarray,
                   scale: float | None = None, res: int = SDF_RES,
                   pad_voxels: int = 3):
    """Bake a triangle mesh into (sdf_grid, lower, spacing) in mesh-local
    coordinates (after optional uniform rescale so the largest AABB edge is
    ``scale``, matching CreateParticleShape's convention, helpers.h:154-260).

    Returns:
        sdf: (res, res, res) float32, world units, negative inside.
        lower: (3,) grid lower corner in mesh-local coordinates.
        spacing: float voxel edge length.
    """
    from ..utils.mesh import _voxelize_np
    from .. import native

    verts = np.asarray(verts, np.float64)
    mesh_lower = verts.min(axis=0)
    edges = verts.max(axis=0) - mesh_lower
    if scale is not None:
        s = float(scale) / edges.max()
        verts = (verts - mesh_lower) * s
        mesh_lower = np.zeros(3)
        edges = edges * s
    spacing = float(edges.max()) / (res - 2 * pad_voxels)
    lower = mesh_lower - pad_voxels * spacing

    v_grid = verts - lower  # voxelizers take grid-frame verts
    if native.available():
        occ = native.voxelize_mesh(v_grid, np.asarray(faces, np.int32),
                                   np.zeros(3), spacing, (res, res, res))
    else:
        occ = _voxelize_np(v_grid, np.asarray(faces, np.int32),
                           np.zeros(3), spacing, res)
    occ = np.asarray(occ, bool)
    if not occ.any():
        # degenerate/open mesh: fall back to shell occupancy (mark voxels
        # containing vertices) so thin meshes still collide
        idx = np.clip(((v_grid) / spacing).astype(int), 0, res - 1)
        occ[idx[:, 0], idx[:, 1], idx[:, 2]] = True
    return sdf_from_occupancy(occ, spacing), lower.astype(np.float32), spacing
