"""Host-side scene geometry: random convex "carrot" chunks and voxel
particle fill.

Behavioral re-implementation of the reference's mesh-based pipeline
(PyFleX/bindings/helpers.h): ``CreateRandomConvexMesh`` (helpers.h:2164-2237,
12-kDOP planes at random distances) and ``CreateParticleShape``
(helpers.h:154-260: scale mesh so max edge == scale, voxelize on a
maxDim^3 grid, one particle per occupied voxel + jitter). Because the
shapes are convex we replace triangle-mesh voxelization with an exact
point-in-convex test — the same occupancy for convex inputs, with no mesh
plumbing. Deterministic under a NumPy Generator seed.

Runs once per reset (not hot); a C++ twin lives in native/geometry.cpp for
parity with the reference's native core/ (voxelize.cpp, convex.h).
"""
from __future__ import annotations

import dataclasses

import numpy as np

# 12-kDOP plane directions (helpers.h:2170-2184)
KDOP_DIRECTIONS = np.array([
    [1, 0, 0], [0, 1, 0], [0, 0, 1],
    [-1, 0, 0], [0, -1, 0], [0, 0, -1],
    [1, 1, 0], [-1, -1, 0], [1, 0, 1],
    [-1, 0, -1], [0, 1, 1], [0, -1, -1],
], dtype=np.float64)
KDOP_DIRECTIONS /= np.linalg.norm(KDOP_DIRECTIONS, axis=1, keepdims=True)


@dataclasses.dataclass
class ConvexChunk:
    normals: np.ndarray   # (P, 3) outward unit normals
    offsets: np.ndarray   # (P,)  plane offsets: inside <=> n.x <= d
    vertices: np.ndarray  # (V, 3) hull vertices (for bounds)


def _use_native() -> bool:
    import os

    if os.environ.get("DYNRES_NO_NATIVE"):
        return False
    from .. import native

    return native.available()


def random_convex(rng: np.random.Generator, num_planes: int,
                  min_dist: float, max_dist: float) -> ConvexChunk:
    """A random convex solid bounded by the first ``num_planes`` kDOP
    directions at uniformly random distances (helpers.h:2186-2198)."""
    num_planes = int(np.clip(num_planes, 6, 12))
    normals = KDOP_DIRECTIONS[:num_planes]
    offsets = rng.uniform(min_dist, max_dist, size=num_planes)
    if _use_native():
        from .. import native

        verts = native.kdop_vertices(normals, offsets)
        verts = np.unique(np.round(verts, 9), axis=0)
    else:
        verts = _convex_vertices(normals, offsets)
    return ConvexChunk(normals=normals, offsets=offsets, vertices=verts)


def _convex_vertices(normals: np.ndarray, offsets: np.ndarray,
                     eps: float = 1e-6) -> np.ndarray:
    """Vertices of the polytope {x : n_i . x <= d_i} by plane-triple
    intersection."""
    P = normals.shape[0]
    verts = []
    for i in range(P):
        for j in range(i + 1, P):
            for k in range(j + 1, P):
                A = np.stack([normals[i], normals[j], normals[k]])
                if abs(np.linalg.det(A)) < 1e-9:
                    continue
                p = np.linalg.solve(A, np.array([offsets[i], offsets[j],
                                                 offsets[k]]))
                if np.all(normals @ p <= offsets + eps * (1 + np.abs(offsets))):
                    verts.append(p)
    if not verts:  # degenerate (should not happen with kDOP)
        return np.zeros((1, 3))
    verts = np.array(verts)
    # dedupe
    keep = []
    for v in verts:
        if not any(np.linalg.norm(v - verts[i]) < 1e-6 for i in keep):
            keep.append(len(keep))
    return np.unique(np.round(verts, 9), axis=0)


def fill_convex_with_particles(chunk: ConvexChunk, lower: np.ndarray,
                               scale: float, spacing: float,
                               rng: np.random.Generator,
                               jitter: float) -> np.ndarray:
    """Voxel-center particle fill of a convex chunk, replicating
    CreateParticleShape's grid layout (helpers.h:170-250).

    The chunk is rescaled so its largest AABB edge equals ``scale`` and its
    AABB minimum sits at ``lower``; particles are placed at occupied voxel
    centers of a symmetric ``spacing`` grid, plus uniform random-direction
    jitter. Returns (n, 3) world positions.
    """
    v = chunk.vertices
    mesh_lower = v.min(axis=0)
    mesh_upper = v.max(axis=0)
    edges0 = mesh_upper - mesh_lower
    max_edge0 = edges0.max()
    s = scale / max_edge0
    # scaled-local frame: x_local = (x_orig - mesh_lower) * s
    edges = edges0 * s

    if _use_native():
        from .. import native

        occ, grid_lower, max_dim = native.convex_fill_grid(
            chunk.normals, chunk.offsets, mesh_lower, mesh_upper, scale,
            spacing)
        gx, gy, gz = np.nonzero(occ)
        pts = grid_lower[None, :] + spacing * (
            np.stack([gx, gy, gz], axis=-1) + 0.5)
        inside = None
    else:
        spacing_eps = spacing * (1.0 - 1e-4)
        d = np.where(spacing > edges, 1,
                     np.maximum(1, (edges / spacing_eps).astype(np.int64)))
        max_dim = int(d.max())

        grid_lower = np.zeros(3) - 2.0 * spacing
        max_dim += 4
        mesh_offset = 0.5 * (spacing - (edges - (d - 1) * spacing))
        grid_lower -= mesh_offset

        idx = np.arange(max_dim)
        gx, gy, gz = np.meshgrid(idx, idx, idx, indexing="ij")
        centers = grid_lower[None, :] + spacing * (
            np.stack([gx, gy, gz], axis=-1).reshape(-1, 3) + 0.5)
        # map voxel centers back to the chunk's original frame for the
        # inside test
        orig = centers / s + mesh_lower[None, :]
        inside = np.all(
            orig @ chunk.normals.T <= chunk.offsets[None, :] + 1e-9, axis=1)
        pts = centers[inside]
    if pts.shape[0] == 0:
        # guarantee at least one particle at the centroid
        pts = ((v.mean(axis=0) - mesh_lower) * s)[None, :]
    if jitter > 0:
        dirs = rng.normal(size=pts.shape)
        dirs /= np.maximum(np.linalg.norm(dirs, axis=1, keepdims=True), 1e-9)
        pts = pts + dirs * jitter
    return pts + np.asarray(lower)[None, :] + grid_lower * 0.0


def grid_block_particles(lower: np.ndarray, dims: tuple, spacing: float,
                         rng: np.random.Generator,
                         jitter: float = 0.005,
                         tie_break: float = 1e-4) -> np.ndarray:
    """Axis-aligned block of free granular particles (yz_granularmanip / the
    'ball' scene: a cube of loose grains)."""
    nx, ny, nz = dims
    gx, gy, gz = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                             indexing="ij")
    pts = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3) * spacing
    pts = pts + np.asarray(lower)[None, :] + spacing * 0.5
    if jitter > 0:
        pts = pts + rng.uniform(-jitter, jitter, size=pts.shape)
    elif tie_break > 0:
        # break exact grid ties (regular packings stress the fixed-capacity
        # neighbor cells and produce degenerate contact normals)
        pts = pts + rng.uniform(-tie_break, tie_break, size=pts.shape)
    return pts
