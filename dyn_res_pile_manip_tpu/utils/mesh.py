"""Minimal triangle-mesh loading + mesh->particle fill.

Covers the reference's ImportMesh (PyFleX/core/mesh.cpp: PLY/OBJ) and the
mesh branch of CreateParticleShape (helpers.h:154-260) so user-provided
meshes (e.g. coffee_bean.ply equivalents) can be filled with rigid particle
blocks. ASCII + binary-little-endian PLY and basic OBJ are supported.
"""
from __future__ import annotations

import struct

import numpy as np


def load_obj(path: str):
    verts, faces = [], []
    with open(path, "r") as f:
        for line in f:
            if line.startswith("v "):
                verts.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("f "):
                idx = [int(tok.split("/")[0]) - 1 for tok in line.split()[1:]]
                for i in range(1, len(idx) - 1):  # fan-triangulate
                    faces.append([idx[0], idx[i], idx[i + 1]])
    return (np.asarray(verts, np.float64),
            np.asarray(faces, np.int32).reshape(-1, 3))


def load_ply(path: str):
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii", "replace").strip()
            header.append(line)
            if line == "end_header":
                break
        fmt = next(l.split()[1] for l in header if l.startswith("format"))
        n_verts = int(next(l.split()[-1] for l in header
                           if l.startswith("element vertex")))
        n_faces = int(next(l.split()[-1] for l in header
                           if l.startswith("element face")))
        # vertex property names in order (within the vertex element)
        vprops = []
        in_vertex = False
        for l in header:
            if l.startswith("element"):
                in_vertex = l.startswith("element vertex")
            elif l.startswith("property") and in_vertex:
                vprops.append(l.split()[-1])
        if fmt == "ascii":
            verts = np.zeros((n_verts, 3))
            for i in range(n_verts):
                vals = f.readline().split()
                verts[i] = [float(vals[vprops.index(c)]) for c in "xyz"]
            faces = []
            for _ in range(n_faces):
                vals = [int(x) for x in f.readline().split()]
                idx = vals[1:1 + vals[0]]
                for i in range(1, len(idx) - 1):
                    faces.append([idx[0], idx[i], idx[i + 1]])
        elif fmt == "binary_little_endian":
            per_vert = len(vprops)
            raw = f.read(4 * per_vert * n_verts)
            arr = np.frombuffer(raw, dtype="<f4").reshape(n_verts, per_vert)
            cols = [vprops.index(c) for c in "xyz"]
            verts = arr[:, cols].astype(np.float64)
            faces = []
            for _ in range(n_faces):
                (cnt,) = struct.unpack("<B", f.read(1))
                idx = struct.unpack(f"<{cnt}i", f.read(4 * cnt))
                for i in range(1, cnt - 1):
                    faces.append([idx[0], idx[i], idx[i + 1]])
        else:
            raise ValueError(f"unsupported PLY format {fmt}")
    return np.asarray(verts, np.float64), np.asarray(faces, np.int32)


def import_mesh(path: str):
    if path.lower().endswith(".obj"):
        return load_obj(path)
    if path.lower().endswith(".ply"):
        return load_ply(path)
    raise ValueError(f"unsupported mesh format: {path}")


def fill_mesh_with_particles(verts: np.ndarray, faces: np.ndarray,
                             lower, scale: float, spacing: float,
                             rng: np.random.Generator,
                             jitter: float = 0.0) -> np.ndarray:
    """CreateParticleShape for triangle meshes: rescale so the largest AABB
    edge equals ``scale``, voxelize on the symmetric grid, one particle per
    occupied voxel (+ jitter). Uses the native voxelizer when available,
    else a NumPy ray-parity fallback."""
    mesh_lower = verts.min(axis=0)
    mesh_upper = verts.max(axis=0)
    edges0 = mesh_upper - mesh_lower
    s = scale / edges0.max()
    v_scaled = (verts - mesh_lower) * s
    edges = edges0 * s
    spacing_eps = spacing * (1.0 - 1e-4)
    d = np.where(spacing > edges, 1,
                 np.maximum(1, (edges / spacing_eps).astype(np.int64)))
    max_dim = int(d.max()) + 4
    grid_lower = (np.zeros(3) - 2.0 * spacing
                  - 0.5 * (spacing - (edges - (d - 1) * spacing)))

    from .. import native

    if native.available():
        occ = native.voxelize_mesh(v_scaled, faces, grid_lower, spacing,
                                   (max_dim, max_dim, max_dim))
    else:
        occ = _voxelize_np(v_scaled, faces, grid_lower, spacing, max_dim)
    gx, gy, gz = np.nonzero(occ)
    pts = grid_lower[None, :] + spacing * (
        np.stack([gx, gy, gz], axis=-1) + 0.5)
    if pts.shape[0] == 0:
        pts = (0.5 * edges)[None, :]
    if jitter > 0:
        dirs = rng.normal(size=pts.shape)
        dirs /= np.maximum(np.linalg.norm(dirs, axis=1, keepdims=True), 1e-9)
        pts = pts + dirs * jitter
    return pts + np.asarray(lower)[None, :]


def _voxelize_np(verts, faces, lower, spacing, max_dim):
    """NumPy ray-parity voxelizer fallback (x-axis rays)."""
    occ = np.zeros((max_dim, max_dim, max_dim), dtype=bool)
    ys = lower[1] + spacing * (np.arange(max_dim) + 0.5) + 1.2345e-7
    zs = lower[2] + spacing * (np.arange(max_dim) + 0.5) + 2.7183e-7
    xs = lower[0] + spacing * (np.arange(max_dim) + 0.5)
    a = verts[faces[:, 0]]
    b = verts[faces[:, 1]]
    c = verts[faces[:, 2]]
    for iy, py in enumerate(ys):
        for iz, pz in enumerate(zs):
            d1 = (b[:, 1] - a[:, 1]) * (pz - a[:, 2]) - \
                 (b[:, 2] - a[:, 2]) * (py - a[:, 1])
            d2 = (c[:, 1] - b[:, 1]) * (pz - b[:, 2]) - \
                 (c[:, 2] - b[:, 2]) * (py - b[:, 1])
            d3 = (a[:, 1] - c[:, 1]) * (pz - c[:, 2]) - \
                 (a[:, 2] - c[:, 2]) * (py - c[:, 1])
            inside = ~(((d1 < 0) | (d2 < 0) | (d3 < 0))
                       & ((d1 > 0) | (d2 > 0) | (d3 > 0)))
            det = ((b[:, 1] - a[:, 1]) * (c[:, 2] - a[:, 2])
                   - (c[:, 1] - a[:, 1]) * (b[:, 2] - a[:, 2]))
            ok = inside & (np.abs(det) > 1e-14)
            if not ok.any():
                continue
            det_ok = np.where(np.abs(det) > 1e-14, det, 1.0)
            w1 = ((py - a[:, 1]) * (c[:, 2] - a[:, 2])
                  - (pz - a[:, 2]) * (c[:, 1] - a[:, 1])) / det_ok
            w2 = ((b[:, 1] - a[:, 1]) * (pz - a[:, 2])
                  - (b[:, 2] - a[:, 2]) * (py - a[:, 1])) / det_ok
            hx = a[:, 0] + w1 * (b[:, 0] - a[:, 0]) + w2 * (c[:, 0] - a[:, 0])
            hx = hx[ok]
            crossings = (hx[None, :] > xs[:, None]).sum(axis=1)
            occ[:, iy, iz] = (crossings % 2) == 1
    return occ
