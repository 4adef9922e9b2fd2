"""Generate small watertight demo meshes for the mesh-asset scene path
(assets/meshes_demo/*.ply, exercised by examples/test_softbody_mesh.py).

The reference scenes reference bunny.ply/armadillo.ply but the repo
ships no mesh assets (PyFleX/data is not in the release — PARITY.md);
these stand-ins are deformed icospheres (sphere topology => watertight
by construction, so the parity-raycast voxelizer in utils/mesh.py fills
them exactly like CreateParticleShape, helpers.h:154-260).

Run: python scripts/gen_demo_mesh.py
"""
import os

import numpy as np


def icosphere(subdiv=3):
    t = (1 + 5 ** 0.5) / 2
    v = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], np.float64)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]],
        np.int64)
    for _ in range(subdiv):
        verts = list(v)
        cache = {}

        def mid(a, b):
            key = (min(a, b), max(a, b))
            if key not in cache:
                m = verts[a] + verts[b]
                m /= np.linalg.norm(m)
                cache[key] = len(verts)
                verts.append(m)
            return cache[key]

        nf = []
        for a, b, c in f:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            nf += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        v = np.array(verts)
        f = np.array(nf, np.int64)
    return v, f


def bunny_blob():
    """Bunny-proportioned blob: ellipsoid body + radial bumps for the
    head and two ears, as smooth displacements of one sphere (stays
    watertight)."""
    v, f = icosphere(3)

    def bump(center, width, height):
        c = np.asarray(center, np.float64)
        c /= np.linalg.norm(c)
        cosang = v @ c
        return height * np.exp((cosang - 1.0) / width)

    r = 1.0 + bump([0.0, 0.7, 0.7], 0.08, 0.55)        # head
    r += bump([0.25, 0.95, 0.35], 0.015, 0.7)          # ear R
    r += bump([-0.25, 0.95, 0.35], 0.015, 0.7)         # ear L
    r += bump([0.0, -0.2, -1.0], 0.05, 0.25)           # tail
    out = v * r[:, None]
    out *= np.array([0.75, 0.9, 1.0])                  # body proportions
    return out, f


def armadillo_blob():
    v, f = icosphere(2)

    def bump(center, width, height):
        c = np.asarray(center, np.float64)
        c /= np.linalg.norm(c)
        return height * np.exp((v @ c - 1.0) / width)

    r = 1.0 + bump([0, 1, 0.3], 0.06, 0.4)             # head
    r += bump([0.8, -0.5, 0], 0.04, 0.35)              # leg
    r += bump([-0.8, -0.5, 0], 0.04, 0.35)             # leg
    r += bump([0, -0.3, 1.0], 0.05, 0.3)               # tail
    out = v * r[:, None]
    out *= np.array([0.8, 1.0, 0.6])
    return out, f


def write_ply(path, v, f):
    with open(path, "w") as fp:
        fp.write("ply\nformat ascii 1.0\n"
                 f"element vertex {len(v)}\n"
                 "property float x\nproperty float y\nproperty float z\n"
                 f"element face {len(f)}\n"
                 "property list uchar int vertex_indices\nend_header\n")
        for p in v:
            fp.write(f"{p[0]:.5f} {p[1]:.5f} {p[2]:.5f}\n")
        for tri in f:
            fp.write(f"3 {tri[0]} {tri[1]} {tri[2]}\n")
    print(f"{path}: {len(v)} verts, {len(f)} tris, "
          f"{os.path.getsize(path) // 1024} KB")


if __name__ == "__main__":
    os.makedirs("assets/meshes_demo", exist_ok=True)
    write_ply("assets/meshes_demo/bunny.ply", *bunny_blob())
    write_ply("assets/meshes_demo/armadillo.ply", *armadillo_blob())
