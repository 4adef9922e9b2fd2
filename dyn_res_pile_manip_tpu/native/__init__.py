"""ctypes bindings for the native geometry core (geometry.cpp).

The reference keeps its host-side geometry in C++ (PyFleX/core/: convex
hull building, triangle voxelization, SDFs — ~9k LoC); this module binds
our C++ twins. Build with ``make -C dyn_res_pile_manip_tpu/native`` or
``python -m dyn_res_pile_manip_tpu.native.build``. All entry points have
NumPy fallbacks in core/geometry.py; ``available()`` reports whether the
shared library is loaded.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None


def _lib_path() -> str:
    return os.path.join(os.path.dirname(__file__), "libdynres_geometry.so")


def load():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = _lib_path()
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    dptr = ctypes.POINTER(ctypes.c_double)
    u8ptr = ctypes.POINTER(ctypes.c_uint8)
    i32ptr = ctypes.POINTER(ctypes.c_int32)
    fptr = ctypes.POINTER(ctypes.c_float)

    lib.kdop_vertices.restype = ctypes.c_int
    lib.kdop_vertices.argtypes = [dptr, dptr, ctypes.c_int, dptr,
                                  ctypes.c_int]
    lib.convex_fill_grid.restype = ctypes.c_int
    lib.convex_fill_grid.argtypes = [dptr, dptr, ctypes.c_int, dptr, dptr,
                                     ctypes.c_double, ctypes.c_double,
                                     u8ptr, ctypes.c_int, dptr]
    lib.voxelize_mesh.restype = None
    lib.voxelize_mesh.argtypes = [dptr, ctypes.c_int, i32ptr, ctypes.c_int,
                                  dptr, ctypes.c_double, ctypes.c_int,
                                  ctypes.c_int, ctypes.c_int, u8ptr]
    lib.occupancy_sdf.restype = None
    lib.occupancy_sdf.argtypes = [u8ptr, ctypes.c_int, ctypes.c_int,
                                  ctypes.c_int, fptr]
    _LIB = lib
    return lib


def available() -> bool:
    return load() is not None


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def kdop_vertices(normals: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    lib = load()
    normals = np.ascontiguousarray(normals, dtype=np.float64)
    offsets = np.ascontiguousarray(offsets, dtype=np.float64)
    cap = 512
    out = np.zeros((cap, 3), dtype=np.float64)
    n = lib.kdop_vertices(_dp(normals), _dp(offsets), len(offsets),
                          _dp(out), cap)
    return out[:min(n, cap)].copy()


def convex_fill_grid(normals, offsets, mesh_lower, mesh_upper, scale,
                     spacing, max_dim_cap: int = 256):
    """Returns (occupancy (D,D,D) bool, grid_lower (3,), max_dim D)."""
    lib = load()
    normals = np.ascontiguousarray(normals, dtype=np.float64)
    offsets = np.ascontiguousarray(offsets, dtype=np.float64)
    mesh_lower = np.ascontiguousarray(mesh_lower, dtype=np.float64)
    mesh_upper = np.ascontiguousarray(mesh_upper, dtype=np.float64)
    occ = np.zeros(max_dim_cap ** 3, dtype=np.uint8)
    grid_lower = np.zeros(3, dtype=np.float64)
    d = lib.convex_fill_grid(
        _dp(normals), _dp(offsets), len(offsets), _dp(mesh_lower),
        _dp(mesh_upper), float(scale), float(spacing),
        occ.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), max_dim_cap,
        _dp(grid_lower))
    if d < 0:
        raise ValueError("convex_fill_grid: max_dim_cap overflow")
    return (occ[:d ** 3].reshape(d, d, d).astype(bool), grid_lower, d)


def voxelize_mesh(vertices, indices, lower, spacing, dims):
    lib = load()
    vertices = np.ascontiguousarray(vertices, dtype=np.float64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    lower = np.ascontiguousarray(lower, dtype=np.float64)
    dx, dy, dz = dims
    occ = np.zeros(dx * dy * dz, dtype=np.uint8)
    lib.voxelize_mesh(
        _dp(vertices), vertices.shape[0],
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        indices.shape[0], _dp(lower), float(spacing), dx, dy, dz,
        occ.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return occ.reshape(dx, dy, dz).astype(bool)


def occupancy_sdf(occupancy) -> np.ndarray:
    lib = load()
    occ = np.ascontiguousarray(occupancy, dtype=np.uint8)
    dx, dy, dz = occ.shape
    out = np.zeros(dx * dy * dz, dtype=np.float32)
    lib.occupancy_sdf(
        occ.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), dx, dy, dz,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out.reshape(dx, dy, dz)
