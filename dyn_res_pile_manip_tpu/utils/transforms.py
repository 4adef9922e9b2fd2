"""Quaternion / rotation-matrix conversions.

Covers the subset of the reference's vendored transformations.py that the
robot-state mirroring uses (quaternion_from_matrix, quaternion_matrix,
rotation_matrix — flex_env.py:16,145-150), plus the axis-angle helper
(flex_env.py:31-42). Quaternions are (x, y, z, w) to match the reference's
shape-state layout.
"""
from __future__ import annotations

import numpy as np


def rotation_matrix(angle: float, direction, point=None) -> np.ndarray:
    """4x4 rotation about an axis through ``point`` (or origin)."""
    d = np.asarray(direction, dtype=np.float64)
    d = d / np.linalg.norm(d)
    s, c = np.sin(angle), np.cos(angle)
    C = 1.0 - c
    x, y, z = d
    m = np.eye(4)
    m[:3, :3] = np.array([
        [x * x * C + c, x * y * C - z * s, x * z * C + y * s],
        [y * x * C + z * s, y * y * C + c, y * z * C - x * s],
        [z * x * C - y * s, z * y * C + x * s, z * z * C + c]])
    if point is not None:
        p = np.asarray(point[:3], dtype=np.float64)
        m[:3, 3] = p - m[:3, :3] @ p
    return m


def quaternion_matrix(q) -> np.ndarray:
    """(x, y, z, w) quaternion -> 4x4 rotation matrix."""
    x, y, z, w = [float(v) for v in q]
    n = x * x + y * y + z * z + w * w
    if n < 1e-12:
        return np.eye(4)
    s = 2.0 / n
    m = np.eye(4)
    m[:3, :3] = np.array([
        [1 - s * (y * y + z * z), s * (x * y - z * w), s * (x * z + y * w)],
        [s * (x * y + z * w), 1 - s * (x * x + z * z), s * (y * z - x * w)],
        [s * (x * z - y * w), s * (y * z + x * w), 1 - s * (x * x + y * y)]])
    return m


def quaternion_from_matrix(matrix) -> np.ndarray:
    """4x4 (or 3x3) rotation matrix -> (x, y, z, w) quaternion."""
    m = np.asarray(matrix, dtype=np.float64)[:3, :3]
    t = np.trace(m)
    if t > 0:
        s = 0.5 / np.sqrt(t + 1.0)
        w = 0.25 / s
        x = (m[2, 1] - m[1, 2]) * s
        y = (m[0, 2] - m[2, 0]) * s
        z = (m[1, 0] - m[0, 1]) * s
    else:
        i = int(np.argmax(np.diag(m)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = 2.0 * np.sqrt(max(1e-12, 1.0 + m[i, i] - m[j, j] - m[k, k]))
        q = np.zeros(3)
        q[i] = 0.25 * s
        q[j] = (m[j, i] + m[i, j]) / s
        q[k] = (m[k, i] + m[i, k]) / s
        w = (m[k, j] - m[j, k]) / s
        x, y, z = q
    return np.array([x, y, z, w])


def quat_from_axis_angle(axis, angle: float) -> np.ndarray:
    """(x, y, z, w) quaternion from axis-angle (flex_env.py:31-42)."""
    axis = np.asarray(axis, dtype=np.float64)
    axis = axis / np.linalg.norm(axis)
    half = angle * 0.5
    return np.concatenate([axis * np.sin(half), [np.cos(half)]])
