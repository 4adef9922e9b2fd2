"""Camera model — the single owner of every load-bearing optical constant.

Reproduces the reference camera contract exactly (all cites are reference
files):

- projection: 45 deg vertical fov, aspect W/H, near 0.01, far 1000
  (PyFleX/bindings/pyflex.cpp:1246-1248, 3501-3518; g_camNear/g_camFar).
- view matrix: RotY(-ax) * Rot(-ay, axis=(cos(-ax),0,sin(-ax))) * T(-pos)
  (pyflex.cpp:1247).
- ``get_cam_params`` -> [fx, fy, cx, cy] with fx = proj[0,0]*W/2
  (env/flex_env.py:1135-1142).
- ``get_cam_extrinsics`` -> the 4x4 GL view matrix (env/flex_env.py:1144-1145).
- depth channel is *linear eye-space depth in world units* ("meters"):
  z_lin = 2 n f / (f + n - z_ndc (f - n)) (pyflex.cpp:3775-3784).
- default MPC camera: top-down at height 6/8*global_scale, angle
  (rad, -90deg, 0) with rad = cam_idx*20deg (env/flex_env.py:192-201).
- OpenGL->OpenCV frame change used everywhere by perception and rewards:
  opencv_T_opengl = diag(1,-1,-1,1) (planners.py:197-206, utils.py:479-489).
"""
from __future__ import annotations

import dataclasses

import numpy as np

OPENCV_T_OPENGL = np.array(
    [[1.0, 0, 0, 0], [0, -1.0, 0, 0], [0, 0, -1.0, 0], [0, 0, 0, 1.0]]
)


def projection_matrix(width: int, height: int, fov_deg: float = 45.0,
                      near: float = 0.01, far: float = 1000.0) -> np.ndarray:
    """Standard OpenGL perspective projection (gluPerspective)."""
    aspect = float(width) / float(height)
    f = 1.0 / np.tan(np.deg2rad(fov_deg) / 2.0)
    proj = np.zeros((4, 4))
    proj[0, 0] = f / aspect
    proj[1, 1] = f
    proj[2, 2] = (far + near) / (near - far)
    proj[2, 3] = (2.0 * far * near) / (near - far)
    proj[3, 2] = -1.0
    return proj


def _rotation(axis: np.ndarray, angle: float) -> np.ndarray:
    """4x4 right-handed rotation about ``axis`` by ``angle`` (radians)."""
    axis = np.asarray(axis, dtype=np.float64)
    axis = axis / np.linalg.norm(axis)
    x, y, z = axis
    c, s = np.cos(angle), np.sin(angle)
    C = 1 - c
    m = np.eye(4)
    m[:3, :3] = np.array([
        [x * x * C + c, x * y * C - z * s, x * z * C + y * s],
        [y * x * C + z * s, y * y * C + c, y * z * C - x * s],
        [z * x * C - y * s, z * y * C + x * s, z * z * C + c],
    ])
    return m


def view_matrix(cam_pos: np.ndarray, cam_angle: np.ndarray) -> np.ndarray:
    """GL view matrix, mirroring the reference composition.

    view = R(-ax, y-axis) @ R(-ay, (cos(-ax), 0, sin(-ax))) @ T(-pos)
    """
    ax, ay, _ = [float(a) for a in cam_angle]
    t = np.eye(4)
    t[:3, 3] = -np.asarray(cam_pos, dtype=np.float64)
    r1 = _rotation(np.array([0.0, 1.0, 0.0]), -ax)
    r2 = _rotation(np.array([np.cos(-ax), 0.0, np.sin(-ax)]), -ay)
    return r1 @ r2 @ t


@dataclasses.dataclass(frozen=True)
class Camera:
    """An immutable pinhole camera in the reference's conventions."""

    width: int = 720
    height: int = 720
    cam_pos: tuple = (0.0, 18.0, 0.0)
    cam_angle: tuple = (0.0, -np.pi / 2.0, 0.0)
    fov_deg: float = 45.0
    near: float = 0.01
    far: float = 1000.0

    @staticmethod
    def default(global_scale: float = 24.0, cam_idx: int = 0,
                width: int = 720, height: int = 720) -> "Camera":
        """The top-down MPC camera (env/flex_env.py:192-201)."""
        rad = np.deg2rad(cam_idx * 20.0)
        cam_dis = 0.0 * global_scale / 8.0
        cam_height = 6.0 * global_scale / 8.0
        pos = (np.sin(rad) * cam_dis, cam_height, np.cos(rad) * cam_dis)
        ang = (rad, -np.deg2rad(90.0), 0.0)
        return Camera(width=width, height=height, cam_pos=pos, cam_angle=ang)

    @staticmethod
    def side(global_scale: float, cam_idx: int,
             width: int = 720, height: int = 720) -> "Camera":
        """The auxiliary tilted cameras (env/flex_env.py:889-894)."""
        rad = np.deg2rad(cam_idx * 45.0)
        cam_dis = 7.0 * global_scale / 8.0
        cam_height = 4.0 * global_scale / 8.0
        pos = (np.sin(rad) * cam_dis, cam_height, np.cos(rad) * cam_dis)
        ang = (rad, -np.deg2rad(25.0), 0.0)
        return Camera(width=width, height=height, cam_pos=pos, cam_angle=ang)

    @property
    def proj(self) -> np.ndarray:
        return projection_matrix(self.width, self.height, self.fov_deg,
                                 self.near, self.far)

    @property
    def view(self) -> np.ndarray:
        return view_matrix(np.asarray(self.cam_pos), np.asarray(self.cam_angle))

    def cam_params(self) -> list:
        """[fx, fy, cx, cy] exactly as env/flex_env.py:1135-1142."""
        proj = self.proj
        cx = self.width / 2.0
        cy = self.height / 2.0
        return [proj[0, 0] * cx, proj[1, 1] * cy, cx, cy]

    def extrinsics(self) -> np.ndarray:
        """The 4x4 GL view matrix (env/flex_env.py:1144-1145)."""
        return self.view

    def opencv_from_world(self) -> np.ndarray:
        """Matrix taking world (GL) points to OpenCV camera coordinates.

        cam_cv = inv(opencv_T_opengl) @ view @ world; perception divides the
        result by global_scale (planners.py:192-209, utils.py:479-489).
        """
        return np.linalg.inv(OPENCV_T_OPENGL) @ self.view
