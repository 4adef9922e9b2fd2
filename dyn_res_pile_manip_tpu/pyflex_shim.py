"""pyflex-compatible module API over the TPU simulator.

Mirrors the Python-visible surface of the reference's pybind11 module
(PyFleX/bindings/pyflex.cpp:3794-3876): init / set_scene / step / render /
get_positions / set_positions / add_box / set_shape_states / camera
getters-setters / clean — so reference-style smoke scripts
(PyFleX/bindings/examples/test_*.py) port with an import swap.

Robot-mesh mirroring (add_mesh + per-link shape states) is intentionally a
kinematic no-op: the physics-relevant end effector is the pusher board the
env drives directly (see env/pusher.py).
"""
from __future__ import annotations

import numpy as np

from .core.camera import Camera, projection_matrix, view_matrix
from .core.types import Colliders
from .env import scene as scene_lib
from .render import raster
from .sim import pbd


class _Runtime:
    def __init__(self):
        self.screen_w = 720
        self.screen_h = 720
        self.cam_pos = np.array([0.0, 18.0, 0.0])
        self.cam_angle = np.array([0.0, -np.pi / 2.0, 0.0])
        self.light_dir = np.array([0.1, 2.0, 0.1])
        self.light_fov = 70.0
        self.state = None
        self.sim_params = None
        self.build = None
        self.colliders = Colliders.ground_only(num_boxes=8)
        self.n_boxes = 1  # slot 0 reserved for a kinematic pusher
        self.n_capsules = 0
        self.grid = pbd.default_grid(24.0)
        self.seed = 0


_rt = _Runtime()


def init(headless: bool = True, *_args):
    return None


def clean():
    _rt.state = None


def set_screenWidth(w):
    _rt.screen_w = int(w)


def set_screenHeight(h):
    _rt.screen_h = int(h)


def set_light_dir(d):
    _rt.light_dir = np.asarray(d)


def set_light_fov(f):
    _rt.light_fov = float(f)


def set_camPos(p):
    _rt.cam_pos = np.asarray(p, dtype=np.float64)


def set_camAngle(a):
    _rt.cam_angle = np.asarray(a, dtype=np.float64)


def set_scene(idx, scene_params, thread_idx=0):
    _rt.seed += 1
    state, params, build = scene_lib.set_scene(
        int(idx), np.asarray(scene_params, np.float64), seed=_rt.seed)
    _rt.state, _rt.sim_params, _rt.build = state, params, build
    _rt.colliders = Colliders.ground_only(num_boxes=8)
    _rt.n_boxes = 1
    _rt.n_capsules = 0


def get_n_particles():
    return int(np.asarray(_rt.state.active).sum())


def get_positions():
    act = np.asarray(_rt.state.active)
    xs = np.asarray(_rt.state.x)[act]
    invm = np.asarray(_rt.state.invm)[act]
    return np.concatenate([xs, invm[:, None]], axis=1).reshape(-1)


def set_positions(positions):
    import jax.numpy as jnp

    pos = np.asarray(positions).reshape(-1, 4)
    x = np.asarray(_rt.state.x).copy()
    x[:pos.shape[0]] = pos[:, :3]
    _rt.state = _rt.state.replace(x=jnp.asarray(x),
                                  v=jnp.zeros_like(_rt.state.v))


def step(*_args, **_kw):
    lower, dims = _rt.grid
    _rt.state = pbd.step_frame(_rt.state, _rt.sim_params, _rt.colliders,
                               lower, dims)


def _yaw_from_quat(q):
    x, y, z, w = [float(v) for v in q]
    return np.arctan2(2.0 * (w * y + x * z), 1.0 - 2.0 * (y * y + z * z))


def add_box(halfEdge, center, quat, hideShape=0, color=None):
    b = _rt.n_boxes
    _rt.colliders = _rt.colliders.with_box(
        b, np.asarray(center), np.asarray(halfEdge),
        yaw=_yaw_from_quat(quat), active=True)
    _rt.n_boxes += 1
    return b


def add_capsule(radius, half_length, center, quat, hideShape=0,
                color=None):
    """Kinematic capsule along the local x-axis (AddCapsule parity)."""
    import numpy as _np

    x, y, z, w = [float(v) for v in quat]
    # rotate the local x axis by the quaternion
    axis = _np.array([1 - 2 * (y * y + z * z),
                      2 * (x * y + z * w),
                      2 * (x * z - y * w)])
    c = _np.asarray(center, dtype=_np.float64)
    i = _rt.n_capsules
    _rt.colliders = _rt.colliders.with_capsule(
        i, c - axis * half_length, c + axis * half_length, radius,
        active=True)
    _rt.n_capsules += 1
    return i


def add_mesh(path, scaling, hideShape=0, color=None):
    return -1  # robot visual meshes: kinematic no-op (see module docstring)


def set_shape_states(states):
    """states: (S, 14) rows [pos(3), prev(3), quat(4), prev_quat(4)];
    rows beyond the tracked boxes (robot links) are ignored."""
    states = np.asarray(states).reshape(-1, 14)
    col = _rt.colliders
    for i in range(min(states.shape[0], _rt.n_boxes - 1)):
        col = col.with_box(1 + i, states[i, :3], np.asarray(
            col.box_half[1 + i]), yaw=_yaw_from_quat(states[i, 6:10]),
            active=True)
    _rt.colliders = col


def get_shape_states():
    col = _rt.colliders
    out = np.zeros((_rt.n_boxes - 1, 14))
    for i in range(1, _rt.n_boxes):
        c = np.asarray(col.box_center[i])
        yaw = float(col.box_yaw[i])
        q = np.array([0.0, np.sin(yaw / 2), 0.0, np.cos(yaw / 2)])
        out[i - 1] = np.concatenate([c, c, q, q])
    return out


def _camera():
    return Camera(width=_rt.screen_w, height=_rt.screen_h,
                  cam_pos=tuple(_rt.cam_pos), cam_angle=tuple(_rt.cam_angle))


def render(render_depth: bool = True, *_args):
    import jax.numpy as jnp

    cam = _camera()
    fx, fy, cx, cy = cam.cam_params()
    obs = raster.render_rgbd(
        _rt.state.x, _rt.state.active, _rt.colliders,
        jnp.asarray(cam.opencv_from_world(), jnp.float32), fx, fy, cx, cy,
        jnp.asarray(_rt.build.color, jnp.float32),
        jnp.float32(float(_rt.sim_params.radius) * 0.5),
        width=cam.width, height=cam.height)
    obs = np.asarray(obs)
    if not render_depth:
        obs = obs[..., :4]
    return obs.reshape(-1)


def get_projMatrix():
    return projection_matrix(_rt.screen_w, _rt.screen_h).T.reshape(-1)


def get_viewMatrix():
    return view_matrix(_rt.cam_pos, _rt.cam_angle).T.reshape(-1)
