"""Pusher kinematics: scripted waypoint sweeps of a kinematic board collider.

Replaces the reference's PyBullet-IK-driven robot arm (env/flex_env.py:248-333:
waypoints -> calculateInverseKinematics -> mirrored link meshes). The
reference robot carries a *custom end-effector* (README "Load custom
pybullet_data": a pusher board) whose contact geometry is a thin vertical
board; the planner's differentiable pusher model treats it as an
infinite-height board of half-width 0.8/24 camera units = 0.8 world units
sweeping start->end (planners.py:211-257). We animate exactly that board as
an oriented-box collider following the reference waypoint schedule:

  hover(s)+gs/24 -> s -> e -> hover(e)+gs/24, speed 1/50 world units/frame
  (env/flex_env.py:287-293), then 200 settle frames (flex_env.py:322-330).
"""
from __future__ import annotations

import dataclasses

import numpy as np

SPEED = 1.0 / 50.0          # world units per frame (flex_env.py:289)
PUSHER_HALF_WIDTH = 0.8     # long half-axis; matches gen_s_delta pusher_w*gs
PUSHER_HALF_THICK = 0.125   # along the push direction
PUSHER_LENGTH = 3.0         # board spans [ee_h - 3, ee_h]
SETTLE_FRAMES = 200


@dataclasses.dataclass
class PusherPlan:
    """Per-frame pusher poses for one push (host arrays, scan inputs)."""
    center: np.ndarray   # (T, 3)
    yaw: np.ndarray      # (T,)
    vel: np.ndarray      # (T, 3)
    active: np.ndarray   # (T,) bool
    n_frames: int        # frames actually used (rest is settle padding)


def action_waypoints(action: np.ndarray, global_scale: float,
                     robot_type: str = "franka",
                     cont_motion: bool = False,
                     last_ee: np.ndarray | None = None):
    """4-D push [xs, ys, xe, ye] -> EE waypoints in (x, y_2d, h) coords
    (flex_env.py:255-288). Returns (way_pts list, pusher_yaw)."""
    if robot_type == "franka":
        h = global_scale / 8.0
    elif robot_type == "kinova":
        h = 0.11 * global_scale
    else:
        raise NotImplementedError(robot_type)
    s_2d = np.concatenate([action[:2], [h]])
    e_2d = np.concatenate([action[2:4], [h]])
    d = s_2d - e_2d
    pusher_angle = np.pi / 2 if d[0] == 0 else np.arctan(d[1] / d[0])
    lift = np.array([0.0, 0.0, global_scale / 24.0])
    if cont_motion:
        if last_ee is None:
            last_ee = s_2d + np.array([0.0, 0.0, global_scale / 6.0])
        high = np.array([0.0, 0.0, global_scale / 6.0])
        park = e_2d + np.array([-global_scale / 3.0 - e_2d[0], 0.0,
                                global_scale / 6.0])
        way_pts = [last_ee, s_2d + high, s_2d, e_2d, e_2d + high, park]
    else:
        way_pts = [s_2d + lift, s_2d, e_2d, e_2d + lift]
    return way_pts, pusher_angle


def _ee_to_world(p: np.ndarray) -> np.ndarray:
    """(x, y_2d, h) EE coords -> world (x, h, -y_2d), the bullet->flex basis
    change (flex_env.py:80-81 with the planner's s_3d convention)."""
    return np.array([p[0], p[2], -p[1]])


def plan_push(action: np.ndarray, global_scale: float,
              robot_type: str = "franka", cont_motion: bool = False,
              last_ee: np.ndarray | None = None,
              frame_bucket: int = 128,
              fixed_total: int | None = None) -> PusherPlan:
    """Build the per-frame pusher pose schedule for one 4-D push.

    The total frame count is padded up to a multiple of ``frame_bucket``
    with extra settle frames (pusher inactive) so jitted push programs are
    reused across pushes; ``fixed_total`` pins every push to one length
    (a single compiled program per scene — extra frames are just settle).
    """
    way_pts, angle = action_waypoints(action, global_scale, robot_type,
                                      cont_motion, last_ee)
    # board's long axis perpendicular to the push direction
    d2 = np.asarray(action[2:4], dtype=np.float64) - np.asarray(
        action[:2], dtype=np.float64)
    if np.linalg.norm(d2) < 1e-9:
        d2 = np.array([1.0, 0.0])
    push_dir_world = np.array([d2[0], 0.0, -d2[1]])
    push_dir_world /= np.linalg.norm(push_dir_world)
    # world_from_box x-axis = (cos yaw, 0, -sin yaw); align with push dir
    yaw = np.arctan2(-push_dir_world[2], push_dir_world[0])

    centers, vels = [], []
    for i_p in range(len(way_pts) - 1):
        s, e = way_pts[i_p], way_pts[i_p + 1]
        steps = int(np.linalg.norm(e - s) / SPEED) + 1
        for i in range(steps):
            ee = s + (e - s) * i / steps
            w = _ee_to_world(ee)
            # board hangs below the EE: center y = ee_h - L/2
            centers.append([w[0], w[1] - PUSHER_LENGTH / 2.0 + 0.01, w[2]])
            vels.append(_ee_to_world(e) - _ee_to_world(s))
    centers = np.asarray(centers, dtype=np.float32)
    vels = np.asarray(vels, dtype=np.float32)
    norms = np.linalg.norm(vels, axis=1, keepdims=True)
    vels = np.where(norms > 1e-9, vels / np.maximum(norms, 1e-9) * SPEED, 0.0)
    vels = vels * 60.0  # per-frame displacement -> units/sec (dt = 1/60)

    n_push = centers.shape[0]
    total = n_push + SETTLE_FRAMES
    total = int(np.ceil(total / frame_bucket) * frame_bucket)
    if fixed_total is not None:
        total = max(total, int(fixed_total))

    center = np.zeros((total, 3), dtype=np.float32)
    center[:n_push] = centers
    center[n_push:] = [0.0, -100.0, 0.0]   # parked (arm reset to rest pose)
    vel = np.zeros((total, 3), dtype=np.float32)
    vel[:n_push] = vels
    yaw_arr = np.full((total,), yaw, dtype=np.float32)
    active = np.zeros((total,), dtype=bool)
    active[:n_push] = True
    return PusherPlan(center=center, yaw=yaw_arr, vel=vel, active=active,
                      n_frames=total)


def pusher_half_extents() -> np.ndarray:
    return np.array([PUSHER_HALF_THICK, PUSHER_LENGTH / 2.0,
                     PUSHER_HALF_WIDTH], dtype=np.float32)
