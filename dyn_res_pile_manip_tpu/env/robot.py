"""Robot-arm layer: kinematic Franka chain without PyBullet.

The reference's FlexRobotHelper (env/flex_env.py:78-158) loads a Franka /
Kinova URDF into PyBullet, mirrors each link mesh into FleX as a kinematic
triangle mesh, and drives the end effector with calculateInverseKinematics
along scripted waypoints (flex_env.py:290-305). Two facts make that whole
stack a visual, not a physical, component in the pile task:

1. the robot carries a *custom pusher end-effector* (reference README
   "Load custom pybullet_data") — a board whose contact geometry is what
   the particles actually feel;
2. every learned component (dataset pusher deltas, planner gen_s_delta)
   models the interaction as exactly that board sweeping start -> end
   (planners.py:211-257, dataset_gnn_dyn.py:121-194).

This framework therefore drives the board directly (env/pusher.py) for
physics — and this module provides the arm itself the TPU-native way:
an analytic modified-DH Franka Panda chain with damped-least-squares IK
(host NumPy, no URDF/PyBullet dependency), whose per-link world poses are
exposed through the reference's getRobotShapeStates surface and whose
link segments can be mirrored into the renderer as capsules (the visible
arm in videos; pyflex.cpp DrawShapes:1525-1620's role).
"""
from __future__ import annotations

import numpy as np

from . import pusher

# Franka Panda modified-DH table (Craig convention), public parameters:
# rows (a, d, alpha) for joints 1..7 plus the flange offset.
_PANDA_DH = np.array([
    # a      d       alpha
    [0.0,    0.333,  0.0],
    [0.0,    0.0,   -np.pi / 2],
    [0.0,    0.316,  np.pi / 2],
    [0.0825, 0.0,    np.pi / 2],
    [-0.0825, 0.384, -np.pi / 2],
    [0.0,    0.0,    np.pi / 2],
    [0.088,  0.0,    np.pi / 2],
])
_FLANGE_D = 0.107
_Q_HOME = np.array([0.0, -0.3, 0.0, -2.2, 0.0, 2.0, 0.785])
_Q_LO = np.array([-2.897, -1.763, -2.897, -3.072, -2.897, -0.018, -2.897])
_Q_HI = np.array([2.897, 1.763, 2.897, -0.07, 2.897, 3.752, 2.897])


def _dh_transform(a, d, alpha, theta):
    ca, sa = np.cos(alpha), np.sin(alpha)
    ct, st = np.cos(theta), np.sin(theta)
    return np.array([
        [ct, -st, 0.0, a],
        [st * ca, ct * ca, -sa, -d * sa],
        [st * sa, ct * sa, ca, d * ca],
        [0.0, 0.0, 0.0, 1.0],
    ])


def _mat_to_quat(R):
    """3x3 rotation -> xyzw quaternion (pybullet convention)."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array([(R[2, 1] - R[1, 2]) / s, (R[0, 2] - R[2, 0]) / s,
                         (R[1, 0] - R[0, 1]) / s, 0.25 * s])
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(max(1.0 + R[i, i] - R[j, j] - R[k, k], 1e-12)) * 2
    q = np.zeros(4)
    q[i] = 0.25 * s
    q[j] = (R[j, i] + R[i, j]) / s
    q[k] = (R[k, i] + R[i, k]) / s
    q[3] = (R[k, j] - R[j, k]) / s
    return q


class PandaChain:
    """Analytic Panda FK/IK in its own (bullet-style, z-up) base frame."""

    def fk_frames(self, q) -> list:
        """Joint angles (7,) -> list of 9 4x4 frames (base, 7 joints,
        flange), in the unscaled robot base frame."""
        frames = [np.eye(4)]
        T = np.eye(4)
        for i in range(7):
            a, d, alpha = _PANDA_DH[i]
            T = T @ _dh_transform(a, d, alpha, q[i])
            frames.append(T.copy())
        T = T @ _dh_transform(0.0, _FLANGE_D, 0.0, 0.0)
        frames.append(T)
        return frames

    def ee(self, q) -> np.ndarray:
        return self.fk_frames(q)[-1][:3, 3]

    def ik(self, target, q0=None, iters=60, damping=1e-2,
           tol=1e-4) -> np.ndarray:
        """Damped-least-squares position IK (the role of
        p.calculateInverseKinematics, flex_env.py:297)."""
        q = (_Q_HOME if q0 is None else np.asarray(q0, np.float64)).copy()
        target = np.asarray(target, np.float64)
        for _ in range(iters):
            frames = self.fk_frames(q)
            p_ee = frames[-1][:3, 3]
            err = target - p_ee
            if np.linalg.norm(err) < tol:
                break
            # joint i rotates about the z axis of its own (post-joint)
            # frame in modified DH
            J = np.zeros((3, 7))
            for i in range(7):
                J[:, i] = np.cross(self._axis(frames, i),
                                   p_ee - frames[i + 1][:3, 3])
            JJT = J @ J.T + damping * np.eye(3)
            dq = J.T @ np.linalg.solve(JJT, err)
            q = np.clip(q + dq, _Q_LO, _Q_HI)
        return q

    @staticmethod
    def _axis(frames, i):
        """Rotation axis of joint i+1 in base coords (z of frame i+1 in
        modified DH)."""
        return frames[i + 1][:3, 2]


class FlexRobotHelper:
    """Reference surface (env/flex_env.py:84-154) over the analytic chain.

    loadURDF takes the same arguments; joint state is driven either
    per-joint (resetJointState) or from an EE waypoint (set_ee -> IK).
    getRobotShapeStates returns one 14-float kinematic row per link
    (base + 7 joints + flange + pusher board), in FleX world coordinates
    (bullet z-up -> flex y-up, flex_env.py:79-81)."""

    transform_bullet_to_flex = np.array([
        [1, 0, 0, 0], [0, 0, 1, 0], [0, -1, 0, 0], [0, 0, 0, 1]],
        dtype=np.float64)

    def __init__(self):
        self.robotId = 0
        self.chain = PandaChain()
        self.q = _Q_HOME.copy()
        self.scaling = 1.0
        self.base_position = np.zeros(3)
        self.num_link = 10          # base + 7 joints + flange + pusher
        self.num_meshes = self.num_link
        self.state_pre = None
        self.ee_pos = np.array([-100.0, 0.0, 0.0])
        self.ee_yaw = 0.0

    def loadURDF(self, fileName, basePosition, baseOrientation,
                 useFixedBase=True, globalScaling=1.0):
        self.base_position = np.asarray(basePosition, dtype=np.float64)
        self.scaling = float(globalScaling)
        return self.robotId

    # ------------------------------------------------------------ driving
    def set_ee(self, pos_world, yaw: float = 0.0):
        """Pose the arm so the flange sits above the pusher EE point
        (FleX world coords, y up). IK runs in the unscaled robot frame."""
        self.ee_pos = np.asarray(pos_world, dtype=np.float64)
        self.ee_yaw = float(yaw)
        # world (y-up) -> robot base frame (z-up, unscaled)
        rel = (self.ee_pos - self.base_position) / max(self.scaling, 1e-9)
        target = np.array([rel[0], -rel[2], rel[1]])
        reach = np.linalg.norm(target)
        if reach > 1.1:                       # clamp into the workspace
            target = target * (1.1 / reach)
        self.q = self.chain.ik(target, q0=self.q)

    def resetJointState(self, i, pose):
        if 0 <= i < 7:
            self.q[i] = float(pose)
        return self.getRobotShapeStates()

    # ------------------------------------------------------------- states
    def _link_frames_world(self):
        frames = self.chain.fk_frames(self.q)
        out = []
        B = self.transform_bullet_to_flex
        for T in frames:
            Tw = T.copy()
            Tw[:3, 3] *= self.scaling
            Tw = B @ Tw
            Tw[:3, 3] += self.base_position
            out.append(Tw)
        return out

    def getRobotShapeStates(self) -> np.ndarray:
        rows = []
        for Tw in self._link_frames_world():
            pos = Tw[:3, 3]
            quat = _mat_to_quat(Tw[:3, :3])
            rows.append(np.concatenate([pos, pos, quat, quat]))
        # the pusher board hangs from the EE waypoint (env/pusher.py)
        center = self.ee_pos.copy()
        center[1] -= pusher.PUSHER_LENGTH / 2.0
        q = np.array([0.0, np.sin(self.ee_yaw / 2), 0.0,
                      np.cos(self.ee_yaw / 2)])
        rows.append(np.concatenate([center, center, q, q]))
        cur = np.stack(rows)
        if self.state_pre is None:
            self.state_pre = cur.copy()
        out = cur.copy()
        out[:, 3:6] = self.state_pre[:, 0:3]
        out[:, 10:14] = self.state_pre[:, 6:10]
        self.state_pre = cur
        return out

    def link_capsules(self):
        """(p0, p1, radius) per arm segment in FleX world coords — the
        render/collision proxies for the visible arm (the reference
        mirrors link meshes; capsules are the TPU-native equivalent)."""
        frames = self._link_frames_world()
        pts = [T[:3, 3] for T in frames]
        caps = []
        r = 0.055 * self.scaling
        for i in range(len(pts) - 1):
            if np.linalg.norm(pts[i + 1] - pts[i]) < 1e-6:
                continue
            caps.append((pts[i], pts[i + 1], r))
        # flange -> EE connector
        caps.append((pts[-1], self.ee_pos, r * 0.8))
        return caps
