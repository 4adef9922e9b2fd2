"""Robot-arm layer: why there is a pusher board instead of an IK-posed arm.

The reference's FlexRobotHelper (env/flex_env.py:78-158) loads a Franka /
Kinova URDF into PyBullet, mirrors each link mesh into FleX as a kinematic
triangle mesh, and drives the end effector with calculateInverseKinematics
along scripted waypoints (flex_env.py:290-305). Two facts make that whole
stack a visual, not a physical, component:

1. the robot carries a *custom pusher end-effector* (reference README
   "Load custom pybullet_data") — a board whose contact geometry is what
   the particles actually feel;
2. every learned component (dataset pusher deltas, planner gen_s_delta)
   models the interaction as exactly that board sweeping start -> end
   (planners.py:211-257, dataset_gnn_dyn.py:121-194).

This framework therefore drives the board directly (env/pusher.py) along
the same waypoint schedule. This module provides the API-compatible
attachment points so user code written against FlexRobotHelper keeps
working in spirit: joint state is reduced to the EE waypoint pose.
"""
from __future__ import annotations

import numpy as np

from . import pusher


class FlexRobotHelper:
    """API-compatible stand-in: tracks an EE pose instead of a URDF.

    loadURDF/resetJointState/getRobotShapeStates mirror the reference
    surface (env/flex_env.py:84-154); shape states returned are the pusher
    board's 14-float kinematic state."""

    def __init__(self):
        self.robotId = 0
        self.num_meshes = 1
        self.num_link = 1
        self.state_pre = None
        self.ee_pos = np.array([-100.0, 0.0, 0.0])
        self.ee_yaw = 0.0

    def loadURDF(self, fileName, basePosition, baseOrientation,
                 useFixedBase=True, globalScaling=1.0):
        self.base_position = np.asarray(basePosition, dtype=np.float64)
        return self.robotId

    def set_ee(self, pos_world, yaw: float = 0.0):
        self.ee_pos = np.asarray(pos_world, dtype=np.float64)
        self.ee_yaw = float(yaw)

    def resetJointState(self, i, pose):
        return self.getRobotShapeStates()

    def getRobotShapeStates(self) -> np.ndarray:
        center = self.ee_pos.copy()
        center[1] -= pusher.PUSHER_LENGTH / 2.0
        q = np.array([0.0, np.sin(self.ee_yaw / 2), 0.0,
                      np.cos(self.ee_yaw / 2)])
        cur = np.concatenate([center, center, q, q])[None, :]
        if self.state_pre is None:
            self.state_pre = cur.copy()
        out = cur.copy()
        out[0, 3:6] = self.state_pre[0, 0:3]
        out[0, 10:14] = self.state_pre[0, 6:10]
        self.state_pre = cur
        return out
