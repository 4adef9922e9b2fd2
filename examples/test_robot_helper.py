"""Robot-helper binding test: FK/IK roundtrip + link mirroring into a
live scene — the role of PyFleX/bindings/examples/test_pybullet_kuka.py
(which smoke-tests the pybullet-backed FlexRobotHelper; ours is the
analytic, pybullet-free Panda chain, env/robot.py)."""
import numpy as np

from _example_utils import init, cam, frame, report, mirror_arm
from dyn_res_pile_manip_tpu import pyflex_shim as pyflex
from dyn_res_pile_manip_tpu.env.robot import FlexRobotHelper

np.random.seed(23)

frames = init(screen=360) or 90

robot = FlexRobotHelper()
robot.loadURDF(None, basePosition=[2.0, 0.0, 0.0],
               baseOrientation=[0, 0, 0, 1], globalScaling=2.0)

# IK accuracy over a waypoint ring inside the workspace
errs = []
for k in range(12):
    th = 2 * np.pi * k / 12
    target = np.array([2.0 + 1.0 * np.cos(th), 0.8, 1.0 * np.sin(th)])
    robot.set_ee(target)
    states = robot.getRobotShapeStates()
    assert states.shape == (robot.num_link, 14)
    # the flange (row -2) should track the EE waypoint
    errs.append(np.linalg.norm(states[-2, :3] - target))
print(f"IK flange error over 12 waypoints: mean={np.mean(errs):.3f} "
      f"max={np.max(errs):.3f} (arm scale 2.0)")

# per-joint driving (resetJointState) must move the chain
s0 = robot.getRobotShapeStates()[:, :3].copy()
robot.resetJointState(2, 0.9)
s1 = robot.getRobotShapeStates()[:, :3]
assert np.abs(s1 - s0).max() > 1e-3, "joint drive had no effect"

# mirror the arm over a small granular scene and render
pyflex.set_scene(18, np.array([0.8, -0.4, 0.0, -0.4, 1.0, 1.0]), 0)
cam((0.0, 4.0, 3.0), (0.0, -0.9, 0.0))
for i in range(frames):
    robot.set_ee(np.array([1.0 * np.cos(i * 0.05), 0.8,
                           1.0 * np.sin(i * 0.05)]))
    mirror_arm(robot)
    pyflex.step()
    if i % 40 == 0:
        frame("robot_helper", "robot_helper", i)

report("robot_helper")
pyflex.clean()
