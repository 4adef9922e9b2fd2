"""Fluid manipulation with a visible robot arm mirrored into the scene —
the binding test for robot-link mirroring during manipulation
(PyFleX/bindings/examples/test_FluidManip_wKuka.py: the paddle of
test_FluidManip is carried by an arm whose links follow the end
effector; our FlexRobotHelper is the pybullet-free analytic chain,
env/robot.py)."""
import numpy as np

from _example_utils import init, cam, frame, report, mirror_arm
from dyn_res_pile_manip_tpu import pyflex_shim as pyflex
from dyn_res_pile_manip_tpu.env.robot import FlexRobotHelper

np.random.seed(18)

frames = init() or 200

params = np.concatenate([
    [1.0], [0.05, 0.0, 0.05, 8, 6, 6, 1.0],
    [0.0], [2.0, 0.0]])
pyflex.set_scene(19, params)
cam((0.6, 1.3, 2.2))

robot = FlexRobotHelper()
robot.loadURDF(None, basePosition=[1.6, 0.0, 0.2],
               baseOrientation=[0, 0, 0, 1], globalScaling=1.5)

quat = np.array([0.0, 0.0, 0.0, 1.0])
half = np.array([0.02, 0.2, 0.12])
c0 = np.array([0.1, 0.2, 0.2])
pyflex.add_box(half, c0, quat)

last = c0.copy()
for i in range(frames):
    cur = c0 + np.array([0.25 * (1 - np.cos(i * 0.04)), 0.0, 0.0])
    states = np.zeros((1, 14))
    states[0, :3] = cur
    states[0, 3:6] = last
    states[0, 6:10] = states[0, 10:] = quat
    pyflex.set_shape_states(states)
    last = cur
    # arm follows the paddle handle
    robot.set_ee(cur + np.array([0.0, 0.25, 0.0]))
    mirror_arm(robot)
    pyflex.step()
    if i % 40 == 0:
        frame("fluid_manip_kuka", "FluidManip_wKuka", i)

report("FluidManip_wKuka")
pyflex.clean()
