"""Fluid manipulation with arm + per-shape colored container — the
binding test for the AddBox color argument
(PyFleX/bindings/examples/test_FluidManip_wKuka_wShapeColor.py)."""
import numpy as np

from _example_utils import (init, cam, frame, report, mirror_arm,
                            glass_walls)
from dyn_res_pile_manip_tpu import pyflex_shim as pyflex
from dyn_res_pile_manip_tpu.env.robot import FlexRobotHelper

np.random.seed(19)

frames = init() or 160

params = np.concatenate([
    [1.0], [0.05, 0.0, 0.05, 8, 6, 6, 1.0],
    [0.0], [2.0, 0.0]])
pyflex.set_scene(19, params)
cam((0.6, 1.3, 2.2))

# colored tank walls (per-shape colors)
wall_colors = [[0.8, 0.2, 0.2], [0.2, 0.7, 0.3],
               [0.2, 0.3, 0.8], [0.9, 0.7, 0.1]]
quat = np.array([0.0, 0.0, 0.0, 1.0])
for (half, c), col in zip(glass_walls(0.9, 0.65, 0.5), wall_colors):
    pyflex.add_box(np.array(half), np.array(c) + [0.25, 0.0, 0.2],
                   quat, color=col)

robot = FlexRobotHelper()
robot.loadURDF(None, basePosition=[1.6, 0.0, 0.2],
               baseOrientation=[0, 0, 0, 1], globalScaling=1.5)

for i in range(frames):
    robot.set_ee(np.array([0.3 + 0.2 * np.sin(i * 0.05), 0.5, 0.2]))
    mirror_arm(robot)
    pyflex.step()
    if i % 40 == 0:
        frame("fluid_manip_colored", "FluidManip_wKuka_wShapeColor", i)

report("FluidManip_wKuka_wShapeColor")
pyflex.clean()
