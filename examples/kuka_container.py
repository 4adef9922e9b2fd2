"""A robot arm working over a walled container of grains — the binding
test combining the robot helper, container boxes, and the granular
solver (PyFleX/bindings/examples/kuka_container.py)."""
import numpy as np

from _example_utils import (init, cam, frame, report, mirror_arm,
                            glass_walls, add_glass)
from dyn_res_pile_manip_tpu import pyflex_shim as pyflex
from dyn_res_pile_manip_tpu.env.robot import FlexRobotHelper

np.random.seed(22)

frames = init(screen=360) or 150

scale = 1.2
pyflex.set_scene(18, np.array([scale, -scale / 2, 0.0, -scale / 2,
                               1.0, 1.0]), 0)
cam((0.0, 4.5, 3.5), (0.0, -0.9, 0.0))

# container walls around the pile
walls = glass_walls(dis_x=2.6, dis_z=2.6, height=1.0, border=0.1)
add_glass(walls, (0.0, 0.0, 0.0))

robot = FlexRobotHelper()
robot.loadURDF(None, basePosition=[2.6, 0.0, 0.0],
               baseOrientation=[0, 0, 0, 1], globalScaling=3.0)

for i in range(frames):
    # sweep the EE across the container
    ee = np.array([1.2 * np.cos(i * 0.03), 0.9,
                   1.2 * np.sin(i * 0.03)])
    robot.set_ee(ee, yaw=i * 0.03)
    mirror_arm(robot)
    pyflex.step()
    if i % 40 == 0:
        frame("kuka_container", "kuka_container", i)

report("kuka_container")
pyflex.clean()
