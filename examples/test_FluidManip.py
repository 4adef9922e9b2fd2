"""Stirring a fluid tank with a kinematic paddle — the binding test for
the composable fluid+rigid scene and moving-tool interaction
(PyFleX/bindings/examples/test_FluidManip.py; scene 19 =
yz_fluid_and_box.h, params [n_fluid, (pos dims invMass)*n, n_rigid,
(pos size invMass rgb)*n, viscosity, draw_mesh])."""
import numpy as np

from _example_utils import init, cam, frame, report
from dyn_res_pile_manip_tpu import pyflex_shim as pyflex

np.random.seed(17)

frames = init() or 200

params = np.concatenate([
    [1.0],                                  # one fluid block
    [0.05, 0.0, 0.05, 8, 6, 6, 1.0],
    [1.0],                                  # one rigid box floating in it
    [0.2, 0.35, 0.15, 0.15, 0.1, 0.1, 0.5, 0.8, 0.4, 0.2],
    [2.0, 0.0]])                            # viscosity, draw_mesh
pyflex.set_scene(19, params)
cam((0.4, 1.1, 1.9))

quat = np.array([0.0, 0.0, 0.0, 1.0])
half = np.array([0.02, 0.25, 0.12])
c0 = np.array([0.05, 0.25, 0.2])
pyflex.add_box(half, c0, quat)

last = c0.copy()
for i in range(frames):
    cur = c0 + np.array([0.25 * (1 - np.cos(i * 0.04)), 0.0,
                         0.1 * np.sin(i * 0.08)])
    states = np.zeros((1, 14))
    states[0, :3] = cur
    states[0, 3:6] = last
    states[0, 6:10] = states[0, 10:] = quat
    pyflex.set_shape_states(states)
    last = cur
    pyflex.step()
    if i % 40 == 0:
        frame("fluid_manip", "FluidManip", i)

report("FluidManip")
pyflex.clean()
