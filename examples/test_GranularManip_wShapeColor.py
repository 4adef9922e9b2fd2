"""Granular pushing with a per-shape colored pusher — the binding test
for colored tools over the granular solver
(PyFleX/bindings/examples/test_GranularManip_wShapeColor.py: the push of
test_GranularManip with the pusher's RGB passed through AddBox)."""
import numpy as np

from _example_utils import init, cam, frame, report, quat_from_axis_angle
from dyn_res_pile_manip_tpu import pyflex_shim as pyflex

np.random.seed(21)

frames = init(screen=360) or 120

scale = 1.5
pyflex.set_scene(18, np.array([scale, -scale / 2, 0.0, -scale / 2,
                               1.0, 1.0]), 0)
cam((0.0, 6.0, 0.01), (0.0, -np.pi / 2 + 1e-3, 0.0))

angle = np.deg2rad(35.0)
quat = quat_from_axis_angle(np.array([0.0, 1.0, 0.0]), -angle)
half = np.array([0.05, 1.0, 0.4])


def center_at(d):
    return np.array([d * np.cos(angle), half[1], d * np.sin(angle)])


dis = 1.8
pyflex.add_box(half, center_at(dis), quat, color=[0.9, 0.25, 0.15])

for i in range(frames):
    states = np.zeros((1, 14))
    states[0, 3:6] = center_at(dis)
    dis -= 0.012
    states[0, :3] = center_at(dis)
    states[0, 6:10] = states[0, 10:] = quat
    pyflex.set_shape_states(states)
    pyflex.step()
    if i % 40 == 0:
        frame("granular_colored", "GranularManip_wShapeColor", i)

report("GranularManip_wShapeColor")
pyflex.clean()
