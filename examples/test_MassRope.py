"""A rigid ball swinging from a pinned rope — the binding test for
spring ropes + Update()-driven control particles
(PyFleX/bindings/examples/test_MassRope.py; scene 9 = yz_massrope.h,
params [x, y, z, length, stiffness, draw_mesh])."""
import numpy as np

from _example_utils import init, cam, frame, report
from dyn_res_pile_manip_tpu import pyflex_shim as pyflex

np.random.seed(6)

frames = init() or 150

pyflex.set_scene(9, np.array([0.0, 0.5, 0.0, 1.0, 0.8, 0.0]))
cam((0.0, 1.6, 3.0), (0.0, -0.35, 0.0))

for i in range(frames):
    # swing the pinned rope end in a circle
    d = 0.008 * np.array([np.cos(i * 0.05), 0.0, np.sin(i * 0.05)])
    pyflex.step(update_params=d)
    if i % 30 == 0:
        frame("mass_rope", "MassRope", i)

report("MassRope")
pyflex.clean()
