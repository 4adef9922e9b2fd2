"""A rigid box with randomized edges dropped into a fluid dam — the
binding test for rigid/fluid coupling with parameterized geometry
(PyFleX/bindings/examples/test_BoxBathExt.py; scene 7 = yz_boxbathext.h,
params [x, y, z, px, pz])."""
import numpy as np

from _example_utils import init, cam, frame, report, rand_float
from dyn_res_pile_manip_tpu import pyflex_shim as pyflex

np.random.seed(10)

frames = init() or 150

x = rand_float(0.15, 0.349)
y = rand_float(0.15, 0.349)
z = rand_float(0.15, 0.299)
px = rand_float(0.45, 1.2 - x)
pz = rand_float(0.02, 0.4 - z)

pyflex.set_scene(7, np.array([x, y, z, px, pz]), 0)
cam((0.6, 1.0, 2.4))

for i in range(frames):
    pyflex.step()
    if i % 30 == 0:
        frame("box_bath_ext", "BoxBathExt", i)

report("BoxBathExt")
pyflex.clean()
