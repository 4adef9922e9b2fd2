"""A soft body dropped on the floor — the binding test for
overlapping-cluster soft-body shape matching
(PyFleX/bindings/examples/test_SoftFall.py; scene 16 = yz_softfall.h,
params [type, scale, x, y, z, draw_mesh])."""
import numpy as np

from _example_utils import init, cam, frame, report
from dyn_res_pile_manip_tpu import pyflex_shim as pyflex

np.random.seed(2)

frames = init() or 120

# type 0 = bunny stand-in, scale 12, dropped from y=0.8
pyflex.set_scene(16, np.array([0.0, 12.0, 0.0, 0.8, 0.0, 0.0]))
cam((0.6, 1.2, 2.4))

for i in range(frames):
    pyflex.step()
    if i % 30 == 0:
        frame("soft_fall", "SoftFall", i)

report("SoftFall")
pyflex.clean()
