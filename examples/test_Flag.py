"""A pinned cloth flag in wind — the binding test for cloth springs,
tethers and aerodynamic wind/drag
(PyFleX/bindings/examples/test_Flag.py; scene 10 = yz_flag.h, params
[height, dimx, dimy, stretch, bend, shear, wind, draw_mesh];
update_params = the two pinned corners' deltas)."""
import numpy as np

from _example_utils import init, cam, frame, report
from dyn_res_pile_manip_tpu import pyflex_shim as pyflex

np.random.seed(7)

frames = init() or 150

pyflex.set_scene(10, np.array([1.0, 32, 24, 0.9, 0.5, 0.6, 2.0, 0]))
cam((0.8, 1.2, 2.4))

for i in range(frames):
    if i < 90:
        pyflex.step(update_params=np.zeros(6))
    else:
        # then carry the flag pole sideways by both pinned corners
        d = np.array([0.004, 0.0, 0.0])
        pyflex.step(update_params=np.concatenate([d, d]))
    if i % 30 == 0:
        frame("flag", "Flag", i)

report("Flag")
pyflex.clean()
