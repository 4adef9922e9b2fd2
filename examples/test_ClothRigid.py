"""Rigid boxes dropped onto a corner-pinned cloth trampoline — the
binding test for cloth/rigid two-way coupling
(PyFleX/bindings/examples/test_ClothRigid.py; scene 12 = yz_clothrigid.h,
params [dimx_c, dimy_c, height, p_cloth(3), dim_rigid(3), num_rigid(3),
num_banana, draw_points]; update_params moves all 4 pinned corners)."""
import numpy as np

from _example_utils import init, cam, frame, report
from dyn_res_pile_manip_tpu import pyflex_shim as pyflex

np.random.seed(9)

frames = init() or 150

pyflex.set_scene(12, np.array([16, 16, 1.0, 0.0, 0.0, 0.0,
                               3, 3, 3, 2, 1, 1, 0, 1]))
cam((1.2, 1.8, 3.2), (0.0, -0.5, 0.0))

for i in range(frames):
    if i < 90:
        pyflex.step(update_params=np.zeros(3))
    else:
        # lower the pinned corners together (slackening the trampoline)
        pyflex.step(update_params=np.array([0.0, -0.004, 0.0]))
    if i % 30 == 0:
        frame("cloth_rigid", "ClothRigid", i)

report("ClothRigid")
pyflex.clean()
