"""Cloth manipulation by grabbing/releasing control points — the binding
test for the grab/release Update() protocol
(PyFleX/bindings/examples/test_ClothManip.py; scene 15 = yz_clothmanip.h,
params [offset(3), fabric_type, dimx, dimy, dimz, ctrl_pts[8], stretch,
bend, shear, dyn_frict, stat_frict, particle_frict, invMass, wind,
draw_mesh]; update_params = [ctrl_slot, dx, dy, dz])."""
import numpy as np

from _example_utils import init, cam, frame, report
from dyn_res_pile_manip_tpu import pyflex_shim as pyflex

np.random.seed(8)

frames = init() or 180
dimx, dimy = 24, 24
# grab points: the 4 corners + 4 edge midpoints of the sheet
corners = [0, dimx - 1, dimx * (dimy - 1), dimx * dimy - 1]
mids = [dimx // 2, dimx * (dimy // 2), dimx * (dimy // 2) + dimx - 1,
        dimx * (dimy - 1) + dimx // 2]
ctrl = corners + mids

params = np.concatenate([
    [0.0, 0.45, 0.0, 0.0, dimx, dimy, 1.0], ctrl,
    [0.9, 0.6, 0.7, 0.6, 0.6, 0.6, 1.0, 0.0, 0.0]])
pyflex.set_scene(15, params)
cam((0.6, 1.4, 2.2))

for i in range(frames):
    if i < 60:       # grab corner 0 and pull it up across the sheet
        pyflex.step(update_params=np.array([0.0, 0.01, 0.008, 0.01]))
    elif i < 120:    # switch the grab to the opposite corner
        pyflex.step(update_params=np.array([3.0, -0.01, 0.006, -0.01]))
    else:            # hold still and settle
        pyflex.step(update_params=np.array([3.0, 0.0, 0.0, 0.0]))
    if i % 30 == 0:
        frame("cloth_manip", "ClothManip", i)

report("ClothManip")
pyflex.clean()
