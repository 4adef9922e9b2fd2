"""A soft rod dragged by its end particles — the binding test for
per-particle Update() dragging on clustered soft bodies
(PyFleX/bindings/examples/test_SoftRod.py; scene 11 = yz_softrod.h,
params [scale(3), trans(3), clusterSpacing, clusterRadius,
clusterStiffness, draw_mesh]; update_params = [dx, dz, idx...])."""
import numpy as np

from _example_utils import init, cam, frame, report
from dyn_res_pile_manip_tpu import pyflex_shim as pyflex

np.random.seed(4)

frames = init() or 150

pyflex.set_scene(11, np.array([10.0, 2.0, 2.0, 0.0, 0.05, 0.0,
                               4.0, 2.0, 0.55, 0.0]))
cam((0.5, 1.0, 2.2))

n = pyflex.get_n_particles()
x = np.asarray(pyflex.get_positions()).reshape(-1, 4)[:, :3]
# drag the 8 particles with the largest x (the rod's far end)
drag_idx = np.argsort(x[:, 0])[-8:]

for i in range(frames):
    if 30 <= i < 110:
        d = 0.004 * np.array([np.cos(i * 0.06), np.sin(i * 0.06)])
        pyflex.step(update_params=np.concatenate([d, drag_idx]))
    else:
        pyflex.step()
    if i % 30 == 0:
        frame("soft_rod", "SoftRod", i)

report("SoftRod")
pyflex.clean()
