"""Fluid pour captured from an orbiting camera ring
(PyFleX/bindings/examples/test_FluidPour_SfM.py: the pour of
test_FluidPour plus a structure-from-motion camera sweep with saved
poses)."""
import os

import numpy as np

from _example_utils import OUT_ROOT, init, cam, frame, report
from dyn_res_pile_manip_tpu import pyflex_shim as pyflex

np.random.seed(16)

frames = init() or 150
n_views = 8

pyflex.set_scene(17, np.array([
    0.15, 0.55, 0.12, 5, 6, 4,
    0.05, 0.0, 0.05, 8, 4, 6, 0.0]))

for _ in range(frames):
    pyflex.step()

center = np.array([0.3, 0.1, 0.2])
poses = []
for k in range(n_views):
    th = 2 * np.pi * k / n_views
    pos = center + np.array([2.0 * np.sin(th), 1.3, 2.0 * np.cos(th)])
    cam(pos, (th, -0.5, 0.0))
    frame("sfm_view", "FluidPour_SfM", k)
    poses.append(np.concatenate([pyflex.get_camPos(),
                                 pyflex.get_camAngle()]))

np.save(os.path.join(OUT_ROOT, "FluidPour_SfM", "camera_poses.npy"),
        np.stack(poses))
report("FluidPour_SfM")
pyflex.clean()
