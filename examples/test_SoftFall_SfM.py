"""Soft-body drop rendered from an orbiting camera ring — the
structure-from-motion capture pattern
(PyFleX/bindings/examples/test_SoftFall_SfM.py: settle the body, then
sweep the camera around it collecting RGB + camera poses)."""
import os

import numpy as np

from _example_utils import OUT_ROOT, init, cam, frame, report
from dyn_res_pile_manip_tpu import pyflex_shim as pyflex

np.random.seed(3)

frames = init() or 120
n_views = 12

pyflex.set_scene(16, np.array([1.0, 12.0, 0.0, 0.8, 0.0, 0.0]))
cam((0.6, 1.2, 2.4))

for _ in range(frames):
    pyflex.step()

center = np.array([0.0, 0.3, 0.0])
radius, height = 2.2, 1.4
poses = []
for k in range(n_views):
    th = 2 * np.pi * k / n_views
    pos = center + np.array([radius * np.sin(th), height,
                             radius * np.cos(th)])
    # yaw toward the center, fixed pitch (the SfM ring)
    cam(pos, (th, -0.55, 0.0))
    frame("sfm_view", "SoftFall_SfM", k)
    poses.append(np.concatenate([pyflex.get_camPos(),
                                 pyflex.get_camAngle()]))

np.save(os.path.join(OUT_ROOT, "SoftFall_SfM", "camera_poses.npy"),
        np.stack(poses))
report("SoftFall_SfM")
pyflex.clean()
