"""Fluid shake captured from multiple cameras per frame
(PyFleX/bindings/examples/test_FluidShake_multiview.py: same scene as
test_FluidShake, rendering an RGB + camera-pose pair per view)."""
import numpy as np

from _example_utils import (init, cam, frame, report, glass_walls,
                            add_glass, move_glass)
from dyn_res_pile_manip_tpu import pyflex_shim as pyflex

np.random.seed(12)

frames = init() or 120
views = [((0.3, 1.0, 1.8), (0.0, -0.6, 0.0)),
         ((1.6, 1.0, 0.2), (np.pi / 2, -0.6, 0.0)),
         ((0.2, 2.2, 0.2), (0.0, -np.pi / 2, 0.0))]

pyflex.set_scene(6, np.array([0.08, 0.08, 0.08, 6, 10, 5, 0, 0, 0]))

walls = glass_walls(dis_x=0.5, dis_z=0.35, height=0.6)
base = np.array([0.2, 0.0, 0.15])
add_glass(walls, base)

last = base.copy()
for i in range(frames):
    cur = base + np.array([0.12 * np.sin(i * 0.06), 0.0, 0.0])
    move_glass(walls, cur, last)
    last = cur
    pyflex.step()
    if i % 40 == 0:
        for v, (pos, ang) in enumerate(views):
            cam(pos, ang)
            frame(f"view{v}", "FluidShake_multiview", i)

report("FluidShake_multiview")
pyflex.clean()
