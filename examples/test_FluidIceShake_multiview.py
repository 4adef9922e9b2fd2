"""Fluid + ice shake captured from a camera ring per keyframe
(PyFleX/bindings/examples/test_FluidIceShake_multiview.py)."""
import numpy as np

from _example_utils import (init, cam, frame, report, glass_walls,
                            add_glass, move_glass)
from dyn_res_pile_manip_tpu import pyflex_shim as pyflex

np.random.seed(14)

frames = init() or 120
n_views = 4

pyflex.set_scene(8, np.array([
    0.1, 0.0, 0.1, 6, 8, 5, 2.0,
    0.18, 0.5, 0.15, 0.15, 0.15, 0.15, 0.8, 0.0, 0.0]))

walls = glass_walls(dis_x=0.55, dis_z=0.4, height=0.7)
base = np.array([0.22, 0.0, 0.17])
add_glass(walls, base)

center = np.array([0.22, 0.0, 0.17])
last = base.copy()
for i in range(frames):
    cur = base + np.array([0.1 * np.sin(i * 0.05), 0.0, 0.0])
    move_glass(walls, cur, last)
    last = cur
    pyflex.step()
    if i % 40 == 0:
        for k in range(n_views):
            th = 2 * np.pi * k / n_views
            pos = center + np.array([1.8 * np.sin(th), 1.2,
                                     1.8 * np.cos(th)])
            cam(pos, (th, -0.55, 0.0))
            frame(f"view{k}", "FluidIceShake_multiview", i)

report("FluidIceShake_multiview")
pyflex.clean()
