"""Fluid sloshing in a shaking kinematic glass — the binding test for
PBF fluids vs moving box colliders
(PyFleX/bindings/examples/test_FluidShake.py; scene 6 = yz_fluidshake.h,
params [x, y, z, dim_x, dim_y, dim_z, box_dis_x, box_dis_y,
draw_mesh]; the glass is four add_box walls driven by
set_shape_states)."""
import numpy as np

from _example_utils import (init, cam, frame, report, glass_walls,
                            add_glass, move_glass)
from dyn_res_pile_manip_tpu import pyflex_shim as pyflex

np.random.seed(11)

frames = init() or 200

pyflex.set_scene(6, np.array([0.08, 0.08, 0.08, 6, 10, 5, 0, 0, 0]))
cam((0.3, 1.0, 1.8))

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
        frame("fluid_shake", "FluidShake", i)

report("FluidShake")
pyflex.clean()
