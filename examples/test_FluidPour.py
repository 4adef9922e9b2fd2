"""Pouring fluid from an upper glass into a tank — the binding test for
two fluid bodies + kinematic container hand-off
(PyFleX/bindings/examples/test_FluidPour.py; scene 17 = yz_fluidpour.h,
params = two fluid blocks [x, y, z, dimx, dimy, dimz] + draw_mesh).

The reference tilts the pouring glass; box colliders here are yaw-only
by design (core/types.py Colliders — the granular workload's pusher
rotates about y), so the pour is realized by sliding the upper glass
wall aside and letting gravity hand the fluid down into the tank."""
import numpy as np

from _example_utils import (init, cam, frame, report, glass_walls,
                            add_glass, move_glass)
from dyn_res_pile_manip_tpu import pyflex_shim as pyflex

np.random.seed(15)

frames = init() or 250

# upper block spills into the lower tank block
pyflex.set_scene(17, np.array([
    0.15, 0.75, 0.12, 5, 6, 4,    # upper fluid (in the lifted glass)
    0.05, 0.0, 0.05, 8, 4, 6,     # lower tank fluid
    0.0]))
cam((0.5, 1.3, 2.2))

# tank walls (static) + upper glass (kinematic, slides open)
tank = glass_walls(dis_x=0.8, dis_z=0.55, height=0.5)
add_glass(tank, (0.25, 0.0, 0.2))

upper = glass_walls(dis_x=0.45, dis_z=0.35, height=0.45, border=0.03)
ubase = np.array([0.27, 0.72, 0.22])
quat = np.array([0.0, 0.0, 0.0, 1.0])
for half, c in upper:
    pyflex.add_box(np.array(half), np.array(c) + ubase, quat)
# plus a floor under the upper glass that will slide away
floor_half = np.array([0.45 / 2, 0.015, 0.35 / 2])
floor_c = ubase + np.array([0.0, -0.015, 0.0])
pyflex.add_box(floor_half, floor_c, quat)

last_slide = 0.0
for i in range(frames):
    slide = min(max(0.0, (i - 40) / 80.0), 1.0) * 0.5
    states = np.zeros((4 + len(upper) + 1, 14))
    for r, (half, c) in enumerate(tank):
        states[r, :3] = states[r, 3:6] = np.array(c) + [0.25, 0.0, 0.2]
        states[r, 6:10] = states[r, 10:] = quat
    for r, (half, c) in enumerate(upper):
        rr = 4 + r
        states[rr, :3] = states[rr, 3:6] = np.array(c) + ubase
        states[rr, 6:10] = states[rr, 10:] = quat
    rr = 4 + len(upper)
    states[rr, :3] = floor_c + [slide, 0.0, 0.0]
    states[rr, 3:6] = floor_c + [last_slide, 0.0, 0.0]
    states[rr, 6:10] = states[rr, 10:] = quat
    pyflex.set_shape_states(states)
    last_slide = slide
    pyflex.step()
    if i % 50 == 0:
        frame("fluid_pour", "FluidPour", i)

report("FluidPour")
pyflex.clean()
