"""Pouring fluid from an upper glass into a tank — the binding test for
two fluid bodies + kinematic container hand-off
(PyFleX/bindings/examples/test_FluidPour.py; scene 17 = yz_fluidpour.h,
params = two fluid blocks [x, y, z, dimx, dimy, dimz] + draw_mesh).

The pouring glass TILTS, as in the reference choreography (pourer angle
sweeping toward 110 degrees about the z axis,
examples/test_FluidPour.py:283-310): every wall of the upper glass
rotates rigidly about the glass's pouring lip via full-quaternion box
colliders (core/types.py box_quat) driven through set_shape_states."""
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

# tank walls (static) + upper glass (kinematic, tilts to pour)
tank = glass_walls(dis_x=0.8, dis_z=0.55, height=0.5)
add_glass(tank, (0.25, 0.0, 0.2))

upper = glass_walls(dis_x=0.45, dis_z=0.35, height=0.45, border=0.03)
ubase = np.array([0.27, 0.72, 0.22])
quat = np.array([0.0, 0.0, 0.0, 1.0])
for half, c in upper:
    pyflex.add_box(np.array(half), np.array(c) + ubase, quat)
# plus a floor that tilts with the glass
floor_half = np.array([0.45 / 2, 0.015, 0.35 / 2])
floor_c = ubase + np.array([0.0, -0.015, 0.0])
pyflex.add_box(floor_half, floor_c, quat)

# pivot: the pouring lip (the -x top edge of the glass)
pivot = ubase + np.array([-0.45 / 2, 0.45, 0.0])
parts = [(np.array(c) + ubase) for _, c in upper] + [floor_c]


def pose(angle, center):
    """Rotate the whole glass rigidly about the lip (z axis)."""
    ca, sa = np.cos(angle), np.sin(angle)
    rel = center - pivot
    rot = np.array([ca * rel[0] - sa * rel[1],
                    sa * rel[0] + ca * rel[1], rel[2]])
    q = np.array([0.0, 0.0, np.sin(angle / 2), np.cos(angle / 2)])  # xyzw
    return pivot + rot, q


prev_angle = 0.0
max_angle = np.deg2rad(110.0)  # the reference sweeps to ~110 degrees
for i in range(frames):
    angle = min(max(0.0, (i - 40) / 140.0), 1.0) * max_angle
    states = np.zeros((4 + len(parts), 14))
    for r, (half, c) in enumerate(tank):
        states[r, :3] = states[r, 3:6] = np.array(c) + [0.25, 0.0, 0.2]
        states[r, 6:10] = states[r, 10:] = quat
    for r, center in enumerate(parts):
        rr = 4 + r
        pos, q = pose(angle, center)
        prev_pos, prev_q = pose(prev_angle, center)
        states[rr, :3] = pos
        states[rr, 3:6] = prev_pos
        states[rr, 6:10] = q
        states[rr, 10:] = prev_q
    pyflex.set_shape_states(states)
    prev_angle = angle
    pyflex.step()
    if i % 50 == 0:
        frame("fluid_pour", "FluidPour", i)

report("FluidPour")
pyflex.clean()
