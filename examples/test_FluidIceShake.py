"""A rigid 'ice' block floating in shaken fluid — the binding test for
mixed fluid + rigid phases in one shaken container
(PyFleX/bindings/examples/test_FluidIceShake.py; scene 8 =
yz_fluidiceshake.h, params [fluid pos(3) dims(3), viscosity,
ice pos(3) dims(3) invMass, pad, draw_mesh])."""
import numpy as np

from _example_utils import (init, cam, frame, report, glass_walls,
                            add_glass, move_glass)
from dyn_res_pile_manip_tpu import pyflex_shim as pyflex

np.random.seed(13)

frames = init() or 200

pyflex.set_scene(8, np.array([
    0.1, 0.0, 0.1, 6, 8, 5,      # fluid grid
    2.0,                          # viscosity
    0.18, 0.5, 0.15, 0.15, 0.15, 0.15,  # ice box above the fluid
    0.8,                          # ice invMass (buoyant)
    0.0, 0.0]))
cam((0.3, 1.0, 1.8))

walls = glass_walls(dis_x=0.55, dis_z=0.4, height=0.7)
base = np.array([0.22, 0.0, 0.17])
add_glass(walls, base)

last = base.copy()
for i in range(frames):
    cur = base + np.array([0.1 * np.sin(i * 0.05), 0.0, 0.0])
    move_glass(walls, cur, last)
    last = cur
    pyflex.step()
    if i % 40 == 0:
        frame("fluid_ice_shake", "FluidIceShake", i)

report("FluidIceShake")
pyflex.clean()
