"""Gripping a pile of free rice grains between two fingers — the
binding test for high-friction grain/tool interaction
(PyFleX/bindings/examples/test_GripRice.py; scene 4 = yz_ricefall.h,
two grain blocks with 4x gravity + sticky friction)."""
import numpy as np

from _example_utils import init, cam, frame, report
from dyn_res_pile_manip_tpu import pyflex_shim as pyflex

np.random.seed(20)

frames = init() or 220

pyflex.set_scene(4, np.zeros(1))
cam((0.3, 0.8, 1.3))

for _ in range(60):      # let the rice settle into a pile
    pyflex.step()

x = np.asarray(pyflex.get_positions()).reshape(-1, 4)[:, :3]
c = x.mean(axis=0)
c[1] = 0.0
half = np.array([0.015, 0.18, 0.12])
quat = np.array([0.0, 0.0, 0.0, 1.0])
gap0 = 0.28

pyflex.add_box(half, c + [-gap0, 0.18, 0.0], quat)
pyflex.add_box(half, c + [gap0, 0.18, 0.0], quat)

prev = [c + [-gap0, 0.18, 0.0], c + [gap0, 0.18, 0.0]]
for i in range(frames - 60):
    close = min(i / 70.0, 1.0) * (gap0 - 0.08)
    lift = max(0.0, (i - 100) / 60.0) * 0.3
    cur = [c + [-(gap0 - close), 0.18 + lift, 0.0],
           c + [gap0 - close, 0.18 + lift, 0.0]]
    states = np.zeros((2, 14))
    for f in range(2):
        states[f, :3] = cur[f]
        states[f, 3:6] = prev[f]
        states[f, 6:10] = states[f, 10:] = quat
    pyflex.set_shape_states(states)
    prev = cur
    pyflex.step()
    if i % 40 == 0:
        frame("grip_rice", "GripRice", i)

report("GripRice")
pyflex.clean()
