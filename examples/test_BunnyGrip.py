"""Gripping a soft bunny between two kinematic fingers — the binding
test for soft bodies vs moving shape colliders
(PyFleX/bindings/examples/test_BunnyGrip.py; scene 14 = yz_bunnygrip.h,
params [scale, globalStiffness, plasticThreshold, plasticCreep,
draw_mesh]; the gripper choreography lives in the driving script)."""
import numpy as np

from _example_utils import init, cam, frame, report
from dyn_res_pile_manip_tpu import pyflex_shim as pyflex

np.random.seed(5)

frames = init() or 180

pyflex.set_scene(14, np.array([9.0, 0.0, 0.02, 0.12, 0.0]))
cam((0.5, 1.0, 2.0))

x = np.asarray(pyflex.get_positions()).reshape(-1, 4)[:, :3]
c = x.mean(axis=0)
half = np.array([0.02, 0.25, 0.18])
quat = np.array([0.0, 0.0, 0.0, 1.0])
gap0 = (x[:, 0].max() - x[:, 0].min()) / 2 + 0.06

fingers = [pyflex.add_box(half, c + [-gap0, 0.1, 0.0], quat),
           pyflex.add_box(half, c + [gap0, 0.1, 0.0], quat)]

prev = [c + [-gap0, 0.1, 0.0], c + [gap0, 0.1, 0.0]]
for i in range(frames):
    close = min(i / 60.0, 1.0) * (gap0 - 0.12)       # squeeze phase
    lift = max(0.0, (i - 90) / 60.0) * 0.35          # then lift
    cur = [c + [-(gap0 - close), 0.1 + lift, 0.0],
           c + [gap0 - close, 0.1 + lift, 0.0]]
    states = np.zeros((2, 14))
    for f in range(2):
        states[f, :3] = cur[f]
        states[f, 3:6] = prev[f]
        states[f, 6:10] = quat
        states[f, 10:] = quat
    pyflex.set_shape_states(states)
    prev = cur
    pyflex.step()
    if i % 30 == 0:
        frame("bunny_grip", "BunnyGrip", i)

report("BunnyGrip")
pyflex.clean()
