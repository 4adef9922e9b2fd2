"""Rigid boxes falling, colored per instance through set_phases — the
binding test for phase-colored rendering
(PyFleX/bindings/examples/test_colorRigidFall.py: set_phases + get_phases
roundtrip while rendering)."""
import numpy as np

from _example_utils import init, cam, frame, report, rand_float
from dyn_res_pile_manip_tpu import pyflex_shim as pyflex

np.random.seed(1)

frames = init() or 150
n_instance = 3

scene_params = np.zeros(n_instance * 3 + 3)
scene_params[0] = n_instance
scene_params[1] = -9.8
low_bound = 0.09
for i in range(n_instance):
    scene_params[i * 3 + 2] = rand_float(0.0, 0.1)
    scene_params[i * 3 + 3] = rand_float(low_bound, low_bound + 0.01)
    scene_params[i * 3 + 4] = rand_float(0.0, 0.1)
    low_bound += 0.21

pyflex.set_scene(3, scene_params, 0)
cam((0.3, 0.9, 1.6))

n_particles = pyflex.get_n_particles()
phases = [i % n_instance for i in range(n_particles)]
pyflex.set_phases(phases)
back = pyflex.get_phases()
assert (np.asarray(back) == np.asarray(phases)).all(), "phase roundtrip"

for i in range(frames):
    pyflex.step()
    if i % 30 == 0:
        frame("color_rigid_fall", "colorRigidFall", i)

report("colorRigidFall")
pyflex.clean()
