"""Stack of rigid particle boxes falling under gravity — the binding test
for rigid-group shape matching (PyFleX/bindings/examples/test_RigidFall.py;
scene 3 = yz_rigidfall.h)."""
import numpy as np

from _example_utils import init, cam, frame, report, rand_float
from dyn_res_pile_manip_tpu import pyflex_shim as pyflex

np.random.seed(0)

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

for i in range(frames):
    pyflex.step()
    if i % 30 == 0:
        frame("rigid_fall", "RigidFall", i)

report("RigidFall")
pyflex.clean()
