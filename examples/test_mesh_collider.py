"""Kinematic triangle-mesh collider smoke: register an OBJ via add_mesh,
pour grains on it (AddTriangleMesh usage, helpers.h:713-760)."""
import os
import tempfile

import numpy as np

import dyn_res_pile_manip_tpu.pyflex_shim as pyflex

CUBE_OBJ = "\n".join(
    ["v 0 0 0", "v 1 0 0", "v 1 1 0", "v 0 1 0",
     "v 0 0 1", "v 1 0 1", "v 1 1 1", "v 0 1 1",
     "f 1 3 2", "f 1 4 3", "f 5 6 7", "f 5 7 8",
     "f 1 2 6", "f 1 6 5", "f 4 7 3", "f 4 8 7",
     "f 1 5 8", "f 1 8 4", "f 2 3 7", "f 2 7 6", ""])


def main():
    pyflex.set_screenWidth(240)
    pyflex.set_screenHeight(240)
    pyflex.init()
    pyflex.set_scene(18, np.array([0.7, -0.35, 0.0, -0.35, 1.0, 0.7,
                                   0.075]), 0)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "cube.obj")
        with open(path, "w") as f:
            f.write(CUBE_OBJ)
        h = pyflex.add_mesh(path, 1.0)
    assert h >= 0
    # park the mesh under the pile so grains rest on it
    row = np.zeros((1, 14))
    row[0, :3] = [-0.35, 0.0, -0.35]
    row[0, 6:10] = [0, 0, 0, 1]
    row[0, 10:14] = [0, 0, 0, 1]
    pyflex.set_shape_states(row)
    for _ in range(60):
        pyflex.step()
    pos = pyflex.get_positions().reshape(-1, 4)
    assert not np.isnan(pos).any()
    print("grains resting at y in [%.3f, %.3f]" % (pos[:, 1].min(),
                                                   pos[:, 1].max()))
    assert pos[:, 1].max() > 0.5  # some grains held up by the mesh
    pyflex.clean()
    print("ok")


if __name__ == "__main__":
    main()
