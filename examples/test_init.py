"""Bare init smoke, the role of the reference's
PyFleX/bindings/examples/test.py: init, set the SoftRod scene (registry
index 11) with empty params, print the scene bounds, step 150 frames.
"""
import numpy as np

import dyn_res_pile_manip_tpu.pyflex_shim as pyflex


def main(n_frames=150):
    pyflex.init()
    pyflex.set_scene(11, np.array([]), 0)
    print("Scene Upper:", pyflex.get_scene_upper())
    print("Scene Lower:", pyflex.get_scene_lower())
    for _ in range(n_frames):
        pyflex.step()
    pos = pyflex.get_positions().reshape(-1, 4)
    assert np.isfinite(pos).all()
    print("particles:", pos.shape[0], "y range:",
          pos[:, 1].min(), pos[:, 1].max())
    pyflex.clean()


if __name__ == "__main__":
    main()
