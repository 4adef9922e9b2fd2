"""Smoke every registered scene (18/20/21/22/23) through the pyflex shim:
build, settle, render — the shim-level coverage the reference gets from
its per-scene example scripts (PyFleX/bindings/examples/test_*.py)."""
import numpy as np

import dyn_res_pile_manip_tpu.pyflex_shim as pyflex

GS = 8.0

SCENES = {
    18: np.array([0.7, -0.35, 0.0, -0.35, 1.0, 0.7, 0.075]),
    20: np.array([0.2, -0.9, 0.5, -0.9, 0.0, 1.0, 1.0, 60]),
    21: np.array([0.2, -1.0, 0.5, -1.0, 0.0, 0.5, 1.0, 24, 10, 20]),
    22: np.array([0.36, 0.36, -1.2, 0.5, -1.2, 1.0, 0.9, 1.0, 8,
                  10.0, 20.0, 3, 10, 3, 0.72, 0.0, -1, -1, -1, 0.0]),
    23: np.array([0.2, -1.5, 0.5, -1.2, 0.0, 1.0, 1.0, 30,
                  0.2, 0.0, 0.5, -1.2, 24, 10, 20]),
}


def main(frames=40):
    pyflex.set_screenWidth(240)
    pyflex.set_screenHeight(240)
    pyflex.init()
    for idx, params in SCENES.items():
        pyflex.set_scene(idx, params, 0)
        n = pyflex.get_n_particles()
        assert n > 0, idx
        for _ in range(frames):
            pyflex.step()
        pos = pyflex.get_positions().reshape(-1, 4)
        assert not np.isnan(pos).any(), idx
        assert pos[:, 1].min() > -0.1, idx      # nothing under the floor
        img = pyflex.render().reshape(240, 240, 5)
        assert img[..., -1].max() > 0.0, idx
        print(f"scene {idx}: {n} particles ok")
    pyflex.clean()
    print("ok")


if __name__ == "__main__":
    main()
