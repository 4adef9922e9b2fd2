"""Multi-rollout state collection through the shim: positions, velocities
and phases per frame across scenes (the role of the reference's
PyFleX/bindings/examples/data_collection.py, which pool-maps pyflex
workers; sequential here — one chip — with the same output contract)."""
import numpy as np

import dyn_res_pile_manip_tpu.pyflex_shim as pyflex

SCENES = {
    18: np.array([0.7, -0.35, 0.0, -0.35, 1.0, 0.7, 0.075]),
    22: np.array([0.36, 0.36, -1.2, 0.5, -1.2, 1.0, 0.9, 1.0, 8,
                  10.0, 20.0, 3, 10, 3, 0.72, 0.0, -1, -1, -1, 0.0]),
}


def collect(idx, scene_params, n_rollout=2, time_step=30):
    first = None
    out_p, out_v, out_g = [], [], []
    for r in range(n_rollout):
        pyflex.set_scene(idx, scene_params, r)
        n = pyflex.get_n_particles()
        first = n if first is None else first
        p = np.zeros((time_step, n, 4))
        v = np.zeros((time_step, n, 3))
        g = np.zeros((time_step, n), np.int32)
        for t in range(time_step):
            p[t] = pyflex.get_positions().reshape(-1, 4)
            v[t] = pyflex.get_velocities().reshape(-1, 3)
            g[t] = pyflex.get_phases()
            pyflex.step()
        out_p.append(p)
        out_v.append(v)
        out_g.append(g)
    return out_p, out_v, out_g


def main():
    pyflex.set_screenWidth(360)
    pyflex.set_screenHeight(360)
    pyflex.init(True)
    for idx, params in SCENES.items():
        p, v, g = collect(idx, params)
        print("scene", idx, "rollouts:", len(p),
              "shape:", p[0].shape, v[0].shape, g[0].shape,
              "settled |v| end:", float(np.abs(v[-1][-1]).max()))
    pyflex.clean()


if __name__ == "__main__":
    main()
