"""Particle-state visualization through the shim: build a scene, settle,
scatter-plot the particle cloud colored by rigid group (the role of the
reference's PyFleX/bindings/examples/particle_visualization.py, which
uses open3d; matplotlib here — same surface: get_positions/get_phases)."""
import numpy as np

import dyn_res_pile_manip_tpu.pyflex_shim as pyflex


def main(out="particle_vis.png", n_settle=60):
    pyflex.set_screenWidth(360)
    pyflex.set_screenHeight(360)
    pyflex.init(True)
    scene_params = np.array([0.36, 0.36, -1.2, 0.5, -1.2, 1.0, 0.9, 1.0, 8,
                             10.0, 20.0, 3, 10, 3, 0.72, 0.0, -1, -1, -1,
                             0.0])
    pyflex.set_scene(22, scene_params, 0)
    for _ in range(n_settle):
        pyflex.step()
    pos = pyflex.get_positions().reshape(-1, 4)
    grp = pyflex.get_phases()
    vel = pyflex.get_velocities().reshape(-1, 3)
    print("particles:", pos.shape[0], "groups:", int(grp.max()) + 1,
          "max |v|:", float(np.abs(vel).max()))

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(projection="3d")
    ax.scatter(pos[:, 0], pos[:, 2], pos[:, 1], c=grp % 20, cmap="tab20",
               s=4)
    ax.set_title("settled carrots scene (%d particles)" % pos.shape[0])
    fig.savefig(out, dpi=110)
    print("wrote", out)
    pyflex.clean()


if __name__ == "__main__":
    main()
