"""Multi-view rendering smoke: settle a granular scene, then render it
from several camera poses via set_camPos/set_camAngle (the role of the
reference's *_multiview examples, e.g. test_FluidIceShake_multiview.py —
per-view cam pose set + render, same shim surface)."""
import numpy as np

import dyn_res_pile_manip_tpu.pyflex_shim as pyflex


def main(out="multiview.png"):
    pyflex.set_screenWidth(240)
    pyflex.set_screenHeight(240)
    pyflex.init(True)
    scene_params = np.array([0.7, -0.35, 0.0, -0.35, 1.0, 0.7, 0.075])
    pyflex.set_scene(18, scene_params, 0)
    for _ in range(40):
        pyflex.step()

    base_pos = pyflex.get_camPos()
    views = []
    for k, (dx, dz, ang_y) in enumerate([(0.0, 0.0, 0.0),
                                         (1.5, 0.0, np.pi / 6),
                                         (-1.5, 1.5, -np.pi / 6)]):
        pyflex.set_camPos(np.asarray(base_pos) + np.array([dx, 0.0, dz]))
        pyflex.set_camAngle(np.array([ang_y, -np.pi / 2 * 0.9, 0.0]))
        img = pyflex.render(render_depth=True).reshape(240, 240, 5)
        views.append(img[..., :3])
        fg = (img[..., 4] < 5.0).mean()
        print("view %d: fg fraction %.3f" % (k, fg))

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, len(views), figsize=(3 * len(views), 3))
    for ax, v in zip(axes, views):
        ax.imshow(np.clip(v / 255.0, 0, 1))
        ax.axis("off")
    fig.savefig(out, dpi=110, bbox_inches="tight")
    print("wrote", out)
    pyflex.clean()


if __name__ == "__main__":
    main()
