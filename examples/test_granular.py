"""Granular-scene smoke script, the role of the reference's
PyFleX/bindings/examples/test_Granular.py: init, set scene, step N frames,
write frames to a GIF."""
import numpy as np

import dyn_res_pile_manip_tpu.pyflex_shim as pyflex
from dyn_res_pile_manip_tpu.utils.video import VideoRecorder


def main(n_frames=60, out="granular.gif"):
    pyflex.set_screenWidth(360)
    pyflex.set_screenHeight(360)
    pyflex.init(True)
    scene_params = np.array([0.7, -0.35, 0.0, -0.35, 1.0, 0.7, 0.075])
    pyflex.set_scene(18, scene_params, 0)
    print("particles:", pyflex.get_n_particles())
    vid = VideoRecorder(out, fps=10)
    for i in range(n_frames):
        pyflex.step()
        if i % 5 == 0:
            img = pyflex.render(render_depth=True).reshape(360, 360, 5)
            vid.write(img[..., :3])
    vid.close()
    pos = pyflex.get_positions().reshape(-1, 4)
    print("y range after settle:", pos[:, 1].min(), pos[:, 1].max())
    pyflex.clean()


if __name__ == "__main__":
    main()
