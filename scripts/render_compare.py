"""Side-by-side renderer comparison for DEMO.md: plain perception splats
vs the video path (skinned merged splats + diffuse + shadow map), on a
real datagen frame."""
import sys

import jax.numpy as jnp
import numpy as np

from dyn_res_pile_manip_tpu.core.camera import Camera
from dyn_res_pile_manip_tpu.env import scene as scene_lib
from dyn_res_pile_manip_tpu.render import raster
from dyn_res_pile_manip_tpu.utils.imageio import write_color


def main(particles_path="data/gnn_dyn_data_custom/0/0_particles.npy",
         out="demo_render_compare.png"):
    pos = np.load(particles_path).reshape(-1, 4)[:, :3].astype(np.float32)
    n = pos.shape[0]
    cap = int(np.ceil(n / 1024)) * 1024
    x = np.zeros((cap, 3), np.float32)
    x[:n] = pos
    active = np.arange(cap) < n

    gs = 24.0
    cam = Camera.default(gs)
    fx, fy, cx, cy = cam.cam_params()
    cvw = jnp.asarray(cam.opencv_from_world(), jnp.float32)
    col = scene_lib.make_colliders_with_walls(gs)
    color = jnp.asarray(np.array([237.0, 145.0, 33.0]) / 255.0, jnp.float32)

    frames = []
    for skin, shadows in ((False, False), (True, True)):
        obs = raster.render_rgbd(
            jnp.asarray(x), jnp.asarray(active), col, cvw, fx, fy, cx, cy,
            color, jnp.float32(0.075 * 0.5), skin=skin, shadows=shadows)
        frames.append(np.asarray(obs)[..., :3])
    side = np.concatenate(frames, axis=1)
    write_color(out, side)
    print("wrote", out, side.shape)


if __name__ == "__main__":
    main(*sys.argv[1:])
