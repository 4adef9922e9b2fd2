"""Render any registered scene to an animated GIF/MP4 — the role of
PyFleX/bindings/examples/make_video.py (frame capture + encoding).

Usage: python examples/make_video.py [scene_idx] [n_frames] [out.gif]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from _example_utils import init, cam  # noqa: E402
from dyn_res_pile_manip_tpu import pyflex_shim as pyflex  # noqa: E402

scene_idx = int(sys.argv[1]) if len(sys.argv) > 1 else 2    # dam break
n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 120
out_path = sys.argv[3] if len(sys.argv) > 3 else "out_examples/video.gif"

init(screen=360)
if scene_idx == 18:
    pyflex.set_scene(18, np.array([1.5, -0.75, 0.0, -0.75, 1.0, 1.0]), 0)
    cam((0.0, 6.0, 0.01), (0.0, -np.pi / 2 + 1e-3, 0.0))
else:
    pyflex.set_scene(scene_idx, np.zeros(1))
    cam((0.8, 1.2, 2.6))

frames = []
for i in range(n_frames):
    pyflex.step()
    if i % 3 == 0:
        img = pyflex.render().reshape(pyflex._rt.screen_h,
                                      pyflex._rt.screen_w, 5)
        frames.append(np.clip(img[..., :3], 0, 255).astype(np.uint8))

os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
import imageio  # noqa: E402
if out_path.endswith(".gif"):
    imageio.mimsave(out_path, frames, duration=0.05, loop=0)
else:
    imageio.mimsave(out_path, frames, fps=20)
print(f"wrote {len(frames)} frames to {out_path}")
pyflex.clean()
