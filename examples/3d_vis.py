"""3D point-cloud visualization of a simulated scene — the role of
PyFleX/bindings/examples/3d_vis.py (particle scatter with camera-frame
backprojection check).

Usage: python examples/3d_vis.py [scene_idx]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from _example_utils import init, cam, OUT_ROOT  # noqa: E402
from dyn_res_pile_manip_tpu import pyflex_shim as pyflex  # noqa: E402
from dyn_res_pile_manip_tpu.utils.pointcloud import depth2fgpcd  # noqa: E402

scene_idx = int(sys.argv[1]) if len(sys.argv) > 1 else 3

init(screen=360)
if scene_idx == 3:
    pyflex.set_scene(3, np.array([3, -9.8, 0.02, 0.09, 0.02,
                                  0.05, 0.30, 0.07, 0.0, 0.51, 0.01, 0]))
else:
    pyflex.set_scene(scene_idx, np.zeros(1))
cam((0.4, 1.0, 1.6))

for _ in range(int(os.environ.get("EXAMPLE_FRAMES", "0")) or 90):
    pyflex.step()

x = np.asarray(pyflex.get_positions()).reshape(-1, 4)[:, :3]

# backproject the rendered depth and compare with the true positions
H, W = pyflex._rt.screen_h, pyflex._rt.screen_w
img = pyflex.render().reshape(H, W, 5)
depth = img[..., 4]
fx = fy = W / (2 * np.tan(np.deg2rad(45.0) / 2))
fgpcd = depth2fgpcd(depth, depth < 2.0, [fx, fy, W / 2, H / 2])
print(f"particles={len(x)} backprojected_px={len(fgpcd)}")

os.makedirs(OUT_ROOT, exist_ok=True)
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
fig = plt.figure(figsize=(10, 5))
ax = fig.add_subplot(121, projection="3d")
ax.scatter(x[:, 0], x[:, 2], x[:, 1], s=2)
ax.set_title("simulator particles")
ax2 = fig.add_subplot(122, projection="3d")
ax2.scatter(fgpcd[:, 0], fgpcd[:, 2], fgpcd[:, 1], s=1)
ax2.set_title("depth backprojection (camera frame)")
fig.savefig(os.path.join(OUT_ROOT, "3d_vis.png"), dpi=110)
print(f"wrote {os.path.join(OUT_ROOT, '3d_vis.png')}")
pyflex.clean()
