"""Video recording without ffmpeg: animated GIF (PIL) or PNG frame dirs.

Stands in for the reference's cv2.VideoWriter usage (env/flex_env.py:308-314,
data_gen/res_rgr_data.py mpc.avi)."""
from __future__ import annotations

import os

import numpy as np


class VideoRecorder:
    """`write(rgb_uint8)` frames; `close()` flushes. path ending in .gif
    writes an animated GIF, otherwise a directory of numbered PNGs."""

    def __init__(self, path: str, fps: int = 5):
        self.path = path
        self.fps = fps
        self.frames = []
        self._is_gif = path.lower().endswith(".gif")
        if not self._is_gif:
            os.makedirs(path, exist_ok=True)
        self._count = 0

    def write(self, frame: np.ndarray):
        frame = np.asarray(frame).astype(np.uint8)
        if self._is_gif:
            self.frames.append(frame)
        else:
            from .imageio import write_color

            write_color(os.path.join(self.path, f"{self._count:05d}.png"),
                        frame)
        self._count += 1

    def release(self):
        self.close()

    def close(self):
        if self._is_gif and self.frames:
            from PIL import Image

            imgs = [Image.fromarray(f) for f in self.frames]
            imgs[0].save(self.path, save_all=True, append_images=imgs[1:],
                         duration=int(1000 / self.fps), loop=0)
            self.frames = []
