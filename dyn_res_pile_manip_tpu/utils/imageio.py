"""Image I/O in the reference's on-disk formats (data_gen/gnn_dyn_data.py:
{t}_color.png BGR uint8, {t}_depth.png uint16 millimeters)."""
from __future__ import annotations

import imageio.v2 as imageio
import numpy as np


def write_color(path: str, rgb: np.ndarray) -> None:
    """rgb: (H, W, 3) float/uint8 RGB in 0..255. Stored as PNG (the
    reference writes BGR via cv2.imwrite on a pre-flipped array — net
    effect: RGB file on disk)."""
    imageio.imwrite(path, rgb.astype(np.uint8))


def read_color(path: str) -> np.ndarray:
    return np.asarray(imageio.imread(path))[..., :3]


def write_depth(path: str, depth_world: np.ndarray) -> None:
    """depth in world units -> uint16 'millimeters' (x1000)."""
    imageio.imwrite(path, (depth_world * 1000.0).astype(np.uint16))


def read_depth(path: str) -> np.ndarray:
    """Returns the raw uint16 array (caller divides by global_scale*1000,
    dataset/dataset_gnn_dyn.py:97)."""
    return np.asarray(imageio.imread(path)).astype(np.float64)
