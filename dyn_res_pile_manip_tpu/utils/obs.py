"""Observation post-processing + drawing helpers.

Ports of the image-side utilities the reference scatters across
env/flex_env.py (proc_obs, 51-73) and utils.py (drawRotatedRect 386-400,
drawPushing 402-415, rmbg 524-531, lighten_img 606-617,
preprocess_action_repeat 121-134) — cv2-free.
"""
from __future__ import annotations

import numpy as np

from .imaging import resize_area

FG_THRESHOLD = 0.599 / 0.8


def proc_obs(obs: np.ndarray, config: dict, res: int = 64) -> np.ndarray:
    """720x720x5 RGBD -> res x res x 1 binary foreground mask
    (flex_env.py:51-73)."""
    global_scale = config["dataset"]["global_scale"]
    assert obs.shape[-1] == 5
    out = obs.astype(np.float32).copy()
    out[..., :3] = out[..., :3][..., ::-1] / 255.0
    out[..., -1] = out[..., -1] / global_scale
    out = np.concatenate([out[..., :3], out[..., -1:]], axis=-1)
    out[out[..., -1] > FG_THRESHOLD, :3] = 1.0
    out = resize_area(out, (res, res))
    mask = (out[..., -1] <= FG_THRESHOLD).astype(np.float32)
    return mask[..., None]


def _draw_line(img, p0, p1, color, width=1):
    """Bresenham-ish thick line on an (H, W, 3) array (in place)."""
    h, w = img.shape[:2]
    n = int(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1])) + 1)
    xs = np.linspace(p0[0], p1[0], n)
    ys = np.linspace(p0[1], p1[1], n)
    r = max(1, width // 2)
    for x, y in zip(xs, ys):
        x0, x1 = int(x) - r, int(x) + r + 1
        y0, y1 = int(y) - r, int(y) + r + 1
        img[max(0, y0):min(h, y1), max(0, x0):min(w, x1)] = color
    return img


def draw_rotated_rect(img, s, e, width=1):
    """Gradient-colored push segment (utils.py:386-400)."""
    img = img.copy()
    length = int(np.hypot(s[0] - e[0], s[1] - e[1]) + 1)
    theta = np.arctan2(e[1] - s[1], e[0] - s[0])
    to = theta + np.pi / 2
    for i in range(length):
        color = (255, int(255 * i / length), 0)
        x = s[0] + (e[0] - s[0]) * i / length
        y = s[1] + (e[1] - s[1]) * i / length
        _draw_line(img,
                   (x - 0.5 * width * np.cos(to), y - 0.5 * width * np.sin(to)),
                   (x + 0.5 * width * np.cos(to), y + 0.5 * width * np.sin(to)),
                   color, 1)
    return img


def draw_pushing(img, s, e, width):
    """Start/end bars + arrow for a push (utils.py:402-415)."""
    img = img.copy()
    theta = np.arctan2(e[1] - s[1], e[0] - s[0])
    to = theta + np.pi / 2
    color = (255, 99, 71)
    for p in (s, e):
        _draw_line(img,
                   (p[0] - 0.5 * width * np.cos(to), p[1] - 0.5 * width * np.sin(to)),
                   (p[0] + 0.5 * width * np.cos(to), p[1] + 0.5 * width * np.sin(to)),
                   color, 5)
    _draw_line(img, s, e, color, 5)
    return img


def rmbg(img: np.ndarray, bg: np.ndarray) -> np.ndarray:
    """White out pixels matching a background plate (utils.py:524-531)."""
    assert img.shape == bg.shape and img.dtype == np.uint8
    out = img.copy()
    diff = np.abs(img.astype(np.int32) - bg.astype(np.int32)).sum(axis=2)
    out[diff < 1e-3] = 255
    return out


def lighten_img(img: np.ndarray, factor: float = 1.2) -> np.ndarray:
    """Brightness enhancement (utils.py:606-617), PIL-based in memory."""
    from PIL import Image, ImageEnhance

    pil = Image.fromarray(img.astype(np.uint8))
    return np.asarray(ImageEnhance.Brightness(pil).enhance(factor))


def preprocess_action_repeat(act: np.ndarray, width: int = 32,
                             height: int = 32) -> np.ndarray:
    """Action frame: per-pixel coordinates + tiled action (utils.py:121-134)."""
    act_dim = act.shape[0]
    frame = np.zeros((act_dim + 2, height, width))
    frame[2:] = np.tile(act.reshape(-1, 1, 1), (1, height, width))
    width_1d = (np.arange(width) + 0.5) / width - 0.5
    height_1d = (height - np.arange(height) - 0.5) / height - 0.5
    frame[0] = np.tile(width_1d.reshape(1, 1, -1), (1, height, 1))
    frame[1] = np.tile(height_1d.reshape(1, -1, 1), (1, 1, width))
    return frame.reshape(-1)
