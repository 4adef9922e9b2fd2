"""Host-side imaging utilities: distance transforms, goal-shape generation,
mask resizing, and the ground-truth task reward.

Behavioral re-implementations of the image helpers in the reference's
utils.py (gt_rewards 546-559, gen_goal_shape 566-579, gen_subgoal 596-604)
without cv2: distance transforms use scipy's exact EDT (the reference uses
cv2.distanceTransform DIST_L2 maskSize 5, an EDT approximation), and letter
goal masks are rasterized from a system font instead of shipped .npy assets.
"""
from __future__ import annotations

import glob
import os

import numpy as np
from scipy import ndimage


def distance_transform(binary_zero_region: np.ndarray) -> np.ndarray:
    """Euclidean distance to the nearest zero pixel.

    Equivalent to cv2.distanceTransform(src, DIST_L2, 5): distance from each
    non-zero pixel of ``binary_zero_region`` to the nearest zero pixel.
    """
    return ndimage.distance_transform_edt(
        binary_zero_region.astype(bool)).astype(np.float32)


def resize_area(img: np.ndarray, out_hw: tuple) -> np.ndarray:
    """Anti-aliased (area-style) resize for float images, like
    cv2.resize(..., INTER_AREA) for downscaling."""
    import jax.image

    out_h, out_w = out_hw
    if img.shape[:2] == (out_h, out_w):
        return np.asarray(img, dtype=np.float32)
    shape = (out_h, out_w) + img.shape[2:]
    out = jax.image.resize(img.astype(np.float32), shape, method="linear",
                           antialias=True)
    return np.asarray(out)


def gt_rewards(mask: np.ndarray, subgoal: np.ndarray) -> float:
    """Ground-truth task metric (utils.py:546-554): lower is better.

    mask: binary foreground mask; subgoal: distance-transform image of the
    goal (0 inside the goal region)."""
    subgoal_mask = subgoal < 0.5
    obj_dist = distance_transform(1 - mask.astype(np.uint8))
    return (np.sum(mask * subgoal) / mask.sum()
            + np.sum(obj_dist * subgoal_mask) / subgoal_mask.sum())


def gt_rewards_norm_by_sum(mask: np.ndarray, subgoal: np.ndarray) -> float:
    subgoal_mask = subgoal < 0.5
    obj_dist = distance_transform(1 - mask.astype(np.uint8))
    return (np.sum(mask * subgoal) / subgoal.sum()
            + np.sum(obj_dist * subgoal_mask) / obj_dist.sum())


def _find_font(size: int):
    from PIL import ImageFont

    candidates = []
    for pat in ("/usr/share/fonts/**/DejaVuSans.ttf",
                "/usr/share/fonts/**/*Helvetica*.ttf",
                "/usr/share/fonts/**/LiberationSans-Regular.ttf",
                "/usr/share/fonts/**/*.ttf"):
        candidates += sorted(glob.glob(pat, recursive=True))
        if candidates:
            break
    for path in candidates:
        try:
            return ImageFont.truetype(path, size)
        except Exception:
            continue
    return None


def letter_mask(name: str, h: int, w: int) -> np.ndarray:
    """Rasterize a capital-letter goal mask (1 inside the glyph).

    Replaces the reference's shipped env/target_shapes/helvetica_*.npy
    assets: same role (binary letter occupancy grid covering ~60% of the
    frame), regenerated procedurally so no assets are copied.
    """
    from PIL import Image, ImageDraw

    big = 512
    img = Image.new("L", (big, big), 0)
    draw = ImageDraw.Draw(img)
    font = _find_font(int(big * 0.9))
    if font is not None:
        bbox = draw.textbbox((0, 0), name, font=font)
        tw, th = bbox[2] - bbox[0], bbox[3] - bbox[1]
        draw.text(((big - tw) / 2 - bbox[0], (big - th) / 2 - bbox[1]),
                  name, fill=255, font=font)
        arr = np.asarray(img, dtype=np.float32) / 255.0
    else:  # fallback: block letters for a few glyphs
        arr = np.zeros((big, big), dtype=np.float32)
        t = big // 6
        if name.upper() == "I":
            arr[t:2 * t, big // 4:3 * big // 4] = 1
            arr[-2 * t:-t, big // 4:3 * big // 4] = 1
            arr[t:-t, big // 2 - t // 2:big // 2 + t // 2] = 1
        else:  # generic square
            arr[big // 4:-big // 4, big // 4:-big // 4] = 1
    # scale glyph to occupy the central ~55% of the target frame
    out = np.zeros((h, w), dtype=np.float32)
    ys, xs = np.nonzero(arr > 0.5)
    if len(ys) == 0:
        return out
    gh, gw = ys.max() - ys.min() + 1, xs.max() - xs.min() + 1
    scale = 0.55 * min(h / gh, w / gw)
    sub = arr[ys.min():ys.max() + 1, xs.min():xs.max() + 1]
    new_h, new_w = max(1, int(gh * scale)), max(1, int(gw * scale))
    sub = resize_area(sub, (new_h, new_w))
    y0, x0 = (h - new_h) // 2, (w - new_w) // 2
    out[y0:y0 + new_h, x0:x0 + new_w] = (sub > 0.5).astype(np.float32)
    return out


def gen_goal_shape(name: str, h: int, w: int, font_name: str = "helvetica_thin"):
    """Goal distance-transform + RGB image for a letter target
    (utils.py:566-579). Returns (goal_dist (h,w), goal_img (h,w,3) uint8).

    Loads a pre-generated assets/target_shapes/helvetica_{name}.npy mask if
    present (same role as the reference's env/target_shapes assets; masks
    store 0 inside the glyph), else rasterizes the glyph procedurally."""
    asset = os.path.join("assets", "target_shapes", f"helvetica_{name}.npy")
    if os.path.exists(asset):
        stored = np.load(asset)
        if stored.shape != (h, w):
            stored = resize_area(stored, (h, w))
        goal = (stored <= 0.5).astype(np.uint8)
    else:
        goal = (letter_mask(name, h, w) > 0.5).astype(np.uint8)
    goal_dist = np.minimum(distance_transform(1 - goal), 1e4)
    goal_img = (goal * 255)[..., None].repeat(3, axis=-1).astype(np.uint8)
    return goal_dist, goal_img


def gen_ch_goal(name: str, h: int, w: int):
    """Character goal from the 720_ch asset set (utils.py:581-594); falls
    back to the procedural glyph rasterizer."""
    asset = os.path.join("assets", "target_shapes_ch", f"{name}.npy")
    if os.path.exists(asset):
        stored = resize_area(np.load(asset), (h, w))
        goal = (stored <= 0.5).astype(np.uint8)
    else:
        goal = (letter_mask(name, h, w) > 0.5).astype(np.uint8)
    goal_dist = distance_transform(1 - goal)
    goal_img = (goal * 255)[..., None].repeat(3, axis=-1).astype(np.uint8)
    return goal_dist, goal_img


def gen_subgoal(c_row: int, c_col: int, r: float, h: int = 64, w: int = 64):
    """Disc goal: returns (subgoal distance image, binary mask)."""
    mask = np.zeros((h, w))
    grid = np.mgrid[0:h, 0:w].astype(np.float64)
    grid[0] -= c_row
    grid[1] -= c_col
    dist = np.sqrt(np.sum(grid ** 2, axis=0))
    mask[dist < r] = 1
    subgoal = np.minimum(distance_transform(1 - mask.astype(np.uint8)), 1e4)
    return subgoal, mask


def save_goal_assets(out_dir: str, h: int = 720, w: int = 720) -> None:
    """Pre-generate letter goal masks as .npy (same on-disk role as the
    reference's env/target_shapes)."""
    os.makedirs(out_dir, exist_ok=True)
    for ch in "ILTOXUVNMKAEFH":
        np.save(os.path.join(out_dir, f"helvetica_{ch}.npy"),
                1.0 - letter_mask(ch, h, w))
