"""Host-side (NumPy) point-cloud utilities.

Behavioral re-implementations of the perception helpers in the reference's
utils.py (fps 423-436, fps_rad 438-449, fps_np 451-466, recenter 468-477,
opengl2cam 479-489, depth2fgpcd 491-506, pcd2pix 508-522, downsample_pcd
533-544). These run at episode boundaries only (not the hot path) — the
in-loop JAX variants live in dyn_res_pile_manip_tpu.ops.sampling.
"""
from __future__ import annotations

import numpy as np

OPENCV_T_OPENGL = np.array(
    [[1.0, 0, 0, 0], [0, -1.0, 0, 0], [0, 0, -1.0, 0], [0, 0, 0, 1.0]]
)


def fps_np(pcd: np.ndarray, particle_num: int, init_idx: int = -1):
    """Farthest-point sampling to exactly ``particle_num`` points.

    Returns (sampled (particle_num, c), final max distance)."""
    n = pcd.shape[0]
    if init_idx == -1:
        rand_idx = np.random.randint(n)
    else:
        rand_idx = init_idx
    out = np.empty((particle_num, pcd.shape[1]), dtype=pcd.dtype)
    out[0] = pcd[rand_idx]
    dist = np.linalg.norm(pcd - out[0], axis=1)
    for i in range(1, particle_num):
        out[i] = pcd[dist.argmax()]
        dist = np.minimum(dist, np.linalg.norm(pcd - out[i], axis=1))
    return out, dist.max()


def fps(pcd: np.ndarray, particle_num: int, init_idx: int = -1):
    """FPS returning (points, coverage radius) — utils.py:423-436 semantics
    (coverage radius = max over points of distance to nearest sample)."""
    return fps_np(pcd, particle_num, init_idx)


def fps_rad(pcd: np.ndarray, radius: float) -> np.ndarray:
    """FPS until every point is within ``radius`` of a sample."""
    rand_idx = np.random.randint(pcd.shape[0])
    samples = [pcd[rand_idx]]
    dist = np.linalg.norm(pcd - samples[0], axis=1)
    while dist.max() > radius:
        samples.append(pcd[dist.argmax()])
        dist = np.minimum(dist, np.linalg.norm(pcd - samples[-1], axis=1))
    return np.stack(samples, axis=0)


def recenter(pcd: np.ndarray, sampled_pcd: np.ndarray, r: float = 0.02
             ) -> np.ndarray:
    """Move each sample to the mean of the raw points within radius ``r``."""
    dist = np.linalg.norm(pcd[:, None, :] - sampled_pcd[None, :, :], axis=2)
    out = np.zeros_like(sampled_pcd)
    for i in range(sampled_pcd.shape[0]):
        sel = pcd[dist[:, i] < r]
        out[i] = sel.mean(axis=0) if sel.shape[0] > 0 else sampled_pcd[i]
    return out


def opengl2cam(pcd: np.ndarray, cam_extrinsic: np.ndarray,
               global_scale: float) -> np.ndarray:
    """World (GL) -> OpenCV camera coords, divided by global_scale."""
    opencv_T_world = np.matmul(np.linalg.inv(cam_extrinsic), OPENCV_T_OPENGL)
    homo = np.concatenate([pcd, np.ones((pcd.shape[0], 1))], axis=1)
    return np.matmul(np.linalg.inv(opencv_T_world), homo.T).T[:, :3] \
        / global_scale


def depth2fgpcd(depth: np.ndarray, mask: np.ndarray, cam_params) -> np.ndarray:
    """Back-project masked depth pixels to an OpenCV-frame point cloud."""
    h, w = depth.shape
    mask = np.logical_and(mask, depth > 0)
    fgpcd = np.zeros((int(mask.sum()), 3))
    fx, fy, cx, cy = cam_params
    pos_x, pos_y = np.meshgrid(np.arange(w), np.arange(h))
    pos_x = pos_x[mask]
    pos_y = pos_y[mask]
    fgpcd[:, 0] = (pos_x - cx) * depth[mask] / fx
    fgpcd[:, 1] = (pos_y - cy) * depth[mask] / fy
    fgpcd[:, 2] = depth[mask]
    return fgpcd


def pcd2pix(pcd: np.ndarray, cam_params, offset=(0, 0)) -> np.ndarray:
    """Project OpenCV-frame points to (row, col) integer pixels."""
    fx, fy, cx, cy = cam_params
    pix = np.zeros((pcd.shape[0], 2))
    pix[:, 1] = pcd[:, 0] * fx / pcd[:, 2] + cx
    pix[:, 0] = pcd[:, 1] * fy / pcd[:, 2] + cy
    pix[:, 0] += offset[0]
    pix[:, 1] += offset[1]
    return pix.astype(np.int32)


def downsample_pcd(pcd: np.ndarray, voxel_size: float) -> np.ndarray:
    """Voxel-grid downsample: mean of the points in each occupied voxel
    (open3d ``voxel_down_sample`` semantics, utils.py:533-544)."""
    if pcd.shape[0] == 0:
        return pcd
    mins = pcd.min(axis=0)
    keys = np.floor((pcd - mins) / voxel_size).astype(np.int64)
    # Lexicographic voxel id
    dims = keys.max(axis=0) + 1
    flat = (keys[:, 0] * dims[1] + keys[:, 1]) * dims[2] + keys[:, 2]
    order = np.argsort(flat, kind="stable")
    flat_sorted = flat[order]
    pts_sorted = pcd[order]
    boundaries = np.flatnonzero(np.diff(flat_sorted)) + 1
    groups = np.split(pts_sorted, boundaries)
    return np.stack([g.mean(axis=0) for g in groups], axis=0)


def find_closest_point(pcd: np.ndarray, point: np.ndarray) -> int:
    dist = np.linalg.norm(pcd - point[None, :], axis=1)
    return int(np.argmin(dist))
