"""Differentiable task rewards.

Re-implementation of env/flex_rewards.py in JAX:
- config_reward_ptcl (flex_rewards.py:156-214): project particles to pixels
  via camera intrinsics, bilinearly sample a goal distance field
  (grid_sample -> map_coordinates), plus a coverage term (min distance from
  FPS-sampled goal pixels to the particles), normalized by N, negated.
- config_reward (flex_rewards.py:117-154): image-mask variant.

Goal-image preprocessing (distance transform of the goal mask) happens once
on host in ``prepare_goal``; the per-iteration reward is pure JAX and
differentiable w.r.t. the particle states (the MPC backprops through it).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.imaging import distance_transform


def prepare_goal(goal: np.ndarray):
    """goal: (H, W) distance image (0 inside the goal region).

    Returns the sampling field goal - dt(goal<0.5) shifted to min 0
    (flex_rewards.py:172-177): inside the goal the field *decreases* toward
    the region's center, giving useful gradients inside the goal too.
    """
    goal_seg = (goal < 0.5).astype(np.uint8)
    neg_goal_dist = distance_transform(goal_seg)
    field = goal - neg_goal_dist
    field = field - field.min()
    return jnp.asarray(field, jnp.float32)


def goal_coords(goal: np.ndarray, num: int, rng=None) -> np.ndarray:
    """FPS-downsampled (col, row) coordinates of the goal region
    (flex_env.py:1029-1031)."""
    from ..utils import pointcloud as pc

    rows, cols = np.nonzero(goal < 0.5)
    coor = np.stack([cols, rows], axis=1).astype(np.float64)  # (M, 2)
    num = min(num, coor.shape[0])
    sampled, _ = pc.fps_np(coor, num, init_idx=0)
    return sampled.astype(np.float32)


def config_reward_ptcl(state, goal_field, cam_params, goal_coor,
                       normalize=True, offset=(0.0, 0.0)):
    """state: (B, N, 3) camera-frame particles; goal_field from prepare_goal;
    goal_coor: (M, 2) (col, row). Returns (B,) rewards (higher better)."""
    B, N, _ = state.shape
    fx, fy, cx, cy = cam_params
    col = state[..., 0] * fx / state[..., 2] + cx + offset[0]   # (B, N)
    row = state[..., 1] * fy / state[..., 2] + cy + offset[1]

    # grid_sample(align_corners=False) samples at pixel - 0.5
    def sample(r, c):
        return jax.scipy.ndimage.map_coordinates(
            goal_field, [r - 0.5, c - 0.5], order=1, mode="nearest")

    rewards = jax.vmap(sample)(row, col).sum(axis=1)            # (B,)

    pix = jnp.stack([col, row], axis=-1)                        # (B, N, 2)
    d = jnp.linalg.norm(goal_coor[None, :, None, :] - pix[:, None, :, :],
                        axis=-1)                                # (B, M, N)
    rewards = rewards + d.min(axis=2).sum(axis=1)
    if normalize:
        rewards = rewards / N
    return -rewards


def config_reward(state, goal, goal_mask):
    """Image-mask variant (flex_rewards.py:117-154): state (B, 1, H, W)
    binary occupancy, goal (H, W) distance field."""
    mask = state[:, 0]
    rewards = jnp.sum(goal[None] * mask, axis=(1, 2))
    return -rewards
