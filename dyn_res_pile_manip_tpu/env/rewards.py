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


def prepare_goal_lowrank(goal: np.ndarray, rank: int = 64):
    """Rank-``rank`` SVD factorization of the prepare_goal field, for the
    planner's gather-free sample path (config_reward_ptcl_fast).

    A 192k-point bilinear map_coordinates gather costs ~10 ms/iteration on
    TPU (gathers run at ~10-50M rows/s); factorized, the sample becomes two
    two-hot weight matmuls on the MXU (~5 ms fwd+grad, rank 64 max
    reconstruction error ~0.1% of the field range on disc/letter goals).
    Host SVD runs once per goal. Returns (US, V): field ~= US @ V.T."""
    field = np.asarray(prepare_goal(goal))
    u, s, vt = np.linalg.svd(field, full_matrices=False)
    us = (u[:, :rank] * s[:rank]).astype(np.float32)
    v = vt[:rank].T.astype(np.float32)
    return jnp.asarray(us), jnp.asarray(v)


def _interp_rows(tbl, q):
    """Bilinear row interpolation of ``tbl`` (H, K) at fractional indices
    ``q`` (P,), as two one-hot bf16 matmuls (gather-free; the one-hot rows
    select exact f32 table rows, so only the selection itself is bf16).
    Gradient w.r.t. q flows through the lerp weight (the exact bilinear
    derivative), matching map_coordinates' vjp."""
    H = tbl.shape[0]
    qc = jnp.clip(q, 0.0, H - 1.0)
    i0 = jnp.floor(qc)
    w1 = (qc - i0)[:, None]
    iota = jnp.arange(H, dtype=jnp.float32)[None, :]
    h0 = (iota == i0[:, None]).astype(jnp.bfloat16)
    h1 = (iota == jnp.minimum(i0 + 1.0, H - 1.0)[:, None]).astype(
        jnp.bfloat16)
    t = tbl.astype(jnp.bfloat16)
    r0 = (h0 @ t).astype(jnp.float32)
    r1 = (h1 @ t).astype(jnp.float32)
    return r0 * (1.0 - w1) + r1 * w1


def config_reward_ptcl_fast(state, field_us, field_v, cam_params, goal_coor,
                            normalize=True, offset=(0.0, 0.0)):
    """MXU-friendly twin of config_reward_ptcl for the planner's jitted
    optimize loop (flex_rewards.py:156-214 semantics):

    - goal-field bilinear sample through the rank-K SVD factors from
      prepare_goal_lowrank (two-hot matmuls instead of a 192k-point gather)
    - coverage min-distance via d^2 = |g|^2 + |p|^2 - 2 g.p with the cross
      term as one MXU matmul (instead of materializing the broadcast diff)

    Worst-case deviation from the exact reward is ~0.3 px on near-zero
    min-distances plus the SVD truncation (~0.1% of field range) — far
    below the FPS perception noise the planner already votes across. The
    exact config_reward_ptcl remains the scoring/reporting path."""
    B, N, _ = state.shape
    fx, fy, cx, cy = cam_params
    col = state[..., 0] * fx / state[..., 2] + cx + offset[0]   # (B, N)
    row = state[..., 1] * fy / state[..., 2] + cy + offset[1]

    P = B * N
    u = _interp_rows(field_us, (row - 0.5).reshape(P))          # (P, K)
    v = _interp_rows(field_v, (col - 0.5).reshape(P))
    rewards = jnp.sum(u * v, axis=-1).reshape(B, N).sum(axis=1)

    pix = jnp.stack([col, row], axis=-1)                        # (B, N, 2)
    g2 = jnp.sum(goal_coor ** 2, axis=-1)                       # (M,)
    p2 = jnp.sum(pix ** 2, axis=-1)                             # (B, N)
    cross = jnp.einsum("md,bnd->bmn", goal_coor, pix,
                       precision=jax.lax.Precision.HIGHEST)
    d2 = g2[None, :, None] + p2[:, None, :] - 2.0 * cross       # (B, M, N)
    dmin = jnp.sqrt(jnp.maximum(jnp.min(d2, axis=2), 0.0))
    rewards = rewards + dmin.sum(axis=1)
    if normalize:
        rewards = rewards / N
    return -rewards


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


def depth_to_pcd(depth, original_size, cam_params, cam_extrinsic):
    """Back-project a full depth image to a world point-cloud grid
    (flex_rewards.py:13-33). Host NumPy."""
    fx, fy, cx, cy = cam_params
    w, h = original_size
    obs_h, obs_w = depth.shape
    fx, fy = fx * obs_w / w, fy * obs_h / h
    cx, cy = cx * obs_w / w, cy * obs_h / h
    x, y = np.meshgrid(np.arange(obs_w), np.arange(obs_h))
    pts = np.stack([((x - cx) * depth / fx).reshape(-1),
                    ((y - cy) * depth / fy).reshape(-1),
                    depth.reshape(-1)], axis=1)
    homo = np.concatenate([pts, np.ones((pts.shape[0], 1))], axis=-1)
    return (cam_extrinsic @ homo.T).T[:, :3].reshape(obs_h, obs_w, 3)


def highest_reward(state, reward_params):
    """Max negative depth over the workspace (flex_rewards.py:57-92):
    state (N, C, H, W) with the depth channel last; returns (N,)."""
    _, _, _ = reward_params
    arr = np.asarray(state)
    return np.asarray([np.amax(-arr[i, -1]) for i in range(arr.shape[0])])


def distractor_reward_diff(act_seqs_tensor, distractor_dist_fn, config,
                           width=64):
    """Penalize pushes whose swept segment nears a distractor
    (flex_rewards.py:245-264). act_seqs_tensor: (S, T, cvx, 4) jnp."""
    wkspc_w = config["dataset"]["wkspc_w"]
    a = act_seqs_tensor
    n = a.shape[0] * a.shape[1]
    img = jnp.stack([
        -a[..., 1] / wkspc_w * width / 3.0 + width / 2.0,
        a[..., 0] / wkspc_w * width / 3.0 + width / 2.0,
        -a[..., 3] / wkspc_w * width / 3.0 + width / 2.0,
        a[..., 2] / wkspc_w * width / 3.0 + width / 2.0,
    ], axis=-1)
    img = img.reshape(n, a.shape[2], 4)
    max_dist = jnp.zeros((n,))
    for i in range(11):
        w = i / 10.0
        px = img[:, 0, 0] * w + img[:, 0, 2] * (1 - w)
        py = img[:, 0, 1] * w + img[:, 0, 3] * (1 - w)
        max_dist = jnp.maximum(distractor_dist_fn(px, py), max_dist)
    return -max_dist
