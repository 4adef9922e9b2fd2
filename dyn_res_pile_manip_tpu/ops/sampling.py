"""On-device (jittable) point-sampling ops.

JAX twins of the host-side perception helpers (utils/pointcloud.py): used
when perception must stay on device (fused datagen loops, future
end-to-end-jitted MPC perception). All fixed-shape + masked:

- fps: farthest-point sampling to exactly k points (dgl farthest_point_sampler
  role, reference utils.py:423-436) over a masked point set.
- fps_rad_capped: radius-stopped FPS with a static capacity (utils.py:438-449;
  returns a validity mask instead of a ragged result).
- voxel_downsample_capped: voxel-grid mean downsample with static capacity
  (open3d voxel_down_sample role, utils.py:533-544).
- depth_to_fgpcd: masked back-projection of a depth image (utils.py:491-506)
  with a static point capacity.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BIG = 1e9


@functools.partial(jax.jit, static_argnames=("k",))
def fps(points: jnp.ndarray, mask: jnp.ndarray, k: int, start_idx: int = 0):
    """points: (N, C), mask: (N,) bool. Returns (samples (k, C),
    idx (k,), coverage_radius) — the max distance from any masked point to
    its nearest sample, matching utils.fps's second return."""
    n = points.shape[0]
    d0 = jnp.where(mask, BIG, -BIG)

    def body(carry, _):
        dist, last_idx = carry
        p = points[last_idx]
        d_new = jnp.linalg.norm(points - p[None, :], axis=-1)
        dist = jnp.minimum(dist, jnp.where(mask, d_new, -BIG))
        nxt = jnp.argmax(dist)
        return (dist, nxt), last_idx

    (dist, _), idx = jax.lax.scan(
        body, (d0, jnp.asarray(start_idx)), None, length=k)
    return points[idx], idx, jnp.max(jnp.where(mask, dist, -BIG))


@functools.partial(jax.jit, static_argnames=("cap",))
def fps_rad_capped(points: jnp.ndarray, mask: jnp.ndarray, radius,
                   cap: int, start_idx: int = 0):
    """FPS until every masked point is within ``radius`` of a sample, up to
    ``cap`` samples. Returns (samples (cap, C), valid (cap,))."""
    samples, idx, _ = fps(points, mask, cap, start_idx)
    # sample j is needed iff, before it was added, some point was farther
    # than radius from samples[:j] — recompute incrementally
    d = jnp.where(mask, BIG, -BIG)

    def body(d, p):
        needed = jnp.max(d) > radius
        d = jnp.minimum(d, jnp.where(
            mask, jnp.linalg.norm(points - p[None, :], axis=-1), -BIG))
        return d, needed

    _, needed = jax.lax.scan(body, d, samples)
    needed = needed.at[0].set(True)
    return samples, needed


@functools.partial(jax.jit, static_argnames=("cap",))
def voxel_downsample_capped(points: jnp.ndarray, mask: jnp.ndarray,
                            voxel_size, cap: int):
    """Voxel-grid mean downsample with static output capacity.

    Occupied voxels beyond ``cap`` are dropped (callers size cap to the
    workspace). Returns (centroids (cap, 3), valid (cap,))."""
    lower = jnp.min(jnp.where(mask[:, None], points, BIG), axis=0)
    keys = jnp.floor((points - lower[None, :]) / voxel_size).astype(jnp.int32)
    kmax = jnp.max(jnp.where(mask[:, None], keys, 0), axis=0) + 1
    flat = (keys[:, 0] * kmax[1] + keys[:, 1]) * kmax[2] + keys[:, 2]
    flat = jnp.where(mask, flat, -1)
    # hash voxel ids into a table of 2*cap slots
    hsize = 2 * cap
    hid = jnp.where(flat >= 0, (flat * jnp.int32(-1640531535)) % hsize, hsize)
    sums = jnp.zeros((hsize + 1, 3)).at[hid].add(
        jnp.where(mask[:, None], points, 0.0))
    cnts = jnp.zeros((hsize + 1,)).at[hid].add(mask.astype(jnp.float32))
    occupied = cnts[:hsize] > 0
    centroids = sums[:hsize] / jnp.maximum(cnts[:hsize, None], 1.0)
    # compact the first ``cap`` occupied slots
    order = jnp.argsort(~occupied)  # occupied first (stable)
    take = order[:cap]
    return centroids[take], occupied[take]


@functools.partial(jax.jit, static_argnames=("cap",))
def depth_to_fgpcd(depth: jnp.ndarray, fg_mask: jnp.ndarray, cam_params,
                   cap: int):
    """Masked back-projection with static capacity: returns
    (points (cap, 3), valid (cap,)). Foreground pixels beyond cap drop."""
    h, w = depth.shape
    fx, fy, cx, cy = cam_params
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=depth.dtype),
                          jnp.arange(w, dtype=depth.dtype), indexing="ij")
    mask = fg_mask & (depth > 0)
    pts = jnp.stack([(xs - cx) * depth / fx,
                     (ys - cy) * depth / fy,
                     depth], axis=-1).reshape(-1, 3)
    flat_mask = mask.reshape(-1)
    # compact: order foreground first
    order = jnp.argsort(~flat_mask)[:cap]
    return pts[order], flat_mask[order]
