"""TPU-native position-based-dynamics granular solver.

A ground-up JAX re-design of the closed-source NVIDIA FleX solver core the
reference drives through NvFlexUpdateSolver (PyFleX/bindings/pyflex.cpp:2045;
parameter semantics from PyFleX/include/NvFlex.h:95-154). Per display frame
(dt = 1/60) the solver runs ``num_substeps`` substeps of:

  1. semi-implicit integration with viscous damping,
  2. hash-grid neighbor search (sort-based, fixed top-K capacity),
  3. ``num_iterations`` Jacobi projection sweeps:
     particle-particle contacts with PBD Coulomb friction and shock
     propagation (mass scaling along gravity), plane and oriented-box
     collision (the walls and the kinematic pusher), and per-group rigid
     shape matching (warm-started quaternion polar decomposition),
  4. velocity update with sleeping.

Everything is shape-static and jit/scan-compatible; the env jits whole
pushes (hundreds of frames) into a single XLA program.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.types import Colliders, SimParams, SimState

# ---------------------------------------------------------------------------
# neighbor search
# ---------------------------------------------------------------------------

# Cell-candidate capacity. With cell size == search radius (1.25x rest
# distance) a cell can hold up to 8 particles when a regular packing aligns
# with the grid; 6 plus the per-build grid offset jitter below keeps
# overflow rare and transient (dropped candidates change every rebuild).
CELL_CAP = 6
NUM_NEIGHBOR_CELLS = 27
# contact projections per neighbor gather (frozen-neighbor reuse)
CONTACT_INNER = 2


def _cell_offsets():
    o = jnp.arange(-1, 2)
    ox, oy, oz = jnp.meshgrid(o, o, o, indexing="ij")
    return jnp.stack([ox.ravel(), oy.ravel(), oz.ravel()], axis=1)  # (27,3)


@functools.partial(jax.jit, static_argnames=("k", "grid_dims"))
def find_neighbors(x: jnp.ndarray, active: jnp.ndarray, group: jnp.ndarray,
                   cell_size: jnp.ndarray, lower: jnp.ndarray,
                   grid_dims: Tuple[int, int, int], k: int = 24):
    """Fixed-capacity neighbor lists via a sorted linear cell hash.

    Replaces FleX's GPU hash grid (maxNeighborsPerParticle=96,
    pyflex.cpp:738). Returns (idx (N,k) int32, ok (N,k) bool) with neighbors
    sorted nearest-first; same-group pairs are excluded (NvFlexMakePhase
    group collision filtering, NvFlex.h:160-176).

    Cell ranges in the sorted order are looked up through dense
    start/end tables scattered from the sorted ids — O(1) per query cell,
    avoiding binary searches (TPU-hostile gather chains).
    """
    n = x.shape[0]
    dx_, dy_, dz_ = grid_dims
    # spatial hash: cell ids are hashed into a fixed table; collisions only
    # add distance-filtered candidates (correctness preserved)
    hash_bits = 20
    hsize = 1 << hash_bits

    # per-build sub-cell grid offset: packings aligned with the grid would
    # otherwise overflow the same cells persistently
    wob = jnp.sum(x[0]) * 7919.0
    offset = (wob - jnp.floor(wob)) * cell_size * jnp.array([1.0, 0.73, 0.41])
    ijk = jnp.floor((x - lower[None, :] + offset[None, :])
                    / cell_size).astype(jnp.int32)
    ijk = jnp.clip(ijk, 0, jnp.array([dx_ - 1, dy_ - 1, dz_ - 1]))
    cid = (ijk[:, 0] * dy_ + ijk[:, 1]) * dz_ + ijk[:, 2]
    hid = (cid * jnp.int32(-1640531535)) & (hsize - 1)
    hid = jnp.where(active, hid, hsize)  # park inactive out of range

    order = jnp.argsort(hid)
    hid_sorted = hid[order]

    # dense per-bucket [start, end) tables over the sorted order
    pos = jnp.arange(n, dtype=jnp.int32)
    start_tbl = jnp.full((hsize + 1,), n, jnp.int32
                         ).at[hid_sorted].min(pos)
    end_tbl = jnp.zeros((hsize + 1,), jnp.int32
                        ).at[hid_sorted].max(pos + 1)

    # 27 neighbor-cell ids per particle
    offs = _cell_offsets()                                   # (27,3)
    nijk = ijk[:, None, :] + offs[None, :, :]                # (N,27,3)
    in_grid = jnp.all(
        (nijk >= 0) & (nijk < jnp.array([dx_, dy_, dz_])[None, None, :]),
        axis=-1)
    ncid = (nijk[..., 0] * dy_ + nijk[..., 1]) * dz_ + nijk[..., 2]
    nhid = (ncid * jnp.int32(-1640531535)) & (hsize - 1)
    nhid = jnp.where(in_grid, nhid, hsize)

    starts = start_tbl[nhid]
    ends = end_tbl[nhid]

    slot = jnp.arange(CELL_CAP)
    cand_pos = starts[..., None] + slot[None, None, :]       # (N,27,C)
    cand_ok = cand_pos < ends[..., None]
    cand_pos = jnp.minimum(cand_pos, n - 1).reshape(n, -1)
    cand_ok = cand_ok.reshape(n, -1)
    cand = order[cand_pos]                                   # (N, 27*C)

    me = jnp.arange(n)[:, None]
    d2 = jnp.sum((x[:, None, :] - x[cand]) ** 2, axis=-1)
    same_group = (group[:, None] == group[cand]) & (group[:, None] >= 0)
    r2 = cell_size * cell_size
    cand_ok = (cand_ok & (cand != me) & active[cand] & active[:, None]
               & ~same_group & (d2 < r2))
    d2 = jnp.where(cand_ok, d2, jnp.inf)

    neg_top, top_i = jax.lax.top_k(-d2, k)                   # nearest-first
    idx = jnp.take_along_axis(cand, top_i, axis=1)
    ok = jnp.isfinite(-neg_top)
    return idx.astype(jnp.int32), ok


# ---------------------------------------------------------------------------
# shape matching
# ---------------------------------------------------------------------------

def _quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """(…,4) wxyz quaternion -> (…,3,3) rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)], -1),
    ], -2)


def _quat_mul(a, b):
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], -1)


def extract_rotation(A: jnp.ndarray, q0: jnp.ndarray,
                     iters: int = 4) -> jnp.ndarray:
    """Warm-started quaternion polar decomposition (Mueller et al. 2016,
    'A Robust Method to Extract the Rotational Part of Deformations').

    A: (G,3,3) covariance, q0: (G,4) warm-start. Returns refined (G,4).
    """
    def body(q, _):
        R = _quat_to_mat(q)                                   # (G,3,3)
        # columns of R and A
        rc = jnp.moveaxis(R, -1, 0)                           # (3,G,3)
        ac = jnp.moveaxis(A, -1, 0)
        num = jnp.sum(jnp.cross(rc, ac, axis=-1), axis=0)     # (G,3)
        den = jnp.abs(jnp.sum(jnp.sum(rc * ac, axis=-1), axis=0)) + 1e-9
        omega = num / den[..., None]
        angle = jnp.linalg.norm(omega, axis=-1, keepdims=True)
        axis = omega / jnp.maximum(angle, 1e-9)
        half = 0.5 * angle
        dq = jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], -1)
        q = _quat_mul(dq, q)
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-9)
        return q, None
    q, _ = jax.lax.scan(body, q0, None, length=iters)
    return q


def group_onehot(state: SimState) -> jnp.ndarray:
    """(G, N) one-hot membership matrix (weights) for rigid groups.

    Group ids are fixed for a scene, so this is computed once per frame and
    turns every shape-matching reduction/broadcast into an MXU matmul —
    TPU scatters/gathers (segment_sum / index lookups) are serial and slow.
    """
    G = state.group_quat.shape[0]
    gids = jnp.arange(G)[:, None]
    return ((state.group[None, :] == gids)
            & (state.group[None, :] >= 0)).astype(jnp.float32)


def shape_match(xp: jnp.ndarray, state: SimState, params: SimParams,
                group_quat: jnp.ndarray, onehot: jnp.ndarray,
                inv_counts: jnp.ndarray, solve_mask: jnp.ndarray = None,
                group_keep: jnp.ndarray = None):
    """One rigid shape-matching projection for all groups at once, all in
    matmuls: onehot (G, N), inv_counts (G,) = 1/max(count,1).

    solve_mask (N,) restricts position updates to awake particles and
    group_keep (G,) preserves the stored quaternion of groups outside the
    active set (their covariances are garbage when members are absent from
    a prefix slice; see build_cache's active-set docs)."""
    # per-group COM and its per-particle broadcast. These matmuls carry
    # raw positions, so force full precision: backends may default f32
    # matmuls to bf16-class accuracy, which would corrupt COMs by ~radius.
    hi = jax.lax.Precision.HIGHEST
    mm = lambda a, b: jnp.matmul(a, b, precision=hi)
    com = mm(onehot, xp) * inv_counts[:, None]                 # (G, 3)
    com_pp = mm(onehot.T, com)                                 # (N, 3)
    w = jnp.sum(onehot, axis=0)                                # (N,) 0/1

    rel = xp - com_pp
    outer = (rel[:, :, None] * state.rest[:, None, :]).reshape(-1, 9)
    A = mm(onehot, outer).reshape(-1, 3, 3)                    # (G, 3, 3)
    q = extract_rotation(A, group_quat)
    if group_keep is not None:
        q = jnp.where(group_keep[:, None], q, group_quat)
    R_pp = mm(onehot.T, _quat_to_mat(q).reshape(-1, 9)).reshape(-1, 3, 3)
    goal = com_pp + jnp.einsum("nij,nj->ni", R_pp, state.rest)
    delta = (goal - xp) * (params.rigid_stiffness * w)[:, None]
    if solve_mask is not None:
        delta = jnp.where(solve_mask[:, None], delta, 0.0)
    return xp + delta, q


# ---------------------------------------------------------------------------
# colliders
# ---------------------------------------------------------------------------

def _box_sdf_normal(p_local: jnp.ndarray, half: jnp.ndarray):
    """Signed distance and outward normal of an axis-aligned box, for points
    given in the box frame. p_local: (...,3)."""
    q = jnp.abs(p_local) - half
    outside = jnp.maximum(q, 0.0)
    d_out = jnp.linalg.norm(outside, axis=-1)
    d_in = jnp.minimum(jnp.max(q, axis=-1), 0.0)
    sdf = d_out + d_in
    # outward normal: outside -> gradient of d_out; inside -> axis of max q
    n_out = outside * jnp.sign(p_local)
    n_out = n_out / jnp.maximum(d_out[..., None], 1e-9)
    inside_axis = jnp.argmax(q, axis=-1)
    n_in = jax.nn.one_hot(inside_axis, 3) * jnp.sign(p_local)
    n = jnp.where((d_out > 0)[..., None], n_out, n_in)
    return sdf, n


def _yaw_rot(yaw):
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    zeros = jnp.zeros_like(c)
    ones = jnp.ones_like(c)
    return jnp.stack([
        jnp.stack([c, zeros, s], -1),
        jnp.stack([zeros, ones, zeros], -1),
        jnp.stack([-s, zeros, c], -1),
    ], -2)  # world-from-box for yaw about +y


def collide_static(xp: jnp.ndarray, x0: jnp.ndarray, colliders: Colliders,
                   params: SimParams, sdt: jnp.ndarray) -> jnp.ndarray:
    """Project particles out of planes and boxes, with Coulomb friction
    against the (possibly moving) surfaces."""
    cd = params.collision_distance
    mu_s, mu_d = params.static_friction, params.dynamic_friction

    def friction(xp, normal, pen, surf_vel):
        """PBD friction: clamp tangential motion relative to the surface."""
        dmove = (xp - x0) - surf_vel * sdt
        dt_tan = dmove - jnp.sum(dmove * normal, -1, keepdims=True) * normal
        tan_len = jnp.linalg.norm(dt_tan, axis=-1, keepdims=True)
        static_ok = tan_len < mu_s * pen[..., None]
        scale = jnp.where(
            static_ok, 1.0,
            jnp.minimum(1.0, mu_d * pen[..., None]
                        / jnp.maximum(tan_len, 1e-9)))
        return -dt_tan * scale

    # planes: keep n.x + d >= cd
    for p in range(colliders.planes.shape[0]):
        nrm = colliders.planes[p, :3]
        off = colliders.planes[p, 3]
        dist = xp @ nrm + off - cd
        pen = jnp.maximum(-dist, 0.0)
        contact = pen > 0
        xp = xp + pen[:, None] * nrm[None, :]
        fr = friction(xp, nrm[None, :], pen, jnp.zeros(3))
        xp = xp + jnp.where(contact[:, None], fr, 0.0)

    # boxes (static unroll — box count is small and fixed)
    has_quat = colliders.box_quat.shape[0] == colliders.box_center.shape[0]
    for b in range(colliders.box_center.shape[0]):
        R = _yaw_rot(colliders.box_yaw[b])                     # (3,3)
        if has_quat:
            # full orientation composed on yaw (types.py box_quat)
            R = R @ _quat_to_mat(colliders.box_quat[b][None])[0]
        ctr = colliders.box_center[b]
        p_local = (xp - ctr) @ R                               # world->box
        sdf, n_local = _box_sdf_normal(p_local, colliders.box_half[b])
        pen = jnp.maximum(cd - sdf, 0.0)
        act = colliders.box_active[b]
        pen = jnp.where(act, pen, 0.0)
        n_world = n_local @ R.T
        xp = xp + pen[:, None] * n_world
        fr = friction(xp, n_world, pen, colliders.box_vel[b])
        xp = xp + jnp.where((pen > 0)[:, None], fr, 0.0)

    # capsules: keep particle centers cap_radius + cd from the segment
    for c in range(colliders.cap_p0.shape[0]):
        p0 = colliders.cap_p0[c]
        seg = colliders.cap_p1[c] - p0
        seg_len2 = jnp.maximum(jnp.dot(seg, seg), 1e-9)
        t = jnp.clip((xp - p0[None, :]) @ seg / seg_len2, 0.0, 1.0)
        closest = p0[None, :] + t[:, None] * seg[None, :]
        diff = xp - closest
        dist = jnp.linalg.norm(diff, axis=-1)
        pen = jnp.maximum(colliders.cap_radius[c] + cd - dist, 0.0)
        pen = jnp.where(colliders.cap_active[c], pen, 0.0)
        nrm = diff / jnp.maximum(dist, 1e-9)[:, None]
        xp = xp + pen[:, None] * nrm
        fr = friction(xp, nrm, pen, colliders.cap_vel[c])
        xp = xp + jnp.where((pen > 0)[:, None], fr, 0.0)

    # triangle meshes, baked to SDF grids (sim/sdf.py; AddTriangleMesh
    # parity, helpers.h:713-760). Static unroll: M is 0 in the granular
    # scenes, so this contributes nothing to the hot path.
    for m in range(colliders.mesh_sdf.shape[0]):
        R = _quat_to_mat(colliders.mesh_quat[m][None])[0]      # (3,3)
        p_local = (xp - colliders.mesh_pos[m]) @ R             # world->local
        sdf, n_local = _sample_sdf_grad(
            colliders.mesh_sdf[m], p_local, colliders.mesh_lower[m],
            colliders.mesh_inv_spacing[m])
        pen = jnp.maximum(cd - sdf, 0.0)
        pen = jnp.where(colliders.mesh_active[m], pen, 0.0)
        n_world = n_local @ R.T
        xp = xp + pen[:, None] * n_world
        fr = friction(xp, n_world, pen, colliders.mesh_vel[m])
        xp = xp + jnp.where((pen > 0)[:, None], fr, 0.0)
    return xp


def _sample_sdf_grad(grid: jnp.ndarray, p: jnp.ndarray, lower: jnp.ndarray,
                     inv_sp: jnp.ndarray):
    """Trilinear SDF sample + unit normal for local-frame points p (N, 3).

    The normal is the analytic gradient of the trilinear interpolant —
    computed from the SAME 8 corner values as the sample, so a mesh costs
    exactly 8 gathered rows per particle. Points outside the grid get the
    clamped border value plus the L2 distance to the grid (far-field
    conservative bound), with the normal pointing back toward the grid.
    """
    R = grid.shape[0]
    g_raw = (p - lower) * inv_sp - 0.5        # voxel-center coordinates
    g = jnp.clip(g_raw, 0.0, R - 1.001)
    i0 = jnp.floor(g).astype(jnp.int32)
    f = g - i0
    flat = grid.reshape(-1)

    def corner(dx, dy, dz):
        idx = ((i0[:, 0] + dx) * R + (i0[:, 1] + dy)) * R + (i0[:, 2] + dz)
        return jnp.take(flat, idx)

    c000, c001 = corner(0, 0, 0), corner(0, 0, 1)
    c010, c011 = corner(0, 1, 0), corner(0, 1, 1)
    c100, c101 = corner(1, 0, 0), corner(1, 0, 1)
    c110, c111 = corner(1, 1, 0), corner(1, 1, 1)
    fx, fy, fz = f[:, 0], f[:, 1], f[:, 2]
    # interpolate z, then y, then x; keep intermediates for the gradient
    c00 = c000 * (1 - fz) + c001 * fz
    c01 = c010 * (1 - fz) + c011 * fz
    c10 = c100 * (1 - fz) + c101 * fz
    c11 = c110 * (1 - fz) + c111 * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    val = c0 * (1 - fx) + c1 * fx
    dx = c1 - c0
    dy = (c01 - c00) * (1 - fx) + (c11 - c10) * fx
    dz = ((c001 - c000) * (1 - fy) + (c011 - c010) * fy) * (1 - fx) + \
         ((c101 - c100) * (1 - fy) + (c111 - c110) * fy) * fx
    grad = jnp.stack([dx, dy, dz], axis=-1) * inv_sp

    # out-of-grid far field
    out_vec = (g_raw - g) / inv_sp
    out_dist = jnp.linalg.norm(out_vec, axis=-1)
    val = val + out_dist
    grad = jnp.where((out_dist > 0)[:, None],
                     out_vec / jnp.maximum(out_dist, 1e-9)[:, None], grad)
    n = grad / jnp.maximum(
        jnp.linalg.norm(grad, axis=-1, keepdims=True), 1e-9)
    return val, n


# ---------------------------------------------------------------------------
# sorted-window contacts (the production path)
# ---------------------------------------------------------------------------
#
# TPU gathers run at ~10-50M rows/s, so any per-iteration neighbor gather
# caps the solver far below MXU/VPU speed (PERFORMANCE.md). Instead the
# solver keeps the particle state x-SORTED between cache rebuilds: every
# true neighbor of particle i then lives within +-TILE positions of i in
# the sorted array (as long as fewer than TILE particles occupy any
# x-slab of one interaction radius — checked by ``window_ok`` below), so
# the candidate set for a tile of TILE consecutive particles is just the
# previous/own/next tile: THREE TILE SHIFTS of the state array. Zero
# gathers, zero scatters per iteration; validity is recomputed from
# current distances every sweep, so the "cache" is only the sort order.
# Candidates beyond the window are dropped like FleX's own
# maxNeighborsPerParticle=96 cap drops far candidates (pyflex.cpp:738).

TILE = 128        # sorted-slot tile; window = W_TILES tiles around own tile
W_TIERS = (3, 5, 9)  # coverage +-128 / +-256 / +-512 sorted slots
_PAD_POS = 1.0e6  # halo padding position: far but finite (no inf-NaN paths)


def _fulltier_translation_enabled() -> bool:
    """Opt-in for the full-tier translation-aware staleness rule
    (DYNRES_FULLTIER_TRANSLATION=1). Read at trace time, not import
    time, so importing this module never touches a backend and tests
    can monkeypatch the environment."""
    import os
    return os.environ.get("DYNRES_FULLTIER_TRANSLATION", "") == "1"


def _window(arr: jnp.ndarray, fill, w_tiles: int = 3) -> jnp.ndarray:
    """(N, ...) -> (N//TILE, w_tiles*TILE, ...): the w_tiles tiles centered
    on each tile, edge tiles padded with ``fill``."""
    nt = arr.shape[0] // TILE
    a = arr.reshape((nt, TILE) + arr.shape[1:])
    h = (w_tiles - 1) // 2
    parts = []
    for s in range(-h, h + 1):
        if s < 0:
            p = jnp.concatenate([jnp.full_like(a[:(-s)], fill), a[:s]], 0)
        elif s > 0:
            p = jnp.concatenate([a[s:], jnp.full_like(a[:s], fill)], 0)
        else:
            p = a
        parts.append(p)
    return jnp.concatenate(parts, axis=1)


def _mid_slice(win: jnp.ndarray, w_tiles: int) -> jnp.ndarray:
    """Center w_tiles*TILE columns of a cached W_TIERS[-1]-wide window."""
    wmax = W_TIERS[-1]
    lo = (wmax - w_tiles) // 2 * TILE
    return win[:, lo:lo + w_tiles * TILE]


def _pair_static_mask(cache: dict, w_tiles: int) -> jnp.ndarray:
    """(nt, T, w_tiles*T) slice of the cached frame-invariant pair validity
    (halo padding, both-active, same-rigid-group exclusion, self)."""
    wmax = W_TIERS[-1]
    lo = (wmax - w_tiles) // 2 * TILE
    return cache["pair_ok"][:, :, lo:lo + w_tiles * TILE]


def principal_axis(x: jnp.ndarray, active: jnp.ndarray) -> jnp.ndarray:
    """Dominant eigenvector of the active-position covariance (power
    iteration, seed jittered from the positions so adversarial alignment
    cannot persist across rebuilds). Sorting along this axis minimizes the
    worst-case slot-window occupancy: tall drop columns sort by height,
    settled piles by their widest ground direction."""
    hi = jax.lax.Precision.HIGHEST
    xa = jnp.where(active[:, None], x, 0.0)
    n = jnp.maximum(jnp.sum(active.astype(jnp.float32)), 1.0)
    mu = jnp.sum(xa, axis=0) / n
    xc = jnp.where(active[:, None], x - mu, 0.0)
    cov = jnp.matmul(xc.T, xc, precision=hi) / n
    wob = jnp.sum(x[0]) * 7919.0
    j = wob - jnp.floor(wob)
    v = jnp.array([1.0, 0.6, 0.8]) + j * jnp.array([0.13, 0.41, -0.23])
    v = v / jnp.linalg.norm(v)
    for _ in range(8):
        v = cov @ v + 1e-7 * v
        v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
    return v


def _permute_state(state: SimState, perm: jnp.ndarray) -> SimState:
    n = state.x.shape[0]
    order = (state.order if state.order is not None
             else jnp.arange(n, dtype=jnp.int32))
    return state.replace(
        x=state.x[perm], v=state.v[perm], invm=state.invm[perm],
        group=state.group[perm], active=state.active[perm],
        rest=state.rest[perm], order=order[perm],
        slept=None if state.slept is None else state.slept[perm])


def sort_state(state: SimState, axis: jnp.ndarray | None = None,
               key: jnp.ndarray | None = None) -> SimState:
    """Sort per-particle arrays along ``axis`` (default: principal axis;
    inactive parked past the end) or by an explicit ``key``, tracking
    original ids in ``state.order``."""
    if key is None:
        if axis is None:
            axis = principal_axis(state.x, state.active)
        key = jnp.where(state.active, state.x @ axis, jnp.float32(3e38))
    return _permute_state(state, jnp.argsort(key))


def unsort_state(state: SimState) -> SimState:
    """Restore original particle order (inverse of sort_state)."""
    if state.order is None:
        return state
    o = state.order

    def unperm(a):
        return jnp.zeros_like(a).at[o].set(a)

    n = state.x.shape[0]
    return state.replace(
        x=unperm(state.x), v=unperm(state.v), invm=unperm(state.invm),
        group=unperm(state.group), active=unperm(state.active),
        rest=unperm(state.rest), order=jnp.arange(n, dtype=jnp.int32),
        slept=None if state.slept is None else unperm(state.slept))


def _rows(arr: jnp.ndarray, color) -> jnp.ndarray:
    """Tile rows of one color: (nt, ...) -> (nt//2, ...); None = all."""
    if color is None:
        return arr
    nt = arr.shape[0]
    return arr.reshape((nt // 2, 2) + arr.shape[1:])[:, color]


def solve_contacts_window(xp: jnp.ndarray, x0: jnp.ndarray,
                          x0w: jnp.ndarray, wi: jnp.ndarray,
                          active: jnp.ndarray, group: jnp.ndarray,
                          cache: dict, params: SimParams,
                          w_tiles: int = 3, color=None) -> jnp.ndarray:
    """One sweep of pairwise distance constraints + Coulomb friction +
    shock propagation over the sorted window (all-pairs within the w_tiles
    tiles around each tile). Same constraint math as FleX's granular
    contact solve (NvFlexParams semantics, NvFlex.h:95-154), reformulated
    so the candidate tensor is built by tile shifts instead of gathers.

    color None updates every tile (Jacobi); color 0/1 updates only
    even/odd tiles against the full current window (red-black
    Gauss-Seidel: half the pair work per sweep, fresher neighbor
    positions). active/group are unused (folded into the cached static
    pair mask) and kept for signature stability.
    """
    nt = xp.shape[0] // TILE
    rest_d = params.radius
    xw = _rows(_window(xp, _PAD_POS, w_tiles), color)  # (rows, W*T, 3)
    a = _rows(xp.reshape(nt, TILE, 3), color)          # (rows, T, 3)
    diff = a[:, :, None, :] - xw[:, None, :, :]        # (rows, T, W*T, 3)
    d2 = jnp.sum(diff * diff, axis=-1)
    inv_dist = jax.lax.rsqrt(jnp.maximum(d2, 1e-18))
    pen = rest_d - d2 * inv_dist

    # static pair validity (halo padding, active, same-group, self) is
    # precomputed once per cache build at full width and sliced here
    contact = (pen > 0) & _rows(_pair_static_mask(cache, w_tiles), color)
    nrm = diff * inv_dist[..., None]

    # shock propagation: the lower particle of a contact becomes heavier so
    # corrections propagate up the stack (NvFlexParams::shockPropagation).
    # ratio = wi_eff/(wi_eff+wj_eff) collapses to a single exp:
    # wi / (wi + wj * e^{k h}) for any sign of h.
    h = (xw[..., 1][:, None, :] - a[..., 1][:, :, None]) / rest_d
    wjk = _rows(_mid_slice(cache["wj"], w_tiles), color)[:, None, :] \
        * jnp.exp(jnp.minimum(params.shock_propagation * h, 60.0))
    wit = _rows(wi.reshape(nt, TILE), color)[:, :, None]
    ratio = wit / jnp.maximum(wit + wjk, 1e-9)

    push = (ratio * pen)[..., None] * nrm

    # friction: relative tangential displacement this substep
    dmove = (_rows((xp - x0).reshape(nt, TILE, 3), color)[:, :, None, :]
             - (xw - _rows(x0w, color))[:, None, :, :])
    dt_tan = dmove - jnp.sum(dmove * nrm, -1, keepdims=True) * nrm
    t2 = jnp.sum(dt_tan * dt_tan, axis=-1, keepdims=True)
    inv_tan = jax.lax.rsqrt(jnp.maximum(t2, 1e-18))
    tan_len = t2 * inv_tan
    static_ok = tan_len < params.static_friction * pen[..., None]
    scale = jnp.where(
        static_ok, 1.0,
        jnp.minimum(1.0, params.dynamic_friction * pen[..., None] * inv_tan))
    fric = -dt_tan * scale * ratio[..., None]

    delta = jnp.where(contact[..., None], push + fric, 0.0)
    cnt = jnp.sum(contact, axis=2)                     # (rows, T)
    dx = jnp.sum(delta, axis=2) / jnp.maximum(cnt, 1)[..., None]
    new = a + params.relaxation_factor * dx
    if color is None:
        return new.reshape(-1, 3)
    xr = xp.reshape(nt // 2, 2, TILE, 3)
    parts = [new if c == color else xr[:, c] for c in (0, 1)]
    return jnp.stack(parts, axis=1).reshape(-1, 3)


# ---------------------------------------------------------------------------
# contacts (legacy gather-based path, kept for brute-force parity tests)
# ---------------------------------------------------------------------------

def solve_contacts(xp: jnp.ndarray, x0: jnp.ndarray, x0j: jnp.ndarray,
                   wi: jnp.ndarray, wj: jnp.ndarray,
                   params: SimParams, nbr_idx: jnp.ndarray,
                   nbr_ok: jnp.ndarray, inner: int = 2) -> jnp.ndarray:
    """One Jacobi sweep of pairwise distance constraints + friction +
    shock-propagation mass scaling.

    x0j / wj are the substep-invariant neighbor gathers (start positions and
    inverse masses), hoisted out of the iteration loop — the only
    per-iteration gather is xp[nbr_idx]. ``inner`` projections are applied
    per gather (neighbor positions frozen within them, self positions
    updated — chaotic-relaxation style) to amortize TPU gather cost.
    """
    rest_d = params.radius  # solidRestDistance == radius for granular scenes
    xj = xp[nbr_idx]                                          # (N,K,3)

    for _ in range(inner):
        diff = xp[:, None, :] - xj
        dist = jnp.linalg.norm(diff, axis=-1)
        pen = rest_d - dist
        contact = nbr_ok & (pen > 0)
        nrm = diff / jnp.maximum(dist, 1e-9)[..., None]

        # shock propagation: the lower particle of a contact becomes heavier
        # so corrections propagate up the stack
        # (NvFlexParams::shockPropagation).
        h = (xj[..., 1] - xp[:, None, 1]) / jnp.maximum(rest_d, 1e-9)
        wi_eff = wi[:, None] * jnp.exp(
            -params.shock_propagation * jnp.maximum(h, 0.0))
        wj_eff = wj * jnp.exp(
            -params.shock_propagation * jnp.maximum(-h, 0.0))
        wsum = jnp.maximum(wi_eff + wj_eff, 1e-9)

        push = (wi_eff / wsum * pen)[..., None] * nrm

        # friction: relative tangential displacement this substep
        dmove = (xp - x0)[:, None, :] - (xj - x0j)
        dt_tan = dmove - jnp.sum(dmove * nrm, -1, keepdims=True) * nrm
        tan_len = jnp.linalg.norm(dt_tan, axis=-1, keepdims=True)
        static_ok = tan_len < params.static_friction * pen[..., None]
        scale = jnp.where(
            static_ok, 1.0,
            jnp.minimum(1.0, params.dynamic_friction * pen[..., None]
                        / jnp.maximum(tan_len, 1e-9)))
        fric = -dt_tan * scale * (wi_eff / wsum)[..., None]

        delta = jnp.where(contact[..., None], push + fric, 0.0)
        cnt = jnp.sum(contact, axis=1)
        dx = jnp.sum(delta, axis=1) / jnp.maximum(cnt, 1)[:, None]
        xp = xp + params.relaxation_factor * dx
    return xp


# ---------------------------------------------------------------------------
# the step
# ---------------------------------------------------------------------------

# active-set prefix sizes (sorted-slot rows); tiers smaller than the state
# capacity are compiled as extra switch branches (see _branch_plan). 12288
# catches the push-swath spikes that used to fall through to the full
# 19.4k body when the disturbed region grew past 8192 candidates
# (PERFORMANCE.md "Where remaining time goes").
#
# COST OF ADDING A TIER: each entry compiles one more lax.switch frame
# body — ~30-60 s of cold compile on this 1-core host, paid by every
# cache-less (plain-CPU) run. Weigh that against the tier's hit rate
# before growing this tuple (PERFORMANCE.md records per-tier hit
# histograms from the push profile).
A_TIERS = (2048, 4096, 8192, 12288)


def _branch_plan(n_capacity: int):
    """Prefix tiers applicable to a given padded capacity. The full-width
    W_TIERS branches always follow these in the switch list."""
    return [a for a in A_TIERS if a < n_capacity]


# wake grid: static 2D (x, z) occupancy over the workspace. Piles are
# shallow, so ignoring y only ever over-wakes a vertical column. Cells of
# 0.25 with box dilation radii below cover search radii up to ~0.25-radius
# scenes with margin.
WAKE_GRID = 128
WAKE_EXT = 16.0
WAKE_CELLS_SOLVE = 3     # dilation (cells) around movers -> solve set
WAKE_CELLS_RING = 2      # extra ring -> frozen support candidates


def _wake_cells(x: jnp.ndarray) -> jnp.ndarray:
    scale = WAKE_GRID / (2.0 * WAKE_EXT)
    ix = jnp.clip(((x[:, 0] + WAKE_EXT) * scale).astype(jnp.int32),
                  0, WAKE_GRID - 1)
    iz = jnp.clip(((x[:, 2] + WAKE_EXT) * scale).astype(jnp.int32),
                  0, WAKE_GRID - 1)
    return ix * WAKE_GRID + iz


def _grid_wake(m: jnp.ndarray, cells: jnp.ndarray,
               r_cells: int) -> jnp.ndarray:
    """(N,) bool -> (N,) bool: particles within ``r_cells`` wake-grid cells
    (box metric, >= euclidean) of any source particle in the (x, z) plane.
    One N-row scatter-max + shifted-OR dilation + one N-row gather; out-of
    -extent positions clip to border cells (conflation only over-wakes)."""
    G = WAKE_GRID
    occ = jnp.zeros((G * G + 1,), jnp.int32)
    occ = occ.at[jnp.where(m, cells, G * G)].max(1)
    grid = occ[:G * G].reshape(G, G) > 0
    for axis in (0, 1):
        acc = grid
        for s in range(1, r_cells + 1):
            z = jnp.zeros_like(jnp.take(grid, jnp.arange(s), axis=axis))
            lo = jnp.concatenate(
                [jax.lax.slice_in_dim(grid, s, G, axis=axis), z], axis=axis)
            hi = jnp.concatenate(
                [z, jax.lax.slice_in_dim(grid, 0, G - s, axis=axis)],
                axis=axis)
            acc = acc | lo | hi
        grid = acc
    return jnp.take(grid.reshape(-1), cells)


def _group_close(m: jnp.ndarray, onehot: jnp.ndarray) -> jnp.ndarray:
    """Close a particle mask under rigid-group membership (a group wakes
    as a whole — it moves rigidly)."""
    gm = (onehot @ m.astype(jnp.float32)) > 0.5               # (G,)
    return m | ((gm.astype(jnp.float32) @ onehot) > 0.5)


def _kinematic_wake(state: SimState, params: SimParams,
                    colliders: Colliders) -> jnp.ndarray:
    """Particles near a MOVING kinematic collider (the pusher board,
    driven capsules) must wake before contact: FleX's solver likewise
    re-activates sleeping particles on shape contact."""
    wake_d = 8.0 * params.radius
    mov = jnp.zeros(state.x.shape[0], bool)
    for b in range(colliders.box_center.shape[0]):
        moving = colliders.box_active[b] & (
            jnp.sum(colliders.box_vel[b] ** 2) > 0)
        R = _yaw_rot(colliders.box_yaw[b])
        p_local = (state.x - colliders.box_center[b]) @ R
        sdf, _ = _box_sdf_normal(p_local, colliders.box_half[b])
        mov = mov | (moving & (sdf < wake_d))
    for c in range(colliders.cap_p0.shape[0]):
        moving = colliders.cap_active[c] & (
            jnp.sum(colliders.cap_vel[c] ** 2) > 0)
        p0 = colliders.cap_p0[c]
        seg = colliders.cap_p1[c] - p0
        t = jnp.clip((state.x - p0) @ seg
                     / jnp.maximum(jnp.dot(seg, seg), 1e-9), 0.0, 1.0)
        d = jnp.linalg.norm(state.x - (p0 + t[:, None] * seg), axis=-1)
        mov = mov | (moving & (d < colliders.cap_radius[c] + wake_d))
    for m in range(colliders.mesh_sdf.shape[0]):
        moving = colliders.mesh_active[m] & (
            jnp.sum(colliders.mesh_vel[m] ** 2) > 0)
        R = _quat_to_mat(colliders.mesh_quat[m][None])[0]
        p_local = (state.x - colliders.mesh_pos[m]) @ R
        sdf, _ = _sample_sdf_grad(
            colliders.mesh_sdf[m], p_local, colliders.mesh_lower[m],
            colliders.mesh_inv_spacing[m])
        mov = mov | (moving & (sdf < wake_d))
    return mov & state.active


def wake_masks(state: SimState, params: SimParams,
               colliders: Colliders | None):
    """(solve_set, candidate_set) for the active-set solver, in the
    CURRENT particle order (any order — the dilation is value-based).

    moving   = active and (|v| > 0, never slept, or near a moving
               kinematic collider)
    solve    = group-closure(euclidean grid dilation of moving):
               integrated, contact-solved, shape-matched.
    candidate = group-closure(one more dilation ring): additionally present
               in the solve's candidate windows as FROZEN one-sided
               colliders (invm treated as 0), so frontier particles rest
               on real support. Everything else is untouched — the FleX
               sleeping model (NvFlexParams::sleepThreshold) realized with
               static shapes.
    """
    slept = (state.slept if state.slept is not None
             else jnp.zeros(state.x.shape[0], bool))
    mov = state.active & ((jnp.sum(state.v ** 2, axis=-1) > 0) | ~slept)
    if colliders is not None:
        mov = mov | _kinematic_wake(state, params, colliders)
    onehot = group_onehot(state)
    cells = _wake_cells(state.x)
    s = _group_close(_grid_wake(mov, cells, WAKE_CELLS_SOLVE),
                     onehot) & state.active
    c = _group_close(_grid_wake(s, cells, WAKE_CELLS_RING),
                     onehot) & state.active
    return s, c


def build_cache(state: SimState, params: SimParams,
                grid_lower=None, grid_dims=None, k: int = None,
                with_pair_mask: bool = True,
                colliders: Colliders | None = None,
                active_set: bool = True):
    """Sort the state by (candidate-set, principal axis) and precompute the
    frame-invariant solve inputs. Returns ``(sorted_state, cache)``.

    Active-set solving: candidate particles are sorted into a PREFIX of
    the state array, so the contact windows, integration, and
    shape-matching of a mostly-sleeping scene run on a small static slice
    (A_TIERS rows) selected per rebuild — the TPU-shaped equivalent of
    FleX's per-particle sleeping. ``colliders`` (when given) wakes
    particles near moving kinematic shapes. ``active_set=False`` keeps
    every active particle in the solve set (still prefix-sliced past the
    padding).

    grid_lower / grid_dims / k are accepted for call-site compatibility
    with the legacy hash-grid cache and ignored — the sorted-window
    formulation needs no grid. FleX likewise amortizes its grid build
    across the solver update (pyflex.cpp:2045)."""
    n = state.x.shape[0]
    if state.slept is None:
        state = state.replace(slept=jnp.zeros(n, bool))
    if active_set:
        s_mask, c_mask = wake_masks(state, params, colliders)
    else:
        s_mask = c_mask = state.active
    # sort along the principal axis of the CANDIDATE set: the frozen
    # suffix's order is irrelevant, and a localized push swath gets an
    # axis aligned with the swath (tight windows) instead of the pile
    axis = principal_axis(state.x, c_mask)
    proj = state.x @ axis
    key = jnp.where(state.active,
                    proj + jnp.where(c_mask, 0.0, 1e6),
                    jnp.float32(3e38))
    perm = jnp.argsort(key)
    state = _permute_state(state, perm)
    key = key[perm]
    s_sorted = s_mask[perm]
    c_sorted = c_mask[perm]
    wi_solve = jnp.where(s_sorted, state.invm, 0.0)

    onehot = group_onehot(state)
    inv_counts = 1.0 / jnp.maximum(jnp.sum(onehot, axis=1), 1.0)
    group_awake = (onehot @ s_sorted.astype(jnp.float32)) > 0.5

    # tier selection: the narrowest window whose slot coverage holds every
    # candidate within one search radius along the sort axis
    # (|axis . dp| <= |dp| < wsearch for any true neighbor pair). Only
    # candidate rows need coverage; non-candidate rows sort after them
    # with a +1e6 key offset, so C->nonC gaps auto-pass.
    wsearch = params.radius + 2.0 * params.particle_collision_margin

    def cov_ok(slots: int) -> jnp.ndarray:
        if slots >= key.shape[0]:
            return jnp.bool_(True)  # window spans the whole array
        ahead = jnp.concatenate(
            [key[slots:], jnp.full((slots,), jnp.float32(3.4e38))])
        return jnp.all((ahead - key > wsearch) | ~c_sorted)

    cov = {w: cov_ok((w - 1) // 2 * TILE) for w in W_TIERS}
    a_tiers = _branch_plan(n)
    full_sel = len(a_tiers) + jnp.where(
        cov[W_TIERS[0]], 0, jnp.where(cov[W_TIERS[1]], 1, 2))
    sel = full_sel.astype(jnp.int32)
    n_c = jnp.sum(c_sorted)
    for i, a in reversed(list(enumerate(a_tiers))):
        sel = jnp.where((n_c <= a) & cov[5], jnp.int32(i), sel)
    wmax = W_TIERS[-1]

    # frame-invariant pair validity at full width, sliced per tier (used
    # by the XLA sweep only — the Pallas kernel rebuilds it in VMEM)
    nt = state.x.shape[0] // TILE
    if with_pair_mask:
        okw = _window(state.active, False, wmax)       # (nt, Wmax*T)
        gw = _window(state.group, -2, wmax)
        gi = state.group.reshape(nt, TILE)
        same = (gi[:, :, None] == gw[:, None, :]) & (gi[:, :, None] >= 0)
        widx = jnp.arange(wmax * TILE)
        self_m = (widx[None, None, :]
                  == ((wmax - 1) // 2 * TILE
                      + jnp.arange(TILE))[None, :, None])
        pair_ok = (okw[:, None, :]
                   & state.active.reshape(nt, TILE)[:, :, None]
                   & ~same & ~self_m)
    else:
        pair_ok = jnp.zeros((1,), bool)

    cache = {
        "x_build": state.x,
        # full-tier flag for cache_stale. OPT-IN (round-5d): the
        # same-session bench A/B at round-5 end measured the full-tier
        # translation rule costing 36% on the 19.3k push and 27% on the
        # settle tail while gaining ~1% on its target 4k all-awake row —
        # the r4 failure mode (deferred rebuilds defer re-tiering,
        # logs/bisect_push_r4.json) recurs even restricted to full-tier
        # builds, because a push's full-tier spike then LINGERS at the
        # full prefix. Default is the absolute rule everywhere;
        # DYNRES_FULLTIER_TRANSLATION=1 re-enables the study path.
        "full_tier": (sel >= jnp.int32(len(a_tiers))
                      if _fulltier_translation_enabled()
                      else jnp.bool_(False)),
        "wj": _window(wi_solve, 0.0, wmax),
        "wi_solve": wi_solve,
        "s": s_sorted,
        "group_awake": group_awake,
        "pair_ok": pair_ok,
        "onehot": onehot,
        "inv_counts": inv_counts,
        "sel": sel,
        "window_ok": cov[W_TIERS[-1]],   # diagnostic: widest tier covered?
    }
    return state, cache


def cache_stale(state: SimState, params: SimParams, cache) -> jnp.ndarray:
    """True when any particle moved more than half the collision-margin
    slack since the cache was built (pairs approach from both sides, so
    each side gets half the slack). Absolute displacement, not relative
    to the active set's mean shift: the round-3 translation-aware
    variant (rebuild only on motion relative to the mean, so free-fall
    reuses one cache) measured 45% SLOWER on the production 19.3k push
    (10.85 -> 7.47 ms/frame, idle-chip bisect logs/bisect_push_r4.json)
    and 70% slower on the settle tail (2.91 -> 1.72) — deferring
    rebuilds also defers active-set re-tiering, so frames run on stale,
    too-large prefix tiers. See PERFORMANCE.md round-4 bisect notes.

    Round-5 refinement, now OPT-IN ONLY (DYNRES_FULLTIER_TRANSLATION=1):
    when the cache was built at the FULL prefix tier (cache["full_tier"])
    the translation-subtracted displacement is coverage-safe (no smaller
    tier a deferred rebuild could have selected, and window pair
    coverage is translation-invariant). But the round-5d same-session
    bench A/B showed the restriction does NOT stop the r4 perf failure
    mode: a push's occasional full-tier spike then LINGERS at the full
    prefix (deferred rebuilds defer re-tiering), costing 36% on the
    19.3k push and 27% on the settle tail for ~1% on the 4k all-awake
    target row. Default: absolute rule everywhere."""
    x_build = cache["x_build"]
    act = state.active[:, None]
    dx = jnp.where(act, state.x - x_build, 0.0)
    thresh = 0.5 * params.particle_collision_margin
    d_abs = jnp.max(jnp.abs(dx))
    n_act = jnp.maximum(jnp.sum(state.active), 1).astype(jnp.float32)
    shift = jnp.sum(dx, axis=0) / n_act
    d_rel = jnp.max(jnp.abs(jnp.where(act, dx - shift[None, :], 0.0)))
    full = cache.get("full_tier", jnp.bool_(False))
    return jnp.where(full, d_rel, d_abs) > thresh


def resolve_pallas(state: SimState) -> bool:
    """True when the state lives on a device where the Pallas contact
    kernel applies (anything but the interpret-only CPU backend).
    Callable only on concrete (non-traced) states."""
    import os
    if os.environ.get("DYNRES_DISABLE_PALLAS"):
        return False
    try:
        dev = next(iter(state.x.devices()))
        return dev.platform not in ("cpu",)
    except Exception:
        return False


@functools.partial(jax.jit, static_argnames=("use_pallas",))
def _step_sorted(state: SimState, params: SimParams, colliders: Colliders,
                 cache: dict, use_pallas: bool = False) -> SimState:
    """One display frame on a sorted state (see step_frame). The branch
    chosen at cache-build time (active-set prefix size x window tier)
    selects one of the compiled frame bodies via lax.switch; contacts run
    in the Pallas VMEM-resident kernel on TPU (use_pallas) or the XLA
    window formulation on CPU. Particles past the active-set prefix are
    asleep and bit-identically untouched."""
    from . import contact_kernel as ck

    sdt = jnp.float32(params.dt / params.num_substeps)
    gravity = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    scal = ck.scalars_from_params(params) if use_pallas else None
    N = state.x.shape[0]
    slept_full = (state.slept if state.slept is not None
                  else jnp.zeros(N, bool))

    def frame_body(a_rows, w_tiles: int, state: SimState) -> SimState:
        A = N if a_rows is None else a_rows
        nt = A // TILE
        wi = cache["wi_solve"][:A]
        sA = cache["s"][:A]
        groupA = state.group[:A]
        activeA = state.active[:A]
        onehotA = cache["onehot"][:, :A]
        inv_countsA = 1.0 / jnp.maximum(jnp.sum(onehotA, axis=1), 1.0)
        stA = state.replace(
            x=state.x[:A], v=state.v[:A], invm=state.invm[:A],
            group=groupA, active=activeA, rest=state.rest[:A],
            order=None, slept=None)
        cacheA = dict(cache)
        if cache["pair_ok"].ndim == 3:
            cacheA["pair_ok"] = cache["pair_ok"][:nt]
        cacheA["wj"] = cache["wj"][:nt]
        free = wi > 0

        def substep(carry, _):
            xA, vA, slA, quat = carry
            v = vA + sdt * gravity * params.gravity_y
            v = v * jnp.maximum(0.0, 1.0 - params.damping * sdt)
            speed = jnp.linalg.norm(v, axis=-1, keepdims=True)
            # cap displacement per substep at the interaction radius so
            # motion can never outrun the sort's collision margin
            vcap = jnp.minimum(params.max_speed, params.radius / sdt)
            v = v * jnp.minimum(1.0, vcap / jnp.maximum(speed, 1e-9))
            v = jnp.where(free[:, None], v, 0.0)
            x0 = xA
            xp = x0 + sdt * v
            if use_pallas:
                packed0 = ck.make_packed(x0, wi, groupA, activeA)

                def half_sweep(xp, color):
                    p = ck.set_xp(packed0, xp)
                    newp = ck.sweep(p, scal, w_tiles, color=color)
                    xr = xp.reshape(nt // 2, 2, TILE, 3)
                    new = newp.T.reshape(nt // 2, TILE, 3)
                    parts = [new if c == color else xr[:, c]
                             for c in (0, 1)]
                    return jnp.stack(parts, axis=1).reshape(-1, 3)
            else:
                # substep-invariant friction anchor
                x0w = _window(x0, _PAD_POS, w_tiles)

                def half_sweep(xp, color):
                    return solve_contacts_window(
                        xp, x0, x0w, wi, activeA, groupA, cacheA,
                        params, w_tiles, color=color)

            def round_(xp, quat, colors):
                # red-black Gauss-Seidel: the second color projects against
                # the freshly-updated first — half the pair work of a full
                # Jacobi sweep at better per-round convergence
                for color in colors:
                    xp = half_sweep(xp, color)
                xp = collide_static(xp, x0, colliders, params, sdt)
                xp, quat = shape_match(xp, stA, params, quat, onehotA,
                                       inv_countsA, solve_mask=sA,
                                       group_keep=cache["group_awake"])
                return xp, quat

            def iteration(carry, _):
                xp, quat = carry
                # color order alternates between rounds so the sweep-order
                # bias along the sort axis cancels (symmetric GS)
                xp, quat = round_(xp, quat, (0, 1))
                xp, quat = round_(xp, quat, (1, 0))
                return (xp, quat), None

            n_pairs = max(1, params.num_iterations // 4)
            (xp, quat), _ = jax.lax.scan(
                iteration, (xp, quat), None, length=n_pairs)

            v_new = (xp - x0) / sdt
            # sleeping: kill sub-threshold velocities to stop creep; a
            # particle that was solved yet stayed put is at a supported
            # equilibrium -> freezable by the next cache build
            vmag = jnp.linalg.norm(v_new, axis=-1, keepdims=True)
            slA = jnp.where(free, vmag[:, 0] < params.sleep_threshold, slA)
            v_new = jnp.where(vmag < params.sleep_threshold, 0.0, v_new)
            v_new = jnp.where(free[:, None], v_new, 0.0)
            xp = jnp.where(free[:, None], xp, x0)
            return (xp, v_new, slA, quat), None

        (xA, vA, slA, quat), _ = jax.lax.scan(
            substep,
            (state.x[:A], state.v[:A], slept_full[:A], state.group_quat),
            None, length=params.num_substeps, unroll=params.num_substeps)

        if A == N:
            x, v, sl = xA, vA, slA
        else:
            x = jnp.concatenate([xA, state.x[A:]], axis=0)
            v = jnp.concatenate([vA, state.v[A:]], axis=0)
            sl = jnp.concatenate([slA, slept_full[A:]], axis=0)
        return state.replace(x=x, v=v, slept=sl, group_quat=quat)

    a_tiers = _branch_plan(N)
    bodies = ([functools.partial(frame_body, a, 5) for a in a_tiers]
              + [functools.partial(frame_body, None, w) for w in W_TIERS])
    return jax.lax.switch(cache["sel"], bodies, state)


def step_frame(state: SimState, params: SimParams, colliders: Colliders,
               grid_lower=None, grid_dims=None, k: int = 24,
               cache=None, use_pallas=None) -> SimState:
    """Advance one display frame (dt = 1/60): num_substeps x
    (integrate -> num_iterations projection sweeps -> velocities).

    Mirrors UpdateFrame -> NvFlexUpdateSolver(g_dt, g_numSubsteps)
    (pyflex.cpp:1857-2115, 2045). Kinematic colliders (pusher) must already
    carry their per-frame pose + velocity in ``colliders``.

    With ``cache=None`` the state may be in any order: it is sorted,
    stepped, and restored (one-shot callers, tests). With a cache from
    build_cache the state MUST already be in that cache's sorted order and
    is returned sorted (the env's scan carries sorted state across frames
    and unsorts once per push).
    """
    if use_pallas is None:
        use_pallas = resolve_pallas(state)
    if cache is None:
        state, cache = build_cache(state, params, colliders=colliders)
        state = _step_sorted(state, params, colliders, cache,
                             use_pallas=use_pallas)
        return unsort_state(state)
    return _step_sorted(state, params, colliders, cache,
                        use_pallas=use_pallas)


def default_grid(global_scale: float = 24.0, cell_size: float = 0.075 * 1.25):
    """Grid covering the workspace (ground to ~half the workspace height)."""
    gs = global_scale
    lower = jnp.array([-gs / 2 - 2.0, -1.0, -gs / 2 - 2.0], jnp.float32)
    extent = jnp.array([gs + 4.0, 14.0, gs + 4.0])
    dims = tuple(int(d) for d in jnp.ceil(extent / cell_size))
    return lower, dims
