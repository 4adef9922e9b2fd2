"""Scene library: param-driven initial SimStates for the granular family.

Registry keyed by the same indices the reference uses
(PyFleX/bindings/pyflex.cpp:2458-2502 registration order):
18 = GranularManip ("ball"), 20 = Coffee, 21 = Capsule, 22 = Carrots,
23 = Coffee_Capsule — matching env/flex_env.py:419,433,447,797,817.
Parameter vectors use the same float layouts (e.g. the 20-float carrots
vector, yx_carrots.h:18-46).

All builders run on host NumPy once per reset and emit a capacity-padded
SimState + SimParams.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..core import geometry
from ..core.types import Colliders, SimParams, SimState, pad_capacity

RADIUS = 0.075  # granular interaction radius shared by all yx_* scenes


@dataclasses.dataclass
class SceneBuild:
    """Host-side scene construction result (pre-padding)."""
    positions: np.ndarray   # (n, 3)
    invm: np.ndarray        # (n,)
    group: np.ndarray       # (n,) int32, -1 = free
    num_groups: int
    params: SimParams
    color: np.ndarray       # (3,) base RGB of the material
    # draw rigid groups as skinned hulls (scene param draw_skin,
    # yx_carrots.h:69-81); consumed by the video/demo render path
    draw_skin: bool = False
    # ---- XPBD scene families (fluids / springs / cloth; sim/xpbd.py) ----
    velocities: np.ndarray | None = None   # (n, 3) initial velocities
    springs: np.ndarray | None = None      # (S, 4) rows [i, j, rest, stiff]
    triangles: np.ndarray | None = None    # (T, 3) cloth triangles
    fluid_mask: np.ndarray | None = None   # (n,) bool eNvFlexPhaseFluid
    # fluid_rest / solid_rest / kernel_h / cohesion / viscosity / wind /
    # drag for sim.xpbd.XConstraints.build; None = pure granular scene
    # (steps through the sim.pbd active-set solver instead)
    xparams: dict | None = None
    control_idx: list | None = None        # scene Update() control points
    scene_kind: str = "granular"           # update_params dispatch key
    # extra static half-spaces from numPlanes > 1 (pyflex.cpp:793-798)
    extra_planes: np.ndarray | None = None  # (P, 4)

    @property
    def uses_xpbd(self) -> bool:
        return self.xparams is not None


def _fill_shape(inside_fn, orig_lower, orig_upper, lower, scale, spacing,
                rng, jitter):
    """Generic voxel-center fill for an arbitrary solid given an inside
    predicate in the shape's original frame (CreateParticleShape grid
    semantics — see core.geometry.fill_convex_with_particles)."""
    edges0 = orig_upper - orig_lower
    max_edge0 = float(edges0.max())
    s = scale / max_edge0
    edges = edges0 * s
    spacing_eps = spacing * (1.0 - 1e-4)
    d = np.where(spacing > edges, 1,
                 np.maximum(1, (edges / spacing_eps).astype(np.int64)))
    max_dim = int(d.max()) + 4
    grid_lower = np.zeros(3) - 2.0 * spacing
    grid_lower -= 0.5 * (spacing - (edges - (d - 1) * spacing))
    idx = np.arange(max_dim)
    gx, gy, gz = np.meshgrid(idx, idx, idx, indexing="ij")
    centers = grid_lower[None, :] + spacing * (
        np.stack([gx, gy, gz], axis=-1).reshape(-1, 3) + 0.5)
    orig = centers / s + orig_lower[None, :]
    pts = centers[inside_fn(orig)]
    if pts.shape[0] == 0:
        pts = ((orig_lower + orig_upper) * 0.5 * s - orig_lower * s)[None, :]
    if jitter > 0:
        dirs = rng.normal(size=pts.shape)
        dirs /= np.maximum(np.linalg.norm(dirs, axis=1, keepdims=True), 1e-9)
        pts = pts + dirs * jitter
    return pts + np.asarray(lower)[None, :]


def _bean_chunk(rng: np.random.Generator) -> geometry.ConvexChunk:
    """Coffee-bean stand-in: an anisotropic convex (flattened ellipsoid-ish
    kDOP). The reference fills data/coffee_bean.ply; only the filled
    occupancy matters for physics."""
    base = rng.uniform(10.0, 14.0)
    offs = np.array([1.0, 0.55, 0.75] * 2 + [0.85] * 6) * base
    normals = geometry.KDOP_DIRECTIONS
    verts = geometry._convex_vertices(normals, offs)
    return geometry.ConvexChunk(normals=normals, offsets=offs, vertices=verts)


def _capsule_inside(scale: float):
    """Inside test for CreateCapsule(slices, segments, r=scale, half=2*scale):
    a capsule along x with radius 1 unit and half-length 2 units (in its
    original frame we use r=1, hl=2)."""
    r, hl = 1.0, 2.0
    lo = np.array([-(hl + r), -r, -r])
    hi = np.array([hl + r, r, r])

    def inside(p):
        cx = np.clip(p[:, 0], -hl, hl)
        d2 = (p[:, 0] - cx) ** 2 + p[:, 1] ** 2 + p[:, 2] ** 2
        return d2 <= r * r
    return inside, lo, hi


def build_carrots(scene_params: np.ndarray, seed: int) -> SceneBuild:
    """The carrots scene (yx_carrots.h:16-127): a grid of random convex
    rigid bodies. scene_params is the 20-float vector from
    env/flex_env.py:777-797."""
    p = np.asarray(scene_params, dtype=np.float64)
    (max_scale, min_scale, x, y, z, s_frict, d_frict, _draw_skin,
     num_carrots_f, min_dist, max_dist, num_x_f, num_y_f, num_z_f,
     pos_diff, add_singular_f, sing_x, sing_y, sing_z, add_noise_f) = p[:20]
    num_carrots = int(num_carrots_f)
    num_x, num_y, num_z = int(num_x_f), int(num_y_f), int(num_z_f)
    add_singular = bool(add_singular_f)
    add_noise = bool(add_noise_f)
    pos_noise = pos_diff * 0.5
    rng = np.random.default_rng(seed)

    positions, group_ids = [], []
    group = 0

    def add_chunk(lower3):
        nonlocal group
        scale = min_scale + (max_scale - min_scale) * rng.random()
        num_planes = rng.integers(6, 13)
        chunk = geometry.random_convex(rng, num_planes, min_dist, max_dist)
        pts = geometry.fill_convex_with_particles(
            chunk, np.asarray(lower3), scale, RADIUS * 1.001, rng,
            jitter=RADIUS * 0.1)
        positions.append(pts)
        group_ids.append(np.full(pts.shape[0], group, dtype=np.int32))
        group += 1

    done = False
    for y_idx in range(num_y):
        if group > num_carrots or done:
            break
        for z_idx in range(num_z):
            if group > num_carrots:
                done = True
                break
            for x_idx in range(num_x):
                if group > num_carrots:
                    done = True
                    break
                noise = (rng.uniform(-pos_noise, pos_noise, 3)
                         if add_noise else np.zeros(3))
                add_chunk((x + x_idx * pos_diff + noise[0],
                           y + y_idx * pos_diff + noise[1],
                           z + z_idx * pos_diff + noise[2]))
    if add_singular:
        add_chunk((sing_x, sing_y, sing_z))

    pos = np.concatenate(positions, axis=0)
    grp = np.concatenate(group_ids, axis=0)
    return SceneBuild(
        positions=pos, invm=np.full(pos.shape[0], 0.2, dtype=np.float32),
        group=grp, num_groups=group,
        params=SimParams.granular(RADIUS, s_frict, d_frict),
        color=np.array([237.0, 145.0, 33.0]) / 255.0,
        draw_skin=bool(_draw_skin))


def build_grid_rigid_scene(kind: str, scale: float, origin: np.ndarray,
                           grid_dims: tuple, num_bodies: int,
                           s_frict: float, d_frict: float, seed: int,
                           color: np.ndarray,
                           capsule_scale: float | None = None) -> SceneBuild:
    """Shared grid-of-rigid-bodies builder (coffee: yx_coffee.h:40-66;
    capsule: yx_capsule.h:41-68). pos_diff == scale."""
    rng = np.random.default_rng(seed)
    num_x, num_y, num_z = grid_dims
    positions, group_ids = [], []
    group = 0
    x, y, z = origin
    done = False
    for y_idx in range(num_y):
        if group > num_bodies or done:
            break
        for a_idx in range(num_z):
            if group > num_bodies:
                done = True
                break
            for b_idx in range(num_x):
                if group > num_bodies:
                    done = True
                    break
                lower = (x + b_idx * scale, y + y_idx * scale,
                         z + a_idx * scale)
                if kind == "coffee":
                    chunk = _bean_chunk(rng)
                    pts = geometry.fill_convex_with_particles(
                        chunk, np.asarray(lower), scale, RADIUS * 1.001,
                        rng, jitter=RADIUS * 0.1)
                elif kind == "capsule":
                    inside, lo, hi = _capsule_inside(scale)
                    pts = _fill_shape(inside, lo, hi, np.asarray(lower),
                                      capsule_scale or scale, RADIUS * 1.001,
                                      rng, jitter=RADIUS * 0.1)
                else:
                    raise ValueError(kind)
                positions.append(pts)
                group_ids.append(np.full(pts.shape[0], group, dtype=np.int32))
                group += 1
    pos = np.concatenate(positions, axis=0)
    grp = np.concatenate(group_ids, axis=0)
    return SceneBuild(
        positions=pos, invm=np.full(pos.shape[0], 0.2, dtype=np.float32),
        group=grp, num_groups=group,
        params=SimParams.granular(RADIUS, s_frict, d_frict), color=color)


def build_coffee(scene_params: np.ndarray, seed: int) -> SceneBuild:
    p = np.asarray(scene_params, dtype=np.float64)
    scale, x, y, z, sf, df, _skin, num_coffee = p[:8]
    return build_grid_rigid_scene(
        "coffee", float(scale), np.array([x, y, z]), (9, 11, 9),
        int(num_coffee), sf, df, seed, np.array([0.29, 0.17, 0.16]))


def build_capsule(scene_params: np.ndarray, seed: int) -> SceneBuild:
    p = np.asarray(scene_params, dtype=np.float64)
    scale, x, y, z, sf, df, _skin, num_caps = p[:8]
    return build_grid_rigid_scene(
        "capsule", float(scale), np.array([x, y, z]), (10, 10, 10),
        int(num_caps), sf, df, seed,
        np.array([18.0, 138.0, 207.0]) / 255.0, capsule_scale=float(scale))


def build_ball(scene_params: np.ndarray, seed: int) -> SceneBuild:
    """yz_GranularManip ('ball'): a box of free self-colliding grains filled
    from data/box.ply with invMass 1 (yz_granularmanip.h:17-39)."""
    p = np.asarray(scene_params, dtype=np.float64)
    scale, x, y, z, sf, df = p[:6]
    # the reference scene hardcodes radius 0.075 and ignores extra params
    # (yz_granularmanip.h:20); our env passes it explicitly as p[6]
    radius = float(p[6]) if p.shape[0] > 6 else 0.075
    rng = np.random.default_rng(seed)
    spacing = radius * 1.0001
    n_side = max(1, int(scale / spacing))
    pts = geometry.grid_block_particles(
        np.array([x, y, z]), (n_side, n_side, n_side), spacing, rng,
        jitter=0.0)
    return SceneBuild(
        positions=pts, invm=np.ones(pts.shape[0], dtype=np.float32),
        group=np.full(pts.shape[0], -1, dtype=np.int32), num_groups=0,
        params=SimParams.granular(float(radius), sf, df),
        color=np.array([0.805, 0.702, 0.401]))


def build_coffee_capsule(scene_params: np.ndarray, seed: int) -> SceneBuild:
    """yx_coffee_capsule.h: a coffee grid plus a capsule grid in one scene."""
    p = np.asarray(scene_params, dtype=np.float64)
    (cof_scale, cof_x, cof_y, cof_z, sf, df, _skin, num_coffee,
     cap_scale, cap_x, cap_y, cap_z, num_caps, _sl, _se) = p[:15]
    a = build_grid_rigid_scene(
        "coffee", float(cof_scale), np.array([cof_x, cof_y, cof_z]),
        (9, 11, 9), int(num_coffee), sf, df, seed,
        np.array([0.29, 0.17, 0.16]))
    b = build_grid_rigid_scene(
        "capsule", float(cap_scale), np.array([cap_x, cap_y, cap_z]),
        (10, 10, 10), int(num_caps), sf, df, seed + 1,
        np.array([18.0, 138.0, 207.0]) / 255.0, capsule_scale=float(cap_scale))
    pos = np.concatenate([a.positions, b.positions], axis=0)
    grp = np.concatenate([a.group, b.group + a.num_groups], axis=0)
    return SceneBuild(
        positions=pos,
        invm=np.concatenate([a.invm, b.invm]),
        group=grp, num_groups=a.num_groups + b.num_groups,
        params=a.params, color=a.color)


SCENE_REGISTRY = {
    18: build_ball,
    20: build_coffee,
    21: build_capsule,
    22: build_carrots,
    23: build_coffee_capsule,
}


def set_scene(scene_idx: int, scene_params: np.ndarray, seed: int = 0,
              capacity_multiple: int = 1024,
              group_multiple: int = 128):
    """Build a scene and return (SimState, SimParams, SceneBuild).

    Equivalent of pyflex.set_scene(idx, params) (pyflex.cpp:2458-2502 +
    Init): allocates capacity-padded device arrays and rigid-group tables.
    """
    if scene_idx not in SCENE_REGISTRY:
        raise NotImplementedError(
            f"scene {scene_idx} not in registry {sorted(SCENE_REGISTRY)}")
    build = SCENE_REGISTRY[scene_idx](scene_params, seed)
    n = build.positions.shape[0]
    cap = pad_capacity(n, capacity_multiple)
    g_cap = pad_capacity(max(build.num_groups, 1), group_multiple)

    x = np.zeros((cap, 3), dtype=np.float32)
    x[:n] = build.positions
    # park padded particles far below the floor so they never interact
    x[n:] = np.array([0.0, -1000.0, 0.0])
    invm = np.zeros((cap,), dtype=np.float32)
    invm[:n] = build.invm
    group = np.full((cap,), -1, dtype=np.int32)
    group[:n] = build.group
    active = np.zeros((cap,), dtype=bool)
    active[:n] = True

    # rigid rest coordinates relative to group COM
    rest = np.zeros((cap, 3), dtype=np.float32)
    if build.num_groups > 0:
        sums = np.zeros((build.num_groups, 3))
        counts = np.zeros((build.num_groups, 1))
        np.add.at(sums, build.group[build.group >= 0],
                  build.positions[build.group >= 0])
        np.add.at(counts, build.group[build.group >= 0], 1.0)
        com = sums / np.maximum(counts, 1.0)
        sel = build.group >= 0
        rest[:n][sel] = (build.positions[sel] - com[build.group[sel]]
                         ).astype(np.float32)

    quat = np.zeros((g_cap, 4), dtype=np.float32)
    quat[:, 0] = 1.0

    v = np.zeros((cap, 3), dtype=np.float32)
    if build.velocities is not None:
        v[:n] = build.velocities
    state = SimState(
        x=jnp.asarray(x), v=jnp.asarray(v),
        invm=jnp.asarray(invm), group=jnp.asarray(group),
        active=jnp.asarray(active), rest=jnp.asarray(rest),
        group_quat=jnp.asarray(quat),
        order=jnp.arange(cap, dtype=jnp.int32))
    return state, build.params, build


def wall_boxes(global_scale: float):
    """The 4 hidden workspace walls added post-settle
    (env/flex_env.py:828-846): halfEdge (0.05, 1.0, gs/2) at +-gs/2."""
    gs = global_scale
    centers = [(gs / 2.0, 1.0, 0.0), (0.0, 1.0, -gs / 2.0),
               (-gs / 2.0, 1.0, 0.0), (0.0, 1.0, gs / 2.0)]
    yaws = [0.0, np.pi / 2.0, 0.0, np.pi / 2.0]
    half = (0.05, 1.0, gs / 2.0)
    return centers, yaws, half


def make_colliders_with_walls(global_scale: float) -> Colliders:
    """Ground plane + 4 walls; box slot 0 reserved for the pusher."""
    col = Colliders.ground_only(num_boxes=5)
    centers, yaws, half = wall_boxes(global_scale)
    for i, (c, yw) in enumerate(zip(centers, yaws)):
        col = col.with_box(1 + i, c, half, yaw=yw, active=True)
    return col
