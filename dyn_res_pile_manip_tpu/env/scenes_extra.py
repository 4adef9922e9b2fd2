"""The non-granular FleX scene families: fluids, rigid+fluid baths,
cloth, ropes, and free-grain scenes, registered at the same indices as
the reference (PyFleX/bindings/pyflex.cpp:2458-2502 registration order):

  0 BunnyBath  1 BoxBath  2 DamBreak  3 RigidFall  4 RiceFall
  6 FluidShake 7 BoxBathExt 8 FluidIceShake 9 MassRope 10 FlagCloth
 13 Granular  15 ClothManip 17 FluidPour 19 FluidAndBox

(5 SoftBody, 11 SoftRod, 12 ClothRigid, 14 BunnyGrip, 16 SoftFall use
NvFlexExt soft-cluster machinery, ported as overlapping weighted
shape-matching clusters — see the scene builders below and
sim/xpbd.py's soft-cluster pass.) Param vectors mirror each scene header's
``ptr[...]`` layout; construction helpers mirror helpers.h
(CreateParticleGrid, CreateSpringGrid:1226, CreateRope:1315,
CreateSpring:145). These scenes step through the unified XPBD solver
(sim/xpbd.py); scenes 3/4/13 are rigid/granular-only and reuse the same
path with no fluid phase.

Note on relaxationFactor: several fluid scenes set relaxationFactor=0.0,
which in FleX only applies in eNvFlexRelaxationGlobal mode (not the
default local mode) — so we keep relaxation at 1.0.
"""
from __future__ import annotations

import numpy as np

from ..core.types import SimParams
from . import scene as scene_mod
from .scene import RADIUS, SceneBuild


# ---------------------------------------------------------------------------
# construction helpers (helpers.h equivalents)
# ---------------------------------------------------------------------------

def _unit_vectors(rng, n):
    v = rng.normal(size=(n, 3))
    return v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-9)


def particle_grid(lower, dims, spacing, rng, jitter=0.005):
    """CreateParticleGrid (helpers.h): lattice + jitter*RandomUnitVector."""
    dx, dy, dz = (int(d) for d in dims)
    ii, jj, kk = np.meshgrid(np.arange(dx), np.arange(dy), np.arange(dz),
                             indexing="ij")
    pts = np.asarray(lower)[None, :] + spacing * np.stack(
        [ii.ravel(), jj.ravel(), kk.ravel()], axis=-1).astype(np.float64)
    if jitter > 0:
        pts = pts + jitter * _unit_vectors(rng, pts.shape[0])
    return pts


def _box_fill(lower, scale, spacing, rng, jitter=0.0):
    """CreateParticleShape on data/box.ply (a unit cube): fill a cube of
    edge ``scale`` (scalar or (3,) per-axis edges) at ``spacing``."""
    edges = np.broadcast_to(np.asarray(scale, np.float64), (3,))
    d = np.maximum(1, (edges / spacing).astype(int))
    ii, jj, kk = np.meshgrid(*(np.arange(n) for n in d), indexing="ij")
    pts = np.asarray(lower)[None, :] + spacing * (np.stack(
        [ii.ravel(), jj.ravel(), kk.ravel()], -1) + 0.5)
    if jitter > 0:
        pts = pts + jitter * _unit_vectors(rng, pts.shape[0])
    return pts


def _sphere_fill(lower, scale, spacing, rng):
    """CreateParticleShape on data/sphere.ply: fill a sphere of diameter
    ``scale`` whose bounding-box lower corner sits at ``lower``."""
    n = max(1, int(scale / spacing))
    ax = (np.arange(n) + 0.5) * spacing
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    pts = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], -1)
    c = scale / 2.0
    keep = np.sum((pts - c) ** 2, axis=1) <= c * c
    return pts[keep] + np.asarray(lower)[None, :]


def spring_grid(lower, dimx, dimy, spacing, stretch, bend, shear):
    """CreateSpringGrid with dz=1 (helpers.h:1226-1313): positions
    lower + spacing*(x, 0, y); returns (positions, springs, triangles).
    Spring rest lengths are the as-built distances (CreateSpring)."""
    dimx, dimy = int(dimx), int(dimy)
    xs, ys = np.meshgrid(np.arange(dimx), np.arange(dimy), indexing="xy")
    # index(x, y) = y*dimx + x; meshgrid 'xy' gives [y, x] layout
    pos = np.asarray(lower)[None, :] + spacing * np.stack(
        [xs.ravel(), np.zeros(dimx * dimy), ys.ravel()], -1)

    def idx(x, y):
        return y * dimx + x

    springs = []

    def add(i, j, k):
        springs.append((i, j, np.linalg.norm(pos[i] - pos[j]), k))

    for y in range(dimy):
        for x in range(dimx):
            i0 = idx(x, y)
            if x > 0:
                add(i0, idx(x - 1, y), stretch)
            if x > 1:
                add(i0, idx(x - 2, y), bend)
            if y > 0 and x < dimx - 1:
                add(i0, idx(x + 1, y - 1), shear)
            if y > 0 and x > 0:
                add(i0, idx(x - 1, y - 1), shear)
    for x in range(dimx):
        for y in range(dimy):
            i0 = idx(x, y)
            if y > 0:
                add(i0, idx(x, y - 1), stretch)
            if y > 1:
                add(i0, idx(x, y - 2), bend)

    tris = []
    for y in range(1, dimy):
        for x in range(1, dimx):
            tris.append((idx(x - 1, y - 1), idx(x, y - 1), idx(x, y)))
            tris.append((idx(x - 1, y - 1), idx(x, y), idx(x - 1, y)))
    return pos, np.array(springs, np.float64), np.array(tris, np.int32)


def make_rope(start, direction, stiffness, segments, length,
              invmass_start=0.5, give=0.0):
    """CreateRope (helpers.h:1315-1366, spiralAngle=0): chain of
    ``segments`` stretch springs + skip-one bending springs at half
    stiffness. Returns (positions, invm, springs) with ids local to the
    rope (0 = start particle)."""
    segments = int(segments)
    seg_len = length / segments
    d = np.asarray(direction, np.float64)
    d = d / np.linalg.norm(d)
    pos = [np.asarray(start, np.float64)]
    invm = [invmass_start]
    springs = []
    for i in range(segments):
        pos.append(pos[-1] + d * seg_len)
        invm.append(1.0)
        prev = len(pos) - 2
        springs.append((prev, prev + 1, (1.0 + give) * seg_len, stiffness))
        if i > 0:
            springs.append((prev - 1, prev + 1, (1.0 + give) * 2 * seg_len,
                            stiffness * 0.5))
    return (np.array(pos), np.array(invm),
            np.array(springs, np.float64))


def bound_planes(scene_lower, scene_upper, positions, num_planes,
                 collision_distance):
    """g_params.planes from scene+particle bounds (pyflex.cpp:742-798):
    ground plus walls of the expanded bounding box, first ``num_planes``
    of [ground, z>=lo, x>=lo, x<=up, z<=up, y<=up]."""
    lo = np.minimum(np.asarray(scene_lower, np.float64),
                    positions.min(axis=0)) - collision_distance
    up = np.maximum(np.asarray(scene_upper, np.float64),
                    positions.max(axis=0)) + collision_distance
    planes = np.array([
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, -lo[2]],
        [1.0, 0.0, 0.0, -lo[0]],
        [-1.0, 0.0, 0.0, up[0]],
        [0.0, 0.0, -1.0, up[2]],
        [0.0, -1.0, 0.0, up[1]],
    ], np.float64)
    return planes[:int(num_planes)]


FLUID_COLOR = np.array([0.113, 0.425, 0.55])


def _fluid_sim_params(radius=0.1, dyn_frict=0.01, iterations=4,
                      collision_distance=0.01, gravity_y=-9.8,
                      static_frict=0.0, damping=0.0) -> SimParams:
    return SimParams(
        radius=np.float32(radius), static_friction=np.float32(static_frict),
        dynamic_friction=np.float32(dyn_frict),
        restitution=np.float32(0.0), damping=np.float32(damping),
        shock_propagation=np.float32(0.0),
        sleep_threshold=np.float32(0.0),
        collision_distance=np.float32(collision_distance),
        particle_collision_margin=np.float32(0.0),
        shape_collision_margin=np.float32(0.0),
        gravity_y=np.float32(gravity_y),
        num_iterations=int(iterations), num_substeps=2)


# ---------------------------------------------------------------------------
# fluid scenes
# ---------------------------------------------------------------------------

def _bath(scene_params, seed, boxes, scene_upper, dam_dims=(8, 15, 8)):
    """Shared rigid-boxes-plus-dam builder (yz_boxbath.h:24-114,
    yz_bunnybath.h, yz_boxbathext.h). ``boxes`` = [(lower, edges), ...]."""
    rng = np.random.default_rng(seed)
    radius = 0.1
    rest = radius * 0.55
    positions, invm, group, fluid = [], [], [], []
    g = 0
    for lower, edges in boxes:
        pts = _box_fill(lower, edges, radius * 0.5, rng)
        positions.append(pts)
        invm.append(np.full(pts.shape[0], 0.25))
        group.append(np.full(pts.shape[0], g, np.int32))
        fluid.append(np.zeros(pts.shape[0], bool))
        g += 1
    fl = particle_grid((0.0, 0.0, 0.0), dam_dims, rest, rng, jitter=0.005)
    positions.append(fl)
    invm.append(np.ones(fl.shape[0]))
    group.append(np.full(fl.shape[0], -1, np.int32))
    fluid.append(np.ones(fl.shape[0], bool))
    pos = np.concatenate(positions)
    params = _fluid_sim_params()
    return SceneBuild(
        positions=pos, invm=np.concatenate(invm).astype(np.float32),
        group=np.concatenate(group), num_groups=g, params=params,
        color=FLUID_COLOR, fluid_mask=np.concatenate(fluid),
        xparams=dict(fluid_rest=rest, solid_rest=rest, kernel_h=radius,
                     cohesion=0.02, viscosity=2.0, vorticity=40.0),
        scene_kind="fluid",
        extra_planes=bound_planes((0, 0, 0), scene_upper, pos, 5, 0.01))


def build_bunny_bath(scene_params, seed):
    """Scene 0, yz_bunnybath.h: despite the name, two rigid 0.2-boxes
    (the bunny/sphere shapes are commented out, yz_bunnybath.h:52-57)
    dropped into an 8x15x8 dam with 5 boundary planes."""
    rng = np.random.default_rng(seed)
    b = [((rng.uniform(0.45, 1.0), -0.0155, rng.uniform(0.05, 0.15)), 0.2),
         ((rng.uniform(0.45, 1.0), -0.0155, rng.uniform(0.2, 0.3)), 0.2)]
    return _bath(scene_params, seed + 1, b, (1.2, 0.0, 0.0))


def build_box_bath(scene_params, seed):
    """Scene 1, yz_boxbath.h:24-114: one rigid 0.2-box at a random spot in
    an 8x15x8 fluid dam, 5 boundary planes, bounds x in [0, 1.2]."""
    rng = np.random.default_rng(seed)
    b = [((rng.uniform(0.45, 1.0), -0.0155, rng.uniform(0.05, 0.15)), 0.2)]
    return _bath(scene_params, seed + 1, b, (1.2, 0.0, 0.0))


def build_box_bath_ext(scene_params, seed):
    """Scene 7, yz_boxbathext.h: box with per-axis edges (x,y,z) placed at
    (px, -0.0155, pz); params [x, y, z, px, pz]."""
    p = np.asarray(scene_params, np.float64)
    x, y, z, px, pz = p[:5]
    b = [((px, -0.0155, pz), np.array([x, y, z]))]
    return _bath(scene_params, seed, b, (1.2, 0.0, 0.0))


def build_dam_break(scene_params, seed):
    """Scene 2, yz_dambreak.h: a 12x24x12 fluid column at rest distance
    0.55*radius released in a [0,1.6]x[0,0.8] box (5 planes)."""
    rng = np.random.default_rng(seed)
    radius = 0.1
    rest = radius * 0.55
    x, z = rng.uniform(0.0, 0.15, 2)
    pts = particle_grid((x, 0.0, z), (12, 24, 12), rest, rng, jitter=0.005)
    return SceneBuild(
        positions=pts, invm=np.ones(pts.shape[0], np.float32),
        group=np.full(pts.shape[0], -1, np.int32), num_groups=0,
        params=_fluid_sim_params(), color=FLUID_COLOR,
        fluid_mask=np.ones(pts.shape[0], bool),
        xparams=dict(fluid_rest=rest, solid_rest=rest, kernel_h=radius,
                     cohesion=0.02, viscosity=2.0, vorticity=40.0),
        scene_kind="fluid",
        extra_planes=bound_planes((0, 0, 0), (1.6, 0.0, 0.8), pts, 5, 0.01))


def build_fluid_shake(scene_params, seed):
    """Scene 6, yz_fluidshake.h:23-104: params
    [x, y, z, dim_x, dim_y, dim_z, box_dis_x, box_dis_y, draw_mesh];
    a fluid block only — the shaking glass is box colliders added by the
    driving script (examples/test_FluidShake.py pattern)."""
    p = np.asarray(scene_params, np.float64)
    x, y, z, dim_x, dim_y, dim_z = p[:6]
    rng = np.random.default_rng(seed)
    radius = 0.1
    rest = radius * 0.55
    pts = particle_grid((x, y, z), (dim_x, dim_y, dim_z), rest, rng, 0.005)
    return SceneBuild(
        positions=pts, invm=np.ones(pts.shape[0], np.float32),
        group=np.full(pts.shape[0], -1, np.int32), num_groups=0,
        params=_fluid_sim_params(), color=FLUID_COLOR,
        fluid_mask=np.ones(pts.shape[0], bool),
        xparams=dict(fluid_rest=rest, solid_rest=rest, kernel_h=radius,
                     cohesion=0.02, viscosity=2.0, vorticity=40.0),
        scene_kind="fluid")


def build_fluid_ice_shake(scene_params, seed):
    """Scene 8, yz_fluidiceshake.h: fluid grid [pos, size] + one rigid
    'ice' box [pos, size, invMass]; params
    [px_f, py_f, pz_f, sx_f, sy_f, sz_f, vis, px_r, py_r, pz_r,
     sx_r, sy_r, sz_r, invMass, ..., draw_mesh]."""
    p = np.asarray(scene_params, np.float64)
    rng = np.random.default_rng(seed)
    radius = 0.1
    rest = radius * 0.55
    fl = particle_grid(p[0:3], p[3:6], rest, rng, 0.005)
    ice = _box_fill(p[7:10], p[10:13], radius * 0.5, rng)
    pos = np.concatenate([fl, ice])
    invm = np.concatenate([np.ones(fl.shape[0]),
                           np.full(ice.shape[0], p[13])]).astype(np.float32)
    return SceneBuild(
        positions=pos, invm=invm,
        group=np.concatenate([np.full(fl.shape[0], -1, np.int32),
                              np.zeros(ice.shape[0], np.int32)]),
        num_groups=1, params=_fluid_sim_params(), color=FLUID_COLOR,
        fluid_mask=np.concatenate([np.ones(fl.shape[0], bool),
                                   np.zeros(ice.shape[0], bool)]),
        xparams=dict(fluid_rest=rest, solid_rest=rest, kernel_h=radius,
                     cohesion=0.02, viscosity=float(p[6]), vorticity=40.0),
        scene_kind="fluid")


def build_fluid_pour(scene_params, seed):
    """Scene 17, yz_fluidpour.h: two fluid blocks; params
    [x,y,z,dimx,dimy,dimz] x2 + [draw_mesh]."""
    p = np.asarray(scene_params, np.float64)
    rng = np.random.default_rng(seed)
    radius = 0.1
    rest = radius * 0.55
    a = particle_grid(p[0:3], p[3:6], rest, rng, 0.005)
    b = particle_grid(p[6:9], p[9:12], rest, rng, 0.005)
    pos = np.concatenate([a, b])
    return SceneBuild(
        positions=pos, invm=np.ones(pos.shape[0], np.float32),
        group=np.full(pos.shape[0], -1, np.int32), num_groups=0,
        params=_fluid_sim_params(), color=FLUID_COLOR,
        fluid_mask=np.ones(pos.shape[0], bool),
        xparams=dict(fluid_rest=rest, solid_rest=rest, kernel_h=radius,
                     cohesion=0.02, viscosity=2.0, vorticity=40.0),
        scene_kind="fluid")


def build_fluid_and_box(scene_params, seed):
    """Scene 19, yz_fluid_and_box.h: n_fluid grids (7 floats each:
    pos, dims, invMass) + n_rigid box shapes (10 floats: pos, size,
    invMass, RGB), then [viscosity, draw_mesh]."""
    p = np.asarray(scene_params, np.float64)
    rng = np.random.default_rng(seed)
    radius = 0.1
    rest = radius * 0.55
    n_fluid = int(p[0])
    positions, invm, group, fluid = [], [], [], []
    for i in range(n_fluid):
        q = p[1 + i * 7: 1 + i * 7 + 7]
        pts = particle_grid(q[0:3], q[3:6], rest, rng, 0.005)
        positions.append(pts)
        invm.append(np.full(pts.shape[0], q[6]))
        group.append(np.full(pts.shape[0], -1, np.int32))
        fluid.append(np.ones(pts.shape[0], bool))
    st = 1 + n_fluid * 7
    n_rigid = int(p[st])
    g = 0
    for i in range(n_rigid):
        q = p[st + 1 + i * 10: st + 1 + i * 10 + 10]
        pts = _box_fill(q[0:3], q[3:6], radius * 0.5, rng)
        positions.append(pts)
        invm.append(np.full(pts.shape[0], q[6]))
        group.append(np.full(pts.shape[0], g, np.int32))
        fluid.append(np.zeros(pts.shape[0], bool))
        g += 1
    vis = float(p[n_fluid * 7 + n_rigid * 10 + 2])
    pos = np.concatenate(positions)
    return SceneBuild(
        positions=pos, invm=np.concatenate(invm).astype(np.float32),
        group=np.concatenate(group), num_groups=g,
        params=_fluid_sim_params(), color=FLUID_COLOR,
        fluid_mask=np.concatenate(fluid),
        xparams=dict(fluid_rest=rest, solid_rest=rest, kernel_h=radius,
                     cohesion=0.02, viscosity=vis, vorticity=40.0),
        scene_kind="fluid")


# ---------------------------------------------------------------------------
# rigid / free-grain scenes (no fluid phase)
# ---------------------------------------------------------------------------

def build_rigid_fall(scene_params, seed):
    """Scene 3, yz_rigidfall.h:23-117: n_instance rigid 0.2-boxes
    (spacing radius*0.5, invMass 0.25); params
    [n_instance, gravityY, (x,y,z) per instance, draw_mesh]. Solid rest
    distance follows fluidRestDistance = 0.055 (pyflex.cpp:760-761)."""
    p = np.asarray(scene_params, np.float64)
    n_instance = int(p[0])
    gravity_y = float(p[1])
    rng = np.random.default_rng(seed)
    radius = 0.1
    positions, group = [], []
    for i in range(n_instance):
        lower = p[i * 3 + 2: i * 3 + 5]
        pts = _box_fill(lower, 0.2, radius * 0.5, rng)
        positions.append(pts)
        group.append(np.full(pts.shape[0], i, np.int32))
    pos = np.concatenate(positions)
    params = _fluid_sim_params(dyn_frict=1.0, gravity_y=gravity_y)
    return SceneBuild(
        positions=pos,
        invm=np.full(pos.shape[0], 0.25, np.float32),
        group=np.concatenate(group), num_groups=n_instance, params=params,
        color=np.array([0.7, 0.8, 0.9]) * 0.7,
        xparams=dict(fluid_rest=0.0, solid_rest=0.055),
        scene_kind="rigid")


def build_rice_fall(scene_params, seed):
    """Scene 4, yz_ricefall.h:23-85: two free self-colliding grain blocks
    (4^3 and 5^3 at rest distance radius*0.5) with 4x gravity and high
    sticky friction; FleX's dissipation/viscosity pair is approximated by
    velocity damping."""
    rng = np.random.default_rng(seed)
    radius = 0.1
    rest = radius * 0.5
    x0, x1 = rng.uniform(0.15, 0.25, 2)
    y0 = rng.uniform(0.1, 0.25)
    y1 = rng.uniform(0.55, 0.7)
    z0, z1 = rng.uniform(0.05, 0.15, 2)
    if rng.uniform(-1, 1) > 0:
        y0, y1 = y1, y0
    a = particle_grid((x0, y0, z0), (4, 4, 4), rest, rng, 0.0)
    b = particle_grid((x1, y1, z1), (5, 5, 5), rest, rng, 0.0)
    pos = np.concatenate([a, b])
    params = _fluid_sim_params(
        radius=radius, dyn_frict=1.0, static_frict=0.0, iterations=3,
        collision_distance=0.00125, gravity_y=-9.8 * 4.0, damping=2.0)
    return SceneBuild(
        positions=pos, invm=np.ones(pos.shape[0], np.float32),
        group=np.full(pos.shape[0], -1, np.int32), num_groups=0,
        params=params, color=np.array([1.0, 1.0, 1.0]),
        xparams=dict(fluid_rest=0.0, solid_rest=rest),
        scene_kind="grains")


def build_granular_13(scene_params, seed):
    """Scene 13, yz_granular.h: a rigid sphere ball dropped far from a
    free-grain 'sandcastle' (the reference fills data/sandcastle.obj; we
    fill an analytic keep-with-towers of the same scale). Granular solver
    params (radius 0.075, 12 iterations, shock 6) — steps through the
    active-set pile solver, not the XPBD path."""
    rng = np.random.default_rng(seed)
    radius = RADIUS
    ball = _sphere_fill((8.0, 4.0, 2.0), 1.0, radius, rng)

    def castle_inside(p):
        # 4-unit-wide keep: base slab + central tower + 4 corner towers
        x, y, z = p[:, 0], p[:, 1], p[:, 2]
        base = (np.abs(x) < 2.0) & (np.abs(z) < 2.0) & (y > 0) & (y < 0.8)
        tower = (x ** 2 + z ** 2 < 0.81) & (y > 0) & (y < 2.4)
        corners = np.zeros_like(base)
        for sx in (-1.5, 1.5):
            for sz in (-1.5, 1.5):
                corners |= ((x - sx) ** 2 + (z - sz) ** 2 < 0.25) \
                    & (y > 0) & (y < 1.6)
        return base | tower | corners

    ax = np.arange(-2.0, 2.0 + 1e-6, radius * 1.0001)
    ay = np.arange(0.0, 2.4 + 1e-6, radius * 1.0001)
    gx, gy, gz = np.meshgrid(ax, ay, ax, indexing="ij")
    grid = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], -1)
    castle = grid[castle_inside(grid)] + np.array([-2.0, -radius * 0.15, 0.0])

    pos = np.concatenate([ball, castle])
    invm = np.concatenate([np.zeros(ball.shape[0]),
                           np.ones(castle.shape[0])]).astype(np.float32)
    # the reference gives the ball invMass 0 (kinematic rigid, launched by
    # examples); rigid group 0 with invm handled by shape matching
    group = np.concatenate([np.zeros(ball.shape[0], np.int32),
                            np.full(castle.shape[0], -1, np.int32)])
    return SceneBuild(
        positions=pos, invm=invm, group=group, num_groups=1,
        params=SimParams.granular(radius, 1.0, 0.5),
        color=np.array([0.805, 0.702, 0.401]))


# ---------------------------------------------------------------------------
# rope / cloth scenes
# ---------------------------------------------------------------------------

def build_mass_rope(scene_params, seed):
    """Scene 9, yz_massrope.h:23-124: a rigid sphere (scale radius*5,
    spacing 0.055, invMass 0.15; its top particle invm 2.0) hanging from a
    rope of int(length/radius*1.1) segments; the rope's far end is the
    pinned control particle moved by Update(). Params
    [x, y, z, length, stiffness, draw_mesh]."""
    p = np.asarray(scene_params, np.float64)
    x, y, z, length, stiffness = p[:5]
    rng = np.random.default_rng(seed)
    radius = 0.055
    size = radius * 5.0
    ball = _sphere_fill((x, y, z), size, radius, rng)
    invm_ball = np.full(ball.shape[0], 0.15)
    attach = int(np.argmax(ball[:, 1]))
    invm_ball[attach] = 2.0
    attach_pos = ball[attach] + np.array([0.0, radius / 1.1, 0.0])
    vel = _unit_vectors(rng, 1)[0] * 1.0

    segments = int(length / radius * 1.1)
    rp, rinvm, rsprings = make_rope(
        attach_pos, (0.0, 1.0, 0.0), stiffness, segments, length,
        invmass_start=0.5, give=0.0)
    n0 = ball.shape[0]
    rsprings[:, :2] += n0
    # CreateSpring(attachIndex, rope_start, 1.0) (yz_massrope.h:63)
    tie = np.array([[attach, n0,
                     np.linalg.norm(ball[attach] - rp[0]), 1.0]])
    springs = np.concatenate([rsprings, tie])
    control = n0 + rp.shape[0] - 1
    invm = np.concatenate([invm_ball, rinvm]).astype(np.float32)
    invm[control] = 0.0
    pos = np.concatenate([ball, rp])
    vels = np.zeros_like(pos)
    vels[:n0] = vel
    params = SimParams(
        radius=np.float32(0.1), static_friction=np.float32(0.0),
        dynamic_friction=np.float32(0.05), restitution=np.float32(0.0),
        damping=np.float32(0.0), shock_propagation=np.float32(0.0),
        sleep_threshold=np.float32(0.0),
        collision_distance=np.float32(radius * 0.5),
        particle_collision_margin=np.float32(0.0),
        shape_collision_margin=np.float32(0.0),
        num_iterations=4, num_substeps=2)
    return SceneBuild(
        positions=pos, invm=invm,
        group=np.concatenate([np.zeros(n0, np.int32),
                              np.full(rp.shape[0], -1, np.int32)]),
        num_groups=1, params=params, color=np.array([0.9, 0.6, 0.2]),
        velocities=vels, springs=springs,
        xparams=dict(fluid_rest=0.0, solid_rest=radius),
        control_idx=[control], scene_kind="mass_rope")


def build_flag_cloth(scene_params, seed):
    """Scene 10, yz_flag.h:7-129: a dimx x dimy spring grid hung in the
    x-y plane (the reference's per-particle swap/negate rotation), corners
    0 and dimx-1 pinned and driven by Update(); unilateral tethers
    (stiffness -0.8, give 0.1) from both corners to every other particle.
    Params [height, dimx, dimy, stretch, bend, shear, wind, draw_mesh]."""
    p = np.asarray(scene_params, np.float64)
    height, dimx, dimy = p[0], int(p[1]), int(p[2])
    stretch, bend, shear, wind_strength = p[3:7]
    rng = np.random.default_rng(seed)
    radius = 0.05
    pos, springs, tris = spring_grid((0.0, 0.0, -height), dimx, dimy,
                                     radius, stretch, bend, shear)
    # rotation hack (yz_flag.h:38-41): swap y/z then y *= -1
    pos = pos[:, [0, 2, 1]]
    pos[:, 1] *= -1.0
    c1, c2 = 0, dimx - 1
    invm = np.ones(pos.shape[0], np.float32)
    invm[c1] = invm[c2] = 0.0
    tethers = []
    for i in range(pos.shape[0]):
        if i in (c1, c2):
            continue
        for c in (c1, c2):
            tethers.append((c, i, 1.1 * np.linalg.norm(pos[c] - pos[i]),
                            -0.8))
    springs = np.concatenate([springs, np.array(tethers, np.float64)])
    vels = _unit_vectors(rng, pos.shape[0]) * 0.1
    params = SimParams(
        radius=np.float32(radius), static_friction=np.float32(0.0),
        dynamic_friction=np.float32(0.25), restitution=np.float32(0.0),
        damping=np.float32(0.0), shock_propagation=np.float32(0.0),
        sleep_threshold=np.float32(0.0),
        collision_distance=np.float32(radius * 0.5),
        particle_collision_margin=np.float32(0.0),
        shape_collision_margin=np.float32(0.0),
        num_iterations=4, num_substeps=2)
    return SceneBuild(
        positions=pos, invm=invm,
        group=np.full(pos.shape[0], -1, np.int32), num_groups=0,
        params=params, color=np.array([0.8, 0.2, 0.2]),
        velocities=vels, springs=springs, triangles=tris,
        xparams=dict(fluid_rest=0.0, solid_rest=radius * 0.5,
                     wind=(0.0, 0.0, -float(wind_strength)), drag=0.06),
        control_idx=[c1, c2], scene_kind="flag")


def build_cloth_manip(scene_params, seed):
    """Scene 15, yz_clothmanip.h: a flat cloth sheet (fabric_type 0;
    shirt/pants types need CreateShirt/CreatePants and are not ported)
    with 8 grabbable control points. Params
    [offset_xyz, fabric_type, dimx, dimy, dimz, ctrl_pts[8],
     stretch, bend, shear, dyn_frict, stat_frict, particle_frict,
     invMass, wind, draw_mesh]."""
    p = np.asarray(scene_params, np.float64)
    offset = p[0:3]
    fabric_type = int(p[3])
    if fabric_type != 0:
        raise NotImplementedError(
            "fabric_type 1/2 (shirt/pants meshes) not ported")
    dimx, dimy = int(p[4]), int(p[5])
    ctrl_pts = [int(c) for c in p[7:15]]
    stretch, bend, shear = p[15:18]
    dyn_frict, stat_frict = p[18], p[19]
    invmass = float(p[21])
    wind_strength = float(p[22])
    rng = np.random.default_rng(seed)
    radius = 0.05
    pos, springs, tris = spring_grid(offset, dimx, dimy, radius,
                                     stretch, bend, shear)
    vels = _unit_vectors(rng, pos.shape[0]) * 0.1
    params = SimParams(
        radius=np.float32(radius),
        static_friction=np.float32(stat_frict),
        dynamic_friction=np.float32(dyn_frict),
        restitution=np.float32(0.0), damping=np.float32(0.0),
        shock_propagation=np.float32(0.0),
        sleep_threshold=np.float32(0.0),
        collision_distance=np.float32(radius * 0.5),
        particle_collision_margin=np.float32(0.0),
        shape_collision_margin=np.float32(0.0),
        num_iterations=4, num_substeps=2)
    return SceneBuild(
        positions=pos,
        invm=np.full(pos.shape[0], invmass, np.float32),
        group=np.full(pos.shape[0], -1, np.int32), num_groups=0,
        params=params, color=np.array([0.25, 0.45, 0.8]),
        velocities=vels, springs=springs, triangles=tris,
        xparams=dict(fluid_rest=0.0, solid_rest=radius * 0.5,
                     wind=(0.0, 0.0, -wind_strength), drag=0.06),
        control_idx=ctrl_pts, scene_kind="cloth_manip")


# ---------------------------------------------------------------------------
# soft-body scenes (flexExt cluster assets -> sim.xpbd overlapping-cluster
# shape matching; mesh assets replaced by analytic stand-in volumes)
# ---------------------------------------------------------------------------

def _soft_volume(kind, scale3, radius, rng):
    """Particle-fill a normalized (unit-box) soft shape scaled by
    scale * radius (mesh->Normalize() + Scale(scale*radius) semantics,
    yz_softfall.h:206-210). The reference repo does NOT ship the
    .ply/.obj assets its scene headers reference; when a real mesh is
    present (``$DYNRES_MESH_DIR/<kind>.{ply,obj}``, default
    assets/meshes/) it is voxel-filled exactly like CreateParticleShape
    (utils/mesh.py); otherwise analytic volumes of matching proportions
    stand in (PARITY.md)."""
    s = np.asarray(scale3, np.float64) * radius
    spacing = radius

    import os
    mesh_dir = os.environ.get("DYNRES_MESH_DIR", "assets/meshes")
    for ext in (".ply", ".obj"):
        path = os.path.join(mesh_dir, kind + ext)
        if os.path.exists(path):
            from ..utils import mesh as mesh_mod
            verts, faces = mesh_mod.import_mesh(path)
            return mesh_mod.fill_mesh_with_particles(
                verts, faces, (0.0, 0.0, 0.0), float(s.max()), spacing,
                rng)

    def ellipsoid(c, r):
        return lambda p: (((p - c) / r) ** 2).sum(axis=1) <= 1.0

    if kind in ("box", "rod"):
        inside = lambda p: np.ones(p.shape[0], bool)  # noqa: E731
    elif kind == "bunny":
        body = ellipsoid(np.array([0.5, 0.4, 0.45]),
                         np.array([0.42, 0.4, 0.34]))
        head = ellipsoid(np.array([0.5, 0.78, 0.72]),
                         np.array([0.26, 0.22, 0.24]))
        inside = lambda p: body(p) | head(p)  # noqa: E731
    elif kind == "armadillo":
        inside = ellipsoid(np.array([0.5, 0.5, 0.5]),
                           np.array([0.38, 0.5, 0.3]))
    elif kind == "octopus":
        inside = ellipsoid(np.array([0.5, 0.4, 0.5]),
                           np.array([0.5, 0.35, 0.5]))
    elif kind == "dragon":
        inside = ellipsoid(np.array([0.5, 0.35, 0.5]),
                           np.array([0.5, 0.3, 0.26]))
    else:
        raise ValueError(kind)

    d = np.maximum(1, (s / spacing).astype(int))
    ii, jj, kk = np.meshgrid(*(np.arange(n) for n in d), indexing="ij")
    unit = (np.stack([ii.ravel(), jj.ravel(), kk.ravel()], -1) + 0.5) \
        / np.maximum(d, 1)
    pts = unit * s
    keep = inside(unit)
    if not keep.any():
        keep[:] = True
    return pts[keep]


def _soft_build(pts_list, radius, cluster_spacing, cluster_stiffness,
                cluster_radius=0.0, global_stiffness=0.0,
                plastic_threshold=0.0, plastic_creep=0.0,
                dyn_frict=0.35, collision_distance=None,
                control_idx=None, scene_kind="soft",
                color=np.array([0.875, 0.782, 0.051])):
    """Shared soft-instance assembly: cluster each instance independently
    (instance id doubles as the collision-exclusion group), pin below-
    ground particles (yz_softfall.h:258-261), radius expanded 1.5x for
    inter-body self collision (yz_softfall.h:264-265)."""
    from ..sim import xpbd as xpbd_mod

    positions, group, ws, stiffs = [], [], [], []
    n_total = sum(p.shape[0] for p in pts_list)
    off = 0
    for gi, pts in enumerate(pts_list):
        positions.append(pts)
        group.append(np.full(pts.shape[0], gi, np.int32))
        w, st = xpbd_mod.build_clusters(
            pts, cluster_spacing * radius,
            cluster_radius * radius, cluster_stiffness)
        wf = np.zeros((w.shape[0], n_total), np.float32)
        wf[:, off:off + pts.shape[0]] = w
        ws.append(wf)
        stiffs.append(st)
        if global_stiffness > 0:
            gw = np.zeros((1, n_total), np.float32)
            gw[0, off:off + pts.shape[0]] = 0.5
            ws.append(gw)
            stiffs.append(np.array([global_stiffness], np.float32))
        off += pts.shape[0]
    pos = np.concatenate(positions)
    invm = np.ones(pos.shape[0], np.float32)
    invm[pos[:, 1] < 0.0] = 0.0  # fix below-ground particles in place
    params = _fluid_sim_params(
        radius=radius * 1.5, dyn_frict=dyn_frict,
        iterations=4,
        collision_distance=(collision_distance
                            if collision_distance is not None
                            else radius * 0.75))
    return SceneBuild(
        positions=pos, invm=invm, group=np.concatenate(group),
        num_groups=len(pts_list), params=params, color=color,
        xparams=dict(
            fluid_rest=0.0, solid_rest=radius * 1.5,
            clusters=(np.concatenate(ws), np.concatenate(stiffs)),
            plastic_threshold=plastic_threshold,
            plastic_creep=plastic_creep),
        control_idx=control_idx, scene_kind=scene_kind)


def build_soft_body(scene_params, seed):
    """Scene 5 (yz_SoftBody 'Plastic Stack', yz_softbody.h:183-280): one
    soft box (scale (x, y, z) x radius, cluster spacing 10r) with plastic
    threshold/creep; params
    [x, y, z, clusterStiffness, plasticThreshold, plasticCreep]."""
    p = np.asarray(scene_params, np.float64)
    x, y, z, stiff, pthresh, pcreep = p[:6]
    rng = np.random.default_rng(seed)
    radius = 0.1
    pts = _soft_volume("box", (x, y, z), radius, rng) \
        + np.array([-x / 20.0, 0.0, -z / 20.0])
    return _soft_build([pts], radius, cluster_spacing=10.0,
                       cluster_stiffness=float(stiff),
                       plastic_threshold=float(pthresh),
                       plastic_creep=float(pcreep), dyn_frict=2.0)


def build_soft_rod(scene_params, seed):
    """Scene 11 (yz_softrod.h:135-200): a soft rod (box_very_high.ply ->
    elongated box) with explicit cluster spacing/radius/stiffness; params
    [scale(3), trans(3), clusterSpacing, clusterRadius, clusterStiffness,
    draw_mesh]. Update() drags listed particle indices in x/z."""
    p = np.asarray(scene_params, np.float64)
    if p.size < 9:
        # empty params = UB in the reference (yz_softrod.h:139 reads
        # ptr[0..9] unchecked; examples/test.py passes []) — default to
        # the canonical test_SoftRod configuration instead
        p = np.array([10.0, 2.0, 2.0, 0.0, 0.05, 0.0, 4.0, 2.0, 0.2, 0.0])
    rng = np.random.default_rng(seed)
    radius = 0.1
    pts = _soft_volume("rod", p[0:3], radius, rng) + p[3:6]
    return _soft_build([pts], radius, cluster_spacing=float(p[6]),
                       cluster_radius=float(p[7]),
                       cluster_stiffness=float(p[8]),
                       scene_kind="soft_rod")


def build_bunny_grip(scene_params, seed):
    """Scene 14 (yz_bunnygrip.h:165-230): one soft bunny (cluster spacing
    1r, stiffness 0.5, optional whole-body 'global' cluster) with plastic
    flow; params [scale, globalStiffness, plasticThreshold, plasticCreep,
    draw_mesh]. The gripper-box choreography is commented out in the
    reference (yz_bunnygrip.h:95-124) and boxes can be added via
    add_box/set_shape_states."""
    p = np.asarray(scene_params, np.float64)
    scale, gstiff, pthresh, pcreep = p[:4]
    rng = np.random.default_rng(seed)
    radius = 0.1
    pts = _soft_volume("bunny", (scale, scale, scale), radius, rng) \
        + np.array([-scale / 20.0, 0.0, -scale / 20.0])
    return _soft_build([pts], radius, cluster_spacing=1.0,
                       cluster_stiffness=0.5,
                       global_stiffness=float(gstiff),
                       plastic_threshold=float(pthresh),
                       plastic_creep=float(pcreep))


def build_soft_fall(scene_params, seed):
    """Scene 16 (yz_softfall.h:108-197): one soft instance (type 0-3 ->
    bunny/armadillo/octopus/dragon stand-ins) at cluster spacing 3r,
    stiffness 0.2; params [type, scale, x, y, z, draw_mesh]."""
    p = np.asarray(scene_params, np.float64)
    kind = ("bunny", "armadillo", "octopus", "dragon")[int(p[0])]
    scale = float(p[1])
    rng = np.random.default_rng(seed)
    radius = 0.1
    pts = _soft_volume(kind, (scale, scale, scale), radius, rng) + p[2:5]
    return _soft_build([pts], radius, cluster_spacing=3.0,
                       cluster_stiffness=0.2)


def build_cloth_rigid(scene_params, seed):
    """Scene 12 (yz_clothrigid.h:12-150): rigid particle boxes dropped
    onto a horizontal cloth sheet pinned at its 4 corners (tether springs
    stiffness -0.5 give 0.05 from every corner); params
    [dimx_cloth, dimy_cloth, height_cloth, p_cloth(3), dim_rigid(3),
    num_rigid(3), num_banana, draw_points]."""
    p = np.asarray(scene_params, np.float64)
    dimx_c, dimy_c = int(p[0]), int(p[1])
    height = float(p[2])
    p_cloth = p[3:6]
    sx, sy, sz = (int(v) for v in p[6:9])
    nx, ny, nz = (int(v) for v in p[9:12])
    num_banana = int(p[12])
    rng = np.random.default_rng(seed)
    radius = 0.15  # g_params.radius default (pyflex.cpp:669)

    # rigid box grid above the cloth (yz_clothrigid.h:44-65)
    positions, group_ids = [], []
    g = 0
    lower = np.array([0.0, height + radius, 0.0])
    for x in range(nx):
        for y in range(ny):
            for z in range(nz):
                at = (radius * 0.905) * np.array([x * sx, y * sy, z * sz]) \
                    + (radius * 0.1) * np.array([x, y, z]) + lower
                pts = _box_fill(
                    at, radius * 0.9 * np.array([sx, sy, sz]),
                    radius * 0.9, rng, jitter=0.001)
                positions.append(pts)
                group_ids.append(np.full(pts.shape[0], g, np.int32))
                g += 1
    for i in range(num_banana):
        at = np.array([0.4, 8.5 + i * 0.25, 0.25]) \
            + _unit_vectors(rng, 1)[0] * radius * 0.25
        pts = _soft_volume("dragon", (2.0, 1.2, 1.2), radius * 0.5, rng) \
            + at
        positions.append(pts)
        group_ids.append(np.full(pts.shape[0], g, np.int32))
        g += 1

    n_rigid = sum(pts.shape[0] for pts in positions)
    cloth_pos, springs, tris = spring_grid(
        p_cloth, dimx_c, dimy_c, radius, 0.9, 0.8, 0.7)
    cloth_pos[:, 1] = height  # yz_clothrigid.h:95-99 (rotation 0)
    springs[:, :2] += n_rigid
    tris += n_rigid
    corners = [n_rigid + 0, n_rigid + dimx_c - 1,
               n_rigid + dimx_c * (dimy_c - 1),
               n_rigid + dimx_c * dimy_c - 1]
    tethers = []
    for i in range(cloth_pos.shape[0]):
        gi = n_rigid + i
        if gi in corners:
            continue
        for c in corners:
            tethers.append((c, gi, 1.05 * np.linalg.norm(
                cloth_pos[c - n_rigid] - cloth_pos[gi - n_rigid]), -0.5))
    springs = np.concatenate([springs, np.array(tethers, np.float64)])

    pos = np.concatenate(positions + [cloth_pos])
    invm = np.ones(pos.shape[0], np.float32)
    for c in corners:
        invm[c] = 0.0
    grp = np.concatenate(group_ids + [np.full(cloth_pos.shape[0], -1,
                                              np.int32)])
    params = _fluid_sim_params(
        radius=radius, dyn_frict=0.75, static_frict=0.7,
        iterations=4, collision_distance=radius * 0.5, damping=0.25)
    return SceneBuild(
        positions=pos, invm=invm, group=grp, num_groups=g,
        params=params, color=np.array([0.6, 0.45, 0.3]),
        springs=springs, triangles=tris,
        xparams=dict(fluid_rest=0.0, solid_rest=radius),
        control_idx=corners, scene_kind="cloth_rigid")


EXTRA_SCENES = {
    0: build_bunny_bath,
    1: build_box_bath,
    2: build_dam_break,
    3: build_rigid_fall,
    4: build_rice_fall,
    5: build_soft_body,
    6: build_fluid_shake,
    7: build_box_bath_ext,
    8: build_fluid_ice_shake,
    9: build_mass_rope,
    10: build_flag_cloth,
    11: build_soft_rod,
    12: build_cloth_rigid,
    13: build_granular_13,
    14: build_bunny_grip,
    15: build_cloth_manip,
    16: build_soft_fall,
    17: build_fluid_pour,
    19: build_fluid_and_box,
}

scene_mod.SCENE_REGISTRY.update(EXTRA_SCENES)
