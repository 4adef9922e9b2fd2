"""Unified XPBD stepper for the non-granular FleX scene families:
distance springs (cloth / ropes / tethers), position-based fluids, and
their couplings with rigid shape-matched bodies and static colliders.

This is the TPU-native equivalent of the constraint types the reference's
closed CUDA solver exposes through its spring / triangle / fluid-phase
buffers (API: PyFleX/include/NvFlex.h; scene wiring:
PyFleX/bindings/helpers.h CreateSpring:145, CreateSpringGrid:1226,
CreateRope:1315; fluid phase flag eNvFlexPhaseFluid, NvFlex.h:160-176).
The granular pile workload keeps its own specialized active-set solver
(sim/pbd.py); this module trades that solver's sleeping machinery for the
extra constraint families — these scenes are small (<= ~16k particles)
and perpetually dynamic.

Design (TPU-first, one jitted program per frame):
  - state is sorted along its principal axis each frame and every pairwise
    interaction (solid contact, fluid density, XSPH viscosity) is evaluated
    on the sorted-window formulation from sim/pbd.py — tile shifts instead
    of gathers, distances as dense (rows, TILE, W*TILE) tensors on the MXU.
  - springs are irregular, so they use one scatter-add per iteration
    (S <= a few 10k rows; bounded, and nowhere near the granular hot path).
  - fluids follow Macklin & Mueller's position-based-fluids formulation
    (poly6 / spiky kernels, density-constraint lambda, s_corr
    anti-clustering standing in for FleX's cohesion, XSPH standing in for
    its viscosity, vorticity confinement re-injecting the rotational
    motion the projections dissipate — _vorticity_pass).
  - cloth aero is per-triangle drag/lift in the wind frame (_tri_aero,
    NvFlex.h:120-122), applied to the triangle's vertices.

Solid/fluid rest-distance semantics mirror pyflex.cpp:756-765: when a
scene sets fluidRestDistance > 0, solid pairs rest at that distance too.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core.types import Colliders, SimParams, SimState
from . import pbd
from .pbd import TILE, _PAD_POS, _window


class XConstraints(struct.PyTreeNode):
    """Extra constraint sets layered on a SimState (capacity-padded).

    sp_idx/sp_rest/sp_stiff/sp_active: distance springs in ORIGINAL
        (unsorted) particle ids; stiffness < 0 means a unilateral tether
        (resists stretch only) — CreateSpring semantics (helpers.h:145,
        yz_flag.h tether loop).
    fluid: (N,) bool — particle carries eNvFlexPhaseFluid.
    cloth: (N,) bool — particle belongs to a dynamic triangle (receives
        wind/drag aero forces; approximation of FleX per-triangle drag).
    tri_idx/tri_active: cloth triangles (rendering + aero membership).
    """

    sp_idx: jnp.ndarray       # (S, 2) int32
    sp_rest: jnp.ndarray      # (S,)
    sp_stiff: jnp.ndarray     # (S,)
    sp_active: jnp.ndarray    # (S,) bool
    fluid: jnp.ndarray        # (N,) bool
    cloth: jnp.ndarray        # (N,) bool
    tri_idx: jnp.ndarray      # (T, 3) int32
    tri_active: jnp.ndarray   # (T,) bool
    # scalars (device; shapes static)
    fluid_rest: jnp.ndarray   # fluidRestDistance; 0 = scene has no fluid
    solid_rest: jnp.ndarray   # solidRestDistance (pyflex.cpp:756-765)
    rest_density: jnp.ndarray # lattice-summed poly6 density at fluid_rest
    cohesion: jnp.ndarray     # FleX cohesion -> s_corr strength
    viscosity: jnp.ndarray    # FleX viscosity -> XSPH blend
    wind: jnp.ndarray         # (3,) g_params.wind
    drag: jnp.ndarray         # FleX drag -> per-particle aero coefficient
    # soft-body clusters: overlapping weighted shape-match regions — the
    # TPU-native equivalent of NvFlexExtCreateSoftFromMesh assets
    # (flexExt cluster creation; driven by yz_softbody.h / yz_softfall.h /
    # yz_softrod.h / yz_bunnygrip.h). cl_rest evolves under plastic creep.
    cl_w: jnp.ndarray = struct.field(         # (G, N) skinning weights
        default_factory=lambda: jnp.zeros((0, 0), jnp.float32))
    cl_rest: jnp.ndarray = struct.field(      # (G, N, 3) cluster-local rest
        default_factory=lambda: jnp.zeros((0, 0, 3), jnp.float32))
    cl_quat: jnp.ndarray = struct.field(      # (G, 4) warm-start rotations
        default_factory=lambda: jnp.zeros((0, 4), jnp.float32))
    cl_stiff: jnp.ndarray = struct.field(     # (G,)
        default_factory=lambda: jnp.zeros((0,), jnp.float32))
    soft: jnp.ndarray = struct.field(         # (N,) cluster-governed mask
        default_factory=lambda: jnp.zeros((0,), bool))
    plastic_threshold: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(0.0))
    plastic_creep: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(0.0))
    # aero lift (NvFlex.h:122 — force prop. to velocity^2*area,
    # perpendicular to velocity, toward the triangle plane normal)
    lift: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(0.0))
    # vorticity confinement strength (NvFlex.h:128 g_params.
    # vorticityConfinement; 40 in every registered fluid scene,
    # 120 in yz_massrope.h:75)
    vorticity: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(0.0))
    # static: does the scene have any fluid / springs / clusters at all
    # (compile-time branch pruning)
    has_fluid: bool = struct.field(pytree_node=False, default=False)
    has_springs: bool = struct.field(pytree_node=False, default=False)
    has_clusters: bool = struct.field(pytree_node=False, default=False)
    has_triangles: bool = struct.field(pytree_node=False, default=False)
    has_vorticity: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def build(cls, n_capacity: int, springs=None, fluid_mask=None,
              cloth_mask=None, triangles=None, fluid_rest=0.0,
              solid_rest=0.075, kernel_h=None, cohesion=0.0, viscosity=0.0,
              wind=(0.0, 0.0, 0.0), drag=0.0, lift=0.0, vorticity=0.0,
              clusters=None, plastic_threshold=0.0, plastic_creep=0.0,
              spring_multiple: int = 256) -> "XConstraints":
        """Host-side assembly with capacity padding.

        springs: (S, 4) float array rows [i, j, rest, stiffness] or None.
        kernel_h: SPH kernel radius (defaults to the scene's params.radius,
        FleX's fluid interaction radius) — needed for the rest density.
        clusters: (w (G, n), stiff (G,)) soft-body skinning weights from
        build_clusters(); rest coords are derived from the build positions
        at first use (set by attach_cluster_rest).
        """
        if springs is None or len(springs) == 0:
            springs = np.zeros((0, 4), np.float64)
        springs = np.asarray(springs, np.float64)
        s_cap = max(spring_multiple, int(
            np.ceil(max(len(springs), 1) / spring_multiple) * spring_multiple))
        sp_idx = np.zeros((s_cap, 2), np.int32)
        sp_rest = np.zeros((s_cap,), np.float32)
        sp_stiff = np.zeros((s_cap,), np.float32)
        sp_active = np.zeros((s_cap,), bool)
        s = len(springs)
        if s:
            sp_idx[:s] = springs[:, :2].astype(np.int32)
            sp_rest[:s] = springs[:, 2]
            sp_stiff[:s] = springs[:, 3]
            sp_active[:s] = True

        if triangles is None or len(triangles) == 0:
            triangles = np.zeros((0, 3), np.int32)
        triangles = np.asarray(triangles, np.int32)
        t_cap = max(256, int(np.ceil(max(len(triangles), 1) / 256) * 256))
        tri = np.zeros((t_cap, 3), np.int32)
        tri_act = np.zeros((t_cap,), bool)
        t = len(triangles)
        if t:
            tri[:t] = triangles
            tri_act[:t] = True

        fl = np.zeros((n_capacity,), bool)
        if fluid_mask is not None:
            fl[:len(fluid_mask)] = fluid_mask
        cl = np.zeros((n_capacity,), bool)
        if cloth_mask is not None:
            cl[:len(cloth_mask)] = cloth_mask
        elif t:
            cl[np.unique(triangles)] = True

        if clusters is not None:
            cw_in, cstiff_in = clusters
            g = cw_in.shape[0]
            g_cap = max(8, int(np.ceil(g / 8) * 8))
            cw = np.zeros((g_cap, n_capacity), np.float32)
            cw[:g, :cw_in.shape[1]] = cw_in
            cstiff = np.zeros((g_cap,), np.float32)
            cstiff[:g] = cstiff_in
            cquat = np.zeros((g_cap, 4), np.float32)
            cquat[:, 0] = 1.0
            soft = cw.sum(axis=0) > 0
            cl_kw = dict(
                cl_w=jnp.asarray(cw),
                cl_rest=jnp.zeros((g_cap, n_capacity, 3), jnp.float32),
                cl_quat=jnp.asarray(cquat),
                cl_stiff=jnp.asarray(cstiff),
                soft=jnp.asarray(soft),
                has_clusters=True)
        else:
            cl_kw = dict(soft=jnp.zeros((n_capacity,), bool))

        return cls(
            plastic_threshold=jnp.float32(plastic_threshold),
            plastic_creep=jnp.float32(plastic_creep),
            **cl_kw,
            sp_idx=jnp.asarray(sp_idx), sp_rest=jnp.asarray(sp_rest),
            sp_stiff=jnp.asarray(sp_stiff), sp_active=jnp.asarray(sp_active),
            fluid=jnp.asarray(fl), cloth=jnp.asarray(cl),
            tri_idx=jnp.asarray(tri), tri_active=jnp.asarray(tri_act),
            fluid_rest=jnp.float32(fluid_rest),
            solid_rest=jnp.float32(solid_rest),
            rest_density=jnp.float32(
                rest_density_lattice(fluid_rest,
                                     kernel_h if kernel_h else solid_rest)
                if fluid_rest > 0 else 1.0),
            cohesion=jnp.float32(cohesion),
            viscosity=jnp.float32(viscosity),
            wind=jnp.asarray(wind, jnp.float32),
            drag=jnp.float32(drag),
            lift=jnp.float32(lift),
            vorticity=jnp.float32(vorticity),
            has_fluid=bool(fluid_rest > 0),
            has_springs=bool(s > 0),
            has_triangles=bool(t > 0),
            has_vorticity=bool(vorticity > 0 and fluid_rest > 0),
        )


    def attach_cluster_rest(self, x0) -> "XConstraints":
        """Fill cl_rest from build positions: rest_gi = x0_i - com0_g with
        the cluster's weighted rest COM (flexExt soft-asset rest poses)."""
        if not self.has_clusters:
            return self
        x0 = jnp.asarray(x0, jnp.float32)
        w = self.cl_w
        wsum = jnp.maximum(jnp.sum(w, axis=1), 1e-6)
        com0 = (w @ x0) / wsum[:, None]
        rest = jnp.where((w > 0)[..., None],
                         x0[None, :, :] - com0[:, None, :], 0.0)
        return self.replace(cl_rest=rest)


def build_clusters(pts, spacing, radius, stiffness):
    """Host-side soft-body cluster creation (the particle-clustering part
    of NvFlexExtCreateSoftFromMesh): greedy center sampling at
    ``spacing``, linear-falloff skinning weights within ``radius``
    (0 = auto 2x spacing, guaranteeing overlap in place of flexExt's
    explicit cluster links). Every particle is attached to at least its
    nearest center. Returns (w (G, n), stiff (G,))."""
    pts = np.asarray(pts)
    n = pts.shape[0]
    centers = []
    taken = np.zeros(n, bool)
    for i in range(n):
        if not taken[i]:
            centers.append(pts[i])
            taken |= np.linalg.norm(pts - pts[i], axis=1) < spacing
    centers = np.array(centers)
    r_eff = radius if radius > 0 else 2.0 * spacing
    d = np.linalg.norm(pts[None, :, :] - centers[:, None, :], axis=-1)
    w = np.maximum(0.0, 1.0 - d / r_eff).astype(np.float32)
    orphan = w.sum(axis=0) <= 0
    if orphan.any():
        nearest = np.argmin(d[:, orphan], axis=0)
        w[nearest, np.where(orphan)[0]] = 0.5
    stiff = np.full(centers.shape[0], stiffness, np.float32)
    return w, stiff


def solve_clusters(xp, xc: XConstraints):
    """One weighted overlapping-cluster shape-matching projection, all in
    matmuls/einsums (generalizes pbd.shape_match's disjoint rigid groups
    to flexExt-style soft bodies: a particle's goal is the skinning-
    weighted average of its clusters' rigid goals)."""
    hi = jax.lax.Precision.HIGHEST
    w = xc.cl_w                                   # (G, N)
    rest = xc.cl_rest                             # (G, N, 3)
    wsum_g = jnp.maximum(jnp.sum(w, axis=1), 1e-6)
    com = jnp.matmul(w, xp, precision=hi) / wsum_g[:, None]      # (G, 3)
    srest = jnp.einsum("gn,gnj->gj", w, rest, precision=hi)
    term1 = jnp.einsum("gn,ni,gnj->gij", w, xp, rest, precision=hi)
    A = term1 - com[:, :, None] * srest[:, None, :]
    q = pbd.extract_rotation(A, xc.cl_quat)
    R = pbd._quat_to_mat(q)                       # (G, 3, 3)
    goal_c = jnp.einsum("gn,gij,gnj->ni", w, R, rest, precision=hi)
    com_pp = jnp.matmul(w.T, com, precision=hi)   # (N, 3) weighted coms
    wsum_i = jnp.maximum(jnp.sum(w, axis=0), 1e-9)
    goal = (com_pp + goal_c) / wsum_i[:, None]
    k_i = jnp.matmul(w.T, xc.cl_stiff, precision=hi) / wsum_i
    delta = jnp.where(xc.soft[:, None], (k_i[:, None]) * (goal - xp), 0.0)
    return xp + delta, q


def plastic_flow(xp, xc: XConstraints, q):
    """Cluster plastic deformation (NvFlexExt clusterPlasticThreshold /
    clusterPlasticCreep): when a cluster's mean elastic deviation exceeds
    the threshold, its rest coordinates creep toward the current
    cluster-local configuration."""
    hi = jax.lax.Precision.HIGHEST
    w = xc.cl_w
    rest = xc.cl_rest
    wsum_g = jnp.maximum(jnp.sum(w, axis=1), 1e-6)
    com = jnp.matmul(w, xp, precision=hi) / wsum_g[:, None]
    R = pbd._quat_to_mat(q)
    local = jnp.einsum("gji,gnj->gni", R,
                       xp[None, :, :] - com[:, None, :], precision=hi)
    err = jnp.where((w > 0)[..., None], local - rest, 0.0)
    dev = (jnp.einsum("gn,gn->g", w, jnp.linalg.norm(err, axis=-1))
           / wsum_g)
    flow = (dev > xc.plastic_threshold)[:, None, None]
    return jnp.where(flow, rest + xc.plastic_creep * err, rest)


# ---------------------------------------------------------------------------
# SPH kernels (Macklin & Mueller 2013, eqs. 2-4; h = interaction radius)
# ---------------------------------------------------------------------------

def _poly6(d2, h):
    c = 315.0 / (64.0 * np.pi * h ** 9)
    t = jnp.maximum(h * h - d2, 0.0)
    return c * t * t * t


def _spiky_grad_mag(dist, h):
    """|gradW_spiky| as a function of distance (applied along r-hat)."""
    c = 45.0 / (np.pi * h ** 6)
    t = jnp.maximum(h - dist, 0.0)
    return c * t * t


def rest_density_lattice(fluid_rest: float, h: float) -> float:
    """Rest density of a unit-mass cubic lattice at spacing ``fluid_rest``
    under the poly6 kernel of radius ``h`` (includes the self term).
    Host-side, once per scene build."""
    r = float(fluid_rest)
    h = float(h)
    if r <= 0:
        return 1.0
    k = int(np.ceil(h / r)) + 1
    ax = np.arange(-k, k + 1) * r
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    d2 = gx ** 2 + gy ** 2 + gz ** 2
    c = 315.0 / (64.0 * np.pi * h ** 9)
    w = np.where(d2 < h * h, c * np.maximum(h * h - d2, 0.0) ** 3, 0.0)
    return float(w.sum())


# ---------------------------------------------------------------------------
# springs
# ---------------------------------------------------------------------------

def solve_springs(xp: jnp.ndarray, invm: jnp.ndarray,
                  sp_idx: jnp.ndarray, sp_rest: jnp.ndarray,
                  sp_stiff: jnp.ndarray, sp_active: jnp.ndarray
                  ) -> jnp.ndarray:
    """One Jacobi sweep of distance-spring projections (scatter-add,
    count-averaged like the contact solve). Negative stiffness = unilateral
    tether (stretch only), matching CreateSpring's use in yz_flag.h:50-60."""
    i, j = sp_idx[:, 0], sp_idx[:, 1]
    xi, xj = xp[i], xp[j]
    diff = xi - xj
    dist = jnp.linalg.norm(diff, axis=-1)
    nrm = diff / jnp.maximum(dist, 1e-9)[:, None]
    c = dist - sp_rest
    k = jnp.abs(sp_stiff)
    apply = sp_active & ((sp_stiff > 0) | (c > 0))
    wi, wj = invm[i], invm[j]
    wsum = jnp.maximum(wi + wj, 1e-9)
    corr = jnp.where(apply, -k * c / wsum, 0.0)
    di = (corr * wi)[:, None] * nrm
    dj = (-corr * wj)[:, None] * nrm
    acc = jnp.zeros_like(xp).at[i].add(di).at[j].add(dj)
    cnt = jnp.zeros(xp.shape[0], jnp.float32).at[i].add(
        apply.astype(jnp.float32)).at[j].add(apply.astype(jnp.float32))
    return xp + acc / jnp.maximum(cnt, 1.0)[:, None]


# ---------------------------------------------------------------------------
# windowed pair passes (sorted order)
# ---------------------------------------------------------------------------

def _pair_mask(active_s, group_s, w_tiles):
    """(nt, T, W*T) static pair validity: both active, not same rigid
    group, not self (same construction as pbd.build_cache's pair_ok)."""
    nt = active_s.shape[0] // TILE
    okw = _window(active_s, False, w_tiles)
    gw = _window(group_s, -2, w_tiles)
    gi = group_s.reshape(nt, TILE)
    same = (gi[:, :, None] == gw[:, None, :]) & (gi[:, :, None] >= 0)
    widx = jnp.arange(w_tiles * TILE)
    self_m = (widx[None, None, :]
              == ((w_tiles - 1) // 2 * TILE
                  + jnp.arange(TILE))[None, :, None])
    return (okw[:, None, :] & active_s.reshape(nt, TILE)[:, :, None]
            & ~same & ~self_m)


def _solid_pass(xp, x0, wi_s, fluid_s, pair_ok, xc: XConstraints,
                params: SimParams, w_tiles: int) -> jnp.ndarray:
    """Solid contact projection (non fluid-fluid pairs) at solid_rest with
    Coulomb friction; same math as pbd.solve_contacts_window minus shock
    propagation (these scenes don't stack high columns)."""
    nt = xp.shape[0] // TILE
    xw = _window(xp, _PAD_POS, w_tiles)
    a = xp.reshape(nt, TILE, 3)
    diff = a[:, :, None, :] - xw[:, None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    inv_dist = jax.lax.rsqrt(jnp.maximum(d2, 1e-18))
    dist = d2 * inv_dist

    flw = _window(fluid_s, False, w_tiles)
    fli = fluid_s.reshape(nt, TILE)
    both_fluid = fli[:, :, None] & flw[:, None, :]

    pen = xc.solid_rest - dist
    contact = (pen > 0) & pair_ok & ~both_fluid
    nrm = diff * inv_dist[..., None]

    wjk = _window(wi_s, 0.0, w_tiles)[:, None, :]
    wit = wi_s.reshape(nt, TILE)[:, :, None]
    ratio = wit / jnp.maximum(wit + wjk, 1e-9)
    push = (ratio * pen)[..., None] * nrm

    x0w = _window(x0, _PAD_POS, w_tiles)
    dmove = ((xp - x0).reshape(nt, TILE, 3)[:, :, None, :]
             - (xw - x0w)[:, None, :, :])
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
    cnt = jnp.sum(contact, axis=2)
    dx = jnp.sum(delta, axis=2) / jnp.maximum(cnt, 1)[..., None]
    return xp + params.relaxation_factor * dx.reshape(-1, 3)


def _fluid_pass(xp, fluid_s, pair_ok, xc: XConstraints,
                params: SimParams, w_tiles: int) -> jnp.ndarray:
    """One PBF density-constraint projection (two windowed sweeps: lambda,
    then position deltas with s_corr anti-clustering). Fluid particles have
    unit mass; solid neighbors contribute to density at solid mass 1
    (boundary handling via the solid-contact pass)."""
    h = params.radius
    nt = xp.shape[0] // TILE
    eps = 100.0  # CFM relaxation (PBF eq. 11)

    xw = _window(xp, _PAD_POS, w_tiles)
    a = xp.reshape(nt, TILE, 3)
    diff = a[:, :, None, :] - xw[:, None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    inv_dist = jax.lax.rsqrt(jnp.maximum(d2, 1e-18))
    dist = d2 * inv_dist

    flw = _window(fluid_s, False, w_tiles)
    fli = fluid_s.reshape(nt, TILE)
    pair_fl = pair_ok & flw[:, None, :]          # neighbor is fluid
    in_h = (d2 < h * h) & pair_fl

    w_p6 = jnp.where(in_h, _poly6(d2, h), 0.0)
    rho = jnp.sum(w_p6, axis=2) + _poly6(jnp.float32(0.0), h)  # + self
    rho0 = xc.rest_density
    C = rho / rho0 - 1.0

    gmag = jnp.where(in_h, _spiky_grad_mag(dist, h), 0.0) / rho0
    grad_i = jnp.sum(gmag[..., None] * (diff * inv_dist[..., None]), axis=2)
    sum_g2 = (jnp.sum(gmag * gmag, axis=2)
              + jnp.sum(grad_i * grad_i, axis=-1))
    lam = jnp.where(fli, -C / (sum_g2 + eps), 0.0)

    # s_corr: W(r)/W(dq) anti-clustering (PBF eq. 13); strength scaled from
    # FleX's cohesion (0.02 in the fluid scenes). Kept small: the
    # one-sided neighborhoods of surface particles turn s_corr into a net
    # outward push, so an aggressive gain boils the free surface.
    w_dq = _poly6(jnp.float32((0.2 * h) ** 2), h)
    k_corr = 0.1 * xc.cohesion
    s_corr = -k_corr * (w_p6 / jnp.maximum(w_dq, 1e-12)) ** 4

    lam_full = lam.reshape(-1)
    lamw = _window(lam_full, 0.0, w_tiles)
    # grad_pi W(pi - pj) = -|gradW| r-hat (spiky falls off with distance),
    # so Delta p_i = (1/rho0) sum (lam_i + lam_j + s_corr) gradW flips sign
    coef = jnp.where(in_h,
                     -(lam[:, :, None] + lamw[:, None, :] + s_corr) * gmag,
                     0.0)
    dx = jnp.sum(coef[..., None] * (diff * inv_dist[..., None]), axis=2)
    dx = jnp.where(fli[..., None], dx, 0.0)
    # robustness clamp: one density projection may not move a particle
    # more than a fraction of the kernel radius (FleX maxAcceleration-
    # style limiting) — bounds the one-sided surface-neighborhood kick
    dmag = jnp.linalg.norm(dx, axis=-1, keepdims=True)
    cap = 0.2 * h
    dx = dx * jnp.minimum(1.0, cap / jnp.maximum(dmag, 1e-12))
    return xp + dx.reshape(-1, 3)


def _xsph_pass(x, v, fluid_s, pair_ok, xc: XConstraints,
               params: SimParams, w_tiles: int) -> jnp.ndarray:
    """XSPH velocity smoothing over fluid neighbors (stands in for FleX's
    viscosity parameter; c tuned so viscosity=2 gives a visibly damped
    splash without locking)."""
    h = params.radius
    nt = x.shape[0] // TILE
    xw = _window(x, _PAD_POS, w_tiles)
    a = x.reshape(nt, TILE, 3)
    d2 = jnp.sum((a[:, :, None, :] - xw[:, None, :, :]) ** 2, axis=-1)
    flw = _window(fluid_s, False, w_tiles)
    fli = fluid_s.reshape(nt, TILE)
    in_h = (d2 < h * h) & pair_ok & flw[:, None, :]
    w_p6 = jnp.where(in_h, _poly6(d2, h), 0.0)
    vw = _window(v, 0.0, w_tiles)
    dv = jnp.sum(w_p6[..., None]
                 * (vw[:, None, :, :] - v.reshape(nt, TILE, 3)[:, :, None, :]),
                 axis=2) / xc.rest_density
    c = 0.05 * xc.viscosity
    out = v.reshape(nt, TILE, 3) + jnp.where(fli[..., None], c * dv, 0.0)
    return out.reshape(-1, 3)


def _vorticity_pass(x, v, fluid_s, pair_ok, xc: XConstraints,
                    params: SimParams, w_tiles: int, sdt) -> jnp.ndarray:
    """Vorticity confinement (Macklin & Mueller PBF sec. 5; FleX
    NvFlex.h:128 g_params.vorticityConfinement): two windowed sweeps —
    (1) omega_i = sum_j (v_j - v_i) x grad_i W_ij (SPH curl, volume
    factor 1/rho0), (2) eta_i = sum_j |omega_j| grad_i W_ij, then the
    confinement force f = eps (eta-hat x omega) re-injects the rotational
    motion the position-based projection dissipates. eps is the FleX
    parameter scaled by _VORT_SCALE (FleX's internal force scaling is not
    published; the scale is chosen so vorticityConfinement=40 visibly
    prolongs dam-break swirl without destabilizing — see
    tests/test_xpbd.py::test_dam_break_vorticity_confinement)."""
    h = params.radius
    nt = x.shape[0] // TILE
    xw = _window(x, _PAD_POS, w_tiles)
    a = x.reshape(nt, TILE, 3)
    diff = a[:, :, None, :] - xw[:, None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    inv_dist = jax.lax.rsqrt(jnp.maximum(d2, 1e-18))
    flw = _window(fluid_s, False, w_tiles)
    fli = fluid_s.reshape(nt, TILE)
    in_h = (d2 < h * h) & pair_ok & flw[:, None, :]
    # grad_i W(xi - xj) = -|gradW| r-hat (same convention as _fluid_pass)
    gmag = jnp.where(in_h, _spiky_grad_mag(d2 * inv_dist, h), 0.0) \
        / xc.rest_density
    gradw = -gmag[..., None] * (diff * inv_dist[..., None])
    vw = _window(v, 0.0, w_tiles)
    dvel = vw[:, None, :, :] - v.reshape(nt, TILE, 3)[:, :, None, :]
    omega = jnp.sum(jnp.cross(dvel, gradw), axis=2)          # (nt, TILE, 3)
    om_mag = jnp.linalg.norm(omega, axis=-1)
    omw = _window(om_mag.reshape(-1), 0.0, w_tiles)
    eta = jnp.sum(omw[:, None, :, None] * gradw, axis=2)
    n_hat = eta * jax.lax.rsqrt(
        jnp.sum(eta * eta, axis=-1, keepdims=True) + 1e-10)
    f = _VORT_SCALE * xc.vorticity * jnp.cross(n_hat, omega)
    dv = sdt * f
    # energy bound: confinement may only RE-inject a fraction of the
    # motion a particle already has (|dv| <= 0.15 |v| per substep) — an
    # unbounded kick during the initial splash fires particles through
    # thin kinematic walls (tunneling past collide_static's one-substep
    # sweep). FleX's closed solver necessarily bounds this too (its
    # fluids don't self-accelerate).
    vi = v.reshape(nt, TILE, 3)
    vmag = jnp.linalg.norm(vi, axis=-1, keepdims=True)
    dmag = jnp.linalg.norm(dv, axis=-1, keepdims=True)
    dv = dv * jnp.minimum(1.0, 0.15 * vmag / jnp.maximum(dmag, 1e-12))
    out = vi + jnp.where(fli[..., None], dv, 0.0)
    return out.reshape(-1, 3)


_VORT_SCALE = 0.02


def _tri_aero(x, v, invm, xc_s: XConstraints, sdt) -> jnp.ndarray:
    """Per-triangle wind/drag/lift (NvFlex.h:120-122 semantics: drag force
    prop. to velocity^2 * area opposing the relative-wind normal motion;
    lift prop. to velocity^2 * area, perpendicular to the velocity and
    toward the triangle normal's side; wind enters as the reference frame
    of the relative velocity). Replaces the round-3 per-particle drag
    blend when the scene registers dynamic triangles.

    tri rows are bounded (cloth sheets, few-k), so one 3xT gather + 3
    scatter-adds per substep stay far off the granular hot path (the same
    budget call as solve_springs). FleX's internal force scaling is not
    published; _AERO_SCALE calibrates drag=0.06 to the previous
    per-particle response at windStrength 1.5, and the update is clamped
    so drag can never overshoot the wind frame (|dv| <= |v_rel|)."""
    tri = xc_s.tri_idx
    act = xc_s.tri_active
    p0, p1, p2 = x[tri[:, 0]], x[tri[:, 1]], x[tri[:, 2]]
    vt = (v[tri[:, 0]] + v[tri[:, 1]] + v[tri[:, 2]]) / 3.0
    nvec = jnp.cross(p1 - p0, p2 - p0)
    a2 = jnp.linalg.norm(nvec, axis=-1, keepdims=True)
    n_hat = nvec / jnp.maximum(a2, 1e-12)
    area = 0.5 * a2[:, 0]
    vrel = vt - xc_s.wind[None, :]
    speed = jnp.linalg.norm(vrel, axis=-1)
    vn = jnp.sum(vrel * n_hat, axis=-1)                       # signed
    f_drag = (-xc_s.drag * area * speed * vn)[:, None] * n_hat
    # lift direction: component of n-hat perpendicular to the flow,
    # magnitude prop. to speed^2 * area * cos(theta)*sin(theta)
    v_hat = vrel / jnp.maximum(speed[:, None], 1e-9)
    lift_dir = n_hat - jnp.sum(n_hat * v_hat, axis=-1,
                               keepdims=True) * v_hat
    lift_dir = lift_dir * jax.lax.rsqrt(
        jnp.sum(lift_dir * lift_dir, axis=-1, keepdims=True) + 1e-12)
    vt_mag = jnp.linalg.norm(vrel - vn[:, None] * n_hat, axis=-1)
    f_lift = (-xc_s.lift * area * vt_mag * vn)[:, None] * lift_dir
    f = jnp.where(act[:, None], _AERO_SCALE * (f_drag + f_lift), 0.0)
    dv = jnp.zeros_like(v)
    third = f / 3.0
    for k in range(3):
        dv = dv.at[tri[:, k]].add(third)
    dv = dv * (sdt * invm)[:, None]
    # drag cannot push a particle past rest in the wind frame
    prel = v - xc_s.wind[None, :]
    pmag = jnp.linalg.norm(prel, axis=-1, keepdims=True)
    dmag = jnp.linalg.norm(dv, axis=-1, keepdims=True)
    dv = dv * jnp.minimum(1.0, pmag / jnp.maximum(dmag, 1e-12))
    return v + jnp.where(xc_s.cloth[:, None], dv, 0.0)


_AERO_SCALE = 4.0e4


# ---------------------------------------------------------------------------
# the frame step
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("w_tiles",))
def _step_sorted_xpbd(state: SimState, xc_s: XConstraints,
                      params: SimParams, colliders: Colliders,
                      w_tiles: int) -> SimState:
    """One frame on an already-sorted state with sorted-order constraint
    arrays (sp_idx remapped, fluid/cloth permuted)."""
    sdt = jnp.float32(params.dt / params.num_substeps)
    gravity = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    free = state.invm > 0
    active = state.active
    pair_ok = _pair_mask(active, state.group, w_tiles)
    wi_s = jnp.where(active, state.invm, 0.0)
    onehot = pbd.group_onehot(state)
    if xc_s.has_clusters:
        # soft particles are collision-grouped by instance id but shape-
        # matched by their overlapping clusters, not the rigid path
        onehot = onehot * (~xc_s.soft).astype(jnp.float32)[None, :]
    inv_counts = 1.0 / jnp.maximum(jnp.sum(onehot, axis=1), 1.0)
    group_keep = jnp.ones(onehot.shape[0], bool)

    def substep(carry, _):
        x, v, quat, cl_quat, cl_rest = carry
        xcc = xc_s.replace(cl_quat=cl_quat, cl_rest=cl_rest)
        v = v + sdt * gravity * params.gravity_y
        v = v * jnp.maximum(0.0, 1.0 - params.damping * sdt)
        if xc_s.has_triangles:
            # per-triangle wind/drag/lift (NvFlex.h:120-122)
            v = _tri_aero(x, v, wi_s, xc_s, sdt)
        else:
            # triangle-less scenes with drag: per-particle blend toward
            # the wind velocity (e.g. rope-only aero)
            aero = xc_s.drag * (xc_s.wind[None, :] - v)
            v = jnp.where(xc_s.cloth[:, None], v + sdt * 60.0 * aero, v)
        speed = jnp.linalg.norm(v, axis=-1, keepdims=True)
        vcap = jnp.minimum(params.max_speed, params.radius / sdt)
        v = v * jnp.minimum(1.0, vcap / jnp.maximum(speed, 1e-9))
        v = jnp.where(free[:, None], v, 0.0)
        x0 = x
        xp = x0 + sdt * v

        def iteration(carry, _):
            xp, quat, cq = carry
            if xc_s.has_springs:
                xp = solve_springs(xp, jnp.where(free, state.invm, 0.0),
                                   xc_s.sp_idx, xc_s.sp_rest,
                                   xc_s.sp_stiff, xc_s.sp_active)
                xp = jnp.where(free[:, None], xp, x0)
            xp = _solid_pass(xp, x0, wi_s, xc_s.fluid, pair_ok, xc_s,
                             params, w_tiles)
            xp = jnp.where(free[:, None], xp, x0)
            if xc_s.has_fluid:
                xp = _fluid_pass(xp, xc_s.fluid, pair_ok, xc_s, params,
                                 w_tiles)
                xp = jnp.where(free[:, None], xp, x0)
            xp = pbd.collide_static(xp, x0, colliders, params, sdt)
            xp, quat = pbd.shape_match(xp, state, params, quat, onehot,
                                       inv_counts, solve_mask=active,
                                       group_keep=group_keep)
            xp = jnp.where(free[:, None], xp, x0)
            if xc_s.has_clusters:
                xp, cq = solve_clusters(xp, xcc.replace(cl_quat=cq))
                xp = jnp.where(free[:, None], xp, x0)
            return (xp, quat, cq), None

        (xp, quat, cl_quat), _ = jax.lax.scan(
            iteration, (xp, quat, cl_quat), None,
            length=params.num_iterations)
        if xc_s.has_clusters:
            cl_rest = plastic_flow(xp, xcc, cl_quat)
        v_new = (xp - x0) / sdt
        v_new = jnp.where(free[:, None], v_new, 0.0)
        if xc_s.has_fluid:
            v_new = _xsph_pass(xp, v_new, xc_s.fluid, pair_ok, xc_s,
                               params, w_tiles)
            v_new = jnp.where(free[:, None], v_new, 0.0)
        if xc_s.has_vorticity:
            v_new = _vorticity_pass(xp, v_new, xc_s.fluid, pair_ok, xc_s,
                                    params, w_tiles, sdt)
            v_new = jnp.where(free[:, None], v_new, 0.0)
        xp = jnp.where(free[:, None], xp, x0)
        return (xp, v_new, quat, cl_quat, cl_rest), None

    (x, v, quat, cl_quat, cl_rest), _ = jax.lax.scan(
        substep,
        (state.x, state.v, state.group_quat, xc_s.cl_quat, xc_s.cl_rest),
        None, length=params.num_substeps, unroll=params.num_substeps)
    return (state.replace(x=x, v=v, group_quat=quat),
            xc_s.replace(cl_quat=cl_quat, cl_rest=cl_rest))


def default_w_tiles(n_capacity: int, cap: int = 15) -> int:
    """Window width covering the whole array for small scenes, capped for
    larger ones (scene builders may pass a scene-specific value computed
    from their geometry)."""
    nt = n_capacity // TILE
    w = 2 * nt - 1
    return min(w if w % 2 == 1 else w + 1, cap)


def step_frame_xpbd(state: SimState, xc: XConstraints, params: SimParams,
                    colliders: Colliders, w_tiles: int | None = None):
    """Advance one display frame; returns (state, xc) — xc carries the
    evolving soft-cluster rotations/rest shapes (plastic flow). The state
    may be in any order: it is sorted along its principal axis, the
    constraint id spaces are remapped into sorted order, the frame runs,
    and original order is restored (these scenes re-sort every frame — no
    sleeping, no cache reuse)."""
    if w_tiles is None:
        w_tiles = default_w_tiles(state.x.shape[0])
    n = state.x.shape[0]
    axis = pbd.principal_axis(state.x, state.active)
    key = jnp.where(state.active, state.x @ axis, jnp.float32(3e38))
    perm = jnp.argsort(key)
    state_s = pbd._permute_state(state, perm)
    inv = jnp.zeros(n, jnp.int32).at[perm].set(
        jnp.arange(n, dtype=jnp.int32))
    xc_s = xc.replace(
        sp_idx=inv[xc.sp_idx],
        tri_idx=inv[xc.tri_idx],
        fluid=xc.fluid[perm],
        cloth=xc.cloth[perm],
        soft=xc.soft[perm] if xc.soft.shape[0] == n else xc.soft,
    )
    if xc.has_clusters:
        xc_s = xc_s.replace(cl_w=xc.cl_w[:, perm],
                            cl_rest=xc.cl_rest[:, perm])
    state_s, xc_s = _step_sorted_xpbd(state_s, xc_s, params, colliders,
                                      w_tiles=w_tiles)
    xc_out = xc.replace(cl_quat=xc_s.cl_quat)
    if xc.has_clusters:
        xc_out = xc_out.replace(cl_rest=xc_s.cl_rest[:, inv])
    return pbd.unsort_state(state_s), xc_out


@functools.partial(jax.jit, static_argnames=("n_frames", "w_tiles"))
def run_frames(state: SimState, xc: XConstraints, params: SimParams,
               colliders: Colliders, n_frames: int,
               w_tiles: int | None = None):
    """``n_frames`` display frames fused into ONE XLA program (lax.scan
    over step_frame_xpbd, re-sorting inside the scan) — the measurement
    and batch-rollout entry point: per-frame host dispatch would dominate
    on small scenes through the remote-chip tunnel."""
    if w_tiles is None:
        w_tiles = default_w_tiles(state.x.shape[0])

    def body(carry, _):
        st, xcc = carry
        st, xcc = step_frame_xpbd(st, xcc, params, colliders,
                                  w_tiles=w_tiles)
        return (st, xcc), None

    (state, xc), _ = jax.lax.scan(body, (state, xc), None, length=n_frames)
    return state, xc
