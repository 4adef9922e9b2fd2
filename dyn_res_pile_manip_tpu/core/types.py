"""Core pytree types for the TPU-native PBD simulator.

These replace the reference's global-state C++ runtime buffers
(PyFleX/bindings/pyflex.cpp:543-1010 SimBuffers) with immutable JAX pytrees:
arrays live on device, there is no map/unmap choreography, and a simulation
step is a pure function SimState -> SimState.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct


class SimParams(struct.PyTreeNode):
    """Solver parameters (subset of NvFlexParams actually exercised by the
    granular scenes; semantics from PyFleX/include/NvFlex.h:95-154 and the
    yx_carrots scene defaults, PyFleX/bindings/scenes/yx_carrots.h:107-120).

    Auto-derived values follow pyflex.cpp's Init defaults: for granular
    scenes solid_rest_distance = radius and collision_distance =
    0.5 * radius when unset.
    """

    radius: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.075))
    static_friction: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))
    dynamic_friction: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.9))
    restitution: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.2))
    damping: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.14))
    shock_propagation: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(6.0))
    sleep_threshold: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.075 * 0.25))
    collision_distance: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.075 * 0.5))
    particle_collision_margin: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.075 * 0.25))
    shape_collision_margin: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.075 * 0.25))
    relaxation_factor: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))
    rigid_stiffness: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.8))
    max_speed: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1e6))
    gravity_y: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(-9.8))
    # structural (static under jit)
    dt: float = struct.field(pytree_node=False, default=1.0 / 60.0)
    num_substeps: int = struct.field(pytree_node=False, default=2)
    num_iterations: int = struct.field(pytree_node=False, default=12)

    @classmethod
    def granular(cls, radius: float = 0.075, static_friction: float = 1.0,
                 dynamic_friction: float = 0.9, **kw) -> "SimParams":
        """Granular-pile defaults (yx_carrots.h:107-120)."""
        r = float(radius)
        defaults = dict(
            radius=jnp.float32(r),
            static_friction=jnp.float32(static_friction),
            dynamic_friction=jnp.float32(dynamic_friction),
            restitution=jnp.float32(0.2),
            damping=jnp.float32(0.14),
            shock_propagation=jnp.float32(6.0),
            sleep_threshold=jnp.float32(r * 0.25),
            collision_distance=jnp.float32(r * 0.5),
            particle_collision_margin=jnp.float32(r * 0.25),
            shape_collision_margin=jnp.float32(r * 0.25),
        )
        defaults.update(kw)
        return cls(**defaults)


class SimState(struct.PyTreeNode):
    """Particle state, capacity-padded to a static N for jit stability.

    x / v: (N, 3) positions and velocities.
    invm: (N,) inverse mass (0.2 for the carrot particles; 0 = locked).
    group: (N,) int32 rigid-group id; -1 for free (non-rigid) particles and
        padding. Particles sharing a group id do not self-collide
        (NvFlexMakePhase(group, 0) semantics, NvFlex.h:160-176).
    active: (N,) bool validity mask for the padded tail.
    rest: (N, 3) body-local coordinates relative to the group's rest COM
        (used by shape matching; pyflex.cpp:883-910 rigid COM setup).
    group_quat: (G, 4) per-group rotation (wxyz), warm-starts the polar
        decomposition in shape matching.
    """

    x: jnp.ndarray
    v: jnp.ndarray
    invm: jnp.ndarray
    group: jnp.ndarray
    active: jnp.ndarray
    rest: jnp.ndarray
    group_quat: jnp.ndarray
    # original particle ids when the state is in solver (x-sorted) order;
    # None = external order. sim.pbd.sort_state / unsort_state maintain it.
    order: jnp.ndarray | None = None
    # (N,) bool: particle was put to rest by the sleep clamp while being
    # solved — i.e. it is at a supported equilibrium, so the active-set
    # solver may freeze it (NvFlexParams::sleepThreshold semantics plus
    # FleX's per-particle sleep bookkeeping). None = never slept (fresh
    # scenes must fall). Materialized by sim.pbd.build_cache.
    slept: jnp.ndarray | None = None

    @property
    def capacity(self) -> int:
        return self.x.shape[0]

    @property
    def num_groups(self) -> int:
        return self.group_quat.shape[0]


class Colliders(struct.PyTreeNode):
    """Static + kinematic analytic colliders.

    planes: (P, 4) half-spaces n.x + d >= 0 that particles must stay inside
        (FleX g_params.planes; carrots uses numPlanes=1, the ground).
    boxes: oriented boxes. The granular workload animates yaw about +y
        only (box_yaw — walls and the pusher); general orientations
        compose through box_quat (R = yaw_rot @ quat_mat), used by
        tilting kinematic shapes like the FluidPour pourer. box 0 is
        reserved for the kinematic pusher; its pose and velocity are
        animated per frame by the env.
    """

    planes: jnp.ndarray        # (P, 4)
    box_center: jnp.ndarray    # (B, 3)
    box_half: jnp.ndarray      # (B, 3)
    box_yaw: jnp.ndarray       # (B,)
    box_active: jnp.ndarray    # (B,) bool
    box_vel: jnp.ndarray       # (B, 3) kinematic velocity (for friction)
    # kinematic capsules (AddCapsule parity, helpers.h:713-760)
    cap_p0: jnp.ndarray        # (C, 3) segment start
    cap_p1: jnp.ndarray        # (C, 3) segment end
    cap_radius: jnp.ndarray    # (C,)
    cap_active: jnp.ndarray    # (C,) bool
    cap_vel: jnp.ndarray       # (C, 3)
    # full box orientation (wxyz, world<-local), composed ON TOP of
    # box_yaw: R = yaw_rot(yaw) @ quat_mat(quat). Identity for the
    # granular workload (pusher/walls are yaw-only); general-quat shapes
    # (e.g. the FluidPour tilting glass) set yaw=0 and this quat. Empty
    # (0, 4) only as the dataclass default — constructors materialize it.
    box_quat: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros((0, 4), jnp.float32))
    # kinematic triangle meshes, baked to SDF grids at build time
    # (AddTriangleMesh parity, helpers.h:713-760; see sim/sdf.py).
    # All grids share resolution sim.sdf.SDF_RES; M grows host-side via
    # with_mesh (one recompile per scene build, like FleX's BVH upload).
    mesh_sdf: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros((0, 1, 1, 1), jnp.float32))
    mesh_lower: jnp.ndarray = struct.field(      # (M, 3) grid lower, local
        default_factory=lambda: jnp.zeros((0, 3), jnp.float32))
    mesh_inv_spacing: jnp.ndarray = struct.field(  # (M,) 1/voxel edge
        default_factory=lambda: jnp.zeros((0,), jnp.float32))
    mesh_pos: jnp.ndarray = struct.field(        # (M, 3) world translation
        default_factory=lambda: jnp.zeros((0, 3), jnp.float32))
    mesh_quat: jnp.ndarray = struct.field(       # (M, 4) wxyz world<-local
        default_factory=lambda: jnp.zeros((0, 4), jnp.float32))
    mesh_active: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros((0,), bool))
    mesh_vel: jnp.ndarray = struct.field(        # (M, 3) surface velocity
        default_factory=lambda: jnp.zeros((0, 3), jnp.float32))

    @classmethod
    def ground_only(cls, num_boxes: int = 5,
                    num_capsules: int = 2) -> "Colliders":
        return cls(
            planes=jnp.array([[0.0, 1.0, 0.0, 0.0]], dtype=jnp.float32),
            box_center=jnp.zeros((num_boxes, 3), dtype=jnp.float32),
            box_half=jnp.zeros((num_boxes, 3), dtype=jnp.float32),
            box_yaw=jnp.zeros((num_boxes,), dtype=jnp.float32),
            box_active=jnp.zeros((num_boxes,), dtype=bool),
            box_vel=jnp.zeros((num_boxes, 3), dtype=jnp.float32),
            cap_p0=jnp.zeros((num_capsules, 3), dtype=jnp.float32),
            cap_p1=jnp.ones((num_capsules, 3), dtype=jnp.float32),
            cap_radius=jnp.zeros((num_capsules,), dtype=jnp.float32),
            cap_active=jnp.zeros((num_capsules,), dtype=bool),
            cap_vel=jnp.zeros((num_capsules, 3), dtype=jnp.float32),
            box_quat=jnp.tile(
                jnp.array([[1.0, 0.0, 0.0, 0.0]], dtype=jnp.float32),
                (num_boxes, 1)),
        )

    def with_capsule(self, i: int, p0, p1, radius, active=True,
                     vel=(0.0, 0.0, 0.0)) -> "Colliders":
        return self.replace(
            cap_p0=self.cap_p0.at[i].set(jnp.asarray(p0, jnp.float32)),
            cap_p1=self.cap_p1.at[i].set(jnp.asarray(p1, jnp.float32)),
            cap_radius=self.cap_radius.at[i].set(jnp.float32(radius)),
            cap_active=self.cap_active.at[i].set(active),
            cap_vel=self.cap_vel.at[i].set(jnp.asarray(vel, jnp.float32)),
        )

    def with_mesh(self, sdf, lower, spacing, pos=(0.0, 0.0, 0.0),
                  quat=(1.0, 0.0, 0.0, 0.0), active=True,
                  vel=(0.0, 0.0, 0.0)) -> "Colliders":
        """Append a baked mesh SDF (host-side; grows M by one)."""
        sdf = jnp.asarray(sdf, jnp.float32)
        if self.mesh_sdf.shape[0] == 0:
            grids = sdf[None]
        else:
            grids = jnp.concatenate([self.mesh_sdf, sdf[None]], axis=0)
        cat = lambda a, b: jnp.concatenate(
            [a, jnp.asarray(b, a.dtype)[None]], axis=0)
        return self.replace(
            mesh_sdf=grids,
            mesh_lower=cat(self.mesh_lower, lower),
            mesh_inv_spacing=cat(self.mesh_inv_spacing, 1.0 / float(spacing)),
            mesh_pos=cat(self.mesh_pos, pos),
            mesh_quat=cat(self.mesh_quat, quat),
            mesh_active=cat(self.mesh_active, bool(active)),
            mesh_vel=cat(self.mesh_vel, vel),
        )

    def set_mesh_state(self, i: int, pos, quat,
                       vel=(0.0, 0.0, 0.0)) -> "Colliders":
        """Kinematic pose update for mesh i (wxyz quat)."""
        return self.replace(
            mesh_pos=self.mesh_pos.at[i].set(jnp.asarray(pos, jnp.float32)),
            mesh_quat=self.mesh_quat.at[i].set(
                jnp.asarray(quat, jnp.float32)),
            mesh_vel=self.mesh_vel.at[i].set(jnp.asarray(vel, jnp.float32)),
        )

    def with_box(self, i: int, center, half, yaw=0.0, active=True,
                 vel=(0.0, 0.0, 0.0), quat=None) -> "Colliders":
        """quat: optional full orientation (wxyz); composed with yaw
        (see box_quat). Pass quat for tilted shapes, yaw for the
        granular pusher/walls."""
        out = self.replace(
            box_center=self.box_center.at[i].set(jnp.asarray(center, jnp.float32)),
            box_half=self.box_half.at[i].set(jnp.asarray(half, jnp.float32)),
            box_yaw=self.box_yaw.at[i].set(jnp.float32(yaw)),
            box_active=self.box_active.at[i].set(active),
            box_vel=self.box_vel.at[i].set(jnp.asarray(vel, jnp.float32)),
        )
        if quat is not None:
            out = out.replace(box_quat=self.box_quat.at[i].set(
                jnp.asarray(quat, jnp.float32)))
        return out


def pad_capacity(n: int, multiple: int = 1024) -> int:
    """Round particle count up to a bucketed capacity to bound recompiles."""
    return int(np.ceil(max(n, 1) / multiple) * multiple)
