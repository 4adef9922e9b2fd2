"""pyflex-compatible module API over the TPU simulator.

Mirrors the Python-visible surface of the reference's pybind11 module
(PyFleX/bindings/pyflex.cpp:3794-3876): init / set_scene / step / render /
get_positions / set_positions / add_box / set_shape_states / camera
getters-setters / clean — so reference-style smoke scripts
(PyFleX/bindings/examples/test_*.py) port with an import swap.

Robot-mesh mirroring (add_mesh + per-link shape states) is intentionally a
kinematic no-op: the physics-relevant end effector is the pusher board the
env drives directly (see env/pusher.py).
"""
from __future__ import annotations

import numpy as np

from .core.camera import Camera, projection_matrix, view_matrix
from .core.types import Colliders
from .env import scene as scene_lib
from .env import scenes_extra  # noqa: F401  (registers scenes 0-19)
from .render import raster
from .sim import pbd, xpbd


class _Runtime:
    def __init__(self):
        self.screen_w = 720
        self.screen_h = 720
        self.cam_pos = np.array([0.0, 18.0, 0.0])
        self.cam_angle = np.array([0.0, -np.pi / 2.0, 0.0])
        self.light_dir = np.array([0.1, 2.0, 0.1])
        self.light_fov = 70.0
        self.state = None
        self.sim_params = None
        self.build = None
        self.colliders = Colliders.ground_only(num_boxes=8)
        self.n_boxes = 1  # slot 0 reserved for a kinematic pusher
        self.n_capsules = 0
        self.shapes = []  # user shape registry, in add order: (kind, idx)
        self.grid = pbd.default_grid(24.0)
        self.seed = 0
        # XPBD scene families (fluids / springs / cloth; sim/xpbd.py)
        self.xc = None
        self.w_tiles = None
        self.grabbed = None  # cloth_manip grabbed control point
        self.phases = None   # set_phases override (colors by phase id)
        self.box_colors = {}  # box collider idx -> explicit RGB
        # capacity bucket (tests shrink it for small-scene speed; must
        # stay a multiple of sim.pbd.TILE)
        self.capacity_multiple = 1024


_rt = _Runtime()


def init(headless: bool = True, *_args):
    return None


def clean():
    _rt.state = None


def set_screenWidth(w):
    _rt.screen_w = int(w)


def set_screenHeight(h):
    _rt.screen_h = int(h)


def set_light_dir(d):
    _rt.light_dir = np.asarray(d)


def set_light_fov(f):
    _rt.light_fov = float(f)


def set_camPos(p):
    _rt.cam_pos = np.asarray(p, dtype=np.float64)


def set_camAngle(a):
    _rt.cam_angle = np.asarray(a, dtype=np.float64)


def get_camPos():
    return _rt.cam_pos.copy()


def get_camAngle():
    return _rt.cam_angle.copy()


def set_scene(idx, scene_params, thread_idx=0):
    import jax.numpy as jnp

    _rt.seed += 1
    state, params, build = scene_lib.set_scene(
        int(idx), np.asarray(scene_params, np.float64), seed=_rt.seed,
        capacity_multiple=_rt.capacity_multiple)
    _rt.state, _rt.sim_params, _rt.build = state, params, build
    _rt.colliders = Colliders.ground_only(num_boxes=8)
    _rt.n_boxes = 1
    _rt.n_capsules = 0
    _rt.shapes = []
    _rt.grabbed = None
    _rt.phases = None
    _rt.box_colors = {}
    if build.extra_planes is not None:
        # numPlanes > 1: the scene's own boundary walls (pyflex.cpp:793-798)
        _rt.colliders = _rt.colliders.replace(
            planes=jnp.asarray(build.extra_planes, jnp.float32))
    if build.uses_xpbd:
        cap = state.capacity
        _rt.xc = xpbd.XConstraints.build(
            cap, springs=build.springs, fluid_mask=build.fluid_mask,
            triangles=build.triangles,
            **build.xparams).attach_cluster_rest(state.x)
        _rt.w_tiles = xpbd.default_w_tiles(cap)
    else:
        _rt.xc = None
        _rt.w_tiles = None


def get_n_particles():
    return int(np.asarray(_rt.state.active).sum())


def get_positions():
    act = np.asarray(_rt.state.active)
    xs = np.asarray(_rt.state.x)[act]
    invm = np.asarray(_rt.state.invm)[act]
    return np.concatenate([xs, invm[:, None]], axis=1).reshape(-1)


def _scene_bounds():
    """Particle AABB expanded by the interaction radius — the same rule
    FleX uses to seed g_sceneLower/g_sceneUpper from GetParticleBounds
    (pyflex.cpp Init: bounds expanded by collision margin)."""
    act = np.asarray(_rt.state.active)
    xs = np.asarray(_rt.state.x)[act]
    r = float(_rt.sim_params.radius)
    return xs.min(axis=0) - r, xs.max(axis=0) + r


def get_scene_lower():
    """pyflex.get_scene_upper/lower (pyflex.cpp:3840-3850)."""
    lo, _ = _scene_bounds()
    return lo


def get_scene_upper():
    _, hi = _scene_bounds()
    return hi


def set_positions(positions):
    import jax.numpy as jnp

    pos = np.asarray(positions).reshape(-1, 4)
    x = np.asarray(_rt.state.x).copy()
    x[:pos.shape[0]] = pos[:, :3]
    # slept=None: overwritten configurations re-settle from all-awake
    _rt.state = _rt.state.replace(x=jnp.asarray(x),
                                  v=jnp.zeros_like(_rt.state.v),
                                  slept=None)


def get_velocities():
    """Active-particle velocities, flat (n*3,) (pyflex.get_velocities,
    pyflex.cpp pybind surface)."""
    act = np.asarray(_rt.state.active)
    return np.asarray(_rt.state.v)[act].reshape(-1).copy()


def set_velocities(velocities):
    import jax.numpy as jnp

    vel = np.asarray(velocities).reshape(-1, 3)
    v = np.asarray(_rt.state.v).copy()
    v[:vel.shape[0]] = vel
    _rt.state = _rt.state.replace(v=jnp.asarray(v), slept=None)


def get_phases():
    """Per-particle phase ids, flat (n,) (pyflex.get_phases). FleX packs
    NvFlexMakePhase(group, flags) ints; the analog here is the rigid
    group id (-1 = free particle), which carries the same collision-
    filtering meaning (NvFlex.h:160-176)."""
    act = np.asarray(_rt.state.active)
    if _rt.phases is not None:
        return _rt.phases[act].copy()
    return np.asarray(_rt.state.group)[act].reshape(-1).copy()


# FleX's DrawPoints colors particles from the fixed g_colors table indexed
# by phase (pyflex.cpp:1183-1400); same role here.
PHASE_PALETTE = np.array([
    [0.00, 0.50, 1.00], [0.80, 0.20, 0.20], [0.20, 0.80, 0.30],
    [0.95, 0.80, 0.10], [0.70, 0.30, 0.90], [0.10, 0.80, 0.80],
    [0.95, 0.50, 0.20], [0.60, 0.60, 0.60]])


def set_phases(phases):
    """Recolor particles by phase id (pyflex.set_phases; FleX re-phases
    collision filtering too — here rigid constraints are fixed at
    set_scene, matching FleX where clusters come from CreateParticleShape,
    and only the rendered color follows the new phases)."""
    ph = np.asarray(phases, np.int64).reshape(-1)
    full = np.zeros(int(_rt.state.x.shape[0]), np.int64)
    act = np.flatnonzero(np.asarray(_rt.state.active))
    full[act[:len(ph)]] = ph[:len(act)]
    _rt.phases = full


def _apply_update_params(update_params):
    """Per-scene Update() semantics: move pinned control particles by the
    given deltas (yz_massrope.h:100-117, yz_flag.h:89-127,
    yz_clothmanip.h:104-130 grab/release)."""
    import jax.numpy as jnp

    u = np.asarray(update_params, np.float64).reshape(-1)
    kind = _rt.build.scene_kind
    ctrl = _rt.build.control_idx or []
    dt = _rt.sim_params.dt
    x = np.asarray(_rt.state.x).copy()
    v = np.asarray(_rt.state.v).copy()
    invm = None
    if kind == "mass_rope" and len(ctrl) >= 1:
        moves = [(ctrl[0], u[0:3])]
    elif kind == "flag" and len(ctrl) >= 2:
        moves = [(ctrl[0], u[0:3]), (ctrl[1], u[3:6])]
    elif kind == "cloth_rigid":
        # all 4 pinned corners move together (yz_clothrigid.h:150-190)
        moves = [(c, u[0:3]) for c in ctrl]
    elif kind == "soft_rod":
        # [dx, dz, idx...]: drag listed particles (yz_softrod.h:395-413)
        d = np.array([u[0], 0.0, u[1]])
        moves = [(int(i), d) for i in u[2:]]
    elif kind == "cloth_manip":
        c = ctrl[int(u[0])]
        invm = np.asarray(_rt.state.invm).copy()
        if _rt.grabbed is not None and _rt.grabbed != c:
            invm[_rt.grabbed] = float(_rt.build.invm[_rt.grabbed])
        invm[c] = 0.0
        _rt.grabbed = c
        moves = [(c, u[1:4])]
    else:
        return
    for i, d in moves:
        x[i] += d
        v[i] = d / dt
    st = _rt.state.replace(x=jnp.asarray(x), v=jnp.asarray(v))
    if invm is not None:
        st = st.replace(invm=jnp.asarray(invm))
    _rt.state = st


def step(update_params=None, *_args, **_kw):
    if _rt.xc is not None:
        if update_params is not None:
            _apply_update_params(update_params)
        _rt.state, _rt.xc = xpbd.step_frame_xpbd(
            _rt.state, _rt.xc, _rt.sim_params, _rt.colliders,
            w_tiles=_rt.w_tiles)
        return
    lower, dims = _rt.grid
    _rt.state = pbd.step_frame(_rt.state, _rt.sim_params, _rt.colliders,
                               lower, dims)


def _yaw_from_quat(q):
    x, y, z, w = [float(v) for v in q]
    return np.arctan2(2.0 * (w * y + x * z), 1.0 - 2.0 * (y * y + z * z))


def _ensure_box_capacity(n):
    """Grow the padded box-collider arrays so slot ``n`` exists (the
    static capacity is a compile-shape choice, not a scene limit; a grow
    retraces the jitted step/render once)."""
    import jax.numpy as jnp

    col = _rt.colliders
    cap = col.box_center.shape[0]
    if n < cap:
        return
    pad = max(cap, n + 1 - cap)
    _rt.colliders = col.replace(
        box_center=jnp.concatenate(
            [col.box_center, jnp.zeros((pad, 3), jnp.float32)]),
        box_half=jnp.concatenate(
            [col.box_half, jnp.zeros((pad, 3), jnp.float32)]),
        box_yaw=jnp.concatenate(
            [col.box_yaw, jnp.zeros((pad,), jnp.float32)]),
        box_active=jnp.concatenate(
            [col.box_active, jnp.zeros((pad,), bool)]),
        box_vel=jnp.concatenate(
            [col.box_vel, jnp.zeros((pad, 3), jnp.float32)]),
        box_quat=jnp.concatenate(
            [col.box_quat, jnp.tile(
                jnp.array([[1.0, 0.0, 0.0, 0.0]], jnp.float32),
                (pad, 1))]),
    )


def add_box(halfEdge, center, quat, hideShape=0, color=None):
    b = _rt.n_boxes
    _ensure_box_capacity(b)
    # store the FULL orientation (pyflex xyzw -> internal wxyz, yaw=0);
    # tilted shapes (test_FluidPour pourer) collide and render exactly
    _rt.colliders = _rt.colliders.with_box(
        b, np.asarray(center), np.asarray(halfEdge),
        yaw=0.0, quat=_wxyz(quat), active=True)
    if color is not None:
        _rt.box_colors[b] = np.asarray(color, np.float64).reshape(3)
    _rt.n_boxes += 1
    _rt.shapes.append(("box", b))
    return len(_rt.shapes) - 1


def add_capsule(radius, half_length, center, quat, hideShape=0,
                color=None):
    """Kinematic capsule along the local x-axis (AddCapsule parity)."""
    import numpy as _np

    x, y, z, w = [float(v) for v in quat]
    # rotate the local x axis by the quaternion
    axis = _np.array([1 - 2 * (y * y + z * z),
                      2 * (x * y + z * w),
                      2 * (x * z - y * w)])
    c = _np.asarray(center, dtype=_np.float64)
    i = _rt.n_capsules
    _rt.colliders = _rt.colliders.with_capsule(
        i, c - axis * half_length, c + axis * half_length, radius,
        active=True)
    _rt.n_capsules += 1
    _rt.shapes.append(("capsule", i))
    return len(_rt.shapes) - 1


def add_mesh(path, scaling, hideShape=0, color=None):
    """Register a triangle mesh as a kinematic collider (AddTriangleMesh,
    helpers.h:713-760). The mesh is baked to an SDF grid once (sim/sdf.py);
    its pose is then driven through set_shape_states like any shape."""
    from .sim.sdf import build_mesh_sdf
    from .utils.mesh import import_mesh

    verts, faces = import_mesh(path)
    sdf, lower, spacing = build_mesh_sdf(verts, faces,
                                         scale=float(scaling))
    m = _rt.colliders.mesh_sdf.shape[0]
    _rt.colliders = _rt.colliders.with_mesh(sdf, lower, spacing)
    _rt.shapes.append(("mesh", m))
    return len(_rt.shapes) - 1


def _wxyz(q):
    x, y, z, w = [float(v) for v in q]
    return np.array([w, x, y, z])


def set_shape_states(states):
    """states: (S, 14) rows [pos(3), prev(3), quat(4) xyzw, prev_quat(4)],
    one row per user-added shape in add order (pyflex.cpp shape-state
    layout); extra rows are ignored."""
    states = np.asarray(states).reshape(-1, 14)
    col = _rt.colliders
    dt = _rt.sim_params.dt if _rt.sim_params is not None else 1.0 / 60.0
    for i in range(min(states.shape[0], len(_rt.shapes))):
        kind, idx = _rt.shapes[i]
        # surface velocity from the (pos, prev_pos) pair the caller
        # provides (pyflex 14-float shape-state rows) — a kinematic shape
        # swept through set_shape_states must register as MOVING for both
        # the friction term and the sleeping solver's wake scan
        vel = (states[i, :3] - states[i, 3:6]) / dt
        if kind == "box":
            col = col.with_box(idx, states[i, :3], np.asarray(
                col.box_half[idx]), yaw=0.0,
                quat=_wxyz(states[i, 6:10]), active=True, vel=vel)
        elif kind == "mesh":
            col = col.set_mesh_state(idx, states[i, :3],
                                     _wxyz(states[i, 6:10]), vel=vel)
        # capsules: pose changes unused by current scenes (static tools)
    _rt.colliders = col


def get_shape_states():
    col = _rt.colliders
    out = np.zeros((len(_rt.shapes), 14))
    for row, (kind, idx) in enumerate(_rt.shapes):
        if kind == "box":
            c = np.asarray(col.box_center[idx])
            yaw = float(col.box_yaw[idx])
            qy = np.array([np.cos(yaw / 2), 0.0, np.sin(yaw / 2), 0.0])
            w2, x2, y2, z2 = np.asarray(col.box_quat[idx])
            # compose q_total = q_yaw * q_box (wxyz), report as xyzw
            w1, x1, y1, z1 = qy
            q = np.array([
                w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
                w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
                w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
                w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            ])  # Hamilton product, emitted directly in xyzw order
        elif kind == "mesh":
            c = np.asarray(col.mesh_pos[idx])
            w, x, y, z = np.asarray(col.mesh_quat[idx])
            q = np.array([x, y, z, w])
        else:  # capsule: report the segment midpoint, identity rotation
            c = 0.5 * (np.asarray(col.cap_p0[idx])
                       + np.asarray(col.cap_p1[idx]))
            q = np.array([0.0, 0.0, 0.0, 1.0])
        out[row] = np.concatenate([c, c, q, q])
    return out


def _camera():
    return Camera(width=_rt.screen_w, height=_rt.screen_h,
                  cam_pos=tuple(_rt.cam_pos), cam_angle=tuple(_rt.cam_angle))


def render(render_depth: bool = True, *_args):
    import jax.numpy as jnp

    cam = _camera()
    fx, fy, cx, cy = cam.cam_params()
    draw_r = float(_rt.sim_params.radius) * 0.5
    expand = None
    if _rt.xc is not None:
        # close-up small-scale scenes: widen the splat footprint to the
        # projected pixel radius at the median particle depth (quantized
        # to bound recompiles)
        T = np.asarray(cam.opencv_from_world())
        act = np.asarray(_rt.state.active)
        xs = np.asarray(_rt.state.x)[act]
        z = (xs @ T[:3, :3].T + T[:3, 3])[:, 2]
        z_med = float(np.median(z[z > 0.05])) if (z > 0.05).any() else 1.0
        px_r = draw_r * fx / max(z_med, 1e-3)
        expand = int(np.clip(2 * round(np.ceil(px_r) / 2), 2, 6))
    color = np.asarray(_rt.build.color, np.float64)
    if _rt.phases is not None:
        color = PHASE_PALETTE[_rt.phases % len(PHASE_PALETTE)]
    box_colors = None
    if _rt.box_colors:
        box_colors = np.broadcast_to(
            np.asarray(raster.BOX_COLOR),
            (_rt.colliders.box_center.shape[0], 3)).copy()
        for b, c in _rt.box_colors.items():
            box_colors[b] = c
        box_colors = jnp.asarray(box_colors, jnp.float32)
    obs = raster.render_rgbd(
        _rt.state.x, _rt.state.active, _rt.colliders,
        jnp.asarray(cam.opencv_from_world(), jnp.float32), fx, fy, cx, cy,
        jnp.asarray(color, jnp.float32),
        jnp.float32(draw_r),
        width=cam.width, height=cam.height, expand=expand,
        box_colors=box_colors)
    obs = np.asarray(obs)
    if not render_depth:
        obs = obs[..., :4]
    return obs.reshape(-1)


def get_projMatrix():
    return projection_matrix(_rt.screen_w, _rt.screen_h).T.reshape(-1)


def get_viewMatrix():
    return view_matrix(_rt.cam_pos, _rt.cam_angle).T.reshape(-1)
