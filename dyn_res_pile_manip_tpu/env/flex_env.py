"""FlexEnv: the gym-style pile-pushing environment, TPU-native.

API-compatible re-design of the reference env (env/flex_env.py:160-1161):
reset / step / render / obs2ptcl* / sample_action / clip_action /
get_positions / set_positions / get_cam_params / get_cam_extrinsics /
step_subgoal_ptcl / close, driven by the JAX PBD simulator + splat renderer
instead of pyflex, and by a scripted kinematic pusher board instead of
PyBullet IK (the reference's IK exists only to pose an arm whose custom
pusher end-effector follows the same waypoints; see env/pusher.py).

Whole pushes (waypoint sweep + 200 settle frames) compile into a single
XLA program via scan; observations are rendered on device.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core.camera import Camera
from ..core.types import Colliders, SimState
from ..render import raster
from ..sim import pbd
from ..utils import pointcloud as pc
from . import presets, pusher, scene

FG_THRESHOLD = 0.599 / 0.8  # foreground depth threshold (flex_env.py:912)


def _ccw(a, b, c):
    return (c[1] - a[1]) * (b[0] - a[0]) > (b[1] - a[1]) * (c[0] - a[0])


def intersect(a, b, c, d):
    return _ccw(a, c, d) != _ccw(b, c, d) and _ccw(a, b, c) != _ccw(a, b, d)


# Max frames per neighbor-cache build. Contact correctness is enforced by
# the displacement trigger (pbd.cache_stale: any particle moving more than
# half the collision margin forces a rebuild — CLAUDE.md physics lesson);
# this is only a safety heartbeat. It also bounds kinematic-wake staleness:
# 16 frames x pusher speed 0.02/frame = 0.32 << the 8-radius wake distance.
REBUILD_EVERY = 16


@functools.partial(jax.jit,
                   static_argnames=("grid_dims", "n_frames", "use_pallas"))
def _run_frames(state: SimState, params, colliders: Colliders,
                push_center, push_yaw, push_vel, push_active,
                grid_lower, grid_dims, n_frames: int,
                use_pallas: bool = False) -> SimState:
    """scan ``n_frames`` sim frames with per-frame pusher poses; the
    neighbor cache is rebuilt every REBUILD_EVERY frames (the solver's
    collision margin covers the intervening motion)."""
    half = jnp.asarray(pusher.pusher_half_extents())
    state, cache0 = pbd.build_cache(state, params,
                                    with_pair_mask=not use_pallas)

    def frame(carry, inputs):
        st, cache = carry
        i, c, yw, vl, act = inputs

        # sleep skip: a fully-at-rest scene with the pusher parked is a
        # fixed point of the solver (settle tails dominate push frames);
        # a heartbeat frame every 8th bounds any sleep-clamp artifact
        asleep = (jnp.max(jnp.abs(st.v)) == 0.0) & ~act & ((i % 8) != 0)

        def run(st, cache):
            col = colliders.replace(
                box_center=colliders.box_center.at[0].set(c),
                box_half=colliders.box_half.at[0].set(half),
                box_yaw=colliders.box_yaw.at[0].set(yw),
                box_active=colliders.box_active.at[0].set(act),
                box_vel=colliders.box_vel.at[0].set(vl))
            # rebuild on displacement staleness, on the slow heartbeat, or
            # every other frame while the kinematic pusher is active (a
            # moving collider must keep waking particles ahead of contact
            # even when no particle has moved yet)
            st, cache = jax.lax.cond(
                ((i % REBUILD_EVERY) == 0)
                | (act & ((i % 2) == 0))
                | pbd.cache_stale(st, params, cache),
                lambda: pbd.build_cache(st, params,
                                        with_pair_mask=not use_pallas,
                                        colliders=col),
                lambda: (st, cache))
            st = pbd.step_frame(st, params, col, cache=cache,
                                use_pallas=use_pallas)
            return st, cache

        st, cache = jax.lax.cond(asleep, lambda s, ch: (s, ch), run,
                                 st, cache)
        return (st, cache), None

    idx = jnp.arange(n_frames)
    (state, _), _ = jax.lax.scan(
        frame, (state, cache0),
        (idx, push_center, push_yaw, push_vel, push_active),
        length=n_frames)
    return pbd.unsort_state(state)


class FlexEnv:
    """Drop-in equivalent of the reference FlexEnv (sim only; is_real=False).

    config: the same nested dict as config/mpc/config.yaml et al.
    """

    def __init__(self, config=None):
        self.is_real = False
        self.config = config
        ds = config["dataset"]
        self.screenWidth = 720
        self.screenHeight = 720
        self.wkspc_w = ds["wkspc_w"]
        self.headless = ds.get("headless", True)
        self.obj = ds["obj"]
        self.global_scale = ds["global_scale"]
        self.cont_motion = ds.get("cont_motion", False)
        self.init_pos = ds["init_pos"]
        self.robot_type = ds.get("robot_type", "franka")
        self.img_channel = 1
        self.act_dim = 4

        self.camera = Camera.default(self.global_scale, ds.get("cam_idx", 0),
                                     self.screenWidth, self.screenHeight)
        self._cv_from_world = jnp.asarray(self.camera.opencv_from_world(),
                                          jnp.float32)
        self._grid_lower, self._grid_dims = pbd.default_grid(self.global_scale)
        self._rng = np.random.default_rng()
        self._seed_counter = 0
        self.last_ee = None
        # filled by reset()
        self.state = None
        self.sim_params = None
        self.colliders = None
        self.scene_build = None

    # ------------------------------------------------------------------ reset
    def seed(self, seed: int):
        self._rng = np.random.default_rng(seed)
        self._seed_counter = int(seed)

    def reset(self):
        gs = self.global_scale
        self._seed_counter += 1
        seed = int(self._rng.integers(0, 2 ** 31 - 1))
        if self.obj == "coffee":
            scale = 0.2 * gs / 8.0
            self.scene_params = np.array([
                scale, -0.9 * gs / 8.0, 0.5, -0.9 * gs / 8.0,
                0.0, 1.0, 1.0, 1000])
            idx = 20
        elif self.obj == "ball":
            scale = 0.7
            self.init_x = self.init_y = self.init_z = scale / 2 + (-scale / 2)
            self.scene_params = np.array([
                scale, -scale / 2, 0.0, -scale / 2, 1.0, 0.7,
                self.config["dataset"]["particle_r"]])
            idx = 18
        elif self.obj == "capsule":
            scale = 0.2 * gs / 8.0
            self.scene_params = np.array([
                scale, -1.0 * gs / 8.0, 0.5, -1.0 * gs / 8.0,
                0.0, 0.5, 1.0, 200, 10, 20])
            idx = 21
        elif self.obj == "carrots":
            self.cvx_region = np.array(
                [[-self.wkspc_w, self.wkspc_w, -self.wkspc_w, self.wkspc_w]])
            self.scene_params = presets.carrots_scene_params(
                self.init_pos, gs, self._rng)
            idx = 22
        elif self.obj == "coffee_capsule":
            s = 0.2 * gs / 8.0
            self.scene_params = np.array([
                s, -1.5 * gs / 8.0, 0.5, -1.2 * gs / 8.0, 0.0, 1.0, 1.0, 100,
                s, 0.0 * gs / 8.0, 0.5, -1.2 * gs / 8.0, 200, 10, 20])
            idx = 23
        else:
            raise ValueError(f"obj not defined: {self.obj}")

        state, sim_params, build = scene.set_scene(idx, self.scene_params,
                                                   seed=seed)
        self._use_pallas = pbd.resolve_pallas(state)
        self.state = state
        self.sim_params = sim_params
        self.scene_build = build
        self.n_particles = int(np.asarray(state.active).sum())

        # IK-posed arm for the video/demo renders (flex_env.py:849-853
        # base poses; physics stays on the pusher board, see env/robot.py)
        from .robot import FlexRobotHelper
        self.robot_helper = FlexRobotHelper()
        if self.robot_type == "franka":
            self.robot_helper.loadURDF(
                "franka_panda/panda.urdf", [-4.5 * gs / 8.0, 0.0, 0.0],
                [0, 0, 0, 1], globalScaling=gs)
        else:  # kinova (flex_env.py:853)
            self.robot_helper.loadURDF(
                "kinova/GEN3_URDF_V12.urdf", [-0.5 * gs, 0.0, 0.0],
                [0, 0, 0, 1], globalScaling=gs)

        # settle 500 frames without walls (flex_env.py:824-825), then add the
        # 4 hidden walls (flex_env.py:828-846) and park the pusher.
        col_no_walls = Colliders.ground_only(num_boxes=5)
        self.state = self._settle(col_no_walls, 512)
        self.colliders = scene.make_colliders_with_walls(gs)
        self.last_ee = None
        return None  # parity: reference reset() returns None

    def _settle(self, colliders, n_frames: int) -> SimState:
        t = n_frames
        park = np.zeros((t, 3), np.float32)
        park[:, 1] = -100.0
        return _run_frames(
            self.state, self.sim_params, colliders,
            jnp.asarray(park), jnp.zeros((t,), jnp.float32),
            jnp.zeros((t, 3), jnp.float32), jnp.zeros((t,), bool),
            self._grid_lower, self._grid_dims, t,
            use_pallas=self._use_pallas)

    # ------------------------------------------------------------------- step
    def step(self, action, video_recorder=None, add_cam_idx=None):
        """Execute one 4-D push [xs, ys, xe, ye]; returns the post-settle
        720x720x5 RGBD observation (or None if the sim exploded —
        flex_env.py:316-318 NaN guard)."""
        action = np.asarray(action, dtype=np.float64).reshape(-1)
        plan = pusher.plan_push(action, self.global_scale, self.robot_type,
                                self.cont_motion, self.last_ee,
                                fixed_total=getattr(self, "push_frame_total",
                                                    None))
        if video_recorder is None:
            self.state = _run_frames(
                self.state, self.sim_params, self.colliders,
                jnp.asarray(plan.center), jnp.asarray(plan.yaw),
                jnp.asarray(plan.vel), jnp.asarray(plan.active),
                self._grid_lower, self._grid_dims, plan.n_frames,
                use_pallas=self._use_pallas)
        else:
            # chunked execution so intermediate frames can be captured
            # (reference writes per sim frame, flex_env.py:308-314)
            chunk = 16
            recs = (video_recorder if isinstance(video_recorder, list)
                    else [video_recorder])
            for s0 in range(0, plan.n_frames, chunk):
                s1 = min(s0 + chunk, plan.n_frames)
                self.state = _run_frames(
                    self.state, self.sim_params, self.colliders,
                    jnp.asarray(plan.center[s0:s1]),
                    jnp.asarray(plan.yaw[s0:s1]),
                    jnp.asarray(plan.vel[s0:s1]),
                    jnp.asarray(plan.active[s0:s1]),
                    self._grid_lower, self._grid_dims, s1 - s0,
                    use_pallas=self._use_pallas)
                frame = self._raster_with_pusher(
                    plan, min(s1, plan.n_frames - 1))
                for rec in recs:
                    rec.write(frame[..., :3].astype(np.uint8))
        if self.cont_motion:
            h = (self.global_scale / 8.0 if self.robot_type == "franka"
                 else 0.11 * self.global_scale)
            self.last_ee = np.concatenate([action[2:4], [h]])
        xs = np.asarray(self.state.x)
        if math.isnan(float(np.max(xs[:, 0]))):
            print("simulator exploded when action is ", action)
            return None
        return self.render(add_cam_idx=add_cam_idx)

    # ----------------------------------------------------------------- render
    def render(self, no_return=False, add_cam_idx=None):
        """One extra sim frame then rasterize (flex_env.py:874-900).
        RGB in 0..255; depth channel in world units ("meters")."""
        self.state = self._settle(self.colliders, 1)
        if no_return:
            return None
        obs = self._raster(self.camera)
        if add_cam_idx is None:
            return obs
        imgs = [obs]
        for cam_idx in add_cam_idx:
            imgs.append(self._raster(Camera.side(
                self.global_scale, cam_idx, self.screenWidth,
                self.screenHeight)))
        return imgs

    def _raster_with_pusher(self, plan, i: int) -> np.ndarray:
        """Render with the pusher board posed at frame ``i`` of a plan.
        Video/demo path: skinned rigid hulls + shadow pass + the IK-posed
        arm as capsule proxies (the reference draws skinned meshes, the
        mirrored robot links, and a shadow map here, pyflex.cpp:1183-1400,
        1525-1620; the perception render() keeps exact splats)."""
        import jax.numpy as jnp  # local: keep module import surface small

        col = self.colliders.with_box(
            0, plan.center[i], pusher.pusher_half_extents(),
            yaw=float(plan.yaw[i]), active=bool(plan.active[i]))
        if bool(plan.active[i]) and getattr(self, "robot_helper", None):
            ee = np.asarray(plan.center[i], np.float64).copy()
            ee[1] += pusher.PUSHER_LENGTH / 2.0 - 0.01
            self.robot_helper.set_ee(ee, yaw=float(plan.yaw[i]))
            caps = self.robot_helper.link_capsules()
            C = len(caps)
            col = col.replace(
                cap_p0=jnp.asarray([c[0] for c in caps], jnp.float32),
                cap_p1=jnp.asarray([c[1] for c in caps], jnp.float32),
                cap_radius=jnp.asarray([c[2] for c in caps], jnp.float32),
                cap_active=jnp.ones((C,), bool),
                cap_vel=jnp.zeros((C, 3), jnp.float32))
        saved = self.colliders
        self.colliders = col
        try:
            return self._raster(self.camera,
                                skin=self.scene_build.draw_skin,
                                shadows=True)
        finally:
            self.colliders = saved

    def _raster(self, camera: Camera, skin: bool = False,
                shadows: bool = False) -> np.ndarray:
        fx, fy, cx, cy = camera.cam_params()
        obs = raster.render_rgbd(
            self.state.x, self.state.active, self.colliders,
            jnp.asarray(camera.opencv_from_world(), jnp.float32),
            fx, fy, cx, cy,
            jnp.asarray(self.scene_build.color, jnp.float32),
            jnp.float32(float(self.sim_params.radius) * 0.5),
            width=camera.width, height=camera.height,
            skin=skin, shadows=shadows)
        return np.asarray(obs)

    # ------------------------------------------------------------ perception
    def _check_obs(self, obs):
        assert obs.shape[-1] == 5
        assert obs[..., :3].max() <= 255.0 and obs[..., :3].min() >= 0.0
        assert obs[..., -1].max() >= 0.7 * self.global_scale
        assert obs[..., -1].max() <= 0.8 * self.global_scale

    def obs2ptcl(self, obs, particle_r):
        self._check_obs(obs)
        depth = obs[..., -1] / self.global_scale
        fgpcd = pc.depth2fgpcd(depth, depth < FG_THRESHOLD,
                               self.get_cam_params())
        sampled = pc.fps_rad(fgpcd, particle_r)
        return pc.recenter(fgpcd, sampled, r=min(0.02, 0.5 * particle_r))

    def obs2ptcl_fixed_num(self, obs, particle_num):
        self._check_obs(obs)
        depth = obs[..., -1] / self.global_scale
        fgpcd = pc.depth2fgpcd(depth, depth < FG_THRESHOLD,
                               self.get_cam_params())
        fgpcd = pc.downsample_pcd(fgpcd, 0.01)
        sampled, particle_r = pc.fps(fgpcd, particle_num)
        sampled = pc.recenter(fgpcd, sampled, r=min(0.02, 0.5 * particle_r))
        return sampled, particle_r

    def obs2ptcl_fixed_num_batch(self, obs, particle_num, batch_size):
        """batch_size independent FPS hypotheses (flex_env.py:933-951)."""
        self._check_obs(obs)
        depth = obs[..., -1] / self.global_scale
        out = np.zeros((batch_size, particle_num, 3))
        radii = np.zeros((batch_size,))
        fgpcd_full = pc.depth2fgpcd(depth, depth < FG_THRESHOLD,
                                    self.get_cam_params())
        # the voxel downsample is deterministic — hoist it out of the
        # hypothesis loop (the reference recomputes it 30x,
        # flex_env.py:933-951; only the FPS random start differs per i)
        fgpcd = pc.downsample_pcd(fgpcd_full, 0.01)
        for i in range(batch_size):
            sampled, r = pc.fps(fgpcd, particle_num)
            out[i] = pc.recenter(fgpcd, sampled, r=min(0.02, 0.5 * r))
            radii[i] = r
        return out, radii

    # --------------------------------------------------------------- actions
    def sample_action(self, n):
        action = -self.wkspc_w + 2 * self.wkspc_w * self._rng.random((n, 1, 4))
        return action, np.zeros(n)

    def sample_action_obj_biased(self, n):
        particles = self.get_positions().reshape(-1, 4)
        idx = self._rng.choice(particles.shape[0], n, replace=False)
        start = np.stack([particles[idx, 0], -particles[idx, 2]], axis=1)
        start += self._rng.normal(0, 0.5 * self.global_scale / 12.0,
                                  size=start.shape)
        actions = np.zeros((n, self.act_dim))
        actions[:, :2] = np.clip(start, -self.wkspc_w, self.wkspc_w)
        actions[:, 2:4] = self._rng.uniform(-self.wkspc_w, self.wkspc_w,
                                            (n, 2))
        return actions

    def sample_particle_center(self, n):
        self.cvx_region = np.array(
            [[-self.wkspc_w, self.wkspc_w, -self.wkspc_w, self.wkspc_w]])
        return -self.wkspc_w + 2 * self.wkspc_w * self._rng.random((n, 2))

    def clip_action(self, action):
        """Clip pushes that would sweep the pusher into the workspace walls
        (flex_env.py:335-373 semantics, wall segments at +-gs/2)."""
        g2 = self.global_scale / 2.0
        wall_pts = [np.array([g2, g2]), np.array([g2, -g2]),
                    np.array([-g2, -g2]), np.array([-g2, g2])]
        s_2d, e_2d = action[:2].copy(), action[2:4].copy()
        d = s_2d - e_2d
        ang = np.pi / 2 if d[0] == 0 else np.arctan(d[1] / d[0])
        steps = int(np.linalg.norm(e_2d - s_2d) * 50.0) + 1
        pw = 0.05 * self.global_scale
        for i in range(steps):
            pos = s_2d + (e_2d - s_2d) * i / steps
            left = pos + pw * np.array([np.cos(ang - np.pi / 2),
                                        np.sin(ang - np.pi / 2)])
            right = pos - pw * np.array([np.cos(ang - np.pi / 2),
                                         np.sin(ang - np.pi / 2)])
            for j in range(4):
                if intersect(left, right, wall_pts[j],
                             wall_pts[(j + 1) % 4]):
                    if i <= 15:
                        return None
                    action = action.copy()
                    action[2:4] = s_2d + (e_2d - s_2d) * (i - 15) / steps
                    return action
        return action

    def pixel2action(self, pixel, w=64):
        x = (pixel[1] - w / 2) * 0.6 * self.global_scale / w
        y = (w / 2 - pixel[0]) * 0.6 * self.global_scale / w
        return np.array([x, y])

    # ------------------------------------------------------------ state I/O
    def get_positions(self):
        """Flattened (n, 4) = (x, y, z, invMass) of live particles, matching
        pyflex.get_positions()."""
        act = np.asarray(self.state.active)
        xs = np.asarray(self.state.x)[act]
        invm = np.asarray(self.state.invm)[act]
        return np.concatenate([xs, invm[:, None]], axis=1).reshape(-1)

    def set_positions(self, positions):
        pos = np.asarray(positions).reshape(-1, 4)
        act = np.asarray(self.state.active)
        n = int(act.sum())
        assert pos.shape[0] == n, (pos.shape, n)
        x = np.asarray(self.state.x).copy()
        x[:n] = pos[:, :3]
        # slept=None: an externally restored configuration must re-settle
        # from an all-awake state (the stale sleep mask would otherwise
        # freeze unsupported particles in mid-air — wake_masks only wakes
        # v>0 | ~slept particles)
        self.state = self.state.replace(
            x=jnp.asarray(x), v=jnp.zeros_like(self.state.v), slept=None)

    def get_cam_params(self):
        return self.camera.cam_params()

    def get_cam_extrinsics(self):
        return self.camera.extrinsics()

    def close(self):
        pass

    # --------------------------------------------------- closed-loop driver
    def step_subgoal_ptcl(self, subgoal, model_dy, init_pos=None, n_mpc=30,
                          n_look_ahead=1, n_sample=100, n_update_iter=100,
                          gd_loop=1, particle_num=50, mpc_type="GD",
                          funnel_dist=None, action_seq_mpc_init=None,
                          action_label_seq_mpc_init=None,
                          time_lim=float("inf"), auto_particle_r=False,
                          res_rgr=None):
        """Closed-loop dynamic-resolution MPC (flex_env.py:953-1133).
        Implemented in env/mpc_driver.py to keep env/planner layers apart
        (the reference couples them; SURVEY.md flags this as a wart).
        res_rgr: a pre-loaded resolution regressor (else the driver loads
        the config's mpc.res_sel checkpoint when auto_particle_r)."""
        from .mpc_driver import step_subgoal_ptcl as _driver
        return _driver(
            self, subgoal, model_dy, init_pos=init_pos, n_mpc=n_mpc,
            n_look_ahead=n_look_ahead, n_sample=n_sample,
            n_update_iter=n_update_iter, gd_loop=gd_loop,
            particle_num=particle_num, mpc_type=mpc_type,
            funnel_dist=funnel_dist,
            action_seq_mpc_init=action_seq_mpc_init,
            action_label_seq_mpc_init=action_label_seq_mpc_init,
            time_lim=time_lim, auto_particle_r=auto_particle_r,
            res_rgr=res_rgr)
