"""Shared helpers for the example scripts (the role of
PyFleX/bindings/examples/utils.py + the common driving boilerplate).

Every example follows the reference pattern: build a scene through the
pyflex module surface, drive kinematic shapes / control particles, and
dump rendered frames — these scripts are the de-facto binding tests.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from dyn_res_pile_manip_tpu import pyflex_shim as pyflex  # noqa: E402

OUT_ROOT = os.path.join(os.path.dirname(__file__), "..", "out_examples")


def rand_float(lo, hi):
    return np.random.rand() * (hi - lo) + lo


def rand_int(lo, hi):
    return np.random.randint(lo, hi)


def quat_from_axis_angle(axis, angle):
    """xyzw quaternion (examples/test_FluidPour.py quatFromAxisAngle)."""
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    half = angle * 0.5
    return np.array([axis[0] * np.sin(half), axis[1] * np.sin(half),
                     axis[2] * np.sin(half), np.cos(half)])


def init(screen=720, frames_env="EXAMPLE_FRAMES"):
    """pyflex.init + optional frame/screen overrides for quick CI runs
    (EXAMPLE_FRAMES=N caps the frame count, EXAMPLE_SCREEN=N shrinks the
    render — full-res renders are a multi-minute XLA compile on the
    1-core CPU host)."""
    screen = int(os.environ.get("EXAMPLE_SCREEN", "0")) or screen
    pyflex.set_screenWidth(screen)
    pyflex.set_screenHeight(screen)
    pyflex.init(True)
    return int(os.environ.get(frames_env, "0")) or None


def cam(pos, angle=(0.0, -0.6, 0.0)):
    pyflex.set_camPos(np.asarray(pos, np.float64))
    pyflex.set_camAngle(np.asarray(angle, np.float64))


def frame(name, save_dir, idx=None):
    """Render one RGBD frame, save RGB, return the (H, W, 5) array."""
    h, w = pyflex._rt.screen_h, pyflex._rt.screen_w
    img = pyflex.render().reshape(h, w, 5)
    os.makedirs(os.path.join(OUT_ROOT, save_dir), exist_ok=True)
    fname = name if idx is None else f"{name}_{idx:04d}"
    rgb = np.clip(img[..., :3], 0, 255).astype(np.uint8)
    try:
        import imageio
        imageio.imwrite(os.path.join(OUT_ROOT, save_dir, fname + ".png"),
                        rgb)
    except Exception:
        np.save(os.path.join(OUT_ROOT, save_dir, fname + ".npy"), rgb)
    return img


def report(tag):
    """Print scene statistics (NaN check = the smoke assertion)."""
    act = np.asarray(pyflex._rt.state.active)
    x = np.asarray(pyflex._rt.state.x)[act]
    v = np.asarray(pyflex._rt.state.v)[act]
    ok = not np.isnan(x).any()
    print(f"{tag}: n={int(act.sum())} ok={ok} "
          f"y=[{x[:, 1].min():.3f},{x[:, 1].max():.3f}] "
          f"max|v|={np.abs(v).max():.2f}")
    if not ok:
        raise SystemExit(f"{tag}: NaN positions")


def glass_walls(dis_x, dis_z, height, border=0.025):
    """Four kinematic box walls forming an open glass
    (examples/test_FluidShake.py box layout)."""
    return [
        ((border / 2, height / 2, dis_z / 2), (-dis_x / 2, height / 2, 0)),
        ((border / 2, height / 2, dis_z / 2), (dis_x / 2, height / 2, 0)),
        ((dis_x / 2, height / 2, border / 2), (0, height / 2, -dis_z / 2)),
        ((dis_x / 2, height / 2, border / 2), (0, height / 2, dis_z / 2)),
    ]


def add_glass(walls, offset, colors=None):
    quat = np.array([0.0, 0.0, 0.0, 1.0])
    for i, (half, c) in enumerate(walls):
        pyflex.add_box(np.array(half), np.array(c) + np.asarray(offset),
                       quat, color=None if colors is None else colors[i])


def mirror_arm(helper):
    """Mirror the robot helper's link capsules into the shim's collider
    set (the role of the reference's per-link mesh mirroring,
    env/flex_env.py:84-154; same mechanism as FlexEnv.render)."""
    import jax.numpy as jnp
    caps = helper.link_capsules()
    C = len(caps)
    pyflex._rt.colliders = pyflex._rt.colliders.replace(
        cap_p0=jnp.asarray([c[0] for c in caps], jnp.float32),
        cap_p1=jnp.asarray([c[1] for c in caps], jnp.float32),
        cap_radius=jnp.asarray([c[2] for c in caps], jnp.float32),
        cap_active=jnp.ones((C,), bool),
        cap_vel=jnp.zeros((C, 3), jnp.float32))


def move_glass(walls, offset, prev_offset):
    """One set_shape_states update translating the whole glass."""
    quat = np.array([0.0, 0.0, 0.0, 1.0])
    states = np.zeros((len(walls), 14))
    for i, (half, c) in enumerate(walls):
        states[i, :3] = np.array(c) + np.asarray(offset)
        states[i, 3:6] = np.array(c) + np.asarray(prev_offset)
        states[i, 6:10] = quat
        states[i, 10:] = quat
    pyflex.set_shape_states(states)
