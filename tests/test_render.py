"""Renderer contract tests: depth semantics, foreground threshold, splat
geometry (reference contract: env/flex_env.py:874-915, pyflex.cpp:3775-3784)."""
import jax.numpy as jnp
import numpy as np

from dyn_res_pile_manip_tpu.core.camera import Camera
from dyn_res_pile_manip_tpu.core.types import Colliders
from dyn_res_pile_manip_tpu.render import raster

GS = 24.0


def _render(x, active, col=None, w=240, h=240):
    cam = Camera.default(GS, width=w, height=h)
    fx, fy, cx, cy = cam.cam_params()
    if col is None:
        col = Colliders.ground_only(1)
    obs = raster.render_rgbd(
        jnp.asarray(x, jnp.float32), jnp.asarray(active), col,
        jnp.asarray(cam.opencv_from_world(), jnp.float32),
        fx, fy, cx, cy, jnp.array([0.9, 0.6, 0.1], jnp.float32),
        jnp.float32(0.0375), width=w, height=h)
    return np.asarray(obs), cam


def test_empty_scene_floor_depth():
    obs, _ = _render(np.zeros((4, 3)), np.zeros(4, bool))
    depth = obs[..., 4]
    # top-down camera at 18: floor fills the frame at depth ~18 (slanted rays
    # slightly farther at the edges)
    assert depth.min() >= 18.0 - 1e-3
    assert depth.max() <= 0.8 * GS            # obs contract upper bound
    assert depth.max() >= 0.7 * GS
    assert obs[..., :3].min() >= 1.0 and obs[..., :3].max() <= 255.0


def test_particle_depth_and_fg_mask():
    x = np.array([[0.0, 0.0375, 0.0], [2.0, 0.0375, -1.0]])
    obs, cam = _render(x, np.ones(2, bool))
    depth = obs[..., 4]
    fg = depth / GS < 0.599 / 0.8
    assert fg.sum() > 0
    # top of a floor-resting grain: 18 - (0.0375 + 0.0375) = 17.925
    assert np.isclose(depth.min(), 18.0 - 0.075, atol=0.01)
    # foreground pixel located where the particle projects
    fx, fy, cx, cy = cam.cam_params()
    p = cam.opencv_from_world() @ np.array([2.0, 0.0375, -1.0, 1.0])
    u, v = p[0] * fx / p[2] + cx, p[1] * fy / p[2] + cy
    ys, xs = np.nonzero(fg)
    d = np.sqrt((xs - u) ** 2 + (ys - v) ** 2)
    assert d.min() < 2.0


def test_box_renders_in_depth():
    col = Colliders.ground_only(1).with_box(
        0, (0.0, 1.0, 0.0), (0.5, 1.0, 0.5))
    obs, _ = _render(np.zeros((1, 3)), np.zeros(1, bool), col=col)
    depth = obs[..., 4]
    # box top at y=2 -> depth 16 in the center
    assert np.isclose(depth.min(), 16.0, atol=0.05)


def test_occlusion_order():
    # two particles on the same ray: nearer one wins
    x = np.array([[0.0, 0.0375, 0.0], [0.0, 1.0, 0.0]])
    obs, _ = _render(x, np.ones(2, bool))
    depth = obs[..., 4]
    assert depth.min() < 18.0 - 1.0  # the elevated particle's depth ~17


def test_skin_and_shadow_options():
    """skin expands splats (video path); shadows only darken RGB and
    leave depth untouched (shadersGL.cpp:984 shadow pass equivalent)."""
    rng = np.random.default_rng(0)
    # an elevated clump: casts a real shadow onto the floor beside it
    x = np.zeros((32, 3), np.float32)
    x[:, 0] = rng.uniform(-0.1, 0.1, 32)
    x[:, 2] = rng.uniform(-0.1, 0.1, 32)
    x[:, 1] = np.linspace(0.3, 0.8, 32)
    act = np.ones(32, bool)
    cam = Camera.default(GS, width=240, height=240)
    fx, fy, cx, cy = cam.cam_params()
    col = Colliders.ground_only(1)

    def render(**kw):
        return np.asarray(raster.render_rgbd(
            jnp.asarray(x), jnp.asarray(act), col,
            jnp.asarray(cam.opencv_from_world(), jnp.float32),
            fx, fy, cx, cy, jnp.array([0.9, 0.6, 0.1], jnp.float32),
            jnp.float32(0.0375), width=240, height=240, **kw))

    plain = render()
    skin = render(skin=True)
    shad = render(shadows=True)

    fg = lambda o: (o[..., 4] / GS < 0.599 / 0.8).sum()
    assert fg(skin) > fg(plain)            # expanded splats
    np.testing.assert_array_equal(shad[..., 4], plain[..., 4])  # depth same
    assert (shad[..., :3] <= plain[..., :3] + 1e-4).all()       # only darkens
    assert (shad[..., :3] < plain[..., :3] - 1e-4).any()        # some shadow
    for o in (plain, skin, shad):
        assert o[..., :3].min() >= 1.0 and o[..., :3].max() <= 255.0


def test_per_particle_colors():
    """Per-particle colors (set_phases coloring / DrawPoints per-phase
    g_colors): two separated particles must render with their own hues;
    depth must be identical to the scalar-color path."""
    x = np.array([[-1.5, 0.0375, 0.0], [1.5, 0.0375, 0.0]])
    colors = jnp.asarray([[1.0, 0.05, 0.05], [0.05, 0.05, 1.0]],
                         jnp.float32)
    cam = Camera.default(GS, width=240, height=240)
    fx, fy, cx, cy = cam.cam_params()
    col = Colliders.ground_only(1)
    obs = np.asarray(raster.render_rgbd(
        jnp.asarray(x, jnp.float32), jnp.ones(2, bool), col,
        jnp.asarray(cam.opencv_from_world(), jnp.float32),
        fx, fy, cx, cy, colors, jnp.float32(0.3),
        width=240, height=240))
    ref = np.asarray(raster.render_rgbd(
        jnp.asarray(x, jnp.float32), jnp.ones(2, bool), col,
        jnp.asarray(cam.opencv_from_world(), jnp.float32),
        fx, fy, cx, cy, jnp.array([0.9, 0.6, 0.1], jnp.float32),
        jnp.float32(0.3), width=240, height=240))
    assert np.array_equal(obs[..., 4], ref[..., 4])      # depth unchanged
    fg = obs[..., 4] < 17.9
    assert fg.any()
    rgb = obs[..., :3][fg]
    reds = rgb[:, 0] > 2.0 * np.maximum(rgb[:, 2], 1.0)
    blues = rgb[:, 2] > 2.0 * np.maximum(rgb[:, 0], 1.0)
    assert reds.any() and blues.any()        # both hues present
    assert (reds | blues).mean() > 0.9       # and nothing else


def test_box_colors():
    """Per-shape box colors (AddBox color argument)."""
    col = Colliders.ground_only(2).with_box(
        0, (0.0, 1.0, 0.0), (1.0, 1.0, 1.0), active=True)
    box_colors = jnp.asarray([[1.0, 0.0, 0.0], [0.9, 0.9, 0.9]],
                             jnp.float32)
    cam = Camera.default(GS, width=120, height=120)
    fx, fy, cx, cy = cam.cam_params()
    obs = np.asarray(raster.render_rgbd(
        jnp.zeros((1, 3), jnp.float32), jnp.zeros(1, bool), col,
        jnp.asarray(cam.opencv_from_world(), jnp.float32),
        fx, fy, cx, cy, jnp.array([0.9, 0.6, 0.1], jnp.float32),
        jnp.float32(0.1), width=120, height=120, box_colors=box_colors))
    boxpix = obs[..., 4] < 17.5
    assert boxpix.any()
    rgb = obs[..., :3][boxpix]
    assert (rgb[:, 0] > 3.0 * np.maximum(rgb[:, 1], 1.0)).mean() > 0.95
