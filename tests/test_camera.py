"""Camera module contract tests (vs analytic expectations of the reference
camera model: pyflex.cpp:1246-1248, env/flex_env.py:192-201,1135-1145)."""
import numpy as np
import pytest

from dyn_res_pile_manip_tpu.core.camera import Camera

pytestmark = pytest.mark.quick


def test_default_camera_topdown():
    cam = Camera.default(global_scale=24.0)
    assert np.allclose(cam.cam_pos, (0.0, 18.0, 0.0))
    fx, fy, cx, cy = cam.cam_params()
    # fov 45deg, aspect 1: fx = cot(22.5deg) * 360
    assert np.isclose(fx, 360.0 / np.tan(np.deg2rad(22.5)), rtol=1e-6)
    assert np.isclose(fx, fy)
    assert cx == 360.0 and cy == 360.0


def test_view_matrix_looks_down():
    cam = Camera.default(global_scale=24.0)
    view = cam.view
    # the origin (ground under the camera) maps to eye-space z = -18
    p = view @ np.array([0.0, 0.0, 0.0, 1.0])
    assert np.allclose(p[:3], [0.0, 0.0, -18.0], atol=1e-6)


def test_opencv_depth_positive():
    cam = Camera.default(global_scale=24.0)
    m = cam.opencv_from_world()
    p = m @ np.array([1.0, 0.0, 2.0, 1.0])
    # OpenCV frame: +z is depth
    assert p[2] > 0
    assert np.isclose(p[2], 18.0)


def test_projection_roundtrip_depth():
    """Linear depth from NDC matches the eye-space depth (the contract of
    pyflex.cpp:3775-3784's depth linearization)."""
    cam = Camera.default(24.0)
    proj = cam.proj
    z_eye = -17.5  # GL eye space (camera looks down -z)
    clip = proj @ np.array([0.3, 0.2, z_eye, 1.0])
    z_ndc = clip[2] / clip[3]
    n, f = cam.near, cam.far
    z_lin = 2.0 * n * f / (f + n - z_ndc * (f - n))
    assert np.isclose(z_lin, -z_eye, rtol=1e-5)


def test_pixel_projection_matches_world():
    """A world point projects to the pixel predicted by fx,fy,cx,cy."""
    cam = Camera.default(24.0)
    fx, fy, cx, cy = cam.cam_params()
    world = np.array([2.0, 0.0, -3.0, 1.0])
    p = cam.opencv_from_world() @ world
    u = p[0] * fx / p[2] + cx
    v = p[1] * fy / p[2] + cy
    # cross-check against the full GL pipeline
    clip = cam.proj @ cam.view @ world
    ndc = clip[:3] / clip[3]
    u_gl = (ndc[0] * 0.5 + 0.5) * cam.width
    v_gl = (1.0 - (ndc[1] * 0.5 + 0.5)) * cam.height  # GL y-up vs image y-down
    assert np.isclose(u, u_gl, atol=1e-3)
    assert np.isclose(v, v_gl, atol=1e-3)
