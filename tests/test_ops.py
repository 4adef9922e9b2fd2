"""On-device sampling ops vs host NumPy references."""
import jax.numpy as jnp
import numpy as np
import pytest

from dyn_res_pile_manip_tpu.ops import sampling
from dyn_res_pile_manip_tpu.utils import pointcloud as pc

pytestmark = pytest.mark.quick


def _cloud(n=200, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    return pts


def test_fps_matches_numpy():
    pts = _cloud()
    mask = np.ones(len(pts), bool)
    ours, idx, r = sampling.fps(jnp.asarray(pts), jnp.asarray(mask), 12,
                                start_idx=3)
    ref, r_ref = pc.fps_np(pts.astype(np.float64), 12, init_idx=3)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)
    np.testing.assert_allclose(float(r), r_ref, rtol=1e-5)


def test_fps_respects_mask():
    pts = _cloud()
    mask = np.zeros(len(pts), bool)
    mask[:50] = True
    ours, idx, _ = sampling.fps(jnp.asarray(pts), jnp.asarray(mask), 8,
                                start_idx=0)
    assert np.asarray(idx).max() < 50


def test_fps_rad_capped():
    pts = _cloud()
    mask = np.ones(len(pts), bool)
    samples, valid = sampling.fps_rad_capped(
        jnp.asarray(pts), jnp.asarray(mask), jnp.float32(0.4), 64,
        start_idx=5)
    chosen = np.asarray(samples)[np.asarray(valid)]
    # coverage: all points within radius of some chosen sample
    d = np.linalg.norm(pts[:, None] - chosen[None], axis=-1).min(axis=1)
    assert d.max() <= 0.4 + 1e-5
    # count comparable to the host implementation (same stopping rule)
    np.random.seed(0)
    ref = pc.fps_rad(pts.astype(np.float64), 0.4)
    assert abs(chosen.shape[0] - ref.shape[0]) <= 4


def test_voxel_downsample_capped():
    pts = _cloud(300, seed=2)
    mask = np.ones(len(pts), bool)
    cent, valid = sampling.voxel_downsample_capped(
        jnp.asarray(pts), jnp.asarray(mask), jnp.float32(0.25), 256)
    got = np.asarray(cent)[np.asarray(valid)]
    ref = pc.downsample_pcd(pts.astype(np.float64), 0.25)
    # same voxel count (hash collisions merge voxels only if caps exceeded)
    assert abs(got.shape[0] - ref.shape[0]) <= 2
    # centroids match as sets (sorted lexicographically)
    got_s = got[np.lexsort(got.T)]
    ref_s = ref[np.lexsort(ref.T)]
    if got_s.shape == ref_s.shape:
        np.testing.assert_allclose(got_s, ref_s, atol=1e-4)


def test_depth_to_fgpcd():
    depth = np.full((32, 32), 18.0, np.float32)
    depth[10:14, 8:12] = 17.5
    cam = (40.0, 40.0, 16.0, 16.0)
    fg = depth < 17.9
    pts, valid = sampling.depth_to_fgpcd(jnp.asarray(depth), jnp.asarray(fg),
                                         cam, cap=64)
    got = np.asarray(pts)[np.asarray(valid)]
    ref = pc.depth2fgpcd(depth.astype(np.float64), fg, cam)
    assert got.shape == ref.shape
    got_s = got[np.lexsort(got.T)]
    ref_s = ref[np.lexsort(ref.T)]
    np.testing.assert_allclose(got_s, ref_s, atol=1e-5)
