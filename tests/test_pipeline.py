"""Integration tests: dataset loading + training steps on synthetic episode
data laid out in the reference's on-disk format."""
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dyn_res_pile_manip_tpu.core.camera import Camera
from dyn_res_pile_manip_tpu.utils.config import load_config
from dyn_res_pile_manip_tpu.utils.imageio import (read_depth, write_color,
                                                  write_depth)

GS = 24.0


def _make_episode(epi_dir, cam, n_frames=6, n_particles=120, seed=0):
    """Synthetic episode: a drifting blob of particles + consistent depth."""
    rng = np.random.default_rng(seed)
    os.makedirs(epi_dir, exist_ok=True)
    fx, fy, cx, cy = cam.cam_params()
    cvw = cam.opencv_from_world()
    base = rng.uniform(-1.5, 1.5, (n_particles, 3))
    base[:, 1] = rng.uniform(0.05, 0.3, n_particles)
    actions = rng.uniform(-3, 3, (n_frames - 1, 4))
    for t in range(n_frames):
        pos = base + np.array([0.08 * t, 0.0, 0.03 * t])
        pos4 = np.concatenate(
            [pos, np.full((n_particles, 1), 0.2)], axis=1)
        np.save(os.path.join(epi_dir, f"{t}_particles.npy"),
                pos4.reshape(-1))
        depth = np.full((720, 720), 18.0, np.float64)
        homo = np.concatenate([pos, np.ones((n_particles, 1))], axis=1)
        camp = homo @ cvw.T
        u = (camp[:, 0] * fx / camp[:, 2] + cx).astype(int)
        v = (camp[:, 1] * fy / camp[:, 2] + cy).astype(int)
        for du in range(-3, 4):
            for dv in range(-3, 4):
                uu = np.clip(u + du, 0, 719)
                vv = np.clip(v + dv, 0, 719)
                depth[vv, uu] = np.minimum(depth[vv, uu],
                                           camp[:, 2] - 0.075)
        write_depth(os.path.join(epi_dir, f"{t}_depth.png"), depth)
        write_color(os.path.join(epi_dir, f"{t}_color.png"),
                    np.full((720, 720, 3), 255.0))
    with open(os.path.join(epi_dir, "actions.p"), "wb") as fp:
        pickle.dump(actions, fp)


@pytest.fixture(scope="module")
def episodes(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("gnn_data"))
    cam = Camera.default(GS)
    for e in range(2):
        _make_episode(os.path.join(root, str(e)), cam, seed=e)
    return root, cam


def test_particle_dataset(episodes):
    from dyn_res_pile_manip_tpu.datasets.dataset_gnn_dyn import (
        ParticleDataset, collate_pad)

    root, cam = episodes
    cfg = load_config(overrides={
        "dataset": {"n_episode": 2, "n_timestep": 5},
        "train": {"train_valid_ratio": 0.5}})
    ds = ParticleDataset(root, cfg,
                         "train", [cam.cam_params(), cam.extrinsics()])
    assert len(ds) == 1
    states, deltas, attrs, num, den = ds[0]
    assert states.shape == (6, num, 3)
    assert deltas.shape == (5, num, 3)
    assert np.isfinite(states).all()
    # tracked particles live on the blob's camera-frame depth plane
    assert 0.5 < states[0][:, 2].mean() < 0.8
    s, d, a, nums, dens = collate_pad([ds[0], ds[0]])
    assert s.shape[0] == 2 and s.shape[2] == nums.max()


def test_depth_roundtrip(tmp_path):
    depth = np.random.uniform(10, 18, (32, 32))
    p = str(tmp_path / "d.png")
    write_depth(p, depth)
    back = read_depth(p) / 1000.0
    np.testing.assert_allclose(back, depth, atol=1e-3)


def test_gnn_train_step_decreases_loss(episodes):
    import optax

    from dyn_res_pile_manip_tpu.datasets.dataset_gnn_dyn import (
        ParticleDataset, collate_pad)
    from dyn_res_pile_manip_tpu.models.gnn_dyn import PropNetDiffDenModel
    from dyn_res_pile_manip_tpu.train.train_gnn_dyn import make_train_step

    root, cam = episodes
    cfg = load_config(overrides={
        "dataset": {"n_episode": 2, "n_timestep": 5},
        "train": {"train_valid_ratio": 1.0, "n_rollout": 2}})
    ds = ParticleDataset(root, cfg, "train",
                         [cam.cam_params(), cam.extrinsics()])
    batch = collate_pad([ds[0], ds[1]], n_max=64)
    s, d, a, nums, dens = [jnp.asarray(x) for x in batch]
    s = s[:, :3]
    d = d[:, :2]
    a = a[:, :3]

    model = PropNetDiffDenModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    step = make_train_step(model, optimizer, n_rollout=2)
    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, s, d, a, nums,
                                       dens, update=True)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_res_rgr_pipeline(tmp_path):
    import optax

    from dyn_res_pile_manip_tpu.datasets.dataset_res_rgr import (
        DatasetResRgr, iterate_batches)

    root = str(tmp_path)
    rng = np.random.default_rng(0)
    for i in range(3):
        d = os.path.join(root, str(i))
        os.makedirs(d)
        img = (rng.random((120, 120)) > 0.7).astype(np.uint8) * 255
        write_color(os.path.join(d, "init.png"),
                    img[..., None].repeat(3, -1))
        write_color(os.path.join(d, "goal.png"),
                    img[::-1][..., None].repeat(3, -1))
        np.save(os.path.join(d, "opt_den.npy"), np.array([[50.0]]))
        np.save(os.path.join(d, "opt_y.npy"), np.array([[-2.0]]))
    cfg = load_config(overrides={"train_res_cls": {
        "num_data": 3, "train_valid_ratio": 1.0, "state_h": 64,
        "state_w": 64, "batch_size": 3}})
    ds = DatasetResRgr(root, cfg, "train")
    batch = next(iterate_batches(ds, 3))
    assert batch["input_img"].shape == (3, 64, 64, 6)
    assert batch["conf"].shape == (3, 1)
    assert np.allclose(batch["conf"], 1.0)  # opt_y=-2 -> conf capped at 1

    # one forward/backward on a tiny variant of the net
    from dyn_res_pile_manip_tpu.models.res_regressor import ResRegressorNet
    net = ResRegressorNet(out_dim=1)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 64, 64, 6)))

    def loss_fn(p):
        out = net.apply(p, jnp.asarray(batch["input_img"]))
        return ((out[:, 0] - jnp.asarray(batch["optimal_den"][:, 0])) ** 2
                * jnp.asarray(batch["conf"][:, 0])).mean()

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))


def test_res_rgr_dihedral_augmentation(tmp_path):
    """Train-phase dihedral-8 augmentation permutes pixels but never the
    label; valid phase stays deterministic (our extra over the reference's
    train_res_rgr.py — the labeled set is ~5% of its 2760 scenes)."""
    from dyn_res_pile_manip_tpu.datasets.dataset_res_rgr import DatasetResRgr

    root = str(tmp_path)
    rng = np.random.default_rng(1)
    for i in range(2):
        d = os.path.join(root, str(i))
        os.makedirs(d)
        img = (rng.random((120, 120)) > 0.7).astype(np.uint8) * 255
        write_color(os.path.join(d, "init.png"),
                    img[..., None].repeat(3, -1))
        write_color(os.path.join(d, "goal.png"),
                    img[::-1][..., None].repeat(3, -1))
        np.save(os.path.join(d, "opt_den.npy"), np.array([[50.0 + i]]))
        np.save(os.path.join(d, "opt_y.npy"), np.array([[-2.0]]))
    cfg = load_config(overrides={"train_res_cls": {
        "num_data": 2, "train_valid_ratio": 0.5, "state_h": 64,
        "state_w": 64, "augment": True}})
    ds = DatasetResRgr(root, cfg, "train")
    assert ds.augment
    draws = [ds[0]["input_img"] for _ in range(6)]
    # same multiset of pixels (pure permutation), label untouched
    for x in draws:
        assert x.shape == (64, 64, 6)
        np.testing.assert_allclose(np.sort(x, axis=None),
                                   np.sort(draws[0], axis=None))
    assert any(not np.array_equal(x, draws[0]) for x in draws[1:])
    assert all(float(ds[0]["optimal_den"][0]) == 50.0 for _ in range(3))
    dsv = DatasetResRgr(root, cfg, "valid")
    assert not dsv.augment
    assert np.array_equal(dsv[0]["input_img"], dsv[0]["input_img"])


def test_gp_opt_minimizes():
    from sklearn.gaussian_process import GaussianProcessRegressor
    from sklearn.gaussian_process.kernels import Matern, WhiteKernel

    from dyn_res_pile_manip_tpu.datagen.gp_opt import (expected_minimum,
                                                       gp_minimize_int)

    calls = []

    def f(x):
        calls.append(x[0])
        return (x[0] - 37) ** 2 / 100.0

    kernel = 1 ** 2 * Matern(length_scale=1.0, nu=2.5) + WhiteKernel(0.04)
    base = GaussianProcessRegressor(kernel=kernel, normalize_y=True,
                                    n_restarts_optimizer=2)
    res = gp_minimize_int(f, 2, 100, base, n_calls=10,
                          x0=[[2], [25], [50], [75], [100]])
    x_best, y_best = expected_minimum(res, 2, 100)
    assert len(calls) == 10
    assert abs(x_best[0] - 37) <= 12
