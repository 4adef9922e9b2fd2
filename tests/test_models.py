"""GNN dynamics + resolution regressor tests: shapes, graph parity with the
reference's dense-nonzero construction, equivariance, checkpoint round-trip."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dyn_res_pile_manip_tpu.models.gnn_dyn import PropNetDiffDenModel
from dyn_res_pile_manip_tpu.utils.config import load_config


@pytest.fixture(scope="module")
def model():
    cfg = load_config()
    m = PropNetDiffDenModel(cfg)
    m.init(jax.random.PRNGKey(0))
    return m


def _rand_state(key, B=2, N=20):
    k1, k2 = jax.random.split(key)
    s = jax.random.uniform(k1, (B, N, 3), minval=-0.2, maxval=0.2)
    d = jax.random.normal(k2, (B, N, 3)) * 0.01
    return s, d


def test_predict_shapes(model):
    s, d = _rand_state(jax.random.PRNGKey(1))
    a = jnp.zeros(s.shape[:2])
    den = jnp.full((2,), 1000.0)
    out = model.predict_one_step(model.params, a, s, d, den)
    assert out.shape == s.shape
    assert np.isfinite(np.asarray(out)).all()


def test_graph_matches_reference_construction(model):
    """Edge set equals the reference's threshold+topk adjacency
    (model/gnn_dyn.py:229-237)."""
    s, d = _rand_state(jax.random.PRNGKey(2), B=1, N=15)
    pos = np.asarray(s + d)[0]
    idx, ok = model.build_graph(s + d)
    idx, ok = np.asarray(idx)[0], np.asarray(ok)[0]
    dd = np.sum((pos[None] - pos[:, None]) ** 2, axis=-1)
    thresh = model.adj_thresh ** 2
    k = min(10, 15)
    for i in range(15):
        topk = set(np.argsort(dd[i])[:k])
        expected = {j for j in topk if dd[i, j] < thresh}
        got = set(idx[i][ok[i]])
        assert got == expected


def test_translation_equivariance(model):
    """PropNet predicts position deltas from relative features only, so a
    global translation shifts the output by the same amount."""
    s, d = _rand_state(jax.random.PRNGKey(3))
    a = jnp.zeros(s.shape[:2])
    den = jnp.full((2,), 1000.0)
    out1 = model.predict_one_step(model.params, a, s, d, den)
    shift = jnp.array([0.5, -0.2, 0.3])
    out2 = model.predict_one_step(model.params, a, s + shift, d, den)
    np.testing.assert_allclose(np.asarray(out2 - out1),
                               np.broadcast_to(shift, out1.shape),
                               atol=1e-4)


def test_padding_invariance(model):
    """Padded particles (via particle_nums mask) do not affect live ones."""
    s, d = _rand_state(jax.random.PRNGKey(4), B=1, N=12)
    a = jnp.zeros((1, 12))
    den = jnp.full((1,), 500.0)
    out_small = model.predict_one_step(model.params, a, s, d, den,
                                       particle_nums=jnp.array([12]))
    pad = 6
    s_p = jnp.concatenate([s, jnp.full((1, pad, 3), 7.7)], axis=1)
    d_p = jnp.concatenate([d, jnp.zeros((1, pad, 3))], axis=1)
    a_p = jnp.zeros((1, 12 + pad))
    out_pad = model.predict_one_step(model.params, a_p, s_p, d_p, den,
                                     particle_nums=jnp.array([12]))
    np.testing.assert_allclose(np.asarray(out_pad[:, :12]),
                               np.asarray(out_small), atol=1e-5)


def test_checkpoint_roundtrip(model, tmp_path):
    from dyn_res_pile_manip_tpu.train.checkpoints import (
        load_model_params, save_model_params)

    path = str(tmp_path / "net_best.ckpt")
    save_model_params(model.params, path)
    restored = load_model_params(path)
    s, d = _rand_state(jax.random.PRNGKey(5))
    a = jnp.zeros(s.shape[:2])
    den = jnp.full((2,), 1000.0)
    out1 = model.predict_one_step(model.params, a, s, d, den)
    out2 = model.predict_one_step(restored, a, s, d, den)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))


def test_res_regressor_forward():
    from dyn_res_pile_manip_tpu.models.res_regressor import MPCResRgrNoPool

    cfg = load_config()
    m = MPCResRgrNoPool(cfg)
    m.init(jax.random.PRNGKey(0))
    init = np.zeros((240, 240), np.float32)
    init[100:140, 100:140] = 1
    goal = np.zeros((240, 240), np.float32)
    goal[80:160, 110:130] = 1
    out = m.infer_param(init, goal)
    assert isinstance(out, int)
