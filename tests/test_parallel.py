"""Multi-device sharding tests on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dyn_res_pile_manip_tpu.parallel import mesh as pmesh

def _n_cpu():
    try:
        return len(jax.devices("cpu"))
    except RuntimeError:
        return 0


pytestmark = pytest.mark.skipif(_n_cpu() < 8,
                                reason="needs 8 virtual CPU devices")


def test_mesh_and_sharded_batch():
    m = pmesh.make_mesh(8, platform="cpu")
    x = jnp.arange(16.0).reshape(16, 1)
    xs = pmesh.shard_batch(m, x)
    assert len(xs.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(x))


def test_dp_train_step_matches_single_device():
    import optax

    from dyn_res_pile_manip_tpu.models.gnn_dyn import PropNetDiffDenModel
    from dyn_res_pile_manip_tpu.train.train_gnn_dyn import make_train_step
    from dyn_res_pile_manip_tpu.utils.config import load_config

    cfg = load_config()
    model = PropNetDiffDenModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    step = make_train_step(model, optimizer, n_rollout=2)

    rng = np.random.default_rng(0)
    B, T, N = 8, 3, 16
    states = jnp.asarray(rng.normal(size=(B, T, N, 3)) * 0.1, jnp.float32)
    deltas = jnp.asarray(rng.normal(size=(B, T - 1, N, 3)) * 0.01,
                         jnp.float32)
    attrs = jnp.zeros((B, T, N), jnp.float32)
    nums = jnp.full((B,), N, jnp.int32)
    dens = jnp.full((B,), 1000.0, jnp.float32)

    _, _, loss_single = step(params, opt_state, states, deltas, attrs, nums,
                             dens, update=False)

    m = pmesh.make_mesh(8, platform="cpu")
    params_r = pmesh.replicate(m, params)
    opt_r = pmesh.replicate(m, opt_state)
    batch = pmesh.shard_batch(m, (states, deltas, attrs, nums, dens))
    _, _, loss_dp = step(params_r, opt_r, *batch, update=False)
    np.testing.assert_allclose(float(loss_dp), float(loss_single),
                               rtol=1e-5)


def test_sharded_mpc_rollout_matches():
    """MPC pusher-model + GNN rollout over a sharded sample axis equals the
    single-device result (the planner's dp axis, SURVEY.md §2.3)."""
    from dyn_res_pile_manip_tpu.models.gnn_dyn import PropNetDiffDenModel
    from dyn_res_pile_manip_tpu.planner.planner import gen_s_delta
    from dyn_res_pile_manip_tpu.utils.config import load_config

    cfg = load_config()
    model = PropNetDiffDenModel(cfg)
    params = model.init(jax.random.PRNGKey(1))

    rng = np.random.default_rng(2)
    S, N = 16, 12
    s = jnp.asarray(rng.uniform(-0.2, 0.2, (S, N, 3)), jnp.float32)
    s = s.at[..., 2].add(0.75)
    acts = jnp.asarray(rng.uniform(-3, 3, (S, 4)), jnp.float32)
    den = jnp.full((S,), 800.0, jnp.float32)
    attr = jnp.zeros((S, N), jnp.float32)
    w2c = jnp.eye(4, dtype=jnp.float32)

    @jax.jit
    def rollout(s, acts, attr, den):
        d = gen_s_delta(s, acts, w2c, 24.0)
        return model.predict_one_step(params, attr, s, d, den)

    out_single = np.asarray(rollout(s, acts, attr, den))

    m = pmesh.make_mesh(8, platform="cpu")
    sh = pmesh.shard_batch(m, (s, acts, attr, den))
    out_sharded = np.asarray(rollout(*sh))
    np.testing.assert_allclose(out_sharded, out_single, atol=1e-5)
