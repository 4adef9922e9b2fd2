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


def test_sharded_planner_optimize_matches():
    """The production hot loop itself — PlannerGD._optimize (jitted Adam
    scan over GNN rollouts + reward) — sharded over the sample axis on 8
    devices equals the single-device result (SURVEY.md §2.3 pjit mapping
    of planners.py:336-359,685-697)."""
    from dyn_res_pile_manip_tpu.core.camera import Camera
    from dyn_res_pile_manip_tpu.models.gnn_dyn import PropNetDiffDenModel
    from dyn_res_pile_manip_tpu.planner.planner import PlannerGD
    from dyn_res_pile_manip_tpu.utils.config import load_config
    from dyn_res_pile_manip_tpu.utils.imaging import gen_subgoal
    from dyn_res_pile_manip_tpu.env import rewards as rew

    class _Env:
        is_real = False
        screenWidth = screenHeight = 720

        def __init__(self):
            self.cam = Camera.default(24.0)
            self.cvx_region = np.array([[-5.0, 5.0, -5.0, 5.0]])

        def get_cam_params(self):
            return self.cam.cam_params()

        def get_cam_extrinsics(self):
            return self.cam.extrinsics()

    cfg = load_config()
    model = PropNetDiffDenModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    model.params = params
    planner = PlannerGD(cfg, _Env())

    rng = np.random.default_rng(3)
    N, n_batch, traj = 16, 2, 8
    S = n_batch * traj
    s_cur = jnp.asarray(rng.uniform(-0.1, 0.1, (n_batch, N, 3)),
                        jnp.float32).at[..., 2].add(0.75)
    s_param = jnp.full((n_batch,), 1000.0, jnp.float32)
    a_cur = jnp.zeros((n_batch, N), jnp.float32)
    acts0 = jnp.asarray(rng.uniform(-3, 3, (S, 1, 4)), jnp.float32)
    subgoal, _ = gen_subgoal(360, 360, 80, h=720, w=720)
    goal_field = rew.prepare_goal_lowrank(subgoal)
    goal_coor = jnp.asarray(rew.goal_coords(subgoal, 64))
    lo = jnp.asarray([-5.0, -5.0, -5.0, -5.0], jnp.float32)
    hi = -lo

    def run(acts):
        return planner._optimize(
            model, params, s_cur, s_param, a_cur, acts, goal_field,
            goal_coor, lo, hi, jnp.float32(0.05), 5, int(n_batch),
            fast_reward=True)

    out_single = jax.tree_util.tree_map(np.asarray, run(acts0))

    m = pmesh.make_mesh(8, platform="cpu")
    acts_sh = pmesh.shard_batch(m, acts0)
    out_sharded = jax.tree_util.tree_map(np.asarray, run(acts_sh))

    for a, b in zip(out_single, out_sharded):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)
