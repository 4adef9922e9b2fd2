"""MPPI planner surface: model_rollout / evaluate_traj /
ptcl_evaluate_traj / trajectory_optimization_mppi (reference
planners.py:69-190, 300-530, 549-561 — machinery its driver never wires;
ours runs end-to-end with mpc_type='MPPI')."""
import jax
import numpy as np
import pytest

from dyn_res_pile_manip_tpu.core.camera import Camera
from dyn_res_pile_manip_tpu.models.gnn_dyn import PropNetDiffDenModel
from dyn_res_pile_manip_tpu.planner.planner import PlannerGD
from dyn_res_pile_manip_tpu.utils.config import load_config
from dyn_res_pile_manip_tpu.utils.imaging import gen_subgoal


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


@pytest.fixture(scope="module")
def setup():
    cfg = load_config()
    model = PropNetDiffDenModel(cfg)
    model.init(jax.random.PRNGKey(0))
    planner = PlannerGD(cfg, _Env())
    subgoal, _ = gen_subgoal(360, 360, 80, h=720, w=720)
    rng = np.random.default_rng(1)
    N, n_batch = 24, 2
    state = rng.uniform(-0.1, 0.1, (n_batch, N, 3)).astype(np.float32)
    state[:, :, 2] += 0.75
    return cfg, model, planner, subgoal, state, N, n_batch


def test_model_rollout_shapes(setup):
    _, model, planner, _, state, N, n_batch = setup
    planner.particle_num = N
    n_sample, n_act = 3, 2
    acts = np.random.default_rng(0).uniform(
        -4, 4, (n_sample * n_batch, n_act, 4))
    out = planner.model_rollout(state, model,
                                acts, np.full((n_batch,), 1000.0),
                                np.zeros((n_batch, N)))
    pred = np.asarray(out["model_rollout"]["state_pred"])
    assert pred.shape == (n_sample * n_batch, n_act, N, 3)
    assert not np.isnan(pred).any()
    assert out["rollout_time"] >= 0.0


def test_ptcl_evaluate_traj(setup):
    _, _, planner, subgoal, state, N, _ = setup
    planner.particle_num = N
    n_sample, n_look, cvx = 4, 2, 1
    rng = np.random.default_rng(2)
    obs = rng.uniform(-0.1, 0.1, (n_sample, n_look, cvx, N, 3))
    obs[..., 2] += 0.75
    reward_seqs, next_r = planner.ptcl_evaluate_traj(obs, subgoal)
    assert reward_seqs.shape == (n_sample, cvx)
    assert next_r.shape == (n_sample, n_look, cvx)
    np.testing.assert_allclose(reward_seqs, next_r[:, -1], rtol=1e-5)


def test_evaluate_traj_image_space(setup):
    _, _, planner, _, _, _, _ = setup
    n_sample, n_look, cvx, res = 3, 1, 1, 64
    rng = np.random.default_rng(3)
    obs = (rng.random((n_sample, n_look, cvx, res * res)) < 0.2).astype(
        np.float32)
    goal_df = rng.random((res, res)).astype(np.float32)
    mask = np.ones((res, res), np.float32)
    reward_seqs, next_r = planner.evaluate_traj(obs, goal_df, mask)
    assert reward_seqs.shape == (n_sample, cvx)
    # the reward is the negative masked distance-field overlap
    want = -(obs[0, 0, 0].reshape(res, res) * goal_df).sum()
    np.testing.assert_allclose(next_r[0, 0, 0], want, rtol=1e-4)


def test_mppi_end_to_end_improves(setup):
    cfg, model, planner, subgoal, state, N, n_batch = setup
    act0 = np.random.default_rng(4).uniform(-4, 4, (1, 4))
    out = planner.trajectory_optimization_mppi(
        state, np.full((n_batch,), 1000.0), np.zeros((n_batch, N)),
        subgoal, model, act0, np.zeros(1, np.int32), n_sample=8,
        n_look_ahead=1, n_update_iter=4, action_lower_lim=None,
        action_upper_lim=None)
    assert out["action_sequence"].shape == (1, 4)
    assert out["iter_num"] == 4
    assert np.isfinite(out["reward"])
    # best reward is at least the mean of the first iteration's samples
    assert out["reward"] >= out["rew_mean"][0, 0] - 1e-6
