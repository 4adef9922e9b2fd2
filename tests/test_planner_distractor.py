"""Distractor-aware MPC: the swept-segment distractor penalty must be
folded into the jitted optimizer (reference planners.py:700-712 +
env/flex_rewards.py:245-264), differentiable through the actions."""
import jax
import jax.numpy as jnp
import numpy as np

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


def _segment_intrusion(action, df, width=720, wkspc_w=5.0):
    """max distractor intrusion along the push segment, image space
    (same mapping as distractor_reward_diff)."""
    a = np.asarray(action, np.float64)
    p0 = np.array([-a[1], a[0]]) / wkspc_w * width / 3.0 + width / 2.0
    p1 = np.array([-a[3], a[2]]) / wkspc_w * width / 3.0 + width / 2.0
    vals = []
    for i in range(11):
        w = i / 10.0
        px = p0[0] * w + p1[0] * (1 - w)
        py = p0[1] * w + p1[1] * (1 - w)
        vals.append(float(df(jnp.asarray([px]), jnp.asarray([py]))[0]))
    return max(vals)


def test_distractor_field_changes_chosen_action():
    cfg = load_config()
    model = PropNetDiffDenModel(cfg)
    model.init(jax.random.PRNGKey(0))
    planner = PlannerGD(cfg, _Env())
    subgoal, _ = gen_subgoal(360, 360, 80, h=720, w=720)

    rng = np.random.default_rng(0)
    N, n_batch, traj = 24, 2, 6
    state = rng.uniform(-0.1, 0.1, (n_batch, N, 3)).astype(np.float32)
    state[:, :, 2] += 0.75
    # diverse candidates: some sweep across the distractor, some avoid it
    act_seq = rng.uniform(-4.0, 4.0, (1, traj, 4))
    act_seq[0, 0] = [-3.0, -3.0, 3.0, 3.0]   # guaranteed bump-crossing

    # distractor: a strong wide bump on the initial push path but AWAY
    # from the goal (world (-1.5, -1.5) -> image (432, 288) under the
    # action->image mapping of distractor_reward_diff)
    def df(px, py):
        d2 = (px - 432.0) ** 2 + (py - 288.0) ** 2
        return 50.0 * jnp.exp(-d2 / (2.0 * 120.0 ** 2))

    common = dict(
        n_sample=traj, n_look_ahead=1, n_update_iter=15,
        action_lower_lim=None, action_upper_lim=None,
        time_lim=float("inf"))

    out_plain = planner.trajectory_optimization_ptcl_multi_traj(
        state, np.full((n_batch,), 1000.0), np.zeros((n_batch, N)),
        subgoal, model, act_seq.copy(), np.zeros(1), **common)
    out_dis = planner.trajectory_optimization_ptcl_multi_traj(
        state, np.full((n_batch,), 1000.0), np.zeros((n_batch, N)),
        subgoal, model, act_seq.copy(), np.zeros(1),
        distractor_df_fn=df, **common)

    a_plain = out_plain["action_sequence"][0]
    a_dis = out_dis["action_sequence"][0]
    # the distractor changed the optimization outcome
    assert not np.allclose(a_plain, a_dis, atol=1e-4)
    # and steered the chosen push away from the bump
    i_plain = _segment_intrusion(a_plain, df)
    i_dis = _segment_intrusion(a_dis, df)
    assert i_dis < i_plain, (i_dis, i_plain)
    # rewards with the penalty are lower for center-crossing pushes
    assert out_dis["reward"] < out_plain["reward"] + 1e-6
