"""Trust-region / risk-averse planner options (round-4, model-only
closed loop): mpc.gd.lam_push_len penalizes squared push length inside
the jitted GD loop (and in robust_select's cross-eval), and
mpc.gd.risk_select_std selects candidates by mean - k*std across the
state-hypothesis ensemble. No reference counterpart (the reference's
sim-free planner inherits the model-exploitation failure these address;
diagnosis: logs/diag_gap_r2.log, +13.3 predicted vs -12.5 actual mean
gain at reference settings)."""
import jax
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


def _push_len(a):
    return float(np.hypot(a[2] - a[0], a[3] - a[1]))


def _setup(lam=0.0, risk=0.0):
    cfg = load_config()
    cfg["mpc"]["gd"]["lam_push_len"] = lam
    cfg["mpc"]["gd"]["risk_select_std"] = risk
    cfg["mpc"]["gd"]["robust_select"] = True
    model = PropNetDiffDenModel(cfg)
    model.init(jax.random.PRNGKey(0))
    planner = PlannerGD(cfg, _Env())
    return planner, model


def _run(planner, model, seed=0):
    rng = np.random.default_rng(seed)
    N, n_batch, traj = 24, 2, 6
    state = rng.uniform(-0.1, 0.1, (n_batch, N, 3)).astype(np.float32)
    state[:, :, 2] += 0.75
    act_seq = rng.uniform(-4.0, 4.0, (1, traj, 4))
    subgoal, _ = gen_subgoal(360, 360, 80, h=720, w=720)
    return planner.trajectory_optimization_ptcl_multi_traj(
        state, np.full((n_batch,), 1000.0), np.zeros((n_batch, N)),
        subgoal, model, act_seq.copy(), np.zeros(1),
        n_sample=traj, n_look_ahead=1, n_update_iter=15,
        action_lower_lim=None, action_upper_lim=None,
        time_lim=float("inf"))


def test_push_len_penalty_shortens_chosen_push():
    planner, model = _setup(lam=0.0)
    out_plain = _run(planner, model)
    # a crushing penalty makes any long push strictly dominated
    planner_tr, model_tr = _setup(lam=50.0)
    out_tr = _run(planner_tr, model_tr)
    l_plain = _push_len(out_plain["action_sequence"][0])
    l_tr = _push_len(out_tr["action_sequence"][0])
    assert l_tr < l_plain, (l_tr, l_plain)
    # the GD loop itself (not just selection) must feel the penalty:
    # every surviving candidate push shrinks
    mean_cand_len = np.mean([
        _push_len(a[0]) for a in out_tr["candidate_actions"]])
    mean_cand_len_plain = np.mean([
        _push_len(a[0]) for a in out_plain["candidate_actions"]])
    assert mean_cand_len < mean_cand_len_plain


def test_risk_averse_selection_changes_score_not_crash():
    planner, model = _setup(lam=0.0, risk=5.0)
    out = _run(planner, model)
    # scores are finite, an action was chosen, and candidate scores
    # reflect the mean-minus-std combination (<= plain mean scores)
    assert np.isfinite(out["candidate_scores"]).all()
    assert out["action_sequence"].shape == (1, 4)

    planner0, model0 = _setup(lam=0.0, risk=0.0)
    out0 = _run(planner0, model0)
    # same candidates (risk only reweights selection), scores not higher
    assert np.all(out["candidate_scores"] <= out0["candidate_scores"] + 1e-5)
