"""End-to-end closed-loop MPC CI test (SURVEY §4): a small pile, the
shipped demo GNN checkpoint, a few MPC pushes toward a disc goal — the
planner reward must improve. Mirrors visualize_mpc.py:57-70 at test scale.
"""
import os

import numpy as np
import pytest

from dyn_res_pile_manip_tpu.env.flex_env import FlexEnv
from dyn_res_pile_manip_tpu.models.gnn_dyn import PropNetDiffDenModel
from dyn_res_pile_manip_tpu.train.checkpoints import load_model_params
from dyn_res_pile_manip_tpu.utils.config import load_config
from dyn_res_pile_manip_tpu.utils.imaging import gen_subgoal

CKPT = os.path.join(os.path.dirname(__file__), os.pardir,
                    "assets", "demo_gnn.ckpt")


def test_closed_loop_mpc_improves_reward(tmp_path, monkeypatch):
    # the perception FPS random start consumes GLOBAL numpy RNG state
    # (reference fps_np does too, utils.py:451-466) — pin it so the test
    # is order-independent; without this the marginal 12-sample/20-iter
    # optimizer can land on a non-improving trajectory in isolation
    np.random.seed(7)
    cfg = load_config(overrides={
        "dataset": {"init_pos": "center", "obj": "carrots"},
        # sim-verify the planner's top-2 candidates in the real sim
        # (mpc_driver._sim_verify): the CI loop must not depend on the
        # tiny demo checkpoint being accurate, only on the machinery
        "mpc": {"gd": {"sim_verify": 2, "robust_select": True}}})
    model = PropNetDiffDenModel(cfg)
    model.params = load_model_params(CKPT)

    # drive the crash-safety per-push progress checkpoint incl. its ckpt
    # stamp (env/mpc_driver._write_progress; VERDICT r4 #1) in this run
    from dyn_res_pile_manip_tpu.utils.provenance import set_run_provenance
    progress_path = str(tmp_path / "progress.json")
    monkeypatch.setenv("MPC_PROGRESS_JSON", progress_path)
    set_run_provenance(gnn=CKPT)

    env = FlexEnv(cfg)
    env.push_frame_total = 640   # one compiled push program
    env.seed(11)
    env.reset()

    # disc goal centered on the pile's own centroid: compacting the pile
    # toward itself is the most robust objective for a small optimizer
    obs0 = env.render()
    fg = obs0[..., -1] / env.global_scale < 0.599 / 0.8
    rows, cols = np.nonzero(fg)
    subgoal, _ = gen_subgoal(int(rows.mean()), int(cols.mean()), 100,
                             h=720, w=720)
    acts, _ = env.sample_action(12)

    out = env.step_subgoal_ptcl(
        subgoal, model, None, n_mpc=3, n_look_ahead=1, n_sample=12,
        n_update_iter=20, gd_loop=1, particle_num=30,
        action_seq_mpc_init=acts.transpose(1, 0, 2),
        action_label_seq_mpc_init=np.zeros(1),
        time_lim=float("inf"), auto_particle_r=False)

    import json
    with open(progress_path) as f:
        prog = json.load(f)
    assert prog["pushes_done"] == 3 and prog["partial"] is False
    assert prog["ckpts"]["gnn"]["md5"], prog["ckpts"]

    rewards = out["rewards"]
    assert np.isfinite(rewards).all()
    # reward (higher = better) improves over the initial configuration
    assert rewards.max() > rewards[0], rewards
    assert rewards[-1] > rewards[0] - 5.0, rewards  # and never collapses
    assert out["actions"].shape == (3, 4)
    assert len(out["states"]) == 4
