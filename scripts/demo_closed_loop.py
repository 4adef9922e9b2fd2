"""Closed-loop MPC demo with the trained GNN: push a 'center' pile into a
disc goal; reports the reward trajectory and gt_rewards improvement."""
import json
import sys

import numpy as np

from dyn_res_pile_manip_tpu.env.flex_env import FlexEnv
from dyn_res_pile_manip_tpu.models.gnn_dyn import PropNetDiffDenModel
from dyn_res_pile_manip_tpu.train.checkpoints import load_model_params
from dyn_res_pile_manip_tpu.utils.config import load_config
from dyn_res_pile_manip_tpu.utils.imaging import gen_subgoal, gt_rewards


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 \
        else "data/gnn_dyn_model/demo/net_best.ckpt"
    n_mpc = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cfg = load_config(overrides={
        "dataset": {"init_pos": "center", "obj": "carrots"},
        "mpc": {"n_sample": 32, "n_update_iter": 60, "time_lim": 60000}})
    model = PropNetDiffDenModel(cfg)
    model.params = load_model_params(ckpt)

    env = FlexEnv(cfg)
    env.push_frame_total = 1152
    env.seed(7)
    env.reset()

    # disc goal offset from the pile (push the pile to the goal)
    subgoal, mask = gen_subgoal(300, 420, 90, h=720, w=720)
    acts, _ = env.sample_action(32)

    obs0 = env.render()
    fg0 = (obs0[..., -1] / env.global_scale < 0.599 / 0.8)
    rew0 = gt_rewards(fg0.astype(np.float32), subgoal)

    out = env.step_subgoal_ptcl(
        subgoal, model, None, n_mpc=n_mpc, n_look_ahead=1, n_sample=32,
        n_update_iter=60, gd_loop=1, particle_num=30,
        action_seq_mpc_init=acts.transpose(1, 0, 2),
        action_label_seq_mpc_init=np.zeros(1),
        time_lim=60000, auto_particle_r=False)

    obs1 = out["raw_obs"][-1]
    fg1 = (obs1[..., -1] / env.global_scale < 0.599 / 0.8)
    rew1 = gt_rewards(fg1.astype(np.float32), subgoal)

    result = {
        "planner_rewards": [float(r) for r in out["rewards"]],
        "gt_reward_initial": float(rew0),
        "gt_reward_final": float(rew1),
        "gt_reward_improvement": float(rew0 - rew1),
    }
    print(json.dumps(result, indent=2))
    with open("demo_closed_loop_result.json", "w") as f:
        json.dump(result, f, indent=2)
    # save before/after frames
    from dyn_res_pile_manip_tpu.utils.imageio import write_color
    write_color("demo_before.png", obs0[..., :3])
    overlay = obs1[..., :3].copy()
    overlay[subgoal < 0.5] = 0.5 * overlay[subgoal < 0.5] + \
        0.5 * np.array([0, 255, 0])
    write_color("demo_after.png", overlay)


if __name__ == "__main__":
    main()
