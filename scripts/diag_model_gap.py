"""Closed-loop diagnostic: per MPC step, compare the planner's MODEL-
predicted reward for the chosen action against the ACTUAL reward after
executing it in the simulator, plus the GNN one-step prediction error on
the executed push. Quantifies model-error exploitation (the round-2
letter-goal degradation, DEMO.md "Closed-loop status").

Usage: python scripts/diag_model_gap.py [--n-mpc 6] [--n-update 100]
       [--gnn-folder r2] [--init-pos rand_spread] [--goal I]
       [--particle-num 50] [--seed 42] [--out /tmp/diag_gap.json]
"""
import argparse
import json

import numpy as np

from dyn_res_pile_manip_tpu.env.flex_env import FlexEnv
from dyn_res_pile_manip_tpu.env import rewards as rew
from dyn_res_pile_manip_tpu.models.gnn_dyn import PropNetDiffDenModel
from dyn_res_pile_manip_tpu.planner.planner import PlannerGD, gen_s_delta
from dyn_res_pile_manip_tpu.train.checkpoints import load_model_params
from dyn_res_pile_manip_tpu.utils.config import load_config
from dyn_res_pile_manip_tpu.utils.imaging import gen_goal_shape, gen_subgoal

import jax.numpy as jnp

FG = 0.599 / 0.8


def reward_of(states, goal_field, goal_coor, cam):
    r = rew.config_reward_ptcl(
        jnp.asarray(states, jnp.float32)[None], goal_field,
        tuple(jnp.float32(c) for c in cam), jnp.asarray(goal_coor),
        normalize=True)
    return float(np.asarray(r)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-mpc", type=int, default=6)
    ap.add_argument("--n-update", type=int, default=100)
    ap.add_argument("--n-sample", type=int, default=20)
    ap.add_argument("--gnn-folder", default="r2")
    ap.add_argument("--init-pos", default="rand_spread")
    ap.add_argument("--goal", default="I")
    ap.add_argument("--particle-num", type=int, default=50)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", default="/tmp/diag_gap.json")
    args = ap.parse_args()

    cfg = load_config(overrides={
        "dataset": {"init_pos": args.init_pos, "obj": "carrots",
                    "global_scale": 24, "particle_r": 0.125},
    })
    env = FlexEnv(cfg)
    env.seed(args.seed)
    env.reset()

    model = PropNetDiffDenModel(cfg)
    ckpt = f"data/gnn_dyn_model/{args.gnn_folder}/net_best.ckpt"
    model.params = load_model_params(ckpt)

    if args.goal == "disc":
        subgoal, _ = gen_subgoal(360, 360, 75, h=720, w=720)
    else:
        subgoal, _ = gen_goal_shape(args.goal, h=720, w=720)

    planner = PlannerGD(cfg, env)
    env.planner = planner
    cam = env.get_cam_params()
    goal_field = rew.prepare_goal(subgoal)
    n = args.particle_num
    goal_coor = rew.goal_coords(subgoal, min(n * 5,
                                             int((subgoal < 0.5).sum())))

    obs = env.render()
    ptcl, particle_r = env.obs2ptcl_fixed_num_batch(obs, n, batch_size=30)
    den = float(1 / (particle_r[0] ** 2))
    acts_init, _ = env.sample_action(args.n_mpc)

    records = []
    for i in range(args.n_mpc):
        r_before = reward_of(ptcl[0], goal_field, goal_coor, cam)
        out = planner.trajectory_optimization_ptcl_multi_traj(
            ptcl, np.full((ptcl.shape[0],), den), np.zeros((ptcl.shape[0], n)),
            subgoal, model, acts_init[i:i + 1].transpose(1, 0, 2)
            if acts_init.ndim == 3 else acts_init[i:i + 1][:, None, :],
            np.zeros(1), args.n_sample, 1, args.n_update, None, None,
            time_lim=float("inf"))
        action = out["action_sequence"][0]
        r_pred = float(np.asarray(out["next_r"]).ravel()[0])

        # GNN one-step prediction from hypothesis 0 for the executed action
        s0 = jnp.asarray(ptcl[:1], jnp.float32)
        sd = gen_s_delta(s0, jnp.asarray(action[None], jnp.float32),
                         planner._w2c, planner.global_scale)
        s_pred = np.asarray(model.predict_one_step(
            model.params, jnp.zeros((1, n)), s0, sd,
            jnp.full((1,), den, jnp.float32))[0])

        obs = env.step(action)
        ptcl, particle_r = env.obs2ptcl_fixed_num_batch(obs, n, batch_size=30)
        den = float(1 / (particle_r[0] ** 2))
        r_after = reward_of(ptcl[0], goal_field, goal_coor, cam)
        r_pred_actual = reward_of(s_pred, goal_field, goal_coor, cam)

        # chamfer distance between predicted cloud and actual perceived
        d = np.linalg.norm(s_pred[:, None, :] - ptcl[0][None], axis=-1)
        chamfer = float(d.min(1).mean() + d.min(0).mean()) / 2

        rec = {"step": i, "action": np.asarray(action).tolist(),
               "push_len": float(np.hypot(action[2] - action[0],
                                          action[3] - action[1])),
               "r_before": r_before, "r_pred_model": r_pred,
               "r_pred_state_reward": r_pred_actual, "r_after": r_after,
               "pred_gain": r_pred_actual - r_before,
               "actual_gain": r_after - r_before, "chamfer_pred": chamfer}
        records.append(rec)
        print(json.dumps(rec), flush=True)

    gains_p = [r["pred_gain"] for r in records]
    gains_a = [r["actual_gain"] for r in records]
    summary = {"mean_pred_gain": float(np.mean(gains_p)),
               "mean_actual_gain": float(np.mean(gains_a)),
               "mean_chamfer": float(np.mean([r["chamfer_pred"]
                                              for r in records]))}
    print("SUMMARY", json.dumps(summary))
    with open(args.out, "w") as f:
        json.dump({"records": records, "summary": summary}, f, indent=1)


if __name__ == "__main__":
    main()
