"""Dynamic-resolution A/B: closed-loop MPC with the trained resolution
regressor (auto_particle_r=True) vs fixed particle counts, on held-out
init/goal pairs (the paper's core claim; reference visualize_mpc.py with
mpc.res_sel). Prints one JSON line per run and a summary.

Usage: python scripts/eval_auto_res.py [--scenes 3] [--n-mpc 5]
       [--fixed 20 50] [--rgr-folder r2] [--gnn-folder r2] [--seed 1234]
"""
import argparse
import json
import os

import numpy as np

from dyn_res_pile_manip_tpu.env.flex_env import FlexEnv
from dyn_res_pile_manip_tpu.models.gnn_dyn import PropNetDiffDenModel
from dyn_res_pile_manip_tpu.models.res_regressor import MPCResRgrNoPool
from dyn_res_pile_manip_tpu.train.checkpoints import load_model_params
from dyn_res_pile_manip_tpu.utils.config import load_config
from dyn_res_pile_manip_tpu.utils.imaging import gen_goal_shape, gt_rewards

FG = 0.599 / 0.8


def _dump(path, results, summary=None, ckpts=None):
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        # ckpts = md5 provenance of the exact bytes loaded (VERDICT r4 #1)
        json.dump({"results": results, "summary": summary,
                   "ckpts": ckpts}, f, indent=2)
    os.replace(tmp, path)


def run_one(env, model, subgoal, n_mpc, n_sample, particle_num, auto,
            res_rgr, seed):
    env.seed(seed)
    env.reset()
    obs0 = env.render()
    rew0 = gt_rewards(((obs0[..., -1] / env.global_scale) < FG
                       ).astype(np.float32), subgoal)
    acts, _ = env.sample_action(n_sample)
    out = env.step_subgoal_ptcl(
        subgoal, model, None, n_mpc=n_mpc, n_look_ahead=1,
        n_sample=n_sample, n_update_iter=200, gd_loop=1,
        particle_num=particle_num,
        action_seq_mpc_init=acts.transpose(1, 0, 2),
        action_label_seq_mpc_init=np.zeros(1),
        time_lim=1000, auto_particle_r=auto, res_rgr=res_rgr)
    obs1 = out["raw_obs"][-1]
    rew1 = gt_rewards(((obs1[..., -1] / env.global_scale) < FG
                       ).astype(np.float32), subgoal)
    return float(rew0), float(rew1), out.get("particle_den_seq", [])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=3)
    ap.add_argument("--n-mpc", type=int, default=5)
    ap.add_argument("--n-sample", type=int, default=20)
    ap.add_argument("--fixed", type=int, nargs="*", default=[20, 50])
    ap.add_argument("--rgr-folder", default="r2")
    ap.add_argument("--gnn-folder", default="r2")
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--out", default="eval_auto_res.json")
    ap.add_argument("--start", type=int, default=0,
                    help="resume at this scene index, merging completed "
                         "scenes from an existing --out JSON (per-scene "
                         "seed/goal/init_pos depend only on the index, so "
                         "a resumed run is identical to an uninterrupted "
                         "one)")
    args = ap.parse_args()

    cfg = load_config(overrides={
        "dataset": {"init_pos": "rand_blob", "obj": "carrots"},
        "mpc": {"model_folder": args.gnn_folder, "iter_num": -1,
                "res_sel": {"model_folder": args.rgr_folder,
                            "iter_num": -1}}})
    model = PropNetDiffDenModel(cfg)
    model.params = load_model_params(os.path.join(
        "data/gnn_dyn_model", args.gnn_folder, "net_best.ckpt"))
    rgr = MPCResRgrNoPool(cfg)
    rgr_path = os.path.join("data/res_rgr_model", args.rgr_folder,
                            "net_best_dy.ckpt")
    rgr.params = load_model_params(rgr_path)
    from dyn_res_pile_manip_tpu.utils.provenance import ckpt_provenance
    ckpts = ckpt_provenance(
        gnn=os.path.join("data/gnn_dyn_model", args.gnn_folder,
                         "net_best.ckpt"),
        res_rgr=rgr_path)
    print("ckpt provenance:", json.dumps(ckpts), flush=True)

    env = FlexEnv(cfg)
    results = []
    if args.start > 0 and os.path.exists(args.out):
        with open(args.out) as f:
            prior = json.load(f)["results"]
        results = [r for r in prior
                   if not r.get("partial") and r["scene"] < args.start]
        print("resumed with %d completed scenes from %s"
              % (len(results), args.out), flush=True)
    for s in range(args.start, args.scenes):
        seed = args.seed + 17 * s
        # held-out goal letter (labeling used random A-Z; evaluation fixes
        # the paper's headline letters)
        char = "IXT"[s % 3]
        subgoal, _ = gen_goal_shape(char, h=720, w=720,
                                    font_name="helvetica")
        env.init_pos = "rand_blob" if s % 2 == 0 else "rand_spread"

        runs = {}
        for label, (num, auto) in {
            **{f"fixed_{n}": (n, False) for n in args.fixed},
            "auto": (-1, True),
        }.items():
            r0, r1, dens = run_one(env, model, subgoal, args.n_mpc,
                                   args.n_sample, num, auto,
                                   rgr if auto else None, seed)
            runs[label] = {"gt0": r0, "gt1": r1, "improve": r0 - r1,
                           "dens": [int(d) for d in dens]}
            print(json.dumps({"scene": s, "goal": char, "run": label,
                              **runs[label]}), flush=True)
            # checkpoint partial results after EVERY run: the end-of-round
            # chip guard may kill this eval mid-flight, and a partial A/B
            # is still evidence (the watcher commits results/r4 wholesale)
            _dump(args.out, results + [{"scene": s, "goal": char,
                                        "runs": dict(runs),
                                        "partial": True}], ckpts=ckpts)
        results.append({"scene": s, "goal": char, "runs": runs})
        _dump(args.out, results, ckpts=ckpts)

    summary = {}
    for label in results[0]["runs"]:
        summary[label] = float(np.mean(
            [r["runs"][label]["improve"] for r in results]))
    print("summary (mean gt improvement, higher better):",
          json.dumps(summary))
    _dump(args.out, results, summary, ckpts=ckpts)


if __name__ == "__main__":
    main()
