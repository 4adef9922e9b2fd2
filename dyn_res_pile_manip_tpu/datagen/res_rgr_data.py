"""Resolution-regressor dataset generation: GP-labeled optimal particle
counts (reference data_gen/res_rgr_data.py:96-485).

Per scene (modes random / same_init / same_goal): label the optimal particle
count by Bayesian optimization over Integer(2, 100) — the objective runs 5
repeated short MPC rollouts from the same saved particle state and scores
the gt_rewards improvement plus a 0.001*first_rew*particle_num complexity
penalty (res_rgr_data.py:128-221). Saves init.png/goal.png/opt_den/opt_y/
x_iters/func_vals per step.

Run: python -m dyn_res_pile_manip_tpu.datagen.res_rgr_data [--dir OUT]
"""
from __future__ import annotations

import argparse
import os

import numpy as np
from sklearn.gaussian_process import GaussianProcessRegressor
from sklearn.gaussian_process.kernels import Matern, WhiteKernel

from ..env.flex_env import FlexEnv
from ..models.gnn_dyn import PropNetDiffDenModel
from ..train.checkpoints import load_model_params
from ..utils.config import load_config, save_yaml
from ..utils.imageio import write_color
from ..utils.imaging import gen_goal_shape, gen_subgoal, gt_rewards

FG_THRESHOLD = 0.599 / 0.8


class GPParamOpt:
    def __init__(self, config=None):
        self.config = config or load_config()
        self.global_scale = self.config["dataset"]["global_scale"]
        self.n_mpc = self.config["mpc"]["n_mpc"]
        self.n_mpc_per_model = self.config["mpc"].get("n_mpc_per_model", 1)
        self.num_steps = max(1, self.n_mpc // self.n_mpc_per_model)
        self.n_look_ahead = self.config["mpc"]["n_look_ahead"]
        self.n_sample = self.config["mpc"]["n_sample"]
        self.n_update_iter = self.config["mpc"]["n_update_iter"]
        self.gd_loop = self.config["mpc"]["gd_loop"]
        self.mpc_type = self.config["mpc"]["mpc_type"]

        self.env = FlexEnv(self.config)
        self.env.reset()

        model_folder = os.path.join("data/gnn_dyn_model",
                                    self.config["mpc"]["model_folder"])
        self.GNN_model = PropNetDiffDenModel(self.config)
        it = self.config["mpc"]["iter_num"]
        name = ("net_best.ckpt" if it == -1
                else "net_epoch_0_iter_%d.ckpt" % it)
        self.GNN_model.params = load_model_params(
            os.path.join(model_folder, name))
        self.screenWidth = self.screenHeight = 720

    def param_eval_fn(self, particle_num):
        # quantize to multiples of 4: the jitted planner specializes on
        # the particle count, so an unbounded Integer(2,100) search space
        # would compile a fresh optimizer per proposal (30-60 s each on
        # this host). 25 grid points bound the compile set for the whole
        # labeling run; the GP's white-noise kernel absorbs the rounding.
        particle_num = int(np.clip(round(int(particle_num[0]) / 4) * 4,
                                   4, 100))
        test_repeat = self.config["mpc_data"].get("test_repeat", 5)
        res = np.zeros(test_repeat)
        first_rew = 0.0
        for i in range(test_repeat):
            self.env.set_positions(self.last_pos)
            out = self.env.step_subgoal_ptcl(
                self.subgoal, self.GNN_model, None,
                n_mpc=self.n_mpc_per_model,
                n_look_ahead=self.n_look_ahead, n_sample=self.n_sample,
                n_update_iter=self.n_update_iter, mpc_type=self.mpc_type,
                gd_loop=self.gd_loop, particle_num=particle_num,
                action_seq_mpc_init=self.action_seq_mpc_init,
                action_label_seq_mpc_init=self.action_label_seq_mpc_init,
                time_lim=self.config["mpc"]["time_lim"])
            self.pos.append(self.env.get_positions())
            raw_obs = out["raw_obs"]
            last_rew = gt_rewards(
                (raw_obs[-1][..., -1] / self.global_scale) < FG_THRESHOLD,
                self.subgoal)
            first_rew = gt_rewards(
                (raw_obs[0][..., -1] / self.global_scale) < FG_THRESHOLD,
                self.subgoal)
            res[i] = last_rew - first_rew
        eval_res = res.mean() + 0.001 * first_rew * particle_num
        self.eval_idx += 1
        print("eval %d: particle_num=%d res=%.3f"
              % (self.eval_idx, particle_num, eval_res))
        return eval_res

    def _scene_setup(self, scene_idx, mode):
        if mode == "random":
            if scene_idx % 2 == 1:
                self.env.init_pos = "rand_blob"
            else:
                self.env.init_pos = "rand_spread"
            rand_char = chr(65 + np.random.randint(0, 26))
            self.subgoal, self.goal_img = gen_goal_shape(
                rand_char, h=self.screenHeight, w=self.screenWidth,
                font_name="helvetica")
            self.env.reset()
        elif mode == "same_init":
            self.env.init_pos = "extra_small_half_spread"
            self.env.reset()
            if scene_idx % 2 == 0:
                self.subgoal, mask = gen_subgoal(360, 360, 150,
                                                 h=self.screenHeight,
                                                 w=self.screenWidth)
                self.goal_img = (mask[..., None] * 255).repeat(
                    3, axis=-1).astype(np.uint8)
            else:
                self.subgoal, self.goal_img = gen_goal_shape(
                    "K", h=self.screenHeight, w=self.screenWidth,
                    font_name="helvetica")
        elif mode == "same_goal":
            self.env.init_pos = ("center" if scene_idx % 2 == 0
                                 else "center_init_2")
            self.env.reset()
            self.subgoal, mask = gen_subgoal(320, 320, 100,
                                             h=self.screenHeight,
                                             w=self.screenWidth)
            self.goal_img = (mask[..., None] * 255).repeat(
                3, axis=-1).astype(np.uint8)
        else:
            raise NotImplementedError(mode)

    def gen_dataset(self, save_dir="", base_scene=0, n_scenes=None):
        """base_scene / n_scenes shard the scene range across workers
        (embarrassingly parallel, like gnn_dyn_data's --base-epi)."""
        from .gp_opt import expected_minimum, gp_minimize_int

        self.save_dir = save_dir or self.config["mpc_data"]["folder"]
        os.makedirs(self.save_dir, exist_ok=True)
        save_yaml(self.config, os.path.join(self.save_dir, "config.yaml"))
        num_scene = (n_scenes if n_scenes is not None
                     else self.config["mpc_data"]["num_scene"])
        mode = self.config["mpc_data"]["mode"]
        gp = self.config["mpc_data"]["gp"]

        for scene_idx in range(base_scene, base_scene + num_scene):
            done = all(os.path.exists(os.path.join(
                self.save_dir, str(scene_idx * self.num_steps + s),
                "opt_den.npy")) for s in range(self.num_steps))
            if done:
                # restart-idempotent sharding after a worker/tunnel crash:
                # a scene is complete once its GP optimum is written
                print("scene %d already labeled, skipping" % scene_idx)
                continue
            print("generating scene:", scene_idx)
            self._scene_setup(scene_idx, mode)
            self.last_pos = self.env.get_positions()

            for step_i in range(self.num_steps):
                self.pos = []
                self.eval_idx = 0
                step_dir = os.path.join(
                    self.save_dir,
                    str(step_i + scene_idx * self.num_steps))
                os.makedirs(step_dir, exist_ok=True)
                self.env.set_positions(self.last_pos)
                init_action = os.path.join(
                    "assets", "init_action_%d.npy" % self.n_sample)
                if os.path.exists(init_action):
                    self.action_seq_mpc_init = np.load(
                        init_action)[np.newaxis, ...]
                else:
                    acts, _ = self.env.sample_action(self.n_sample)
                    self.action_seq_mpc_init = acts.transpose(1, 0, 2)
                self.action_label_seq_mpc_init = np.zeros(1)

                raw_obs = self.env.render()
                write_color(os.path.join(step_dir, "goal.png"),
                            self.goal_img)
                init_state = ((raw_obs[..., -1]
                               < FG_THRESHOLD * self.global_scale) * 255
                              )[..., None].repeat(3, axis=-1)
                write_color(os.path.join(step_dir, "init.png"), init_state)
                np.save(os.path.join(step_dir, "init_p.npy"), self.last_pos)

                init_rew = gt_rewards(
                    (raw_obs[..., -1]
                     < FG_THRESHOLD * self.global_scale).astype(np.float32),
                    self.subgoal)
                kernel = (1 ** 2 * Matern(length_scale=gp["length"],
                                          nu=gp["nu"])
                          + WhiteKernel(
                              noise_level=(gp["noise"] * init_rew) ** 2))
                base = GaussianProcessRegressor(
                    kernel=kernel, normalize_y=True,
                    n_restarts_optimizer=10)
                res = gp_minimize_int(
                    self.param_eval_fn, 2, 100, base, n_calls=10,
                    x0=[[2], [25], [50], [75], [100]], random_state=42)
                approx_x, approx_fn = expected_minimum(res, 2, 100)
                np.save(os.path.join(step_dir, "opt_den.npy"),
                        np.array([approx_x]))
                np.save(os.path.join(step_dir, "opt_y.npy"),
                        np.array([approx_fn]))
                np.save(os.path.join(step_dir, "x_iters.npy"),
                        np.array(res.x_iters))
                np.save(os.path.join(step_dir, "func_vals.npy"),
                        np.array(res.func_vals))
                self.last_pos = self.pos[np.random.randint(len(self.pos))]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="")
    ap.add_argument("--config", default=None)
    ap.add_argument("--base-scene", type=int, default=0)
    ap.add_argument("--n-scenes", type=int, default=None)
    ap.add_argument("--seed", type=int, default=None)
    args = ap.parse_args()
    cfg = load_config(args.config) if args.config else load_config(
        "config/data_gen/res_rgr.yaml"
        if os.path.exists("config/data_gen/res_rgr.yaml") else None)
    if args.seed is not None:
        np.random.seed(args.seed)
    opt = GPParamOpt(cfg)
    if args.seed is not None:
        opt.env.seed(args.seed)
    opt.gen_dataset(args.dir, base_scene=args.base_scene,
                    n_scenes=args.n_scenes)


if __name__ == "__main__":
    main()
