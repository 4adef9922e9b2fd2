"""Gradient-descent / MPPI MPC planner over vmapped GNN rollouts.

TPU-native re-design of the reference PlannerGD (planners.py:64-871):

- the whole optimize loop (pusher model -> GNN rollout -> reward -> Adam
  update -> workspace clamp -> best-action tracking) is ONE jitted scan;
  the reference dispatches ~7 CUDA kernels + 2 syncs per iteration.
- candidate x state-hypothesis parallelism (n_sample x n_batch rollouts,
  planners.py:336-359) is a leading batch axis, shardable across chips via
  parallel.mesh.
- the time-budgeted iteration count (planners.py:25-28 fitted perf model;
  679-682) is replaced by an online calibration: a short jitted scan is
  timed per (shape) bucket and the remaining budget runs as one scan.

The differentiable pusher model gen_s_delta matches planners.py:211-257
exactly (infinite-height board, half-width 0.8/24 camera units, hard
length mask x soft exponential width mask x distance-to-end displacement).
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..env import rewards as rew

PUSHER_W = 0.8 / 24.0


def world2cam_matrix(cam_extrinsic: np.ndarray) -> np.ndarray:
    """inv(opencv_T_world) (planners.py:197-203)."""
    opencv_T_opengl = np.diag([1.0, -1.0, -1.0, 1.0])
    opencv_T_world = np.linalg.inv(cam_extrinsic) @ opencv_T_opengl
    return np.linalg.inv(opencv_T_world)


def gen_s_delta(s_cur, action, w2c, global_scale):
    """Differentiable pusher model (planners.py:211-257).

    s_cur: (B, Np, 3) camera-frame particles; action: (B, 4) world pushes.
    """
    s = action[:, :2]
    e = action[:, 2:]
    zeros = jnp.zeros_like(s[:, :1])
    s_3d = jnp.concatenate([s[:, 0:1], zeros, -s[:, 1:2],
                            jnp.ones_like(zeros)], axis=1)
    e_3d = jnp.concatenate([e[:, 0:1], zeros, -e[:, 1:2],
                            jnp.ones_like(zeros)], axis=1)
    s_cam = (s_3d @ w2c.T)[:, :3] / global_scale
    e_cam = (e_3d @ w2c.T)[:, :3] / global_scale

    push_dir = e_cam - s_cam
    push_l = jnp.linalg.norm(push_dir, axis=1)
    push_dir = push_dir / jnp.maximum(
        jnp.linalg.norm(push_dir, axis=1, keepdims=True), 1e-9)
    ortho = jnp.stack([-push_dir[:, 1], push_dir[:, 0],
                       jnp.zeros_like(push_dir[:, 0])], axis=1)

    pos_diff = s_cur - s_cam[:, None, :]                      # (B, Np, 3)
    proj_ortho = jnp.sum(pos_diff * ortho[:, None, :], axis=-1)
    proj = jnp.sum(pos_diff * push_dir[:, None, :], axis=-1)
    l_mask = ((proj < push_l[:, None]) & (proj > 0.0)).astype(s_cur.dtype)
    w_excess = jnp.maximum(jnp.maximum(-PUSHER_W - proj_ortho, 0.0),
                           jnp.maximum(proj_ortho - PUSHER_W, 0.0))
    w_mask = jnp.exp(-w_excess / 0.01)
    to_end = jnp.sum((e_cam[:, None, :] - s_cur) * push_dir[:, None, :],
                     axis=-1)
    return (to_end[..., None] * push_dir[:, None, :]
            * l_mask[..., None] * w_mask[..., None])


class PlannerGD:
    def __init__(self, config, env):
        self.config = config
        self.env = env
        self.action_dim = 4
        self.global_scale = config["dataset"]["global_scale"]
        self.n_his = config["train"]["n_history"]
        self.cam_params = env.get_cam_params()
        self.is_real = env.is_real
        self.cam_extrinsic = env.get_cam_extrinsics()
        self.screenHeight = env.screenHeight
        self.screenWidth = env.screenWidth
        self._w2c = jnp.asarray(world2cam_matrix(self.cam_extrinsic),
                                jnp.float32)
        self._iter_ms = {}          # shape-bucket -> measured ms/iter
        # bf16 GNN compute in the optimize loop (~2x per-iteration; exact
        # position selection is preserved — models/gnn_dyn.py). The
        # reference runs f32 torch; disable via mpc.gd.bf16: false.
        self.bf16 = bool(config["mpc"]["gd"].get("bf16", True))
        # fused Pallas relation-MLP on the rollout's first step (no
        # gradient flows through that branch — models/gnn_dyn.py).
        # OPT-IN via DYNRES_FUSED_EDGES=1: measured end-to-end fwd+grad
        # at the bench shape it LOST to the inline-one-hot XLA path
        # (56.8 vs 22.9 ms — the kernel's 8->64 matmuls underuse the MXU
        # and r_in still streams from HBM; PERFORMANCE.md round-5 notes).
        import os
        self._fused_edges = bool(os.environ.get("DYNRES_FUSED_EDGES"))

    # ------------------------------------------------------------ sampling
    def sample_action_sequences(self, init_act_seq, init_act_label_seq,
                                n_sample, action_lower_lim, action_upper_lim,
                                noise_type="normal"):
        """MPPI-style beta-filtered noise sampler (planners.py:69-190)."""
        beta_filter = self.config["mpc"]["mppi"]["beta_filter"]
        dim = init_act_seq.ndim
        act_seqs = np.stack([init_act_seq] * n_sample)
        shape = ((n_sample, self.action_dim) if dim == 2
                 else (n_sample, init_act_seq.shape[1], self.action_dim))
        act_residual = np.zeros(shape)
        for i in range(self.n_his - 1, init_act_seq.shape[0]):
            if noise_type == "normal":
                sigma = self.config["mpc"]["sigma"] * self.global_scale / 12.0
                noise_sample = np.random.normal(0, sigma, shape)
            elif noise_type == "uniform":
                sigma = 2.0 * self.global_scale / 12.0
                noise_sample = np.random.uniform(-sigma, sigma, shape)
            elif noise_type == "total_rand":
                noise_sample = np.zeros(shape)
            else:
                raise ValueError(noise_type)
            act_residual = (beta_filter * noise_sample
                            + act_residual * (1.0 - beta_filter))
            act_seqs[:, i] += act_residual
            lo, hi = self._cvx_limits(0)
            if dim == 2:
                act_seqs[:, i] = np.clip(act_seqs[:, i], lo, hi)
            else:
                act_seqs[:, i, 0] = np.clip(act_seqs[:, i, 0], lo, hi)
            if noise_type == "total_rand":
                act_seqs[:, i, 0] = np.random.uniform(
                    lo, hi, (n_sample, self.action_dim))
        return act_seqs

    def optimize_action(self, act_seqs, reward_seqs):
        """Softmax-weighted action aggregation (planners.py:549-561)."""
        reward_weight = self.config["mpc"]["mppi"]["reward_weight"]
        n_sample, n_look_ahead, cvx_num, action_dim = act_seqs.shape
        act_seq = np.zeros((n_look_ahead, cvx_num, action_dim))
        from scipy.special import softmax
        for i in range(cvx_num):
            w = softmax(reward_weight * reward_seqs[:, i]).reshape(-1, 1, 1)
            act_seq[:, i, :] = (w * act_seqs[:, :, i, :]).sum(0)
        return act_seq

    def _cvx_limits(self, cvx_i):
        r = self.env.cvx_region[cvx_i]
        x_diff, y_diff = r[1] - r[0], r[3] - r[2]
        lo = np.array([r[0], r[2], r[0] + 0.15 * x_diff, r[2] + 0.15 * y_diff])
        hi = np.array([r[1], r[3], r[1] - 0.15 * x_diff, r[3] - 0.15 * y_diff])
        return lo, hi

    # ------------------------------------------------------------- rollout
    def ptcl_model_rollout(self, model_dy, params, s_cur, s_param, a_cur,
                           act_seqs):
        """Roll the GNN over act_seqs. s_cur: (n_batch, Np, 3);
        act_seqs: (S, n_act, 4) with S = n_sample * n_batch."""
        S = act_seqs.shape[0]
        n_batch = s_cur.shape[0]
        n_sample = S // n_batch
        s = jnp.tile(s_cur, (n_sample, 1, 1))
        den = jnp.tile(s_param, (n_sample,))
        attr = jnp.tile(a_cur, (n_sample, 1))
        preds = []
        for t in range(act_seqs.shape[1]):
            s_delta = gen_s_delta(s, act_seqs[:, t, :], self._w2c,
                                  self.global_scale)
            # fused relation kernel only at t=0 where s carries no
            # gradient (later steps' s depends on predictions)
            s = model_dy.predict_one_step(
                params, attr, s, s_delta, den, bf16=self.bf16,
                fused_edges=bool(self._fused_edges) and t == 0)
            preds.append(s)
        return jnp.stack(preds, axis=1)       # (S, n_act, Np, 3)

    def model_rollout(self, state_cur, model_dy, act_seqs, state_param,
                      attr_cur):
        """Reference model_rollout surface (planners.py:300-371): roll
        act_seqs (n_sample * n_batch, N_act, 4) through the GNN from
        state_cur (n_batch, Np, 3). Returns the reference's nested dict."""
        t0 = time.perf_counter()
        pred = self.ptcl_model_rollout(
            model_dy, model_dy.params,
            jnp.asarray(state_cur, jnp.float32),
            jnp.asarray(state_param, jnp.float32).reshape(-1),
            jnp.asarray(attr_cur, jnp.float32),
            jnp.asarray(act_seqs, jnp.float32))
        jax.block_until_ready(pred)
        return {"model_rollout": {"state_pred": pred},
                "rollout_time": (time.perf_counter() - t0) * 1e3}

    def ptcl_evaluate_traj(self, obs_seqs, obs_goal, obs_goal_coor=None,
                           funnel_dist=None, distractor_df_fn=None,
                           act_seqs_tensor=None, normalize_rew=True):
        """Reference ptcl_evaluate_traj (planners.py:373-457): obs_seqs
        (n_sample, n_look_ahead, cvx_num, Np, 3) -> (reward_seqs, next_r)."""
        obs = jnp.asarray(obs_seqs, jnp.float32)
        n_sample, n_look, cvx, n_ptcl, _ = obs.shape
        goal_np = np.asarray(obs_goal)
        goal_field = rew.prepare_goal(goal_np)
        if obs_goal_coor is None:
            obs_goal_coor = rew.goal_coords(
                goal_np, min(n_ptcl * 5, int((goal_np < 0.5).sum())))
        cam = tuple(jnp.float32(c) for c in self.cam_params)
        next_r = rew.config_reward_ptcl(
            obs.reshape(-1, n_ptcl, 3), goal_field, cam,
            jnp.asarray(obs_goal_coor), normalize=normalize_rew)
        distractor = jnp.zeros_like(next_r)
        if distractor_df_fn is not None:
            distractor = rew.distractor_reward_diff(
                jnp.asarray(act_seqs_tensor, jnp.float32),
                distractor_df_fn, self.config, width=self.screenWidth)
        next_r = next_r.reshape(n_sample, n_look, cvx)
        distractor = distractor.reshape(n_sample, n_look, cvx)
        reward_seqs = next_r[:, -1] + distractor.sum(axis=1)
        return np.asarray(reward_seqs), np.asarray(next_r)

    def evaluate_traj(self, obs_seqs, obs_goal, obs_goal_mask_tensor,
                      distractor_df_fn=None, act_seqs_tensor=None):
        """Image-space reward path (planners.py:459-530): obs_seqs
        (n_sample, n_look_ahead, cvx_num, res*res) binary occupancy images
        -> (reward_seqs, next_r) via the image config_reward."""
        obs = jnp.asarray(obs_seqs, jnp.float32)
        n_sample, n_look, cvx, flat_dim = obs.shape
        res = int(np.sqrt(flat_dim))
        imgs = obs.reshape(-1, 1, res, res)
        next_r = rew.config_reward(
            imgs, jnp.asarray(obs_goal, jnp.float32),
            jnp.asarray(obs_goal_mask_tensor, jnp.float32))
        distractor = jnp.zeros_like(next_r)
        if distractor_df_fn is not None:
            distractor = rew.distractor_reward_diff(
                jnp.asarray(act_seqs_tensor, jnp.float32),
                distractor_df_fn, self.config, width=self.screenWidth)
        next_r = next_r.reshape(n_sample, n_look, cvx)
        distractor = distractor.reshape(n_sample, n_look, cvx)
        reward_seqs = next_r[:, -1] + distractor.sum(axis=1)
        return np.asarray(reward_seqs), np.asarray(next_r)

    # --------------------------------------------------------- MPPI driver
    @functools.partial(jax.jit, static_argnames=("self", "model_dy",
                                                 "n_batch"))
    def _mppi_eval(self, model_dy, params, s_cur, s_param, a_cur, acts,
                   goal_field, goal_coor, n_batch: int):
        """Rollout + terminal reward for one MPPI iteration; rewards are
        averaged across state hypotheses: (n_sample,)."""
        pred = self.ptcl_model_rollout(model_dy, params, s_cur, s_param,
                                       a_cur, acts)
        cam = tuple(jnp.float32(c) for c in self.cam_params)
        r = rew.config_reward_ptcl(pred[:, -1], goal_field, cam, goal_coor)
        return jnp.mean(r.reshape(-1, n_batch), axis=1), pred

    def trajectory_optimization_mppi(
            self, state_cur_np, state_param, attr_cur_np, obs_goal, model_dy,
            act_seq, act_label_seq, n_sample, n_look_ahead, n_update_iter,
            action_lower_lim, action_upper_lim,
            rollout_best_action_sequence=True, time_lim=float("inf"),
            **_kw):
        """End-to-end MPPI: beta-filtered sampling (planners.py:69-190) ->
        GNN rollout -> terminal reward -> softmax aggregation
        (planners.py:549-561), iterated. The reference ships this
        machinery but its driver raises for mpc_type != 'GD'
        (env/flex_env.py:973-976); here it is a working alternative."""
        t_start = time.time()
        self.particle_num = state_cur_np.shape[1]
        n_batch = state_cur_np.shape[0]
        act_seq2 = np.asarray(act_seq, np.float64)
        if act_seq2.ndim == 3:          # (n_act, traj, 4) -> first traj
            act_seq2 = act_seq2[:, 0, :]
        n_act = act_seq2.shape[0]

        model_params = model_dy.params
        s_cur = jnp.asarray(state_cur_np, jnp.float32)
        s_param = jnp.asarray(state_param, jnp.float32).reshape(-1)
        if s_param.shape[0] == 1:
            s_param = jnp.tile(s_param, (n_batch,))
        a_cur = jnp.asarray(attr_cur_np, jnp.float32)
        goal_np = np.asarray(obs_goal)
        goal_field = rew.prepare_goal(goal_np)
        goal_coor = jnp.asarray(rew.goal_coords(
            goal_np, min(self.particle_num * 5,
                         int((goal_np < 0.5).sum()))))

        labels = (act_label_seq if act_label_seq is not None
                  else np.zeros(n_act, np.int32))
        best_r, best_seq = -np.inf, act_seq2.copy()
        rew_mean = np.zeros((1, n_update_iter), np.float32)
        rew_std = np.zeros_like(rew_mean)
        n_iters = 0
        for it in range(n_update_iter):
            if (time.time() - t_start) * 1000.0 > time_lim:
                break
            samples = self.sample_action_sequences(
                act_seq2, labels, n_sample, action_lower_lim,
                action_upper_lim)                     # (n_sample, n_act, 4)
            acts = jnp.asarray(np.repeat(samples, n_batch, axis=0),
                               jnp.float32)
            r, _ = self._mppi_eval(model_dy, model_params, s_cur, s_param,
                                   a_cur, acts, goal_field, goal_coor,
                                   int(n_batch))
            r = np.asarray(r)                         # (n_sample,)
            act_seq2 = self.optimize_action(
                samples[:, :, None, :], r[:, None])[:, 0, :]
            i_best = int(np.argmax(r))
            if r[i_best] > best_r:
                best_r, best_seq = float(r[i_best]), samples[i_best]
            rew_mean[0, it], rew_std[0, it] = r.mean(), r.std()
            n_iters += 1

        obs_seq_best, next_r = None, np.zeros((1,))
        if rollout_best_action_sequence:
            _, pred = self._mppi_eval(
                model_dy, model_params, s_cur[:1], s_param[:1], a_cur[:1],
                jnp.asarray(best_seq[None], jnp.float32), goal_field,
                goal_coor, 1)
            obs_seq_best = np.asarray(pred[0])
            next_r = np.array([best_r])

        return {
            "action_sequence": best_seq,
            "action_full": best_seq[None],
            "reward_full": np.array([best_r]),
            "observation_sequence": obs_seq_best,
            "observation_distractor_sequence": None,
            "reward": np.asarray(best_r),
            "next_r": next_r,
            "rew_mean": rew_mean,
            "rew_std": rew_std,
            "times": {"total_time": time.time() - t_start,
                      "rollout_time": 0.0, "optim_time": 0.0},
            "iter_num": n_iters,
        }

    # ------------------------------------------------- the jitted optimizer
    @functools.partial(jax.jit, static_argnames=("self", "model_dy",
                                                 "n_iters", "n_batch",
                                                 "distractor_df_fn",
                                                 "fast_reward"))
    def _optimize(self, model_dy, params, s_cur, s_param, a_cur, acts0,
                  goal_field, goal_coor, lims_lo, lims_hi, lr,
                  n_iters: int, n_batch: int, distractor_df_fn=None,
                  fast_reward: bool = False,
                  lam_plen=jnp.float32(0.0)):
        """acts0: (S, n_act, 4). Returns final acts, per-iter stats, best
        action tracking. distractor_df_fn (jittable (px, py) -> intrusion
        depth) folds the swept-segment distractor penalty into the reward,
        differentiable through the actions (planners.py:700-712 +
        flex_rewards.py:245-264).

        lam_plen > 0 adds a quadratic push-length penalty (trust region on
        the action magnitude): the round-2/3 diagnosis (logs/diag_gap_r2.log)
        showed the Adam loop exploiting the model's over-optimism on LONG
        pushes (+13.3 predicted vs -12.5 actual mean gain); model error
        grows with per-push displacement, so shrinking preferred push
        length keeps the optimizer inside the model's trust region. No
        reference counterpart (the reference runs sim-free and inherits
        the same exploitation failure mode)."""
        optimizer = optax.adam(lr, b1=0.9, b2=0.999)
        opt_state = optimizer.init(acts0)
        S, n_act, _ = acts0.shape
        n_sample = S // n_batch
        cam = tuple(jnp.float32(c) for c in self.cam_params)

        def loss_fn(acts):
            pred = self.ptcl_model_rollout(model_dy, params, s_cur, s_param,
                                           a_cur, acts)
            final = pred[:, -1]                              # (S, Np, 3)
            if fast_reward:
                # gather-free MXU reward (rank-K field + matmul coverage);
                # candidate scoring/reporting stays on the exact reward
                r = rew.config_reward_ptcl_fast(final, goal_field[0],
                                                goal_field[1], cam,
                                                goal_coor)
            else:
                r = rew.config_reward_ptcl(final, goal_field, cam,
                                           goal_coor)
            if distractor_df_fn is not None:
                dr = rew.distractor_reward_diff(
                    acts[:, :, None, :], distractor_df_fn, self.config,
                    width=self.screenWidth)                  # (S*n_act,)
                r = r + jnp.sum(dr.reshape(S, n_act), axis=1)
            plen2 = jnp.sum((acts[:, :, 2:4] - acts[:, :, 0:2]) ** 2,
                            axis=-1)                         # (S, n_act)
            r = r - lam_plen * jnp.sum(plen2, axis=1)
            return -jnp.sum(r), r

        def body(carry, _):
            acts, opt_state, best_r, best_traj, best_act = carry
            (_, r), g = jax.value_and_grad(loss_fn, has_aux=True)(acts)
            # track best action per state hypothesis BEFORE the update, on
            # the actions the rewards were computed for (planners.py:721-727)
            r_sb = r.reshape(n_sample, n_batch)
            cur_max = jnp.max(r_sb, axis=0)
            cur_idx = jnp.argmax(r_sb, axis=0)
            improved = cur_max > best_r
            best_r = jnp.where(improved, cur_max, best_r)
            best_traj = jnp.where(improved, cur_idx, best_traj)
            sel = acts.reshape(n_sample, n_batch, n_act, -1)[
                cur_idx, jnp.arange(n_batch)]
            best_act = jnp.where(improved[:, None, None], sel, best_act)
            updates, opt_state = optimizer.update(g, opt_state)
            acts = optax.apply_updates(acts, updates)
            acts = jnp.clip(acts, lims_lo[None, None, :],
                            lims_hi[None, None, :])
            stats = (jnp.mean(r), jnp.std(r))
            return (acts, opt_state, best_r, best_traj, best_act), stats

        init = (acts0, opt_state,
                jnp.full((n_batch,), -jnp.inf),
                jnp.zeros((n_batch,), jnp.int32),
                jnp.zeros((n_batch, n_act, 4)))
        (acts, _, best_r, best_traj, best_act), (r_mean, r_std) = \
            jax.lax.scan(body, init, None, length=n_iters)
        # final rewards for reporting
        _, r_final = loss_fn(acts)
        return acts, best_r, best_traj, best_act, r_mean, r_std, r_final

    @functools.partial(jax.jit, static_argnames=("self", "model_dy"))
    def _cross_eval(self, model_dy, params, s_cur, s_param, a_cur, cands,
                    goal_field, goal_coor, lam_plen=jnp.float32(0.0)):
        """Mean and std of each candidate action sequence's model reward
        across ALL state hypotheses. cands: (C, n_act, 4) -> ((C,), (C,)).

        Used by robust_select: the per-hypothesis argmax can crown an
        action that only looks good under one FPS resample of the cloud
        (model-error exploitation); scoring every finalist under the full
        hypothesis ensemble keeps only actions robust to perception
        noise. Selection-side extension of the reference's majority vote
        (planners.py:771-781). The std output feeds risk-averse selection
        (mean - k*std): outcome variance across perception hypotheses is a
        cheap epistemic-uncertainty proxy, and exploitative actions are
        disproportionately high-variance. lam_plen applies the same
        push-length trust-region penalty as _optimize so selection and
        optimization score the same objective."""
        C = cands.shape[0]
        n_batch = s_cur.shape[0]
        acts = jnp.repeat(cands, n_batch, axis=0)      # (C*n_batch, n_act, 4)
        pred = self.ptcl_model_rollout(model_dy, params, s_cur, s_param,
                                       a_cur, acts)
        cam = tuple(jnp.float32(c) for c in self.cam_params)
        r = rew.config_reward_ptcl(pred[:, -1], goal_field, cam, goal_coor)
        plen2 = jnp.sum((cands[:, :, 2:4] - cands[:, :, 0:2]) ** 2, axis=-1)
        r_cb = r.reshape(C, n_batch)
        mean_r = jnp.mean(r_cb, axis=1) - lam_plen * jnp.sum(plen2, axis=1)
        return mean_r, jnp.std(r_cb, axis=1)

    def _calibrate(self, run_fn, key):
        if key in self._iter_ms:
            return self._iter_ms[key]
        # particle counts <= ~100 barely move the iteration cost: reuse a
        # measurement from the same batch geometry instead of paying a
        # fresh calibration compile per N (GP labeling sweeps many N)
        for k, ms in self._iter_ms.items():
            if k[1:] == key[1:] and abs(k[0] - key[0]) <= 60:
                self._iter_ms[key] = ms
                return ms
        def timed(n, eps):
            t0 = time.perf_counter()
            jax.block_until_ready(run_fn(n, eps))
            return time.perf_counter() - t0

        # slope between two iteration counts cancels the per-dispatch
        # overhead (the axon tunnel round-trip alone is ~10 ms/iter when
        # amortized over only 5 iterations) and the in-jit final reward
        # eval; n=15 sits on the budget snap grid so this compile is
        # reused by short time-budgeted runs. Min-of-3 per size: a
        # single-sample slope is noise-dominated through the tunnel —
        # one inflated t5 produced the round-3 6.4 ms/iter outlier
        # (BENCH_r03, a 4x error vs the idle-chip repeat value of
        # ~27 ms/iter). The min strips one-sided latency spikes.
        # Every timed dispatch gets a DIFFERENT input perturbation:
        # byte-identical repeat dispatches through the axon tunnel can
        # return ~instantly (result caching somewhere in the stack,
        # PERFORMANCE.md), and one cached timing collapses or inflates
        # the slope — the likely source of the r4 77k-vs-114k bench
        # spread on identical code. The perturbation is applied outside
        # jit to an existing operand, so shapes/compiled programs are
        # unchanged.
        timed(5, 0.0)                            # compile
        t5 = min(timed(5, 1e-6 * i) for i in range(1, 4))
        timed(15, 0.0)                           # compile
        t15 = min(timed(15, 1e-6 * i) for i in range(1, 4))
        ms = (t15 - t5) * 1000.0 / 10
        if not ms > 0:                           # timing noise floor
            ms = t15 * 1000.0 / 15
        self._iter_ms[key] = ms
        return ms

    # ------------------------------------------------------- the entry point
    def trajectory_optimization_ptcl_multi_traj(
            self, state_cur_np, state_param, attr_cur_np, obs_goal, model_dy,
            act_seq, act_label_seq, n_sample, n_look_ahead, n_update_iter,
            action_lower_lim, action_upper_lim, use_gpu=True,
            rollout_best_action_sequence=True, reward_params=None,
            funnel_dist=None, distractor_df_fn=None, gd_loop=1,
            time_lim=float("inf")):
        """Drop-in equivalent of planners.py:563-871. act_seq:
        (n_act, traj_num, 4) numpy; state_cur_np: (n_batch, Np, 3).

        funnel_dist is accepted for signature parity and unused — the
        reference also accepts it and never reads it (planners.py:579,
        673-871)."""
        t_start = time.time()
        self.particle_num = state_cur_np.shape[1]
        n_batch = state_cur_np.shape[0]
        n_act, traj_num = act_seq.shape[0], act_seq.shape[1]
        lr = self.config["mpc"]["gd"]["lr"]

        model_params = model_dy.params
        s_cur = jnp.asarray(state_cur_np, jnp.float32)
        s_param = jnp.asarray(state_param, jnp.float32).reshape(-1)
        if s_param.shape[0] == 1:
            s_param = jnp.tile(s_param, (n_batch,))
        a_cur = jnp.asarray(attr_cur_np, jnp.float32)

        # goal preprocessing (host, once)
        goal_field = rew.prepare_goal(obs_goal)
        coor = rew.goal_coords(obs_goal,
                               min(self.particle_num * 5,
                                   int((obs_goal < 0.5).sum())))
        goal_coor = jnp.asarray(coor)
        fast_reward = bool(self.config["mpc"]["gd"].get("fast_reward",
                                                        True))
        lam_plen = jnp.float32(self.config["mpc"]["gd"].get(
            "lam_push_len", 0.0))
        risk_k = float(self.config["mpc"]["gd"].get("risk_select_std", 0.0))
        opt_field = (rew.prepare_goal_lowrank(obs_goal) if fast_reward
                     else goal_field)

        # initial action tensor: repeat over state hypotheses
        acts0 = np.transpose(act_seq, (1, 0, 2))          # (traj, n_act, 4)
        acts0 = np.repeat(acts0, n_batch, axis=0)         # (S, n_act, 4)
        acts0 = jnp.asarray(acts0, jnp.float32)

        lo, hi = self._cvx_limits(0)
        lims_lo = jnp.asarray(lo, jnp.float32)
        lims_hi = jnp.asarray(hi, jnp.float32)

        def run(n_iters, eps=0.0):
            # eps != 0 only for calibration dispatches: a per-call input
            # perturbation (same shapes, new bytes) defeats the tunnel's
            # repeat-dispatch result caching without recompiling
            a0 = acts0 + jnp.float32(eps) if eps else acts0
            return self._optimize(model_dy, model_params, s_cur, s_param,
                                  a_cur, a0, opt_field, goal_coor,
                                  lims_lo, lims_hi, jnp.float32(lr),
                                  int(n_iters), int(n_batch),
                                  distractor_df_fn=distractor_df_fn,
                                  fast_reward=fast_reward,
                                  lam_plen=lam_plen)

        key = (self.particle_num, n_batch, traj_num, n_act,
               distractor_df_fn is not None)
        ms_per_iter = self._calibrate(run, key)
        budget = (int(time_lim / ms_per_iter)
                  if np.isfinite(time_lim) else n_update_iter)
        n_iters = int(max(1, min(n_update_iter, budget)))
        # snap the (jit-static) iteration count to a coarse grid so
        # time-budgeted runs don't compile a fresh optimizer per
        # calibration wobble (the budget is approximate anyway)
        grid = (1, 2, 4, 8, 15, 25, 40, 60, 100, 150, 200, 300, 500)
        n_iters = max(g for g in grid if g <= max(n_iters, 1))
        print(f"run mpc for {n_iters} iterations "
              f"({ms_per_iter:.1f} ms/iter calibrated)")

        t_opt = time.perf_counter()
        try:
            out_arrays = run(n_iters)
        except Exception as e:  # OOM guard (planners.py:694-696,748-750)
            if "RESOURCE_EXHAUSTED" not in str(e):
                raise
            print("OOM error — retrying with a shorter schedule")
            n_iters = max(1, n_iters // 4)
            out_arrays = run(n_iters)
        acts, best_r, best_traj, best_act, r_mean, r_std, r_final = \
            jax.tree_util.tree_map(np.asarray, out_arrays)
        optim_time = (time.perf_counter() - t_opt) * 1000.0

        # majority vote across state hypotheses (planners.py:771-781)
        counts = np.bincount(best_traj, minlength=n_sample)
        idx_best_act = int(np.argmax(counts))
        idx_best_sample, best_reward = -1, -np.inf
        for j in range(n_batch):
            if best_traj[j] == idx_best_act and best_r[j] > best_reward:
                idx_best_sample, best_reward = j, best_r[j]
        action_seq_future = best_act[idx_best_sample]     # (n_act, 4)

        candidate_actions, candidate_scores = best_act, best_r
        if self.config["mpc"]["gd"].get("robust_select", False):
            # re-score every hypothesis's best action under the FULL
            # hypothesis ensemble; execute the one with the best mean
            cands = jnp.asarray(best_act, jnp.float32)    # (n_batch, n_act, 4)
            mean_r, std_r = jax.tree_util.tree_map(np.asarray, self._cross_eval(
                model_dy, model_params, s_cur, s_param, a_cur, cands,
                goal_field, goal_coor, lam_plen=lam_plen))
            score = mean_r - risk_k * std_r
            j = int(np.argmax(score))
            action_seq_future = best_act[j]
            best_reward = float(mean_r[j])
            candidate_scores = score

        # rollout the chosen sequence for reporting
        obs_seq_best = None
        next_r = np.zeros((1,))
        if rollout_best_action_sequence:
            pred = self.ptcl_model_rollout(
                model_dy, model_params, s_cur[:1], s_param[:1], a_cur[:1],
                jnp.asarray(action_seq_future[None]))
            cam = tuple(jnp.float32(c) for c in self.cam_params)
            rr = rew.config_reward_ptcl(pred[:, -1], goal_field, cam,
                                        goal_coor)
            obs_seq_best = np.asarray(pred[0])            # (n_act, Np, 3)
            next_r = np.asarray(rr)

        total_time = time.time() - t_start
        rew_mean = np.zeros((1, max(n_update_iter * gd_loop, n_iters)),
                            np.float32)
        rew_std = np.zeros_like(rew_mean)
        rew_mean[0, :n_iters] = r_mean
        rew_std[0, :n_iters] = r_std
        return {
            "action_sequence": action_seq_future,
            # per-hypothesis best finalists + their model scores, for
            # downstream selection layers (sim-verify in the driver)
            "candidate_actions": np.asarray(candidate_actions),
            "candidate_scores": np.asarray(candidate_scores),
            "action_full": np.asarray(acts).reshape(
                traj_num, n_batch, n_act, 4)[:, 0, 0],
            "reward_full": np.asarray(r_final).reshape(
                -1, n_batch)[:, 0],
            "observation_sequence": obs_seq_best,
            "observation_distractor_sequence": None,
            "reward": np.asarray(best_reward),
            "next_r": next_r,
            "rew_mean": rew_mean,
            "rew_std": rew_std,
            "times": {"total_time": total_time,
                      "rollout_time": optim_time,
                      "optim_time": optim_time},
            "iter_num": n_iters,
        }
