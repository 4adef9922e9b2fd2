"""Attribute the MPC optimize-iteration time beyond the GNN itself:
reward fwd+grad, pusher model, Adam/tracking — at the bench shape
(B=1920, N=100). One lax.scan dispatch per number (CLAUDE.md)."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dyn_res_pile_manip_tpu.core.camera import Camera
from dyn_res_pile_manip_tpu.env import rewards as rew
from dyn_res_pile_manip_tpu.models.gnn_dyn import PropNetDiffDenModel
from dyn_res_pile_manip_tpu.planner import planner as pl
from dyn_res_pile_manip_tpu.utils.config import load_config
from dyn_res_pile_manip_tpu.utils.imaging import gen_subgoal

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
N = int(sys.argv[2]) if len(sys.argv) > 2 else 100
REPS = 30


def timed(name, fn, x0):
    @jax.jit
    def loop(x0):
        def body(c, _):
            out = fn(x0 + 1e-12 * c)
            leaves = jax.tree_util.tree_leaves(out)
            acc = sum(jnp.sum(jnp.abs(l[..., :1]).astype(jnp.float32))
                      if l.ndim else jnp.abs(l).astype(jnp.float32)
                      for l in leaves)
            return acc * 1e-20, None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
        return acc

    acc = loop(x0)
    jax.block_until_ready(acc)
    t0 = time.perf_counter()
    acc = loop(x0)
    jax.block_until_ready(acc)
    ms = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:38s} {ms:8.2f} ms")
    return ms


def main():
    cam = Camera.default(24.0)
    cam_params = tuple(jnp.float32(c) for c in cam.cam_params())
    subgoal, _ = gen_subgoal(360, 360, 100, h=720, w=720)
    goal_field = rew.prepare_goal(subgoal)
    goal_coor = jnp.asarray(rew.goal_coords(subgoal, 100))
    print("goal_coor:", goal_coor.shape)

    rng = np.random.default_rng(0)
    state = jnp.asarray(rng.uniform(-0.2, 0.2, (B, N, 3)), jnp.float32)
    state = state.at[..., 2].add(0.75)

    def reward_only(s):
        return rew.config_reward_ptcl(s, goal_field, cam_params, goal_coor)

    timed("reward fwd", reward_only, state)
    timed("reward fwd+grad",
          jax.grad(lambda s: jnp.sum(reward_only(s))), state)

    def field_sample(s):
        fx, fy, cx, cy = cam_params
        col = s[..., 0] * fx / s[..., 2] + cx
        row = s[..., 1] * fy / s[..., 2] + cy

        def sample(r, c):
            return jax.scipy.ndimage.map_coordinates(
                goal_field, [r - 0.5, c - 0.5], order=1, mode="nearest")
        return jax.vmap(sample)(row, col).sum()

    timed("  field sample fwd", field_sample, state)
    timed("  field sample fwd+grad", jax.grad(field_sample), state)

    def coverage(s):
        fx, fy, cx, cy = cam_params
        col = s[..., 0] * fx / s[..., 2] + cx
        row = s[..., 1] * fy / s[..., 2] + cy
        pix = jnp.stack([col, row], axis=-1)
        d = jnp.linalg.norm(
            goal_coor[None, :, None, :] - pix[:, None, :, :], axis=-1)
        return d.min(axis=2).sum()

    timed("  coverage fwd", coverage, state)
    timed("  coverage fwd+grad", jax.grad(coverage), state)

    # pusher model
    w2c = pl.world2cam_matrix(np.asarray(cam.extrinsics()))
    acts = jnp.asarray(rng.uniform(-4, 4, (B, 4)), jnp.float32)

    def sdelta(a):
        return pl.gen_s_delta(state, a, jnp.asarray(w2c, jnp.float32), 24.0)

    timed("gen_s_delta fwd", sdelta, acts)
    timed("gen_s_delta fwd+grad",
          jax.grad(lambda a: jnp.sum(sdelta(a))), acts)


if __name__ == "__main__":
    main()
