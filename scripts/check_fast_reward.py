"""Numeric check of config_reward_ptcl_fast vs the exact reward on disc
and letter goals, then re-run bench.bench_mpc to get the new calibrated
headline."""
import numpy as np
import jax.numpy as jnp

from dyn_res_pile_manip_tpu.env import rewards as rew
from dyn_res_pile_manip_tpu.utils.imaging import gen_subgoal, gen_goal_shape


def check(goal, name, N=100):
    field = rew.prepare_goal(goal)
    us, v = rew.prepare_goal_lowrank(goal)
    coor = jnp.asarray(rew.goal_coords(goal, N * 5))
    cam = (903.0, 903.0, 360.0, 360.0)
    rng = np.random.default_rng(0)
    state = rng.uniform(-0.2, 0.2, (64, N, 3)).astype(np.float32)
    state[..., 2] += 0.75
    exact = np.asarray(rew.config_reward_ptcl(
        jnp.asarray(state), field, cam, coor))
    fast = np.asarray(rew.config_reward_ptcl_fast(
        jnp.asarray(state), us, v, cam, coor))
    err = np.abs(fast - exact)
    rel = err / np.abs(exact)
    print(f"{name:10s} exact range [{exact.min():.2f},{exact.max():.2f}] "
          f"max abs err {err.max():.4f} max rel {rel.max():.2e}")
    # ranking agreement: Spearman-ish via argsort overlap of top decile
    k = max(1, len(exact) // 10)
    top_e = set(np.argsort(exact)[-k:])
    top_f = set(np.argsort(fast)[-k:])
    print(f"{'':10s} top-{k} overlap {len(top_e & top_f)}/{k}")


def main():
    subgoal, _ = gen_subgoal(360, 360, 100, h=720, w=720)
    check(subgoal, "disc")
    goal_i, _ = gen_goal_shape("I", h=720, w=720)
    check(goal_i, "letter I")

    import bench
    mpc = bench.bench_mpc()
    print(f"bench_mpc: {mpc:.1f} rollouts/s "
          f"(vs_baseline {mpc / bench.REF_MPC_ROLLOUTS_PER_SEC:.3f})")


if __name__ == "__main__":
    main()
