"""config_reward_ptcl_fast (the planner's gather-free MXU reward) must
track the exact reward (flex_rewards.py:156-214 semantics) in value and
gradient — it drives the optimizer; the exact path does the scoring."""
import jax
import jax.numpy as jnp
import numpy as np

from dyn_res_pile_manip_tpu.env import rewards as rew
from dyn_res_pile_manip_tpu.utils.imaging import gen_subgoal


def _setup(n=17, b=5):
    subgoal, _ = gen_subgoal(40, 44, 12, h=96, w=96)
    field = rew.prepare_goal(subgoal)
    us, v = rew.prepare_goal_lowrank(subgoal, rank=64)
    coor = jnp.asarray(rew.goal_coords(subgoal, 25))
    cam = (96.0, 96.0, 48.0, 48.0)
    rng = np.random.default_rng(3)
    state = rng.uniform(-0.2, 0.2, (b, n, 3)).astype(np.float32)
    state[..., 2] += 0.75
    return jnp.asarray(state), field, us, v, cam, coor


def test_fast_reward_matches_exact():
    state, field, us, v, cam, coor = _setup()
    exact = rew.config_reward_ptcl(state, field, cam, coor)
    fast = rew.config_reward_ptcl_fast(state, us, v, cam, coor)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                               rtol=2e-3, atol=5e-3)


def test_fast_reward_gradient_direction():
    state, field, us, v, cam, coor = _setup()

    g_exact = jax.grad(lambda s: jnp.sum(
        rew.config_reward_ptcl(s, field, cam, coor)))(state)
    g_fast = jax.grad(lambda s: jnp.sum(
        rew.config_reward_ptcl_fast(s, us, v, cam, coor)))(state)
    ge = np.asarray(g_exact).reshape(-1)
    gf = np.asarray(g_fast).reshape(-1)
    cos = ge @ gf / (np.linalg.norm(ge) * np.linalg.norm(gf) + 1e-12)
    assert cos > 0.99, f"gradient cosine {cos}"
    # magnitudes comparable (the optimizer's step scale must not change)
    ratio = np.linalg.norm(gf) / (np.linalg.norm(ge) + 1e-12)
    assert 0.8 < ratio < 1.25, f"gradient norm ratio {ratio}"
