"""Component breakdown of pbd.build_cache at the 4k bench scene. Each
number is one lax.scan dispatch of REPS invocations (CLAUDE.md timing
rule)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from dyn_res_pile_manip_tpu.env import scene as scene_lib
from dyn_res_pile_manip_tpu.sim import pbd

REPS = 40


def timed(name, fn, x0):
    @jax.jit
    def loop(x0):
        def body(c, _):
            out = fn(x0 + c * 1e-12)
            leaves = jax.tree_util.tree_leaves(out)
            acc = sum(jnp.sum(jnp.abs(l.reshape(-1)[:1]).astype(jnp.float32))
                      for l in leaves if hasattr(l, "reshape"))
            return acc * 1e-20, None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
        return acc

    acc = loop(x0)
    jax.block_until_ready(acc)
    t0 = time.perf_counter()
    acc = loop(x0)
    jax.block_until_ready(acc)
    ms = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:36s} {ms:8.3f} ms", flush=True)
    return ms


def main():
    gs = 24.0
    params20 = np.array([
        0.36, 0.36, -1.2, 0.5, -1.2, 1.0, 0.9, 1.0,
        88, 10.0, 20.0, 6, 10, 6, 0.72, 0.0, -1, -1, -1, 0.0])
    state, sp, build = scene_lib.set_scene(22, params20, seed=0)
    n = int(np.asarray(state.active).sum())
    print(f"particles={n} capacity={state.x.shape[0]}")
    state = state.replace(slept=jnp.zeros(state.x.shape[0], bool))
    use_pallas = pbd.resolve_pallas(state)
    print("pallas:", use_pallas)

    timed("build_cache (full)",
          lambda x: pbd.build_cache(state.replace(x=x), sp,
                                    with_pair_mask=not use_pallas)[1]["sel"],
          state.x)

    timed("wake_masks",
          lambda x: pbd.wake_masks(state.replace(x=x), sp, None), state.x)

    timed("principal_axis",
          lambda x: pbd.principal_axis(x, state.active), state.x)

    axis = pbd.principal_axis(state.x, state.active)

    def sort_only(x):
        proj = x @ axis
        key = jnp.where(state.active, proj, jnp.float32(3e38))
        return jnp.argsort(key)

    timed("argsort", sort_only, state.x)
    perm = jax.jit(sort_only)(state.x)

    timed("permute_state",
          lambda x: pbd._permute_state(state.replace(x=x), perm).x,
          state.x)

    timed("group_onehot",
          lambda x: pbd.group_onehot(state.replace(x=x)), state.x)

    def windows(x):
        wi = jnp.where(state.active, state.invm, 0.0)
        return pbd._window(wi, 0.0, pbd.W_TIERS[-1])

    timed("window(wj)", windows, state.x)

    def coverage(x):
        key = jnp.sort(jnp.where(state.active, x @ axis,
                                 jnp.float32(3e38)))
        outs = []
        for w in pbd.W_TIERS:
            slots = (w - 1) // 2 * pbd.TILE
            if slots >= key.shape[0]:
                outs.append(jnp.bool_(True))
                continue
            ahead = jnp.concatenate(
                [key[slots:], jnp.full((slots,), jnp.float32(3.4e38))])
            outs.append(jnp.all(ahead - key > 0.1))
        return jnp.stack(outs)

    timed("coverage check", coverage, state.x)


if __name__ == "__main__":
    main()
