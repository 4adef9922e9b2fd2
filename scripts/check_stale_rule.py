"""Verify the translation-aware cache_stale rule: (a) the 4k drop bench
throughput, (b) physics sanity — the drop must settle to the same pile
statistics as a conservative every-frame-rebuild run (different rebuild
schedules reorder float sums, so we compare statistics, not bits)."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

import bench
from dyn_res_pile_manip_tpu.env import scene as scene_lib
from dyn_res_pile_manip_tpu.sim import pbd


def drop(rebuild_every_frame: bool, frames=240):
    gs = 24.0
    params20 = np.array([
        0.36, 0.36, -1.2, 0.5, -1.2, 1.0, 0.9, 1.0,
        88, 10.0, 20.0, 6, 10, 6, 0.72, 0.0, -1, -1, -1, 0.0])
    state, sp, build = scene_lib.set_scene(22, params20, seed=0)
    col = scene_lib.make_colliders_with_walls(gs)
    use_pallas = pbd.resolve_pallas(state)

    @functools.partial(jax.jit, static_argnames=("n", "every"))
    def run(st, n: int, every: bool):
        st, cache0 = pbd.build_cache(st, sp, with_pair_mask=not use_pallas)

        def body(carry, i):
            st, cache, nrb = carry
            stale = (jnp.bool_(True) if every
                     else ((i % 16) == 0) | pbd.cache_stale(st, sp, cache))
            st, cache = jax.lax.cond(
                stale,
                lambda: pbd.build_cache(st, sp,
                                        with_pair_mask=not use_pallas),
                lambda: (st, cache))
            st = pbd.step_frame(st, sp, col, cache=cache,
                                use_pallas=use_pallas)
            return (st, cache, nrb + stale.astype(jnp.int32)), None

        (st, _, nrb), _ = jax.lax.scan(
            body, (st, cache0, jnp.int32(0)), jnp.arange(n), length=n)
        return pbd.unsort_state(st), nrb

    st, nrb = run(state, frames, rebuild_every_frame)
    jax.block_until_ready(st.x)
    act = np.asarray(st.active)
    x = np.asarray(st.x)[act]
    v = np.asarray(st.v)[np.asarray(st.active)]
    return dict(
        rebuilds=int(nrb), n=int(act.sum()),
        ymax=float(x[:, 1].max()), ymean=float(x[:, 1].mean()),
        ymin=float(x[:, 1].min()),
        r95=float(np.percentile(np.hypot(x[:, 0], x[:, 2]), 95)),
        maxv=float(np.abs(v).max()))


def main():
    a = drop(True)
    b = drop(False)
    print("every-frame rebuild:", a)
    print("translation-aware  :", b)
    dy = abs(a["ymean"] - b["ymean"])
    dr = abs(a["r95"] - b["r95"])
    print(f"pile-stat deltas: ymean {dy:.4f}  r95 {dr:.4f}")
    assert dy < 0.05 and dr < 0.1, "pile statistics diverged"
    assert b["ymax"] < a["ymax"] + 0.2, "popcorn outliers"
    print("physics sanity OK")

    rate = bench.bench_sim_render()
    print(f"bench_sim_render: {rate:,.0f} particle-steps/s "
          f"({rate / bench.REF_SIM_PARTICLE_STEPS_PER_SEC:.3f}x flex est)")


if __name__ == "__main__":
    main()
