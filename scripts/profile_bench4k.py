"""Component breakdown of bench.bench_sim_render (the 4k all-awake drop).

Each variant runs the same 60-frame lax.scan; differences isolate the
render, the every-2-frame rebuild, and the solver step itself. Run on the
TPU (timings through the axon tunnel are reliable only around a whole
scan dispatch; see CLAUDE.md).
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from dyn_res_pile_manip_tpu.core.camera import Camera
from dyn_res_pile_manip_tpu.env import scene as scene_lib
from dyn_res_pile_manip_tpu.render import raster
from dyn_res_pile_manip_tpu.sim import pbd


def main():
    gs = 24.0
    params20 = np.array([
        0.36, 0.36, -1.2, 0.5, -1.2, 1.0, 0.9, 1.0,
        88, 10.0, 20.0, 6, 10, 6, 0.72, 0.0, -1, -1, -1, 0.0])
    state, sp, build = scene_lib.set_scene(22, params20, seed=0)
    n = int(np.asarray(state.active).sum())
    print(f"particles={n} capacity={state.x.shape[0]} "
          f"groups={state.group_quat.shape[0]}")
    col = scene_lib.make_colliders_with_walls(gs)
    cam = Camera.default(gs)
    fx, fy, cx, cy = cam.cam_params()
    cvw = jnp.asarray(cam.opencv_from_world(), jnp.float32)
    color = jnp.asarray(build.color, jnp.float32)
    rdraw = jnp.float32(float(sp.radius) * 0.5)
    use_pallas = pbd.resolve_pallas(state)
    print("pallas:", use_pallas)
    FRAMES = 60

    @functools.partial(jax.jit, static_argnames=("render", "rebuild_mod",
                                                  "do_step"))
    def run(st, render: bool, rebuild_mod: int, do_step: bool = True):
        st, cache0 = pbd.build_cache(st, sp, with_pair_mask=not use_pallas)

        def body(carry, i):
            st, cache, acc = carry
            st, cache = jax.lax.cond(
                ((i % rebuild_mod) == 0) | pbd.cache_stale(st, sp, cache),
                lambda: pbd.build_cache(st, sp,
                                        with_pair_mask=not use_pallas),
                lambda: (st, cache))
            if do_step:
                st = pbd.step_frame(st, sp, col, cache=cache,
                                    use_pallas=use_pallas)
            if render:
                obs = raster.render_rgbd(st.x, st.active, col, cvw,
                                         fx, fy, cx, cy, color, rdraw)
                acc = acc + obs[::173, ::173, 4].sum()
            else:
                acc = acc + st.x[0, 0]
            return (st, cache, acc), None

        (st, _, acc), _ = jax.lax.scan(
            body, (st, cache0, jnp.float32(0)), jnp.arange(FRAMES),
            length=FRAMES)
        return pbd.unsort_state(st), acc

    variants = [
        ("full (bench)", dict(render=True, rebuild_mod=2)),
        ("no render", dict(render=False, rebuild_mod=2)),
        ("rebuild/16", dict(render=True, rebuild_mod=16)),
        ("no render, rebuild/16", dict(render=False, rebuild_mod=16)),
        ("rebuild only (no step)", dict(render=False, rebuild_mod=2,
                                        do_step=False)),
    ]
    for name, kw in variants:
        st, acc = run(state, **kw)
        st, acc = run(st, **kw)          # post-run pytree structure trace
        jax.block_until_ready(acc)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            st2, acc = run(st, **kw)
            jax.block_until_ready(acc)
            best = min(best, time.perf_counter() - t0)
        ms = best / FRAMES * 1e3
        print(f"{name:28s} {ms:7.3f} ms/frame   "
              f"{n * FRAMES / best / 1e6:6.2f} Mpsteps/s")


if __name__ == "__main__":
    main()
