"""Wall-clock of a realistic push on the datagen-scale scene (TPU):
settle, then time pusher-sweep frames with per-2-frame cache rebuilds —
exactly the env's hot loop. DYNRES_DISABLE_ACTIVESET=1 disables freezing
for A/B comparison."""
import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from dyn_res_pile_manip_tpu.env import presets, scene as scene_lib
from dyn_res_pile_manip_tpu.env import pusher
from dyn_res_pile_manip_tpu.sim import pbd

ACTIVE = not os.environ.get("DYNRES_DISABLE_ACTIVESET")


def main():
    gs = 24.0
    rng = np.random.default_rng(0)
    params22 = presets.carrots_scene_params("spread", gs, rng)
    state, sp, build = scene_lib.set_scene(22, params22, seed=1)
    n = int(np.asarray(state.active).sum())
    print(f"particles={n} capacity={state.x.shape[0]} active_set={ACTIVE}")
    col = scene_lib.make_colliders_with_walls(gs)
    use_pallas = pbd.resolve_pallas(state)
    half = jnp.asarray(pusher.pusher_half_extents())

    @functools.partial(jax.jit, static_argnames=("frames", "push"))
    def run(st, frames: int, push: bool, x0=-4.0):
        st, cache = pbd.build_cache(st, sp, colliders=col,
                                    with_pair_mask=not use_pallas,
                                    active_set=ACTIVE)

        def body(carry, i):
            st, cache = carry
            cx = x0 + 0.02 * i
            c = col.replace(
                box_center=col.box_center.at[0].set(
                    jnp.array([cx, 1.5, 0.0])),
                box_half=col.box_half.at[0].set(half),
                box_active=col.box_active.at[0].set(push),
                box_vel=col.box_vel.at[0].set(jnp.array([1.2, 0.0, 0.0])))
            st, cache = jax.lax.cond(
                (i % 16 == 0) | pbd.cache_stale(st, sp, cache),
                lambda: pbd.build_cache(st, sp, colliders=c,
                                        with_pair_mask=not use_pallas,
                                        active_set=ACTIVE),
                lambda: (st, cache))
            st = pbd.step_frame(st, sp, c, cache=cache,
                                use_pallas=use_pallas)
            return (st, cache), cache["sel"]

        (st, _), sels = jax.lax.scan(body, (st, cache),
                                     jnp.arange(frames), length=frames)
        return pbd.unsort_state(st), sels

    # settle
    st = state
    for _ in range(4):
        st, sels = run(st, 128, False)
    jax.block_until_ready(st.x)
    nm = int(jnp.sum((jnp.linalg.norm(st.v, axis=-1) > 0) & st.active))
    print("moving after settle:", nm, "sel tail:", np.asarray(sels)[-4:])

    jax.block_until_ready(run(st, 128, True)[0].x)  # warm the push variant
    for tag, push in (("settle-tail", False), ("push", True)):
        t0 = time.perf_counter()
        out, sels = run(st, 128, push)
        jax.block_until_ready(out.x)
        dt = (time.perf_counter() - t0) / 128 * 1e3
        u, c = np.unique(np.asarray(sels), return_counts=True)
        print(f"{tag}: {dt:.2f} ms/frame  sels={dict(zip(u.tolist(), c.tolist()))}")
    print("nan:", bool(jnp.isnan(out.x).any()))


if __name__ == "__main__":
    main()
