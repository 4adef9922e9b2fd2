"""Per-component sim cost breakdown at datagen scale (run on the TPU).

Times each solver component inside one lax.scan dispatch (micro-timings
through the axon tunnel are unreliable; see CLAUDE.md).
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from dyn_res_pile_manip_tpu.env import presets, scene as scene_lib
from dyn_res_pile_manip_tpu.sim import pbd


def timed(fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    gs = 24.0
    rng = np.random.default_rng(0)
    params22 = presets.carrots_scene_params("spread", gs, rng)
    state, sp, build = scene_lib.set_scene(22, params22, seed=1)
    n = int(np.asarray(state.active).sum())
    cap = state.x.shape[0]
    G = state.group_quat.shape[0]
    print(f"particles={n} capacity={cap} groups={G}")

    col = scene_lib.make_colliders_with_walls(gs)
    use_pallas = pbd.resolve_pallas(state)
    print("pallas:", use_pallas)

    state_s, cache = jax.jit(
        functools.partial(pbd.build_cache, with_pair_mask=not use_pallas)
    )(state, sp)
    jax.block_until_ready(state_s.x)
    print("tier sel:", int(cache["sel"]), "window covered:",
          bool(cache["window_ok"]))

    F = 30

    @jax.jit
    def full_frames(st):
        def body(st, _):
            st2, cache2 = pbd.build_cache(st, sp,
                                          with_pair_mask=not use_pallas)
            st2 = pbd.step_frame(st2, sp, col, cache=cache2,
                                 use_pallas=use_pallas)
            return st2, None
        st, _ = jax.lax.scan(body, st, None, length=F // 2)
        return st

    # full frame pair (rebuild every 2 frames comparable): use F/2 rebuilds
    t_full = timed(full_frames, state_s) / (F // 2) * 1e3
    print(f"full frame incl rebuild every frame: {t_full:.2f} ms/frame")

    @jax.jit
    def frames_only(st):
        def body(st, _):
            return pbd.step_frame(st, sp, col, cache=cache,
                                  use_pallas=use_pallas), None
        st, _ = jax.lax.scan(body, st, None, length=F)
        return st

    t_frame = timed(frames_only, state_s) / F * 1e3
    print(f"frame without rebuild: {t_frame:.2f} ms/frame")

    @jax.jit
    def rebuilds(st):
        def body(st, _):
            st2, c2 = pbd.build_cache(st, sp,
                                      with_pair_mask=not use_pallas)
            # fold something cheap so nothing is DCE'd
            return st2.replace(v=st2.v + c2["sel"] * 0.0), None
        st, _ = jax.lax.scan(body, st, None, length=F)
        return st

    t_rb = timed(rebuilds, state_s) / F * 1e3
    print(f"cache rebuild: {t_rb:.2f} ms")

    # contacts only (window sweeps at the selected tier, XLA path)
    wi = state_s.invm
    onehot, inv_counts = cache["onehot"], cache["inv_counts"]

    if not use_pallas:
        @jax.jit
        def contacts_only(xp):
            x0 = xp
            x0w = pbd._window(x0, pbd._PAD_POS, 5)
            def body(xp, _):
                xp = pbd.solve_contacts_window(
                    xp, x0, x0w, wi, state_s.active, state_s.group,
                    cache, sp, 5, color=0)
                return xp, None
            xp, _ = jax.lax.scan(body, xp, None, length=F)
            return xp
        t_c = timed(contacts_only, state_s.x) / F * 1e3
        print(f"one half-sweep (tier 5 tiles): {t_c:.2f} ms")
    else:
        from dyn_res_pile_manip_tpu.sim import contact_kernel as ck
        scal = ck.scalars_from_params(sp)
        packed0 = ck.make_packed(state_s.x, wi, state_s.group,
                                 state_s.active)
        for wt in (3, 5, 9):
            @jax.jit
            def contacts_only(xp, wt=wt):
                def body(xp, _):
                    p = ck.set_xp(packed0, xp)
                    newp = ck.sweep(p, scal, wt, color=0)
                    return xp.at[0, 0].add(0.0 * jnp.sum(newp)), None
                xp, _ = jax.lax.scan(body, xp, None, length=F)
                return xp
            t_c = timed(contacts_only, state_s.x) / F * 1e3
            print(f"one pallas half-sweep w_tiles={wt}: {t_c:.2f} ms")

    @jax.jit
    def shape_match_only(xp):
        def body(carry, _):
            xp, q = carry
            xp, q = pbd.shape_match(xp, state_s, sp, q, onehot, inv_counts)
            return (xp, q), None
        (xp, q), _ = jax.lax.scan(body, (xp, state_s.group_quat), None,
                                  length=F)
        return xp
    t_sm = timed(shape_match_only, state_s.x) / F * 1e3
    print(f"shape_match: {t_sm:.2f} ms")

    @jax.jit
    def collide_only(xp):
        def body(xp, _):
            return pbd.collide_static(xp, xp, col, sp,
                                      jnp.float32(1 / 120)), None
        xp, _ = jax.lax.scan(body, xp, None, length=F)
        return xp
    t_cs = timed(collide_only, state_s.x) / F * 1e3
    print(f"collide_static: {t_cs:.2f} ms")

    # render
    from dyn_res_pile_manip_tpu.core.camera import Camera
    from dyn_res_pile_manip_tpu.render import raster
    cam = Camera.default(gs)
    fx, fy, cx, cy = cam.cam_params()
    cvw = jnp.asarray(cam.opencv_from_world(), jnp.float32)
    color = jnp.asarray(build.color, jnp.float32)

    @jax.jit
    def render_only(x):
        def body(acc, _):
            obs = raster.render_rgbd(x, state_s.active, col, cvw,
                                     fx, fy, cx, cy, color,
                                     jnp.float32(float(sp.radius) * 0.5))
            return acc + obs[::173, ::173, 4].sum(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=F)
        return acc
    t_r = timed(render_only, state_s.x) / F * 1e3
    print(f"render 720^2: {t_r:.2f} ms")

    # ---- ablations: stub one component, re-time the full frame ----------
    real_sm = pbd.shape_match

    def time_frames(tag):
        @jax.jit
        def frames(st):
            def body(st, _):
                return pbd._step_sorted.__wrapped__(
                    st, sp, col, cache, use_pallas=use_pallas), None
            st, _ = jax.lax.scan(body, st, None, length=F)
            return st
        t = timed(frames, state_s) / F * 1e3
        print(f"frame [{tag}]: {t:.2f} ms")

    pbd.shape_match = lambda xp, st, p, q, oh, ic: (xp, q)
    time_frames("no shape_match")
    pbd.shape_match = real_sm

    real_cs = pbd.collide_static
    pbd.collide_static = lambda xp, x0, c, p, sdt: xp
    time_frames("no collide_static")
    pbd.collide_static = real_cs

    if use_pallas:
        from dyn_res_pile_manip_tpu.sim import contact_kernel as ck
        real_sweep = ck.sweep

        def stub_sweep(p, s, w, color=None, interpret=False):
            pad = ck.HMAX * ck.TILE
            xp = p[ck._CH_XP:ck._CH_XP + 3, pad:p.shape[1] - pad]
            if color is None:
                return xp
            nt2 = xp.shape[1] // ck.TILE
            return xp.reshape(3, nt2, ck.TILE)[:, color::2, :].reshape(3, -1)

        ck.sweep = stub_sweep
        time_frames("no contacts")
        ck.sweep = real_sweep

    # how many particles move during a typical settle tail?
    nmove = jnp.sum((jnp.linalg.norm(state_s.v, axis=-1) > 0)
                    & state_s.active)
    print("moving now:", int(nmove))


if __name__ == "__main__":
    main()
