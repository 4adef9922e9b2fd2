"""Headline benchmark: fused PBD sim-step + depth render throughput.

Metric: particle-steps/sec at ~4k particles (one "step" = one dt=1/60
display frame = 2 substeps x 12 constraint iterations, plus a fused
720x720 RGBD render every frame — strictly more work per frame than the
reference, which renders only at push boundaries).

vs_baseline: the reference runs NVIDIA FleX (closed CUDA) at roughly
2 ms/frame for a ~4k-particle granular scene on its single-GPU docker setup
(no published tables; estimated from the FleX demo's granular benchmarks),
i.e. ~2.0e6 particle-steps/sec. BASELINE.md records that the repo publishes
no benchmark numbers.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import numpy as np

REFERENCE_PARTICLE_STEPS_PER_SEC = 2.0e6


def main():
    import jax
    import jax.numpy as jnp

    from dyn_res_pile_manip_tpu.core.camera import Camera
    from dyn_res_pile_manip_tpu.env import scene as scene_lib
    from dyn_res_pile_manip_tpu.render import raster
    from dyn_res_pile_manip_tpu.sim import pbd

    gs = 24.0
    # ~4k-particle carrots scene
    params20 = np.array([
        0.36, 0.36, -1.2, 0.5, -1.2, 1.0, 0.9, 1.0,
        88, 10.0, 20.0, 6, 10, 6, 0.72, 0.0, -1, -1, -1, 0.0])
    state, sp, build = scene_lib.set_scene(22, params20, seed=0)
    n = int(np.asarray(state.active).sum())
    col = scene_lib.make_colliders_with_walls(gs)
    lower, dims = pbd.default_grid(gs)
    cam = Camera.default(gs)
    fx, fy, cx, cy = cam.cam_params()
    cvw = jnp.asarray(cam.opencv_from_world(), jnp.float32)
    color = jnp.asarray(build.color, jnp.float32)
    rdraw = jnp.float32(float(sp.radius) * 0.5)

    import functools

    @functools.partial(jax.jit, static_argnames=("frames",))
    def run(st, frames: int):
        cache0 = pbd.build_cache(st, sp, lower, dims)

        def body(carry, i):
            st, cache, acc = carry
            cache = jax.lax.cond(
                (i % 2) == 0,
                lambda: pbd.build_cache(st, sp, lower, dims),
                lambda: cache)
            st = pbd.step_frame(st, sp, col, lower, dims, cache=cache)
            obs = raster.render_rgbd(st.x, st.active, col, cvw,
                                     fx, fy, cx, cy, color, rdraw)
            return (st, cache, acc + obs[::173, ::173, 4].sum()), None
        (st, _, acc), _ = jax.lax.scan(
            body, (st, cache0, jnp.float32(0)), jnp.arange(frames),
            length=frames)
        return st, acc

    frames = 60
    st, acc = run(state, frames)           # compile + settle
    jax.block_until_ready(st.x)
    t0 = time.perf_counter()
    st, acc = run(st, frames)
    jax.block_until_ready(acc)
    dt = time.perf_counter() - t0
    particle_steps_per_sec = n * frames / dt

    print(json.dumps({
        "metric": "fused_sim_render_particle_steps_per_sec_4k",
        "value": round(float(particle_steps_per_sec), 1),
        "unit": "particle-steps/s",
        "vs_baseline": round(
            float(particle_steps_per_sec) / REFERENCE_PARTICLE_STEPS_PER_SEC,
            4),
    }))


if __name__ == "__main__":
    main()
