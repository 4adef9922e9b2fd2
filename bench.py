"""Headline benchmark. Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline", "extras"}.

Primary metric — GNN-MPC rollout throughput (the workload's hot loop:
planner optimize iterations, each = pusher model + GNN graph build +
3-step message passing + differentiable reward + Adam update, batched over
64 action samples x 30 state hypotheses at N=100 particles).

vs_baseline: the reference's own fitted iteration-time model
(planners.py:25-28) predicts 72.4 ms/iteration at N=100; its production
MPC runs 50 samples x 30 hypotheses = 1500 rollouts per iteration with
that budget, i.e. 20,718 rollouts/s. (The model's comment says it was fit
at batch 300, which would make the reference 5x slower per rollout — we
use the conservative production-batch interpretation.) BASELINE.md records
that the repo publishes no benchmark tables.

extras.fused_sim_render_particle_steps_per_sec_4k — PBD frame (2 substeps
x 12 iterations) + fused 720^2 RGBD render at ~4k particles (the reference
renders only at push boundaries; FleX-estimate baseline ~2e6, see
PERFORMANCE.md).
"""
import functools
import json
import time

import numpy as np

REF_MPC_ROLLOUTS_PER_SEC = 1500.0 / ((2969.3971 - 69.923244 * 100
                                      + 1.8509846 * 100 ** 2) / 200.0 / 1000.0)
REF_SIM_PARTICLE_STEPS_PER_SEC = 2.0e6


def bench_mpc():
    import jax

    from dyn_res_pile_manip_tpu.core.camera import Camera
    from dyn_res_pile_manip_tpu.models.gnn_dyn import PropNetDiffDenModel
    from dyn_res_pile_manip_tpu.planner.planner import PlannerGD
    from dyn_res_pile_manip_tpu.utils.config import load_config
    from dyn_res_pile_manip_tpu.utils.imaging import gen_subgoal

    class _Env:
        is_real = False
        screenWidth = screenHeight = 720

        def __init__(self):
            self.cam = Camera.default(24.0)
            self.cvx_region = np.array([[-5.0, 5.0, -5.0, 5.0]])

        def get_cam_params(self):
            return self.cam.cam_params()

        def get_cam_extrinsics(self):
            return self.cam.extrinsics()

    cfg = load_config()
    model = PropNetDiffDenModel(cfg)
    model.init(jax.random.PRNGKey(0))
    planner = PlannerGD(cfg, _Env())
    subgoal, _ = gen_subgoal(360, 360, 100, h=720, w=720)
    rng = np.random.default_rng(0)
    N, n_batch, traj = 100, 30, 64
    state = rng.uniform(-0.2, 0.2, (n_batch, N, 3)).astype(np.float32)
    state[:, :, 2] += 0.75
    act_seq = rng.uniform(-4, 4, (1, traj, 4))

    def run():
        return planner.trajectory_optimization_ptcl_multi_traj(
            state, np.full((n_batch,), 1000.0), np.zeros((n_batch, N)),
            subgoal, model, act_seq, np.zeros(1), n_sample=traj,
            n_look_ahead=1, n_update_iter=20, action_lower_lim=None,
            action_upper_lim=None, time_lim=float("inf"))

    run()   # compile + calibrate
    run()
    # Robust headline: median of 5 independent calibrations (each already
    # min-of-3 per dispatch size). Two same-code bench runs 26 min apart
    # disagreed by 40% (77k contended vs 114k idle — PERFORMANCE.md), so
    # a single calibration is not evidence; the spread is recorded in
    # extras so any residual disagreement is self-explaining.
    key = (N, n_batch, traj, 1, False)
    samples = []
    for _ in range(5):
        planner._iter_ms.pop(key, None)
        run()
        samples.append(planner._iter_ms[key])
    ms_iter = float(np.median(samples))
    bench_mpc.calibration_samples = [round(float(s), 2) for s in samples]
    return traj * n_batch / (ms_iter / 1000.0)


def bench_sim_render():
    import jax
    import jax.numpy as jnp

    from dyn_res_pile_manip_tpu.core.camera import Camera
    from dyn_res_pile_manip_tpu.env import scene as scene_lib
    from dyn_res_pile_manip_tpu.render import raster
    from dyn_res_pile_manip_tpu.sim import pbd

    gs = 24.0
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

    use_pallas = pbd.resolve_pallas(state)

    @functools.partial(jax.jit, static_argnames=("frames",))
    def run(st, frames: int):
        st, cache0 = pbd.build_cache(st, sp, with_pair_mask=not use_pallas)

        def body(carry, i):
            st, cache, acc = carry
            # production rebuild cadence (env _run_frames: 16-frame
            # heartbeat + absolute-displacement trigger; see
            # pbd.cache_stale for why the round-3 translation-aware
            # variant was reverted)
            st, cache = jax.lax.cond(
                ((i % 16) == 0) | pbd.cache_stale(st, sp, cache),
                lambda: pbd.build_cache(st, sp,
                                        with_pair_mask=not use_pallas),
                lambda: (st, cache))
            st = pbd.step_frame(st, sp, col, cache=cache,
                                use_pallas=use_pallas)
            obs = raster.render_rgbd(st.x, st.active, col, cvw,
                                     fx, fy, cx, cy, color, rdraw)
            return (st, cache, acc + obs[::173, ::173, 4].sum()), None
        (st, _, acc), _ = jax.lax.scan(
            body, (st, cache0, jnp.float32(0)), jnp.arange(frames),
            length=frames)
        return pbd.unsort_state(st), acc

    frames = 60
    st, acc = run(state, frames)
    # second warmup with the POST-run pytree structure: unsort/sleep
    # bookkeeping materializes optional SimState fields, so the first
    # re-invocation is a different jit trace — timing it would measure a
    # compile, not the solver
    st, acc = run(st, frames)
    jax.block_until_ready(st.x)
    t0 = time.perf_counter()
    st, acc = run(st, frames)
    jax.block_until_ready(acc)
    dt = time.perf_counter() - t0
    return n * frames / dt


def bench_sim_push():
    """Fused sim+render at the datagen scale (the reference's actual
    sim-bound workload): the 19.3k-particle 'spread' scene, settled, then
    a kinematic pusher sweep with per-rebuild active-set tiers.

    Returns (particle_steps_per_sec_push, particle_steps_per_sec_tail)."""
    import jax
    import jax.numpy as jnp

    from dyn_res_pile_manip_tpu.core.camera import Camera
    from dyn_res_pile_manip_tpu.env import presets, pusher
    from dyn_res_pile_manip_tpu.env import scene as scene_lib
    from dyn_res_pile_manip_tpu.render import raster
    from dyn_res_pile_manip_tpu.sim import pbd

    gs = 24.0
    rng = np.random.default_rng(0)
    params22 = presets.carrots_scene_params("spread", gs, rng)
    state, sp, build = scene_lib.set_scene(22, params22, seed=1)
    n = int(np.asarray(state.active).sum())
    col = scene_lib.make_colliders_with_walls(gs)
    use_pallas = pbd.resolve_pallas(state)
    half = jnp.asarray(pusher.pusher_half_extents())
    cam = Camera.default(gs)
    fx, fy, cx, cy = cam.cam_params()
    cvw = jnp.asarray(cam.opencv_from_world(), jnp.float32)
    color = jnp.asarray(build.color, jnp.float32)
    rdraw = jnp.float32(float(sp.radius) * 0.5)

    @functools.partial(jax.jit, static_argnames=("frames", "push"))
    def run(st, frames: int, push: bool, x0=-4.0):
        st, cache = pbd.build_cache(st, sp, colliders=col,
                                    with_pair_mask=not use_pallas)

        def body(carry, i):
            st, cache, acc = carry
            cx_ = x0 + 0.02 * i
            c = col.replace(
                box_center=col.box_center.at[0].set(
                    jnp.array([cx_, 1.5, 0.0])),
                box_half=col.box_half.at[0].set(half),
                box_active=col.box_active.at[0].set(push),
                box_vel=col.box_vel.at[0].set(jnp.array([1.2, 0.0, 0.0])))
            st, cache = jax.lax.cond(
                (i % 16 == 0) | (push & ((i % 2) == 0))
                | pbd.cache_stale(st, sp, cache),
                lambda: pbd.build_cache(st, sp, colliders=c,
                                        with_pair_mask=not use_pallas),
                lambda: (st, cache))
            st = pbd.step_frame(st, sp, c, cache=cache,
                                use_pallas=use_pallas)
            obs = raster.render_rgbd(st.x, st.active, c, cvw, fx, fy,
                                     cx, cy, color, rdraw)
            return (st, cache, acc + obs[::173, ::173, 4].sum()), None

        (st, _, acc), _ = jax.lax.scan(
            body, (st, cache, jnp.float32(0)), jnp.arange(frames),
            length=frames)
        return pbd.unsort_state(st), acc

    st = state
    for _ in range(4):                       # settle the pile
        st, acc = run(st, 128, False)
    _, acc = run(st, 128, True)              # warm the push variant ONLY
    jax.block_until_ready(acc)

    rates = []
    for push in (True, False):
        t0 = time.perf_counter()
        out, acc = run(st, 128, push)
        jax.block_until_ready(acc)
        rates.append(n * 128 / (time.perf_counter() - t0))
    bench_sim_push.n_particles = n      # for roofline_r4 --measure
    return rates[0], rates[1]


def measure_mpc_ms_per_iter():
    """Calibrated ms per optimize iteration at the bench point (for
    scripts/roofline_r4.py --measure)."""
    rps = bench_mpc()
    return 64 * 30 / rps * 1000.0


def measure_push_ms_per_frame():
    """Measured ms per fused sim+render push frame at the 19.3k scene."""
    push_rate, _ = bench_sim_push()
    return bench_sim_push.n_particles / push_rate * 1000.0


def bench_fluid():
    """PBF dam break (scene 2: 3456 fluid particles, 2 substeps x 4
    density/contact iterations/frame) through the fused multi-frame XPBD
    runner — throughput of the round-3 scene families."""
    import jax

    from dyn_res_pile_manip_tpu.env import scene as scene_lib
    from dyn_res_pile_manip_tpu.env import scenes_extra  # noqa: F401
    from dyn_res_pile_manip_tpu.core.types import Colliders
    from dyn_res_pile_manip_tpu.sim import xpbd
    import jax.numpy as jnp

    state, sp, build = scene_lib.set_scene(2, np.zeros(1), seed=0)
    n = int(np.asarray(state.active).sum())
    col = Colliders.ground_only()
    col = col.replace(planes=jnp.asarray(build.extra_planes, jnp.float32))
    xc = xpbd.XConstraints.build(
        state.capacity, fluid_mask=build.fluid_mask, **build.xparams)
    frames = 60
    st, xcc = xpbd.run_frames(state, xc, sp, col, frames)
    st, xcc = xpbd.run_frames(st, xcc, sp, col, frames)
    jax.block_until_ready(st.x)
    t0 = time.perf_counter()
    st, xcc = xpbd.run_frames(st, xcc, sp, col, frames)
    jax.block_until_ready(st.x)
    return n * frames / (time.perf_counter() - t0)


def chip_contention():
    """Other live python processes that could be sharing the chip (the
    documented ±40% bench spread came from exactly this — PERFORMANCE.md
    'calibrated-slope spread'). Best-effort /proc scan; never fails."""
    import os
    me = os.getpid()
    others = []
    try:
        for pid in os.listdir("/proc"):
            if not pid.isdigit() or int(pid) == me:
                continue
            try:
                with open(f"/proc/{pid}/cmdline", "rb") as f:
                    cmd = f.read().replace(b"\0", b" ").decode(
                        "utf-8", "replace").strip()
            except OSError:
                continue
            if "python" in cmd and ("dyn_res_pile_manip" in cmd
                                    or "visualize_mpc" in cmd
                                    or "eval_auto_res" in cmd):
                others.append(cmd[:80])
    except OSError:
        pass
    try:
        load1 = round(os.getloadavg()[0], 2)
    except OSError:
        load1 = None
    return {"concurrent_chip_procs": len(others),
            "concurrent_cmds": others[:6], "loadavg_1m": load1}


def main():
    contention = chip_contention()
    mpc = bench_mpc()
    sim = bench_sim_render()
    sim_push, sim_tail = bench_sim_push()
    fluid = bench_fluid()
    print(json.dumps({
        "metric": "gnn_mpc_rollouts_per_sec_64x30_n100",
        "value": round(float(mpc), 1),
        "unit": "rollouts/s",
        "vs_baseline": round(float(mpc) / REF_MPC_ROLLOUTS_PER_SEC, 3),
        "extras": {
            "fused_sim_render_particle_steps_per_sec_4k": round(
                float(sim), 1),
            "sim_vs_flex_estimate": round(
                float(sim) / REF_SIM_PARTICLE_STEPS_PER_SEC, 4),
            # the reference's actual sim-bound workload: datagen-scale
            # (19.3k particles) pusher sweep / settle tail, fused render
            "fused_sim_render_push_19k_particle_steps_per_sec": round(
                float(sim_push), 1),
            "sim_push_19k_vs_flex_estimate": round(
                float(sim_push) / REF_SIM_PARTICLE_STEPS_PER_SEC, 4),
            "fused_sim_render_settle_tail_19k_particle_steps_per_sec":
                round(float(sim_tail), 1),
            "pbf_dam_break_particle_steps_per_sec": round(float(fluid), 1),
            "ref_mpc_rollouts_per_sec_fitted": round(
                REF_MPC_ROLLOUTS_PER_SEC, 1),
            # robustness telemetry (VERDICT r4 #7): the headline is the
            # median of these 5 calibrations; if two bench runs disagree,
            # contention explains which one to trust
            "mpc_ms_iter_calibrations": bench_mpc.calibration_samples,
            "contention": contention,
        },
    }))


if __name__ == "__main__":
    main()
