"""Bisect the round-3 push-bench regression (VERDICT r3 weak #1): the
19k push benchmark fell 1.33x -> 0.86x vs the FleX estimate between
BENCH_r02 and BENCH_r03. Suspects: the 12288 prefix tier (commit
4b7fb58) and the translation-aware cache staleness rule (34f5a01), or
plain chip contention during the recorded bench.

Runs scripts/profile_push.py in child processes with module-level
patches selected by env vars, one variant per process (A_TIERS changes
the compiled lax.switch, so variants must not share a trace):

  current             - repo as-is
  no12288             - A_TIERS without the 12288 tier (pre-4b7fb58)
  abs_stale           - absolute displacement staleness (pre-34f5a01)
  no12288+abs_stale   - both reverted

Run on an IDLE chip (pause the datagen/labeling fleet first):
  python scripts/bisect_push_r4.py
"""
import json
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def child():
    import jax.numpy as jnp

    from dyn_res_pile_manip_tpu.sim import pbd

    if os.environ.get("DYNRES_BISECT_NO12288"):
        pbd.A_TIERS = (2048, 4096, 8192)
    if os.environ.get("DYNRES_BISECT_ABS_STALE"):
        def abs_stale(state, params, cache):
            x_build = cache["x_build"]
            d = jnp.where(state.active[:, None],
                          jnp.abs(state.x - x_build), 0.0)
            return jnp.max(d) > 0.5 * params.particle_collision_margin
        pbd.cache_stale = abs_stale
    sys.path.insert(0, HERE)
    import profile_push
    profile_push.main()


def main():
    variants = [
        ("current", {}),
        ("no12288", {"DYNRES_BISECT_NO12288": "1"}),
        ("abs_stale", {"DYNRES_BISECT_ABS_STALE": "1"}),
        ("no12288+abs_stale", {"DYNRES_BISECT_NO12288": "1",
                               "DYNRES_BISECT_ABS_STALE": "1"}),
    ]
    repeats = int(os.environ.get("BISECT_REPEATS", "2"))
    results = {}
    for name, extra in variants:
        times = []
        for r in range(repeats):
            env = dict(os.environ, DYNRES_BISECT_CHILD="1", **extra)
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                cwd=REPO, capture_output=True, text=True, timeout=3600)
            m = re.search(r"push: ([0-9.]+) ms/frame", p.stdout)
            ms = float(m.group(1)) if m else None
            mt = re.search(r"settle-tail: ([0-9.]+) ms/frame", p.stdout)
            times.append({"push_ms": ms,
                          "settle_ms": float(mt.group(1)) if mt else None})
            print(f"{name} run{r}: {times[-1]}", flush=True)
            if p.returncode != 0:
                print(p.stdout[-2000:], p.stderr[-2000:])
        results[name] = times
    out = os.path.join(REPO, "logs", "bisect_push_r4.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    if os.environ.get("DYNRES_BISECT_CHILD"):
        child()
    else:
        main()
