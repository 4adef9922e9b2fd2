"""Summarize a dynamic-resolution A/B JSON (scripts/eval_auto_res.py
output): arm means, per-scene winners, and the auto arm's particle-count
economy (the reference's headline trade-off: task performance at lower
state resolution, visualize_mpc.py + model/res_regressor usage there).

Usage: python scripts/summarize_ab.py results/r5/eval_auto_res_r5.json
"""
import json
import sys

import numpy as np


def summarize(path):
    d = json.load(open(path))
    rows = [r for r in d["results"] if not r.get("partial")]
    partial = [r["scene"] for r in d["results"] if r.get("partial")]
    if not rows:
        print("no complete scenes")
        return
    arms = list(rows[0]["runs"])
    print(f"{path}: {len(rows)} complete scenes"
          + (f" (+partial {partial})" if partial else ""))
    print(f"{'arm':>10} {'mean':>8} {'median':>8}  per-scene improve")
    for arm in arms:
        v = [r["runs"][arm]["improve"] for r in rows]
        print(f"{arm:>10} {np.mean(v):8.1f} {np.median(v):8.1f}  "
              + " ".join(f"{x:7.1f}" for x in v))
    wins = {a: 0 for a in arms}
    for r in rows:
        best = max(arms, key=lambda a: r["runs"][a]["improve"])
        wins[best] += 1
    print("scene wins:", wins)
    dens = [dv for r in rows for dv in r["runs"].get("auto", {})
            .get("dens", [])]
    if dens:
        fixed_ns = [int(a.split("_")[1]) for a in arms if a != "auto"]
        print(f"auto particle count: mean {np.mean(dens):.1f} "
              f"median {np.median(dens):.0f} range "
              f"[{min(dens)}, {max(dens)}] vs fixed arms {fixed_ns}")
        # planner cost scales ~N^2 in the relation tensors: economy vs
        # the best-performing fixed arm
        best_fixed = max((a for a in arms if a != "auto"),
                        key=lambda a: np.mean(
                            [r["runs"][a]["improve"] for r in rows]))
        nf = int(best_fixed.split("_")[1])
        print(f"mean N vs best fixed arm ({best_fixed}): "
              f"{np.mean(dens)/nf:.2f}x particles, "
              f"~{(np.mean(dens)/nf)**2:.2f}x relation-tensor cost")
    if d.get("ckpts"):
        print("ckpts:", json.dumps(d["ckpts"]))


if __name__ == "__main__":
    for p in sys.argv[1:]:
        summarize(p)
