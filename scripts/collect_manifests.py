"""Merge per-episode datagen manifests into a committed, append-only
ledger (VERDICT r4 #6: episode trees are wipe-bait — two VM wipes lost
~1500 episodes across rounds; the ledger makes any regenerated tree
verifiable bit-exact or flagged).

Usage:
  python scripts/collect_manifests.py [--data data/gnn_dyn_data_custom]
      [--out assets/manifests/gnn_dyn_data_custom.jsonl]
  python scripts/collect_manifests.py --backfill   # add manifest.json to
      complete episodes that predate the manifest-writing datagen code

The ledger is append-only: an episode id already present is never
rewritten; if a regenerated episode's hashes differ from the ledger the
conflict is APPENDED as a flagged line (both versions stay visible).
"""
import argparse
import glob
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def backfill(data_dir, n_timestep=10):
    from dyn_res_pile_manip_tpu.datagen.gnn_dyn_data import (
        episode_complete, write_manifest)
    n = 0
    for epi_dir in sorted(glob.glob(os.path.join(data_dir, "*"))):
        if not os.path.isdir(epi_dir):
            continue
        if os.path.exists(os.path.join(epi_dir, "manifest.json")):
            continue
        if not episode_complete(epi_dir, n_timestep):
            continue
        write_manifest(epi_dir, n_timestep, None, -1,
                       extra={"backfilled": True})
        n += 1
    print(f"backfilled {n} manifests in {data_dir}")


def collect(data_dir, out_path):
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    seen = {}
    conflict_seen = set()   # (episode, canonical-hashes) already flagged
    lines = []
    if os.path.exists(out_path):
        with open(out_path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                doc = json.loads(line)
                if doc.get("hash_conflict"):
                    key = (doc["episode"],
                           json.dumps(doc["hashes"], sort_keys=True))
                    if key in conflict_seen:   # drop duplicate conflict
                        continue               # lines on rewrite
                    conflict_seen.add(key)
                else:
                    seen[doc["episode"]] = doc
                lines.append(line)
    added = flagged = 0
    for mf in sorted(glob.glob(os.path.join(data_dir, "*/manifest.json"))):
        with open(mf) as f:
            doc = json.load(f)
        prev = seen.get(doc["episode"])
        if prev is None:
            lines.append(json.dumps(doc, sort_keys=True))
            seen[doc["episode"]] = doc
            added += 1
        elif prev["hashes"] != doc["hashes"]:
            # append-once: the same divergent version must not re-flag
            # on every watcher cycle (it appended 5 duplicate lines per
            # episode during round 5d before this check)
            key = (doc["episode"],
                   json.dumps(doc["hashes"], sort_keys=True))
            if key not in conflict_seen:
                conflict_seen.add(key)
                doc["hash_conflict"] = True
                lines.append(json.dumps(doc, sort_keys=True))
                flagged += 1
    tmp = out_path + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))
    os.replace(tmp, out_path)
    print(f"{out_path}: {len(seen)} episodes ledgered "
          f"(+{added} new, {flagged} hash conflicts)")
    return added + flagged


def verify(data_dir, out_path):
    """Check every on-disk episode against the ledger; report mismatches."""
    with open(out_path) as f:
        ledger = {d["episode"]: d for d in map(json.loads, f)
                  if not d.get("hash_conflict")}
    bad = ok = missing = 0
    for epi, doc in sorted(ledger.items()):
        epi_dir = os.path.join(data_dir, epi)
        if not os.path.isdir(epi_dir):
            missing += 1
            continue
        good = True
        for name, want in doc["hashes"].items():
            p = os.path.join(epi_dir, name)
            if not os.path.exists(p) or hashlib.md5(
                    open(p, "rb").read()).hexdigest() != want:
                good = False
                break
        ok += good
        bad += not good
    print(f"verify: {ok} match, {bad} MISMATCH, {missing} not on disk "
          f"(of {len(ledger)} ledgered)")
    return bad


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="data/gnn_dyn_data_custom")
    ap.add_argument("--out",
                    default="assets/manifests/gnn_dyn_data_custom.jsonl")
    ap.add_argument("--backfill", action="store_true")
    ap.add_argument("--verify", action="store_true")
    args = ap.parse_args()
    if args.backfill:
        backfill(args.data)
    if args.verify:
        sys.exit(1 if verify(args.data, args.out) else 0)
    if not args.backfill and not args.verify:
        collect(args.data, args.out)
