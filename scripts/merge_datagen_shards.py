"""Merge sharded datagen episode ranges (0.., 1000.., 2000.., ...) into a
contiguous 0..N-1 layout in place (the dataset loader expects contiguous
episode indices, dataset_gnn_dyn.py)."""
import os
import pickle
import sys


def complete(d):
    try:
        names = os.listdir(d)
    except FileNotFoundError:
        return False
    if "actions.p" not in names:
        return False
    # 11 frames x (color, depth, particles) + actions.p
    return len(names) >= 34


def main(root="data/gnn_dyn_data_custom"):
    epis = sorted(int(e) for e in os.listdir(root) if e.isdigit())
    keep = [e for e in epis if complete(os.path.join(root, str(e)))]
    drop = [e for e in epis if e not in keep]
    for e in drop:
        import shutil
        shutil.rmtree(os.path.join(root, str(e)))
        print("dropped incomplete", e)
    # compact: move highest-numbered complete episodes into the holes
    keep = sorted(keep)
    target = list(range(len(keep)))
    for dst, src in zip(target, keep):
        if dst != src:
            os.rename(os.path.join(root, str(src)),
                      os.path.join(root, str(dst)))
    print("episodes:", len(keep))
    # sanity: every kept episode loads
    bad = 0
    for e in range(len(keep)):
        p = os.path.join(root, str(e), "actions.p")
        try:
            with open(p, "rb") as f:
                pickle.load(f)
        except Exception as ex:
            print("BAD", e, ex)
            bad += 1
    print("bad:", bad)


if __name__ == "__main__":
    main(*sys.argv[1:])
