"""Merge sharded datagen episode ranges (0.., 1000.., 2000.., ...) into a
contiguous 0..N-1 layout in place (the dataset loader expects contiguous
episode indices, dataset_gnn_dyn.py)."""
import os
import pickle
import sys


def expected_frames(root):
    """Frame count per episode = n_timestep + 1, from the datagen config
    saved next to the shards (fall back to the repo config, then 10)."""
    for cfg in (os.path.join(root, "config.yaml"),
                "config/data_gen/gnn_dyn.yaml"):
        if os.path.exists(cfg):
            try:
                import yaml

                with open(cfg) as f:
                    c = yaml.safe_load(f)
                return int(c["dataset"]["n_timestep"]) + 1
            except Exception:
                pass
    return 11


def complete(d, n_frames):
    """An episode is complete iff actions.p exists and EVERY frame index
    0..n_frames-1 has its (color, depth, particles) triple — an exact
    per-index check, not a raw file-count threshold (rmtree below acts on
    this verdict)."""
    try:
        names = set(os.listdir(d))
    except FileNotFoundError:
        return False
    if "actions.p" not in names:
        return False
    for t in range(n_frames):
        for suffix in ("color.png", "depth.png", "particles.npy"):
            if f"{t}_{suffix}" not in names:
                return False
    return True


def main(root="data/gnn_dyn_data_custom"):
    n_frames = expected_frames(root)
    print("expecting %d frames/episode" % n_frames)
    epis = sorted(int(e) for e in os.listdir(root) if e.isdigit())
    keep = [e for e in epis if complete(os.path.join(root, str(e)), n_frames)]
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
