"""Checkpoint provenance stamping for result JSONs.

Round-5 fix for the recurring artifact-identity failures (VERDICT r4
missing #1): every result writer records the md5 of every checkpoint it
actually loaded, so a repo-wide audit can map each results/*.json to
committed bytes (assets/ckpts/MANIFEST.tsv). The reference avoids the
problem by never overwriting checkpoints
(/root/reference/train/train_res_rgr.py:222-229); we additionally make
results self-describing.
"""
import hashlib
import os


def file_md5(path):
    """md5 hex digest of a file, or None if it does not exist."""
    if not path or not os.path.exists(path):
        return None
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


# run-level provenance: set once at model-load time so ANY writer in the
# process (including the crash-safety per-push progress checkpoint in
# env/mpc_driver.py, which is the only surviving evidence when a
# deadline watcher kills a closed-loop run) can stamp the same md5s.
_RUN_PROVENANCE = None


def set_run_provenance(**paths):
    global _RUN_PROVENANCE
    _RUN_PROVENANCE = ckpt_provenance(**paths)
    return _RUN_PROVENANCE


def run_provenance():
    """The process-wide ckpt stamp, or None if never set."""
    return _RUN_PROVENANCE


def ckpt_provenance(**paths):
    """Build a {name: {path, md5}} provenance dict for result JSONs.

    Usage: json.dump({..., "ckpts": ckpt_provenance(gnn=p1, rgr=p2)}).
    Missing/None paths are recorded with md5=None rather than dropped,
    so an audit sees what was *intended* to load.
    """
    return {name: {"path": p, "md5": file_md5(p)}
            for name, p in paths.items()}
