"""Round-5 artifact-integrity infrastructure (VERDICT r4 missing #1).

- scripts/promote_artifact.sh: append-only content-addressed promotion —
  no checkpoint bytes are ever silently lost (the r2/r3/r4 clobber
  failure mode).
- scripts/audit_provenance.py: repo invariant that every stamped result
  maps to committed bytes.

Reference parity: the reference never overwrites checkpoints
(train/train_res_rgr.py:222-229 keeps immutable per-run dirs).
"""
import os
import shutil
import subprocess
import sys

import pytest

pytestmark = pytest.mark.quick

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _promote(root, src, dst):
    return subprocess.run(
        ["sh", os.path.join(root, "scripts", "promote_artifact.sh"),
         src, dst],
        capture_output=True, text=True, cwd=root)


@pytest.fixture
def sandbox(tmp_path):
    """Copy of the promotion script in an isolated fake repo root (the
    script cds to its parent-of-scripts, so assets/ckpts lands here)."""
    (tmp_path / "scripts").mkdir()
    shutil.copy(os.path.join(REPO, "scripts", "promote_artifact.sh"),
                tmp_path / "scripts" / "promote_artifact.sh")
    return str(tmp_path)


def test_promote_archives_and_manifests(sandbox):
    src = os.path.join(sandbox, "model.ckpt")
    with open(src, "wb") as f:
        f.write(b"bytes-v1")
    dst = os.path.join(sandbox, "assets", "r9", "model_r9.ckpt")
    r = _promote(sandbox, src, dst)
    assert r.returncode == 0, r.stderr
    assert open(dst, "rb").read() == b"bytes-v1"
    assert os.path.exists(dst + ".md5")
    archive = os.listdir(os.path.join(sandbox, "assets", "ckpts"))
    assert any(a.startswith("model_") and a.endswith(".ckpt")
               for a in archive), archive
    manifest = open(os.path.join(sandbox, "assets", "ckpts",
                                 "MANIFEST.tsv")).read().splitlines()
    assert len(manifest) == 1 and dst in manifest[0]


def test_promote_never_destroys_old_bytes(sandbox):
    src = os.path.join(sandbox, "model.ckpt")
    dst = os.path.join(sandbox, "assets", "r9", "model_r9.ckpt")
    with open(src, "wb") as f:
        f.write(b"bytes-v1")
    _promote(sandbox, src, dst)
    with open(src, "wb") as f:
        f.write(b"bytes-v2-different")
    r = _promote(sandbox, src, dst)
    assert r.returncode == 0, r.stderr
    assert open(dst, "rb").read() == b"bytes-v2-different"
    ckpts = os.path.join(sandbox, "assets", "ckpts")
    blobs = [open(os.path.join(ckpts, a), "rb").read()
             for a in os.listdir(ckpts) if a.endswith(".ckpt")]
    # BOTH versions live in the archive — the clobber is impossible
    assert b"bytes-v1" in blobs and b"bytes-v2-different" in blobs
    manifest = open(os.path.join(ckpts, "MANIFEST.tsv")).read().splitlines()
    assert len(manifest) == 2


def test_promote_idempotent_on_same_bytes(sandbox):
    src = os.path.join(sandbox, "model.ckpt")
    dst = os.path.join(sandbox, "assets", "r9", "model_r9.ckpt")
    with open(src, "wb") as f:
        f.write(b"bytes-v1")
    _promote(sandbox, src, dst)
    ckpts = os.path.join(sandbox, "assets", "ckpts")
    before = sorted(os.listdir(ckpts))
    r = _promote(sandbox, src, dst)
    assert r.returncode == 0, r.stderr
    # manifest appends a line (every promotion is logged) but no new
    # archive blob appears and none is rewritten
    assert sorted(a for a in os.listdir(ckpts)
                  if a != "MANIFEST.tsv") == \
        sorted(a for a in before if a != "MANIFEST.tsv")


def test_progress_writer_stamps_ckpts(tmp_path, monkeypatch):
    """env/mpc_driver._write_progress must stamp run provenance so a
    deadline-killed closed loop leaves self-describing partial evidence
    (the only evidence that survives — VERDICT r4 #1)."""
    import json

    import numpy as np

    from dyn_res_pile_manip_tpu.env.mpc_driver import _write_progress
    from dyn_res_pile_manip_tpu.utils import provenance

    ckpt = tmp_path / "model.ckpt"
    ckpt.write_bytes(b"some-weights")
    provenance.set_run_provenance(gnn=str(ckpt))
    path = tmp_path / "progress.json"
    monkeypatch.setenv("MPC_PROGRESS_JSON", str(path))
    _write_progress(1, 5, np.arange(6.0), np.arange(6.0), [30, 28])
    with open(path) as f:
        prog = json.load(f)
    assert prog["pushes_done"] == 2 and prog["partial"] is True
    assert prog["ckpts"]["gnn"]["md5"] == provenance.file_md5(str(ckpt))
    provenance._RUN_PROVENANCE = None


def test_repo_provenance_audit_passes():
    """Repo invariant: every stamped result JSON maps to committed
    bytes (this is the VERDICT r4 #1 done-criterion, run as a test)."""
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "audit_provenance.py")],
        capture_output=True, text=True, cwd=REPO)
    assert r.returncode == 0, r.stdout[-2000:]
