"""Checkpoint longevity (the role of ada/torch_utils/persistence.py).

The reference pickles class *source code* alongside objects so checkpoints
outlive code changes (:35-147).  pgx checkpoints are already code-free
(framework-neutral npz arrays + a JSON config that fully reconstructs the
model), so the remaining capability is source snapshotting: copy the pgx
package sources into the trial dir at training start (the reference's
train.py:87-89 snapshots its scripts the same way) and record a manifest
with content hashes so any trial can be reproduced bit-for-bit with the
exact code that produced it.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from typing import Dict


def snapshot_sources(trial_dir: str, package_root: str = None) -> str:
    """Copy the pgx sources into ``trial_dir/src_snapshot`` and write a
    manifest of sha256 content hashes; returns the manifest path."""
    import pgx
    package_root = package_root or os.path.dirname(os.path.abspath(
        pgx.__file__))
    dst_root = os.path.join(trial_dir, "src_snapshot", "pgx")
    manifest: Dict[str, str] = {}
    for dirpath, _, names in os.walk(package_root):
        if "__pycache__" in dirpath:
            continue
        rel = os.path.relpath(dirpath, package_root)
        for name in sorted(names):
            if not name.endswith(".py"):
                continue
            src = os.path.join(dirpath, name)
            rel_path = os.path.normpath(os.path.join(rel, name))
            dst = os.path.join(dst_root, rel_path)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            # read once and hash the bytes actually written: copying then
            # re-reading would let a concurrent edit leave the manifest
            # digest permanently mismatched with the copied snapshot
            with open(src, "rb") as f:
                payload = f.read()
            with open(dst, "wb") as f:
                f.write(payload)
            shutil.copystat(src, dst)
            manifest[rel_path.replace(os.sep, "/")] = hashlib.sha256(
                payload).hexdigest()
    path = os.path.join(trial_dir, "src_snapshot", "MANIFEST.json")
    with open(path, "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return path


def restore_from_snapshot(trial_dir: str, dest: str = None,
                          verify: bool = True) -> str:
    """Materialize a trial's exact source tree from its ``src_snapshot``
    as an importable package root; returns the directory to put on
    ``sys.path`` / ``PYTHONPATH``.

    This is the restore half of the reference's ``persistent_class``
    capability (ada/torch_utils/persistence.py:35): checkpoints there embed
    class source so old pickles outlive code changes; pgx checkpoints are
    code-free, so longevity instead comes from re-running against the
    snapshotted sources.  Use from a FRESH interpreter (a package already
    imported in this process is not retroactively swapped):

        root = restore_from_snapshot(trial_dir)
        subprocess.run([sys.executable, "-m", "pgx.cli.generate", ...],
                       env={**os.environ, "PYTHONPATH": root})

    With ``verify`` (default), every snapshot file is checked against the
    manifest's sha256 before restoring — a corrupted/tampered snapshot
    raises instead of silently reviving wrong code.
    """
    snap_root = os.path.join(trial_dir, "src_snapshot")
    manifest_path = os.path.join(snap_root, "MANIFEST.json")
    with open(manifest_path) as f:
        manifest = json.load(f)
    if verify:
        bad = {}
        for rel, digest in manifest.items():
            src = os.path.join(snap_root, "pgx", rel)
            if not os.path.exists(src):
                bad[rel] = "missing"
                continue
            with open(src, "rb") as fh:
                if hashlib.sha256(fh.read()).hexdigest() != digest:
                    bad[rel] = "corrupt"
        # files PRESENT in the snapshot but absent from the manifest are
        # also tampering (a planted module would otherwise be restored
        # unverified into the importable root) — EVERY file counts, not
        # just .py: a planted .so/.pyc would shadow the verified source
        # under the extension-module loader precedence
        pkg_root = os.path.join(snap_root, "pgx")
        for dirpath, _, names in os.walk(pkg_root):
            if "__pycache__" in dirpath:  # never restored (see copytree)
                continue
            for name in names:
                rel = os.path.relpath(os.path.join(dirpath, name),
                                      pkg_root).replace(os.sep, "/")
                if rel not in manifest:
                    bad[rel] = "unlisted"
        if bad:
            raise ValueError(
                f"snapshot in {trial_dir} fails manifest verification: "
                f"{bad}")
    dest = dest or os.path.join(trial_dir, "restored_src")
    dst_pkg = os.path.join(dest, "pgx")
    if os.path.exists(dst_pkg):
        shutil.rmtree(dst_pkg)
    shutil.copytree(os.path.join(snap_root, "pgx"), dst_pkg,
                    ignore=shutil.ignore_patterns("__pycache__"))
    return dest


def verify_snapshot(trial_dir: str) -> Dict[str, str]:
    """Compare the snapshot manifest against the currently-importable pgx;
    returns {relpath: 'changed'|'missing'} for any drift (empty == clean)."""
    import pgx
    package_root = os.path.dirname(os.path.abspath(pgx.__file__))
    with open(os.path.join(trial_dir, "src_snapshot",
                           "MANIFEST.json")) as f:
        manifest = json.load(f)
    drift: Dict[str, str] = {}
    for rel, digest in manifest.items():
        src = os.path.join(package_root, rel)
        if not os.path.exists(src):
            drift[rel] = "missing"
            continue
        with open(src, "rb") as f:
            if hashlib.sha256(f.read()).hexdigest() != digest:
                drift[rel] = "changed"
    return drift
