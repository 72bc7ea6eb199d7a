"""Pull-based index replication: ship committed segments to searcher
replicas — the ``lucene/replicator`` module's job.

Reference semantics (replicator/src/java/org/apache/lucene/replicator/):
- ``IndexRevision`` wraps one commit point and PINS it via
  SnapshotDeletionPolicy so its files cannot be deleted while a replica
  is copying (IndexRevision.java:50-80);
- ``ReplicationClient`` pulls: diff the revision's file list against
  what the replica already has, copy ONLY the missing files, and
  publish the commit metadata LAST (IndexReplicationHandler.java —
  "copy the files over, then sync the segments file"), so a replica
  only ever exposes fully-committed states;
- a crashed pull resumes cleanly: index files are write-once, so a
  re-pull just re-diffs and finishes.

Mapping here: a *revision* is a catalog commit manifest
(``segments_N.json``); its *files* are the generation-addressed
immutable table directories it references. The copy is dir-granular
through a ``.reptmp`` staging name + atomic rename, so an interrupted
pull never leaves a half-copied directory under its final name, and the
manifest is published only after every directory it references exists
at the replica.

Scale note: the protocol (pin -> diff -> copy -> publish -> unpin) is
the durable part; the byte movement is ``shutil`` locally and would be
an object-store / DistCp bulk copy in production. Incremental NRT
appends add NEW directories per generation, so steady-state replication
cost is O(new segments), never O(index).

Sibling surface: ``index/replicator.py`` exposes the same protocol as a
LocalReplicator/ReplicationClient publisher-client split at FILE
granularity — (relpath, size) diffs that survive partial directory
copies, per-file atomic rename, and a Spark-distributed bulk copy.
"""

from __future__ import annotations

import json
import os
import shutil

from ..index.catalog import IndexCatalog

__all__ = ["referenced_dirs", "replicate"]

_TMP_SUFFIX = ".reptmp"


def referenced_dirs(manifest: dict) -> list:
    """Relative data directories a commit manifest references, in
    deterministic order."""
    out = []
    for v in (manifest.get("tables") or {}).values():
        for p in (v if isinstance(v, list) else [v]):
            if p not in out:
                out.append(p)
    return sorted(out)


def _copy_dir(src: str, dst: str) -> None:
    """Stage-then-rename directory copy: never exposes a partial dir
    under its final name (the replicator's copy-before-publish rule at
    directory granularity)."""
    tmp = dst + _TMP_SUFFIX
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
    shutil.copytree(src, tmp)
    os.rename(tmp, dst)


def _sweep_tmp(root: str) -> int:
    """Remove staging leftovers from a crashed pull (safe: a .reptmp
    name is never referenced by any manifest)."""
    n = 0
    for dirpath, dirnames, _ in os.walk(root):
        for d in list(dirnames):
            if d.endswith(_TMP_SUFFIX):
                shutil.rmtree(os.path.join(dirpath, d))
                dirnames.remove(d)
                n += 1
    return n


def replicate(src_root: str, dst_root: str) -> dict:
    """One replication pull: bring ``dst_root`` up to ``src_root``'s
    latest commit point. Idempotent and incremental — repeated calls
    copy nothing when up to date, and only NEW generation directories
    after NRT appends / merges / delete commits.

    Returns {"gen", "up_to_date", "copied_dirs", "swept_tmp"}.
    """
    src = IndexCatalog(src_root)
    rev = src.latest_commit()
    if rev is None:
        raise ValueError(f"replicate: nothing committed at {src_root}")
    gen = int(rev["gen"])

    dst = IndexCatalog(dst_root)
    cur = dst.latest_commit()
    if cur is not None and int(cur["gen"]) >= gen:
        return {"gen": int(cur["gen"]), "up_to_date": True,
                "copied_dirs": [], "swept_tmp": 0}

    swept = _sweep_tmp(dst_root)

    # pin the revision at the SOURCE for the duration of the copy
    # (IndexRevision's SnapshotDeletionPolicy hold): a concurrent
    # writer+vacuum at the source cannot remove dirs we are copying
    src.snapshot(gen)
    try:
        copied = []
        for rel in referenced_dirs(rev):
            d = os.path.join(dst_root, rel)
            if os.path.isdir(d):
                continue  # write-once: present means complete
            s = os.path.join(src_root, rel)
            if not os.path.isdir(s):
                raise FileNotFoundError(
                    f"replicate: source dir vanished under pin: {s}")
            _copy_dir(s, d)
            copied.append(rel)
        # data first, manifest LAST — atomic publish at the replica
        path = os.path.join(dst_root, "commits", f"segments_{gen}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(rev, fh, indent=1)
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(tmp, path)
    finally:
        src.release_snapshot(gen)
    return {"gen": gen, "up_to_date": False, "copied_dirs": copied,
            "swept_tmp": swept}
