"""Index replication: publish commit points, sync replicas incrementally.

Capability analog of the reference's replicator module
(replicator/src/java/org/apache/lucene/replicator/):

- ``IndexRevision.java``: a revision is one commit point's file set,
  pinned via SnapshotDeletionPolicy while replicas copy it, released
  afterwards so the deletion policy may reclaim it.
- ``LocalReplicator.java``: ``publish`` / ``checkForUpdate`` /
  ``obtainFile`` on the publisher side.
- ``ReplicationClient.java`` (``updateNow``): copy the files the
  replica is missing into place, and ONLY THEN sync — the replica's
  published state flips atomically from the previous revision to the
  complete new one, never exposing a partial copy.

Sibling surface: ``streaming/replicator.py replicate(src, dst)`` is the
one-shot DIR-granular pull over the same pin -> diff -> copy ->
publish-last protocol (staging-dir rename, crashed-pull sweep). This
module is the publisher/client split at FILE granularity: incremental
(relpath, size) diffs survive partial directory copies, and the bulk
copy distributes over the cluster.

Spark-first shape: a revision here is a commit manifest
(``segments_N.json``) plus the immutable parquet files under its table
directories. Because the catalog never mutates a published directory in
place (appends add dirs, merges replace list entries), an incremental
sync is a pure set difference on (relative path, size): after the base
copy, an NRT append replicates by copying only the new generation's
directories. The bulk copy runs as ONE Spark job over the missing-file
list, so replication bandwidth scales with the cluster rather than the
driver; each file lands via tmp-file + atomic rename, so a crashed
transfer can never leave a full-sized-but-corrupt file that a later
size check would skip.
"""

from __future__ import annotations

import json
import os
import shutil

from .catalog import IndexCatalog

# Files at/under these manifest-level names are replication payload;
# the commits/ directory itself is published last, never bulk-copied.
_SKIP_DIRS = ("commits",)


def _revision_files(root: str, manifest: dict) -> dict:
    """{relative path: size} for every data file the commit references."""
    out: dict = {}
    for name in manifest["tables"]:
        dirs = manifest["tables"][name]
        if isinstance(dirs, str):
            dirs = [dirs]
        for d in dirs:
            base = os.path.join(root, d)
            for dirpath, _, files in os.walk(base):
                for f in files:
                    fp = os.path.join(dirpath, f)
                    out[os.path.relpath(fp, root)] = os.path.getsize(fp)
    return out


class LocalReplicator:
    """Publisher side (LocalReplicator.java): pin the latest commit
    point as a revision so vacuum retains it while replicas copy."""

    def __init__(self, root: str):
        self.root = root
        self.catalog = IndexCatalog(root)

    def publish(self) -> dict:
        """Snapshot the latest commit and return the revision:
        {gen, manifest, files: {relpath: size}}. Caller must
        ``release(gen)`` once every replica has synced (the reference's
        Revision.release via SnapshotDeletionPolicy)."""
        gen = self.catalog.snapshot()
        manifest = self.catalog.commit_at(gen)
        return {"gen": gen, "manifest": manifest,
                "files": _revision_files(self.root, manifest)}

    def check_for_update(self, replica_gen: int | None) -> dict | None:
        """checkForUpdate: the latest revision if newer, else None."""
        c = self.catalog.latest_commit()
        if c is None or (replica_gen is not None
                         and c["gen"] <= replica_gen):
            return None
        return self.publish()

    def release(self, gen: int) -> None:
        self.catalog.release_snapshot(gen)


def _copy_one(src_root: str, dst_root: str, rel: str) -> None:
    src = os.path.join(src_root, rel)
    dst = os.path.join(dst_root, rel)
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    tmp = dst + ".reptmp"
    shutil.copyfile(src, tmp)
    os.replace(tmp, dst)  # atomic: no partial file under the final name


class ReplicationClient:
    """Replica side (ReplicationClient.java updateNow): incremental,
    crash-safe pull of the publisher's latest revision."""

    def __init__(self, src_root: str, dst_root: str, spark=None,
                 copy_partitions: int = 32):
        self.src_root = src_root
        self.dst_root = dst_root
        self.spark = spark
        self.copy_partitions = copy_partitions
        self.replicator = LocalReplicator(src_root)
        os.makedirs(os.path.join(dst_root, "commits"), exist_ok=True)

    def _replica_gen(self) -> int | None:
        c = IndexCatalog(self.dst_root).latest_commit()
        return None if c is None else c["gen"]

    def _missing(self, files: dict) -> list:
        out = []
        for rel, size in files.items():
            dst = os.path.join(self.dst_root, rel)
            if not os.path.exists(dst) or os.path.getsize(dst) != size:
                out.append(rel)
        return sorted(out)

    def _copy(self, rels: list) -> None:
        src_root, dst_root = self.src_root, self.dst_root
        if self.spark is not None and len(rels) > 1:
            # distributed bulk copy: bandwidth scales with the cluster
            n = min(len(rels), self.copy_partitions)
            (self.spark.sparkContext.parallelize(rels, n)
             .foreach(lambda rel: _copy_one(src_root, dst_root, rel)))
        else:
            for rel in rels:
                _copy_one(src_root, dst_root, rel)

    def _publish(self, manifest: dict) -> None:
        """Sync step: the replica's commit point flips atomically AFTER
        every payload file is in place (copy-then-sync ordering)."""
        path = os.path.join(self.dst_root, "commits",
                            f"segments_{manifest['gen']}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1)
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(tmp, path)

    def update_now(self) -> dict | None:
        """Sync to the publisher's latest revision. Returns
        {gen, copied: [rel, ...]} or None when already current. The
        source commit stays snapshot-pinned for the duration of the
        copy and is released after the sync (IndexRevision lifetime)."""
        rev = self.replicator.check_for_update(self._replica_gen())
        if rev is None:
            return None
        try:
            copied = self._missing(rev["files"])
            self._copy(copied)
            self._publish(rev["manifest"])
        finally:
            self.replicator.release(rev["gen"])
        return {"gen": rev["gen"], "copied": copied}
