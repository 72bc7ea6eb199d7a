"""IndexCatalog: atomic commit points over a directory of Parquet tables.

Capability analog of Lucene's commit protocol: ``IndexWriter.commit``
fsyncs segment files then atomically publishes ``segments_N``
(core:index/IndexWriter.java:4075, core:index/SegmentInfos.java). Here a
commit is a JSON manifest written via tmp-file + atomic rename; readers
resolve the latest manifest and only see fully committed table states.
In production deployment the same role is played by an Iceberg catalog's
snapshot commit; this class keeps the sandbox dependency-free while
preserving the semantics (atomic visibility, monotonically numbered
commit points, resumability metadata).
"""

from __future__ import annotations

import json
import os
import re
import time

_COMMIT_RE = re.compile(r"^segments_(\d+)\.json$")

# On-disk format version, stamped into every build's commit manifest and
# checked by IndexSearcher / NRTIndexWriter. Version 2 = 'h'-prefixed
# term_h partition values; indexes without a stamp predate the prefix
# change and would silently match zero postings — readers raise instead.
INDEX_FORMAT_VERSION = 2


def check_format(commit: dict, what: str) -> None:
    fmt = int(((commit or {}).get("extra") or {}).get("format", 1))
    if fmt != INDEX_FORMAT_VERSION:
        raise ValueError(
            f"{what}: index format v{fmt} != reader format "
            f"v{INDEX_FORMAT_VERSION} (term_h partition scheme changed); "
            f"rebuild the index with this version")


def read_table(spark, locations):
    """Read a (possibly multi-generation) table: one scan per directory
    unioned by name — Spark refuses multiple partitioned roots in one
    read, and per-root scans keep partition pruning per generation.
    allowMissingColumns tolerates schema evolution across generations."""
    if isinstance(locations, str):
        locations = [locations]
    if not locations:
        raise ValueError("read_table: no locations")
    out = spark.read.parquet(locations[0])
    for p in locations[1:]:
        out = out.unionByName(spark.read.parquet(p),
                              allowMissingColumns=True)
    return out


class IndexCatalog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "commits"), exist_ok=True)

    # ---- commit points -------------------------------------------------
    def _commit_files(self):
        d = os.path.join(self.root, "commits")
        out = []
        for f in os.listdir(d):
            m = _COMMIT_RE.match(f)
            if m:
                out.append((int(m.group(1)), os.path.join(d, f)))
        return sorted(out)

    def latest_commit(self) -> dict | None:
        files = self._commit_files()
        if not files:
            return None
        with open(files[-1][1]) as fh:
            return json.load(fh)

    def list_commits(self) -> list:
        """Generation numbers of every retained commit point, oldest
        first (DirectoryReader.listCommits analog)."""
        return [g for g, _ in self._commit_files()]

    def commit_at(self, gen: int) -> dict | None:
        """Load a specific retained commit point (IndexCommit): data
        dirs referenced by any retained segments_N stay on disk until
        vacuumed, so the returned manifest is fully readable."""
        for g, fp in self._commit_files():
            if g == int(gen):
                with open(fp) as fh:
                    return json.load(fh)
        return None

    # ---- snapshots (SnapshotDeletionPolicy analog) -----------------------
    # core:index/SnapshotDeletionPolicy.java:49 — a snapshotted commit
    # point is protected from deletion policy / vacuum until released.
    def _snapshots_path(self) -> str:
        return os.path.join(self.root, "commits", "snapshots.json")

    def snapshots(self) -> list:
        """Pinned gens as a MULTISET (duplicates = reference counts):
        two independent clients pinning the same gen hold two pins,
        and one release() drops only one — the reference's
        SnapshotDeletionPolicy refCounts map (SnapshotDeletionPolicy
        .java:58), without which replica A's release could unpin a
        revision replica B is still copying."""
        try:
            with open(self._snapshots_path()) as fh:
                return sorted(json.load(fh))
        except (OSError, ValueError):
            return []

    def _write_snapshots(self, gens) -> None:
        p = self._snapshots_path()
        tmp = p + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(sorted(int(g) for g in gens), fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(tmp, p)

    def snapshot(self, gen: int | None = None) -> int:
        """Pin a commit point (default: the latest) so vacuum retains
        it and everything it references. Returns the pinned gen."""
        if gen is None:
            c = self.latest_commit()
            if not c:
                raise ValueError("nothing committed yet")
            gen = c["gen"]
        if self.commit_at(gen) is None:
            raise ValueError(f"no such commit point {gen}")
        self._write_snapshots(self.snapshots() + [int(gen)])
        return int(gen)

    def release_snapshot(self, gen: int) -> None:
        """Drop ONE pin on ``gen`` (refcount decrement); other
        holders' pins survive."""
        gens = self.snapshots()
        try:
            gens.remove(int(gen))
        except ValueError:
            pass
        self._write_snapshots(gens)

    def rollback(self, gen: int) -> int:
        """Publish a NEW commit whose tables/extra are those of an
        older retained commit point — restoring a snapshot without
        rewriting data (IndexWriter rollback-to-commit via
        IndexWriterConfig.setIndexCommit, core:index/IndexWriter.java
        'expert: open from a previous commit'). History stays linear:
        the restore is itself a new generation."""
        old = self.commit_at(gen)
        if old is None:
            raise ValueError(f"no such commit point {gen}")
        prev = self.latest_commit()
        new_gen = prev["gen"] + 1
        manifest = {
            "gen": new_gen,
            "tables": dict(old["tables"]),
            "extra": {**(old.get("extra") or {}),
                      "restored_from_gen": int(gen)},
            "committed_at_ms": int(time.time() * 1000),
        }
        path = os.path.join(self.root, "commits", f"segments_{new_gen}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1)
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(tmp, path)
        return new_gen

    def commit(self, tables: dict, extra: dict | None = None) -> int:
        """Publish a new commit point mapping table name -> relative path.

        Carries forward tables from the previous commit unless overridden.
        """
        prev = self.latest_commit() or {"gen": 0, "tables": {}}
        gen = prev["gen"] + 1
        manifest = {
            "gen": gen,
            "tables": {**prev["tables"], **tables},
            "extra": {**(prev.get("extra") or {}), **(extra or {})},
            "committed_at_ms": int(time.time() * 1000),
        }
        path = os.path.join(self.root, "commits", f"segments_{gen}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1)
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(tmp, path)  # atomic publish
        return gen

    def drop_tables(self, names) -> int:
        """Publish a commit point without the named tables (their data
        dirs stay on disk until vacuumed — snapshot semantics)."""
        prev = self.latest_commit() or {"gen": 0, "tables": {}}
        tables = {k: v for k, v in prev["tables"].items() if k not in set(names)}
        gen = prev["gen"] + 1
        manifest = {
            "gen": gen,
            "tables": tables,
            "extra": {**(prev.get("extra") or {})},
            "committed_at_ms": int(time.time() * 1000),
        }
        path = os.path.join(self.root, "commits", f"segments_{gen}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1)
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(tmp, path)
        return gen

    # ---- table paths ---------------------------------------------------
    # A table maps to ONE directory (base build) or a LIST of
    # directories (base + NRT-appended generations) — the Lucene
    # segments_N model: a commit point lists the files that make up the
    # index, appends add new dirs to the list atomically, and merges
    # replace list entries, never mutating live directories in place.

    def table_path(self, name: str, commit: dict | None = None) -> str | None:
        """Primary (base) directory of a table; for multi-dir tables
        this is the FIRST generation — use table_locations() to read
        the complete table."""
        c = commit or self.latest_commit()
        if not c or name not in c["tables"]:
            return None
        v = c["tables"][name]
        if isinstance(v, list):
            v = v[0]
        return os.path.join(self.root, v)

    def table_locations(self, name: str, commit: dict | None = None) -> list:
        """ALL directories of a table in generation order ([] if the
        table does not exist). Readers pass the whole list to
        spark.read.parquet(*locations)."""
        c = commit or self.latest_commit()
        if not c or name not in c["tables"]:
            return []
        v = c["tables"][name]
        if isinstance(v, str):
            v = [v]
        return [os.path.join(self.root, x) for x in v]

    def table_rels(self, name: str, commit: dict | None = None) -> list:
        """Relative manifest entries of a table (for building a new
        commit's list values)."""
        c = commit or self.latest_commit()
        if not c or name not in c["tables"]:
            return []
        v = c["tables"][name]
        return [v] if isinstance(v, str) else list(v)

    def new_table_dir(self, name: str, gen_hint: str = "") -> tuple:
        """Uncommitted staging dir for a table version; returns
        (absolute path, relative path to store in the manifest)."""
        rel = f"{name}/v{int(time.time() * 1000)}{gen_hint}"
        ap = os.path.join(self.root, rel)
        os.makedirs(os.path.dirname(ap), exist_ok=True)
        return ap, rel

    def has_table(self, name: str) -> bool:
        return self.table_path(name) is not None

    # ---- vacuum --------------------------------------------------------
    def vacuum(self, keep_commits: int = 2,
               grace_seconds: float = 3600.0) -> dict:
        """Remove table directories referenced by NO retained commit
        point, and prune old commit manifests (IndexDeletionPolicy +
        IndexWriter.deleteUnusedFiles analog). Keeps the newest
        ``keep_commits`` commit points so point-in-time readers opened
        against a recent snapshot stay valid.

        grace_seconds: unreferenced dirs with mtime newer than this are
        SKIPPED — a build/append/compaction stages its output in an
        uncommitted dir until the final commit, so a concurrent vacuum
        must not delete a directory an in-flight writer is filling
        (pass 0 only when no writer can be running).

        Returns {"removed_dirs": [...], "removed_commits": n}."""
        import shutil
        now = time.time()
        files = self._commit_files()
        if not files:
            return {"removed_dirs": [], "removed_commits": 0}
        keep = files[-max(keep_commits, 1):]
        drop = files[:-max(keep_commits, 1)]
        # snapshotted commit points are protected (SnapshotDeletionPolicy)
        pinned = set(self.snapshots())
        if pinned:
            keep = keep + [(g, fp) for g, fp in drop if g in pinned]
            drop = [(g, fp) for g, fp in drop if g not in pinned]
        referenced = set()
        for _, fp in keep:
            with open(fp) as fh:
                c = json.load(fh)
            for v in c["tables"].values():
                for rel in ([v] if isinstance(v, str) else v):
                    referenced.add(rel)
        removed = []
        # table data lives under <root>/<table>/<version-dir>
        for table in sorted(os.listdir(self.root)):
            tdir = os.path.join(self.root, table)
            if table == "commits" or not os.path.isdir(tdir):
                continue
            for ver in sorted(os.listdir(tdir)):
                rel = f"{table}/{ver}"
                if rel in referenced:
                    continue
                vp = os.path.join(tdir, ver)
                try:
                    if now - os.path.getmtime(vp) < grace_seconds:
                        continue  # possibly an in-flight writer's staging
                except OSError:
                    continue
                shutil.rmtree(vp, ignore_errors=True)
                removed.append(rel)
        for _, fp in drop:
            os.remove(fp)
        return {"removed_dirs": removed, "removed_commits": len(drop)}
