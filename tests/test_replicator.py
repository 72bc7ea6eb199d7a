"""Pull-based replication (lucene/replicator parity).

Protocol under test (IndexRevision + ReplicationClient +
IndexReplicationHandler): pin the revision, copy only missing files,
publish the commit LAST, resume cleanly after a crash, incremental
after NRT appends and delete commits.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from lucene_spark.fixtures.transcripts import transcripts_df
from lucene_spark.index import build_index
from lucene_spark.index.catalog import IndexCatalog
from lucene_spark.index.deletes import delete_docs
from lucene_spark.search import IndexSearcher
from lucene_spark.search.query import TermQuery
from lucene_spark.streaming import NRTIndexWriter
from lucene_spark.streaming.replicator import referenced_dirs, replicate


@pytest.fixture(scope="module")
def primary(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("repl")
    src = str(root / "primary")
    base = transcripts_df(spark, n_convs=80, seed=11, partitions=4)
    build_index(spark, base, src, num_buckets=3)
    return src, str(root)


def _q(spark, d):
    s = IndexSearcher(spark, d)
    return s.search(TermQuery("w000001"), k=10), s


def test_full_pull_then_identical_results(spark, primary):
    src, root = primary
    dst = os.path.join(root, "replica1")
    r = replicate(src, dst)
    assert not r["up_to_date"] and r["copied_dirs"]
    want, _ = _q(spark, src)
    got, _ = _q(spark, dst)
    assert got == want
    # second pull is a no-op
    r2 = replicate(src, dst)
    assert r2["up_to_date"] and not r2["copied_dirs"]


def test_incremental_pull_after_nrt_append(spark, primary):
    src, root = primary
    dst = os.path.join(root, "replica2")
    first = replicate(src, dst)
    # append a micro-batch at the primary -> new generation dirs
    batch = (transcripts_df(spark, n_convs=90, seed=11, partitions=2)
             .filter(F.col("conv_id") >= "conv00000080"))
    w = NRTIndexWriter(spark, src, rows_per_bucket=500)
    assert w.append_batch(batch, batch_id=1) > 0
    second = replicate(src, dst)
    assert not second["up_to_date"]
    # incremental: only the append's delta dirs moved, strictly fewer
    # than the initial full pull
    assert 0 < len(second["copied_dirs"]) < len(first["copied_dirs"])
    want, _ = _q(spark, src)
    got, _ = _q(spark, dst)
    assert got == want


def test_delete_commit_replicates(spark, primary):
    src, root = primary
    dst = os.path.join(root, "replica2")  # reuse the NRT replica
    replicate(src, dst)
    sdoc, _ = _q(spark, src)
    victim = sdoc[0][0]
    assert delete_docs(spark, src, f"doc_id = {victim}") >= 1
    r = replicate(src, dst)
    assert not r["up_to_date"]
    got, _ = _q(spark, dst)
    assert victim not in [d for d, _ in got]
    want, _ = _q(spark, src)
    assert got == want


def test_crashed_pull_resumes(spark, primary):
    src, root = primary
    dst = os.path.join(root, "replica3")
    cat = IndexCatalog(src)
    rev = cat.latest_commit()
    dirs = referenced_dirs(rev)
    # simulate a crash: one dir fully copied, one left as .reptmp
    # staging, NO manifest published
    import shutil
    os.makedirs(os.path.join(dst, "commits"), exist_ok=True)
    shutil.copytree(os.path.join(src, dirs[0]), os.path.join(dst, dirs[0]))
    shutil.copytree(os.path.join(src, dirs[1]),
                    os.path.join(dst, dirs[1]) + ".reptmp")
    r = replicate(src, dst)
    assert r["swept_tmp"] == 1
    assert dirs[0] not in r["copied_dirs"]      # present dirs are skipped
    assert dirs[1] in r["copied_dirs"]          # staging was swept, recopied
    want, _ = _q(spark, src)
    got, _ = _q(spark, dst)
    assert got == want


def test_publish_is_last_and_source_unpinned(spark, primary):
    src, root = primary
    dst = os.path.join(root, "replica1")
    # replica manifest equals the source's revision verbatim
    s_rev = IndexCatalog(src).latest_commit()
    d_rev = IndexCatalog(dst).latest_commit()
    # replica may lag the primary (later tests appended) but every dir
    # its manifest references must exist locally — publish-last held
    for rel in referenced_dirs(d_rev):
        assert os.path.isdir(os.path.join(dst, rel))
    # the pin taken during the pull was released
    assert IndexCatalog(src).snapshots() == []
    assert isinstance(s_rev, dict) and isinstance(d_rev, dict)
    # manifests are valid JSON commit points with the format stamp
    assert (d_rev.get("extra") or {}).get("format") == 2


# ---- file-granular LocalReplicator/ReplicationClient surface ----


import os

import pytest

from lucene_spark.fixtures.transcripts import transcripts_df, term_string
from lucene_spark.index import build_index
from lucene_spark.index.catalog import IndexCatalog
from lucene_spark.index.replicator import (LocalReplicator,
                                           ReplicationClient,
                                           _revision_files)
from lucene_spark.search import IndexSearcher
from lucene_spark.search.query import TermQuery

Q = TermQuery(term_string(2))


@pytest.fixture()
def replica_dir(tmp_path):
    return str(tmp_path / "replica")


def _search(spark, index_dir, k=10):
    return IndexSearcher(spark, index_dir).search(Q, k=k)


def test_full_sync_reproduces_results(spark, small_index, replica_dir):
    client = ReplicationClient(small_index, replica_dir, spark=spark)
    res = client.update_now()
    assert res is not None and res["copied"]
    src_gen = IndexCatalog(small_index).latest_commit()["gen"]
    assert IndexCatalog(replica_dir).latest_commit()["gen"] == src_gen
    assert _search(spark, replica_dir) == _search(spark, small_index)
    # already current -> checkForUpdate no-op
    assert client.update_now() is None


def test_incremental_sync_copies_only_new_generation(
        spark, small_index, replica_dir, tmp_path):
    # replicate a private copy of the index so the shared fixture
    # stays untouched by the NRT append
    src = str(tmp_path / "src")
    ReplicationClient(small_index, src).update_now()
    client = ReplicationClient(src, replica_dir)
    first = client.update_now()
    assert first["copied"]

    from lucene_spark.streaming.nrt import NRTIndexWriter
    w = NRTIndexWriter(spark, src)
    batch = transcripts_df(spark, n_convs=5, seed=7, partitions=1)
    w.append_batch(batch)

    second = client.update_now()
    assert second is not None
    assert second["gen"] > first["gen"]
    # the base generation's files were NOT re-copied
    assert set(second["copied"]).isdisjoint(first["copied"])
    assert len(second["copied"]) < len(first["copied"])
    assert _search(spark, replica_dir) == _search(spark, src)


def test_copy_then_sync_crash_leaves_previous_revision(
        spark, small_index, replica_dir, tmp_path):
    src = str(tmp_path / "src")
    ReplicationClient(small_index, src).update_now()
    client = ReplicationClient(src, replica_dir)
    first = client.update_now()

    from lucene_spark.streaming.nrt import NRTIndexWriter
    NRTIndexWriter(spark, src).append_batch(
        transcripts_df(spark, n_convs=5, seed=7, partitions=1))

    # simulate a crash AFTER the bulk copy but BEFORE the sync step
    rev = client.replicator.check_for_update(client._replica_gen())
    client._copy(client._missing(rev["files"]))
    client.replicator.release(rev["gen"])
    # the replica still publishes the previous revision (sync never ran)
    assert IndexCatalog(replica_dir).latest_commit()["gen"] == first["gen"]
    assert _search(spark, replica_dir, k=5) is not None
    # a re-run completes: nothing left to copy, manifest flips
    res = client.update_now()
    assert res["gen"] == rev["gen"] and res["copied"] == []
    assert _search(spark, replica_dir) == _search(spark, src)


def test_revision_pinned_while_copying(small_index, tmp_path):
    src = str(tmp_path / "src")
    ReplicationClient(small_index, src).update_now()
    rep = LocalReplicator(src)
    rev = rep.publish()
    cat = IndexCatalog(src)
    assert rev["gen"] in cat.snapshots()
    rep.release(rev["gen"])
    assert rev["gen"] not in cat.snapshots()


def test_revision_files_cover_all_tables(small_index):
    cat = IndexCatalog(small_index)
    manifest = cat.latest_commit()
    files = _revision_files(small_index, manifest)
    assert files
    for name in manifest["tables"]:
        locs = cat.table_locations(name)
        assert any(os.path.relpath(loc, small_index) in os.path.dirname(rel)
                   or rel.startswith(os.path.relpath(loc, small_index))
                   for loc in locs for rel in files)


def test_corrupt_partial_file_is_recopied(spark, small_index,
                                          replica_dir):
    client = ReplicationClient(small_index, replica_dir, spark=None)
    client.update_now()
    # truncate one replicated parquet file (size mismatch)
    rel = sorted(_revision_files(
        small_index, IndexCatalog(small_index).latest_commit()))[0]
    victim = os.path.join(replica_dir, rel)
    with open(victim, "wb") as fh:
        fh.write(b"x")
    missing = client._missing(_revision_files(
        small_index, IndexCatalog(small_index).latest_commit()))
    assert rel in missing
    client._copy(missing)
    assert os.path.getsize(victim) == os.path.getsize(
        os.path.join(small_index, rel))
