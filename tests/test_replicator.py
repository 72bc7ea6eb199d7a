"""Index replication (replicator module: IndexRevision /
LocalReplicator / ReplicationClient): incremental sync of commit
points, copy-then-sync atomicity, snapshot pinning during the copy."""

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
