"""Commit-point time travel + snapshots + rollback
(core:index/DirectoryReader.java:89 open(IndexCommit),
SnapshotDeletionPolicy.java:49, IndexWriter open-from-previous-commit)."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.fixtures.transcripts import term_string, transcripts_df
from lucene_spark.index import build_index
from lucene_spark.index.catalog import IndexCatalog
from lucene_spark.search import IndexSearcher
from lucene_spark.search.query import TermQuery
from lucene_spark.streaming import NRTIndexWriter

Q = TermQuery(term_string(1))


@pytest.fixture(scope="module")
def history(spark, tmp_path_factory):
    """An index with history: base build, then one NRT append."""
    root = tmp_path_factory.mktemp("tt")
    idx = str(root / "idx")
    base = transcripts_df(spark, n_convs=80, seed=7, partitions=4)
    build_index(spark, base, idx, num_buckets=4)
    cat = IndexCatalog(idx)
    gen0 = cat.latest_commit()["gen"]
    before = IndexSearcher(spark, idx).search(Q, k=10 ** 6)
    extra = transcripts_df(spark, n_convs=110, seed=7, partitions=4) \
        .filter(F.col("conv_id") > F.lit("conv%08d" % 79))
    NRTIndexWriter(spark, idx).append_batch(extra, batch_id=1)
    return idx, gen0, before


def test_open_past_commit_is_point_in_time(spark, history):
    idx, gen0, before = history
    cat = IndexCatalog(idx)
    assert cat.latest_commit()["gen"] > gen0
    assert gen0 in cat.list_commits()
    old = IndexSearcher(spark, idx, generation=gen0)
    new = IndexSearcher(spark, idx)
    assert old.generation == gen0
    assert new.doc_count > old.doc_count
    # the past reader reproduces the pre-append results exactly
    got = old.search(Q, k=10 ** 6)
    assert [(d, round(float(sc), 5)) for d, sc in got] \
        == [(d, round(float(sc), 5)) for d, sc in before]


def test_open_missing_generation_raises(spark, history):
    idx, _, _ = history
    with pytest.raises(ValueError):
        IndexSearcher(spark, idx, generation=99999)


def test_snapshot_protects_commit_from_vacuum(spark, history):
    idx, gen0, before = history
    cat = IndexCatalog(idx)
    cat.snapshot(gen0)
    cat.vacuum(keep_commits=1, grace_seconds=0.0)
    # pinned commit survived and is still fully readable
    assert gen0 in cat.list_commits()
    old = IndexSearcher(spark, idx, generation=gen0)
    assert len(old.search(Q, k=10 ** 6)) == len(before)
    # releasing the snapshot lets the next vacuum drop it
    cat.release_snapshot(gen0)
    cat.vacuum(keep_commits=1, grace_seconds=0.0)
    assert gen0 not in cat.list_commits()
    assert cat.commit_at(gen0) is None


def test_rollback_restores_old_tables_as_new_generation(
        spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("rb")
    idx = str(root / "idx")
    base = transcripts_df(spark, n_convs=60, seed=3, partitions=4)
    build_index(spark, base, idx, num_buckets=4)
    cat = IndexCatalog(idx)
    gen0 = cat.latest_commit()["gen"]
    before = IndexSearcher(spark, idx).search(Q, k=10 ** 6)
    extra = transcripts_df(spark, n_convs=90, seed=3, partitions=4) \
        .filter(F.col("conv_id") > F.lit("conv%08d" % 59))
    NRTIndexWriter(spark, idx).append_batch(extra, batch_id=1)
    assert IndexSearcher(spark, idx).doc_count > len(base.collect()) - 1
    new_gen = cat.rollback(gen0)
    assert new_gen > gen0  # history stays linear
    c = cat.latest_commit()
    assert c["gen"] == new_gen
    assert c["extra"]["restored_from_gen"] == gen0
    got = IndexSearcher(spark, idx).search(Q, k=10 ** 6)
    assert [(d, round(float(sc), 5)) for d, sc in got] \
        == [(d, round(float(sc), 5)) for d, sc in before]


def test_snapshot_pins_are_reference_counted(spark, small_index):
    """Two independent holders pin the same gen; one release drops ONE
    pin (SnapshotDeletionPolicy.refCounts) — the survivor still
    protects the commit from vacuum."""
    from lucene_spark.index.catalog import IndexCatalog
    cat = IndexCatalog(small_index)
    g1 = cat.snapshot()
    g2 = cat.snapshot()
    assert g1 == g2
    assert cat.snapshots().count(g1) == 2
    cat.release_snapshot(g1)
    assert cat.snapshots().count(g1) == 1  # B's pin survives
    cat.release_snapshot(g1)
    assert g1 not in cat.snapshots()
    cat.release_snapshot(g1)  # over-release is a no-op
    assert cat.snapshots() == [g for g in cat.snapshots()]
