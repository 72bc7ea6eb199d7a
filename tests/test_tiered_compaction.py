"""Tiered incremental compaction (TieredMergePolicy analog): NRT
appends create per-batch generation directories; compact_tiered merges
only the small appended generations into target-size buckets without
touching the base generation — search results must be identical before
and after, and the appended-generation dir count must shrink."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.fixtures.transcripts import term_string, transcripts_df
from lucene_spark.index import build_index
from lucene_spark.index.catalog import IndexCatalog
from lucene_spark.index.checker import check_index
from lucene_spark.index.deletes import delete_docs
from lucene_spark.search import IndexSearcher
from lucene_spark.search.query import (BooleanQuery, OrQuery, PhraseQuery,
                                       TermQuery)
from lucene_spark.streaming import NRTIndexWriter

T = [term_string(k) for k in range(30)]

QS = [TermQuery(T[1]), OrQuery((T[2], T[7], T[19])),
      PhraseQuery((T[0], T[1])),
      BooleanQuery(must=(T[0],), should=(T[4],))]


@pytest.fixture(scope="module")
def appended_index(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("tiered")
    idx = str(root / "idx")
    base = transcripts_df(spark, n_convs=60, seed=5, partitions=2)
    build_index(spark, base, idx, num_buckets=2)
    full = transcripts_df(spark, n_convs=120, seed=5, partitions=2)
    w = NRTIndexWriter(spark, idx, rows_per_bucket=120)
    for lo, hi in ((60, 80), (80, 100), (100, 120)):
        b = full.filter((F.col("conv_id") >= f"conv{lo:08d}")
                        & (F.col("conv_id") < f"conv{hi:08d}"))
        assert w.append_batch(b) > 0
    return idx


def test_appends_create_generations(spark, appended_index):
    cat = IndexCatalog(appended_index)
    assert len(cat.table_locations("postings")) == 4  # base + 3 batches
    assert len(cat.table_locations("docstore")) == 4


def test_tiered_compaction_preserves_results(spark, appended_index):
    s_before = IndexSearcher(spark, appended_index)
    before = {i: s_before.search(q, k=15) for i, q in enumerate(QS)}
    n_bk_before = (spark.read.parquet(s_before.norms_paths[-1]).count()
                   + sum(spark.read.parquet(p).count()
                         for p in s_before.norms_paths[:-1]))

    w = NRTIndexWriter(spark, appended_index, rows_per_bucket=120)
    merged = w.compact_tiered(target_docs_per_bucket=10 ** 9)
    assert merged > 0

    cat = IndexCatalog(appended_index)
    locs = cat.table_locations("postings")
    assert len(locs) == 2  # base + one merged generation

    s_after = IndexSearcher(spark, appended_index)
    for i, q in enumerate(QS):
        assert s_after.search(q, k=15) == before[i], q
    # fewer buckets than before (all appended merged into one)
    from lucene_spark.index.catalog import read_table
    n_bk_after = read_table(spark, cat.table_locations("norms")).count()
    assert n_bk_after < n_bk_before
    # index invariants still hold (doc density, postings, stats)
    check_index(spark, appended_index)


def test_tiered_compaction_with_deletes(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("tierdel")
    idx = str(root / "idx")
    base = transcripts_df(spark, n_convs=40, seed=9, partitions=2)
    build_index(spark, base, idx, num_buckets=2)
    full = transcripts_df(spark, n_convs=80, seed=9, partitions=2)
    w = NRTIndexWriter(spark, idx, rows_per_bucket=100)
    for lo, hi in ((40, 60), (60, 80)):
        b = full.filter((F.col("conv_id") >= f"conv{lo:08d}")
                        & (F.col("conv_id") < f"conv{hi:08d}"))
        assert w.append_batch(b) > 0
    delete_docs(spark, idx, "role = 'tool'")
    s_before = IndexSearcher(spark, idx)
    before = {i: s_before.search(q, k=15) for i, q in enumerate(QS)}
    assert w.compact_tiered(target_docs_per_bucket=10 ** 9) > 0
    s_after = IndexSearcher(spark, idx)
    for i, q in enumerate(QS):
        assert s_after.search(q, k=15) == before[i], q


def test_noop_when_single_append(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("tiernoop")
    idx = str(root / "idx")
    build_index(spark, transcripts_df(spark, n_convs=30, seed=3,
                                      partitions=2), idx, num_buckets=2)
    w = NRTIndexWriter(spark, idx)
    batch = (transcripts_df(spark, n_convs=40, seed=3, partitions=2)
             .filter(F.col("conv_id") >= "conv00000030"))
    assert w.append_batch(batch) > 0
    assert w.compact_tiered() == 0  # one appended gen — nothing to tier
