"""addIndexes: fold committed indexes into another
(core:index/IndexWriter.java:3076 addIndexes)."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.fixtures.transcripts import term_string, transcripts_df
from lucene_spark.index import add_indexes, build_index
from lucene_spark.index.checker import check_index
from lucene_spark.index.deletes import delete_docs
from lucene_spark.search import IndexSearcher
from lucene_spark.search.query import TermQuery

Q = TermQuery(term_string(1))


def _split(spark, n_convs, seed, cut):
    full = transcripts_df(spark, n_convs=n_convs, seed=seed, partitions=4)
    key = "conv%08d" % cut
    return (full.filter(F.col("conv_id") <= key),
            full.filter(F.col("conv_id") > key))


@pytest.fixture(scope="module")
def folded(spark, tmp_path_factory):
    """dst holds convs [0, 60], src holds (60, 100]; fold src into dst
    and build a cold reference index over the union."""
    root = tmp_path_factory.mktemp("addidx")
    a, b = _split(spark, 100, seed=11, cut=60)
    dst, src, ref = (str(root / d) for d in ("dst", "src", "ref"))
    build_index(spark, a, dst, num_buckets=4)
    build_index(spark, b, src, num_buckets=3)
    n = add_indexes(spark, dst, src)
    full = transcripts_df(spark, n_convs=100, seed=11, partitions=4)
    build_index(spark, full, ref, num_buckets=4)
    return dst, ref, n


def test_add_indexes_row_count_and_checkindex(spark, folded):
    dst, ref, n = folded
    assert n > 0
    sd = IndexSearcher(spark, dst)
    sr = IndexSearcher(spark, ref)
    assert sd.doc_count == sr.doc_count
    check_index(spark, dst)  # invariants hold after the fold


def test_add_indexes_matches_cold_rebuild(spark, folded):
    """Same corpus, same global stats -> rank- and score-identical
    results vs a cold build over the union (stats converge because the
    fold updates termstats/collection stats like an NRT append)."""
    dst, ref, _ = folded
    got = IndexSearcher(spark, dst).search(Q, k=25)
    want = IndexSearcher(spark, ref).search(Q, k=25)
    assert [(d, round(float(s), 4)) for d, s in got] \
        == [(d, round(float(s), 4)) for d, s in want]


def test_add_indexes_applies_source_deletes(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("adddel")
    a, b = _split(spark, 80, seed=23, cut=50)
    dst, src = str(root / "dst"), str(root / "src")
    build_index(spark, a, dst, num_buckets=3)
    build_index(spark, b, src, num_buckets=3)
    src_rows = b.count()
    n_dead = delete_docs(spark, src, "turn_idx = 2")
    assert n_dead > 0
    n = add_indexes(spark, dst, src)
    assert n == src_rows - n_dead
    # no folded doc came from a deleted source row
    ds = IndexSearcher(spark, dst)
    folded_t2 = (ds._read_cached(ds.docstore_paths)
                 .filter((F.col("turn_idx") == 2)
                         & (F.col("conv_id") > "conv%08d" % 50)).count())
    assert folded_t2 == 0


def test_add_indexes_rejects_uncommitted(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("addbad")
    with pytest.raises(ValueError):
        add_indexes(spark, str(root / "nope"), str(root / "also_nope"))
