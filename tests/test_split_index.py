"""PKIndexSplitter parity: split one index into two by a query.

misc/index/PKIndexSplitter.java semantics under test: matching docs in
one directory, the rest in the other, deleted docs in NEITHER, each
half a fully valid index scoring with its OWN statistics.
"""

import pytest
from pyspark.sql import functions as F

from lucene_spark.fixtures.transcripts import transcripts_df
from lucene_spark.index import build_index
from lucene_spark.index.splitter import split_index
from lucene_spark.search import IndexSearcher
from lucene_spark.search.query import TermQuery


@pytest.fixture(scope="module")
def split_setup(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("split")
    src = str(root / "src")
    corpus = transcripts_df(spark, n_convs=60, seed=5, partitions=4)
    build_index(spark, corpus, src, num_buckets=3)
    # delete one known doc first: it must land in NEITHER half
    from lucene_spark.index.deletes import delete_docs
    s = IndexSearcher(spark, src)
    victim = s.search(TermQuery("w000001"), k=1)[0][0]
    assert delete_docs(spark, src, f"doc_id = {victim}") == 1
    a, b = str(root / "match"), str(root / "rest")
    na, nb = split_index(spark, src, a, b, "role = 'user'")
    return src, a, b, victim, na, nb


def _ds(spark, d):
    from lucene_spark.index.catalog import IndexCatalog, read_table
    return read_table(spark, IndexCatalog(d).table_locations("docstore"))


def test_split_partitions_live_docs(spark, split_setup):
    src, a, b, victim, na, nb = split_setup
    da = {r["role"] for r in _ds(spark, a).select("role").collect()}
    db = {r["role"] for r in _ds(spark, b).select("role").collect()}
    assert da == {"user"} and "user" not in db
    # counts partition the LIVE corpus (victim excluded)
    src_live = _ds(spark, src).count() - 1
    assert na + nb == src_live
    assert na == _ds(spark, a).count()
    # the deleted doc's conv/turn appears in neither half
    vic = (_ds(spark, src).filter(F.col("doc_id") == victim)
           .select("conv_id", "turn_idx").collect()[0])
    for half in (a, b):
        got = (_ds(spark, half)
               .filter((F.col("conv_id") == vic["conv_id"])
                       & (F.col("turn_idx") == vic["turn_idx"])).count())
        assert got == 0


def test_split_halves_are_searchable_with_own_stats(spark, split_setup):
    src, a, b, victim, na, nb = split_setup
    sa, sb = IndexSearcher(spark, a), IndexSearcher(spark, b)
    ra = sa.search(TermQuery("w000002"), k=10)
    rb = sb.search(TermQuery("w000002"), k=10)
    assert ra and rb
    # per-side stats: each half equals a fresh build over ITS corpus —
    # verify the match half against a brute oracle on its own docstore
    import pandas as pd
    from lucene_spark.search.oracle import BruteForceOracle
    pdf = (_ds(spark, a).select("doc_id", "text")
           .toPandas().sort_values("doc_id").reset_index(drop=True))
    oracle = BruteForceOracle(pdf)
    assert ra == oracle.topk({"type": "term", "terms": ["w000002"],
                              "k": 10})


def test_split_checkindex(spark, split_setup):
    src, a, b, *_ = split_setup
    from lucene_spark.index.checker import check_index
    for d in (a, b):
        # raises AssertionError on any invariant violation
        rep = check_index(spark, d)
        assert rep
