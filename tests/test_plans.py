"""Physical-plan assertions: the scan shapes we rely on for 100 TB
scale must actually appear in Catalyst's plans (pushdown, partition
pruning, broadcast) — guarding against silent plan regressions."""

import pytest

from lucene_spark.search import IndexSearcher
from lucene_spark.search.query import TermQuery


@pytest.fixture(scope="module")
def searcher(spark, small_index):
    return IndexSearcher(spark, small_index)


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_postings_scan_prunes_partitions_and_pushes_term(searcher):
    plan = _formatted(searcher._postings_for(["w000001"], "text")
                      .select("term", "bucket_id", "blocks"))
    assert "PartitionFilters" in plan
    # directory-level term-dictionary seek: term_h partition equality
    assert "term_h" in plan.split("PartitionFilters", 1)[1][:200]
    assert "EqualTo(term,w000001)" in plan
    # column pruning: positions/impacts only, no stray columns
    assert "ReadSchema" in plan


def test_termstats_scan_pushes_term_filter(searcher):
    import pyspark.sql.functions as F
    df = (searcher.spark.read.parquet(searcher.termstats_path)
          .filter(F.col("term") == "w000001"))
    plan = _formatted(df)
    assert "EqualTo(term,w000001)" in plan


def test_retrieve_uses_broadcast_join(searcher):
    top = searcher.search_df(TermQuery("w000001"), k=5)
    plan = _formatted(searcher.retrieve(top))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_search_is_partial_topk_then_global_limit(searcher):
    plan = _formatted(searcher.search_df(TermQuery("w000001"), k=5))
    # global merge is TakeOrderedAndProject over per-bucket results
    assert "TakeOrderedAndProject" in plan


def test_nested_tree_scan_prunes_partitions(searcher):
    """The nested-query path's (field, term) pairs scan must keep the
    term_h directory pruning and end in TakeOrderedAndProject."""
    from lucene_spark.search.query import BooleanQuery, PhraseQuery
    q = BooleanQuery(must=(PhraseQuery(("w000001", "w000002")),),
                     should=("w000003",))
    plan = _formatted(searcher.search_df(q, k=5))
    assert "PartitionFilters" in plan
    assert "term_h" in plan.split("PartitionFilters", 1)[1][:200]
    assert "TakeOrderedAndProject" in plan


def test_match_all_reads_no_postings(searcher):
    from lucene_spark.search.query import MatchAllQuery
    plan = _formatted(searcher.search_df(MatchAllQuery(), k=5))
    # built from the norms table alone — no postings directory in scan
    import os
    assert os.path.basename(os.path.dirname(
        searcher.postings_path)) not in plan or "postings" not in plan


def test_merge_has_no_broadcast_and_one_shuffle(spark, small_index):
    """The term-dictionary merge must NOT broadcast global term stats
    (10^7-10^9 terms at web scale => OOM): g_df is computed inside the
    term_h-shuffled partitions, so the plan has exactly one Exchange
    (hashpartitioning on term_h) and no BroadcastExchange."""
    from lucene_spark.index.builder import IndexBuilder
    from lucene_spark.index.catalog import IndexCatalog
    cat = IndexCatalog(small_index)
    b = IndexBuilder(spark, small_index, num_buckets=6)
    seg = spark.read.parquet(cat.table_path("segments"))
    fstats = {r["field"]: (int(r["doc_count"]), int(r["sum_ttf"]))
              for r in spark.read.parquet(cat.table_path("stats")).collect()}
    import re
    plan = _formatted(b._merged_df(seg, fstats))
    assert "BroadcastExchange" not in plan
    assert "BroadcastHashJoin" not in plan
    shuffles = re.findall(r"\(\d+\) Exchange\b", plan)
    assert len(shuffles) == 1
    assert "hashpartitioning(term_h" in plan


def test_sort_search_is_take_ordered_with_cursor_pushed(searcher):
    """Field-sort paging: the plan must end in TakeOrderedAndProject
    (per-partition partial top-k) with the cursor as a Filter BEFORE
    the ordering — the TopFieldCollector-after analog, not a global
    sort + offset."""
    df = searcher.sort_search_df(TermQuery("w000001"), "token_count",
                                 k=5, after=(12, 99))
    plan = _formatted(df)
    assert "TakeOrderedAndProject" in plan
    assert "token_count" in plan
    # no un-partitioned Window (the r03 ivf_train anti-pattern)
    assert "Window" not in plan


def test_taxonomy_counts_no_python_udf(spark, searcher):
    """Facet counting must stay whole-stage-codegen Catalyst: no
    Python UDF / mapInPandas nodes, one hash aggregate pair."""
    from lucene_spark.ops import facets as FC
    import pyspark.sql.functions as F
    m = searcher.term_postings("w000001").select("doc_id")
    docs = (spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat_ws("/", F.lit("a"), (F.col("id") % 3).cast("string"))
        .alias("path")))
    plan = _formatted(FC.taxonomy_counts(m, docs, "path"))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan


def test_filtered_ann_pushes_label_filter(spark):
    """The metadata predicate must reach the embeddings parquet scan
    as a pushed filter, so only eligible row groups are read."""
    from lucene_spark.ops import similarity as SIM
    import pyspark.sql.functions as F
    # sf0.001: no other test persists this path, so the scan stays a
    # FileSourceScan (a cached sf0.01 relation would otherwise satisfy
    # the plan via InMemoryTableScan and hide the pushdown)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = (emb.filter(F.col("vec_id") < 2)
          .select(F.col("vec_id").alias("q_id"), "embedding"))
    res, method = SIM.filtered_ann_topk(emb, qs, dim=64, k=5,
                                        filter_cond="label = 5")
    plan = _formatted(res)
    assert "PushedFilters" in plan
    after = plan.split("PushedFilters", 1)[1]
    assert "EqualTo(label,5)" in after[:200] or "label" in after[:200]
