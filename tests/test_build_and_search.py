"""End-to-end: build the index over a deterministic corpus, check
invariants, and verify rank-identical top-k for the reference query set
against the brute-force oracle, in both exhaustive and pruned modes."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.fixtures.queryset import generate_queries
from lucene_spark.fixtures.transcripts import transcripts_df
from lucene_spark.index.catalog import IndexCatalog
from lucene_spark.index.checker import check_index
from lucene_spark.search import IndexSearcher
from lucene_spark.search.oracle import BruteForceOracle
from lucene_spark.search.query import from_dict


@pytest.fixture(scope="module")
def searcher(spark, small_index):
    return IndexSearcher(spark, small_index)


@pytest.fixture(scope="module")
def corpus_pdf(spark, small_index):
    cat = IndexCatalog(small_index)
    return (spark.read.parquet(cat.table_path("docstore"))
            .select("doc_id", "conv_id", "turn_idx", "text")
            .orderBy("doc_id").toPandas())


@pytest.fixture(scope="module")
def oracle(corpus_pdf):
    return BruteForceOracle(corpus_pdf)


def test_check_index_invariants(spark, small_index):
    summary = check_index(spark, small_index)
    assert summary["docs"] > 1000
    assert summary["terms"] > 1000


def test_text_invariant(spark, small_index, corpus_pdf):
    """Per-turn text equality under stable (conv_id, turn_idx) ordering —
    the BASELINE.json per-row invariant: re-deriving text from engine
    tables equals the source."""
    src = (transcripts_df(spark, n_convs=150, seed=42, partitions=4)
           .orderBy("conv_id", "turn_idx")
           .select("conv_id", "turn_idx", "text").toPandas())
    assert len(src) == len(corpus_pdf)
    assert (src["conv_id"].to_numpy() == corpus_pdf["conv_id"].to_numpy()).all()
    assert (src["turn_idx"].to_numpy() == corpus_pdf["turn_idx"].to_numpy()).all()
    assert (src["text"].to_numpy() == corpus_pdf["text"].to_numpy()).all()
    # doc_id is dense row_number over that ordering
    np.testing.assert_array_equal(corpus_pdf["doc_id"].to_numpy(), np.arange(len(src)))


QUERIES = generate_queries(n_queries=40, seed=4242)


@pytest.mark.parametrize("q", QUERIES, ids=[q["qid"] for q in QUERIES])
def test_topk_rank_identical_vs_oracle(searcher, oracle, q):
    """Engine (pruned) must be rank-identical — same doc_ids in the same
    order with bit-equal float32 scores — to the brute-force oracle."""
    want = oracle.topk(q)
    got = searcher.search(from_dict(q), k=q["k"], pruned=True)
    assert [d for d, _ in got] == [d for d, _ in want], q
    for (gd, gs), (wd, ws) in zip(got, want):
        assert np.float32(gs) == np.float32(ws), (q["qid"], gd, gs, ws)


@pytest.mark.parametrize("q", QUERIES[:12], ids=[q["qid"] for q in QUERIES[:12]])
def test_pruned_equals_exhaustive(searcher, q):
    """CheckHits: the pruned execution must equal naive iteration."""
    a = searcher.search(from_dict(q), k=q["k"], pruned=True)
    b = searcher.search(from_dict(q), k=q["k"], pruned=False)
    assert a == b, q


def test_count_shortcut(searcher, oracle):
    q = {"type": "term", "terms": ["w000000"], "k": 10}
    from lucene_spark.search.query import TermQuery
    n = searcher.count(TermQuery("w000000"))
    want = sum(1 for c in oracle.tfs if c.get("w000000", 0) > 0)
    assert n == want


def test_retrieve_joins_stored_fields(spark, searcher):
    from lucene_spark.search.query import TermQuery
    top = searcher.search_df(TermQuery("w000001"), k=5)
    rows = searcher.retrieve(top).select("doc_id", "text", "conv_id").collect()
    assert len(rows) == 5
    assert all("w000001" in r["text"].lower() for r in rows)


def test_docid_assignment_across_arrow_batches(spark, tmp_path):
    """The conversation prefix-sum must RUN ACROSS Arrow batches: with
    more conversations per range-partition than maxRecordsPerBatch, a
    per-batch cumsum restarts at the partition offset and hands later
    batches duplicate doc_id ranges (found by searching a 2.88M-turn
    scaling build: postings overran norms in 5/32 buckets). Force many
    tiny batches and assert global doc_ids stay dense and contiguous."""
    from lucene_spark.index import build_index
    from lucene_spark.index.checker import check_index
    from lucene_spark.search import IndexSearcher
    from lucene_spark.search.query import TermQuery

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "37")
    try:
        rows = []
        for c in range(400):  # >> 37 convs per partition
            for t in range(2):
                rows.append((f"c{c:05d}", t, "user",
                             f"scan sort w{c % 7}", "none"))
        src = (spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, "
                  "text string, tool string")
            .selectExpr("*", "timestamp('2026-01-01') as ts"))
        out = str(tmp_path / "batchidx")
        build_index(spark, src, out, num_buckets=4)
        ds = spark.read.parquet(f"{out}/docstore/*")
        ids = sorted(r["doc_id"] for r in ds.select("doc_id").collect())
        assert ids == list(range(800))  # dense, no dupes, no gaps
        check_index(spark, out)  # raises AssertionError on violation
        s = IndexSearcher(spark, out)
        assert s.count(TermQuery("scan")) == 800
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
