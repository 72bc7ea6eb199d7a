"""Checkpoint-resume idempotence + highlighter snippets."""

import time

import pytest
from pyspark.sql import functions as F

from lucene_spark.fixtures.transcripts import term_string, transcripts_df
from lucene_spark.index import build_index
from lucene_spark.index.builder import IndexBuilder
from lucene_spark.index.catalog import IndexCatalog
from lucene_spark.search import IndexSearcher
from lucene_spark.search.highlight import highlight
from lucene_spark.search.query import OrQuery, TermQuery

T = [term_string(k) for k in range(10)]


def test_rebuild_is_fast_noop(spark, small_index):
    """A completed build re-entered with the same catalog must skip all
    stages via commit points (segments_N resume semantics)."""
    src = transcripts_df(spark, n_convs=150, seed=42, partitions=4)
    t0 = time.time()
    build_index(spark, src, small_index, num_buckets=6)
    assert time.time() - t0 < 20  # no stage re-runs, just catalog reads


def test_resume_after_dropped_merge(spark, small_index):
    """Dropping the merged tables (simulated mid-build failure after the
    segments stage) and re-entering build() must re-merge and reproduce
    identical search results."""
    s0 = IndexSearcher(spark, small_index)
    q = OrQuery((T[1], T[3]))
    before = s0.search(q, k=10)
    cat = IndexCatalog(small_index)
    cat.drop_tables(["postings", "termstats"])
    src = transcripts_df(spark, n_convs=150, seed=42, partitions=4)
    build_index(spark, src, small_index, num_buckets=6)
    after = IndexSearcher(spark, small_index).search(q, k=10)
    assert before == after


def test_segments_resume_skips_done_buckets(spark, small_index):
    b = IndexBuilder(spark, small_index, num_buckets=6)
    assert b._done_buckets() == set(range(6))


def test_highlight_snippets(spark, small_index):
    s = IndexSearcher(spark, small_index)
    top = s.search_df(TermQuery(T[2]), k=5)
    ret = s.retrieve(top)
    sn = highlight(ret, [T[2]], window=4).collect()
    assert len(sn) == 5
    for r in sn:
        assert r["n_hits"] >= 1
        assert f"<b>{T[2]}</b>" in r["snippet"]


# ---- passage-scored highlighting (UnifiedHighlighter FieldHighlighter
# + PassageScorer analog) ------------------------------------------------

def test_passage_scoring_picks_best_passage(spark):
    from lucene_spark.search.highlight import highlight_passages
    rows = [
        (0, "nothing here. slow appears once. slow fast slow fast here!"),
        (1, "fast at the very start. filler text only in this one."),
        (2, "no matches at all in this document."),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = highlight_passages(df, ["slow", "fast"],
                             {"slow": 10, "fast": 20}, 100,
                             max_passages=1).collect()
    by_doc = {r["doc_id"]: r for r in out}
    # doc 0: the dense 2nd-hit passage must win over the single-hit one
    assert "slow fast slow fast" in by_doc[0]["passage"].replace(
        "<b>", "").replace("</b>", "")
    assert by_doc[0]["n_hits"] == 4
    assert "<b>slow</b>" in by_doc[0]["passage"]
    # doc 1 returns its only matching passage; doc 2 yields no row
    assert by_doc[1]["n_hits"] == 1
    assert 2 not in by_doc


def test_passage_position_decay(spark):
    """Equal-content passages: the EARLIER one scores higher
    (PassageScorer's norm(start) position decay)."""
    from lucene_spark.search.highlight import highlight_passages
    txt = "slow fast here. " + "filler words only. " * 5 + "slow fast here."
    df = spark.createDataFrame([(0, txt)], "doc_id bigint, text string")
    out = highlight_passages(df, ["slow", "fast"], {"slow": 5, "fast": 5},
                             100, max_passages=2).collect()
    assert len(out) == 2
    assert out[0]["p_start"] < out[1]["p_start"]
    assert out[0]["p_score"] > out[1]["p_score"]
