"""Document deletes: live-doc bitmaps skip dead docs at search time,
scores of survivors unchanged, stats untouched until compaction —
Lucene's delete semantics."""

import shutil

import numpy as np
import pytest

from lucene_spark.fixtures.transcripts import term_string, transcripts_df
from lucene_spark.index import build_index
from lucene_spark.index.catalog import IndexCatalog
from lucene_spark.index.deletes import delete_docs, live_count
from lucene_spark.search import IndexSearcher
from lucene_spark.search.query import OrQuery, TermQuery

T = [term_string(k) for k in range(10)]


@pytest.fixture(scope="module")
def del_index(spark, small_index, tmp_path_factory):
    # copy the shared index so deletes don't leak into other tests
    out = str(tmp_path_factory.mktemp("del") / "idx")
    shutil.copytree(small_index, out)
    return out


def test_delete_excludes_docs_scores_unchanged(spark, del_index):
    s0 = IndexSearcher(spark, del_index)
    before = s0.search(OrQuery((T[1], T[4])), k=10**6)
    n = delete_docs(spark, del_index, "role = 'tool'")
    assert n > 0
    cat = IndexCatalog(del_index)
    dead = {r["doc_id"] for r in
            spark.read.parquet(cat.table_path("docstore"))
            .filter("role = 'tool'").select("doc_id").collect()}
    s1 = IndexSearcher(spark, del_index)
    after = s1.search(OrQuery((T[1], T[4])), k=10**6)
    want = [(d, sc) for d, sc in before if d not in dead]
    assert [d for d, _ in after] == [d for d, _ in want]
    for (gd, gs), (wd, ws) in zip(after, want):
        assert np.float32(gs) == np.float32(ws)


def test_count_respects_deletes(spark, del_index):
    s = IndexSearcher(spark, del_index)
    cat = IndexCatalog(del_index)
    ds = spark.read.parquet(cat.table_path("docstore"))
    want = (ds.filter("role != 'tool' and text like '%" + T[1] + "%'")
            .count())
    got = s.count(TermQuery(T[1]))
    # text LIKE can overmatch (substring vs token) — recount exactly
    from lucene_spark.kernels.tokenizer import tokenize_one
    rows = ds.filter("role != 'tool'").select("doc_id", "text").collect()
    exact = sum(1 for r in rows if T[1] in tokenize_one(r["text"]))
    assert got == exact


def test_deletes_cover_all_search_paths(spark, del_index):
    """search_batch, constant-score, phrase_matches and interval_matches
    must honor live-docs too."""
    from lucene_spark.search.query import MultiTermQuery
    cat = IndexCatalog(del_index)
    dead = {r["doc_id"] for r in
            spark.read.parquet(cat.table_path("docstore"))
            .filter("role = 'tool'").select("doc_id").collect()}
    s = IndexSearcher(spark, del_index)
    # batch path
    batch = s.search_batch({"a": OrQuery((T[1], T[4])),
                            "b": TermQuery(T[2])}, k=500).collect()
    assert not any(int(r["doc_id"]) in dead for r in batch)
    # constant-score multi-term path
    cs = s.search_df(MultiTermQuery("set", (T[1], T[2]),
                                    rewrite="constant_score"), k=10**6)
    assert not any(int(r["doc_id"]) in dead for r in cs.collect())
    # phrase + interval paths
    ph = s.phrase_matches([T[0], T[1]])
    assert not any(int(r["doc_id"]) in dead for r in ph.collect())
    iv = s.interval_matches([T[1], T[4]], max_gaps=5)
    assert not any(int(r["doc_id"]) in dead for r in iv.collect())


def test_delete_count_not_double_counted(spark, del_index):
    # re-deleting the same predicate must report 0 newly deleted
    n = delete_docs(spark, del_index, "role = 'tool'")
    assert n == 0


def test_live_count_and_cumulative_deletes(spark, del_index):
    total = int(spark.read.parquet(
        IndexCatalog(del_index).table_path("stats")).collect()[0]["doc_count"])
    lc1 = live_count(spark, del_index)
    assert lc1 < total
    n2 = delete_docs(spark, del_index, "turn_idx = 0")
    lc2 = live_count(spark, del_index)
    assert lc2 <= lc1
    # stats table unchanged (Lucene keeps stats until merge)
    total2 = int(spark.read.parquet(
        IndexCatalog(del_index).table_path("stats")).collect()[0]["doc_count"])
    assert total2 == total
