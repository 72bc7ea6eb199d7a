"""searchAfter deep paging + percolator phrase queries + catalog
vacuum."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.fixtures.transcripts import term_string, transcripts_df
from lucene_spark.index import build_index
from lucene_spark.index.catalog import IndexCatalog
from lucene_spark.search import IndexSearcher
from lucene_spark.search.query import (BooleanQuery, OrQuery, PhraseQuery,
                                       TermQuery)
from lucene_spark.streaming import NRTIndexWriter

T = [term_string(k) for k in range(30)]


@pytest.fixture(scope="module")
def searcher(spark, small_index):
    return IndexSearcher(spark, small_index)


@pytest.mark.parametrize("q", [
    TermQuery(T[1]),
    OrQuery((T[2], T[7], T[19])),
    BooleanQuery(must=(PhraseQuery((T[0], T[1])),), should=(T[3],)),
], ids=["term", "or", "nested"])
def test_pagination_reconstructs_full_ranking(searcher, q):
    full = searcher.search(q, k=10 ** 6)
    assert len(full) > 6
    page_size = max(len(full) // 4, 2)
    pages = [searcher.search(q, k=page_size)]
    while True:
        cursor = pages[-1][-1]
        nxt = searcher.search_after(q, cursor, k=page_size)
        if not nxt:
            break
        pages.append(nxt)
    paged = [hit for p in pages for hit in p]
    assert paged == full


def test_search_after_with_doc_filter(spark, small_index, searcher):
    q = TermQuery(T[1])
    flt = "role = 'user'"
    full = searcher.search(q, k=10 ** 6, doc_filter=flt)
    if len(full) < 4:
        pytest.skip("not enough filtered hits")
    first = searcher.search(q, k=2, doc_filter=flt)
    rest = searcher.search_after(q, first[-1], k=10 ** 6, doc_filter=flt)
    assert first + rest == full


# ---- percolator phrase queries ----------------------------------------

def test_percolate_phrase(spark, small_index):
    from lucene_spark.index.catalog import IndexCatalog
    from lucene_spark.ops import percolate as PC
    cat = IndexCatalog(small_index)
    docs = (spark.read.parquet(cat.table_path("docstore"))
            .select("doc_id", "text"))
    qdf = PC.stored_queries(spark, [
        ("and_q", "and", [T[0], T[1]]),
        ("ph_q", "phrase", [T[0], T[1]]),
    ])
    res = PC.percolate(docs, qdf).collect()
    got_and = {r["doc_id"] for r in res if r["query_id"] == "and_q"}
    got_ph = {r["doc_id"] for r in res if r["query_id"] == "ph_q"}
    from lucene_spark.kernels.tokenizer import tokenize_one
    pdf = docs.toPandas()
    want_ph = set()
    want_and = set()
    for d, t in zip(pdf["doc_id"], pdf["text"]):
        toks = tokenize_one(t)
        if T[0] in toks and T[1] in toks:
            want_and.add(int(d))
            if any(toks[i] == T[0] and toks[i + 1] == T[1]
                   for i in range(len(toks) - 1)):
                want_ph.add(int(d))
    assert got_and == want_and
    assert got_ph == want_ph
    assert got_ph < got_and  # phrase is strictly stricter here


def test_percolate_stream(spark, small_index, tmp_path):
    from lucene_spark.ops import percolate as PC
    cat = IndexCatalog(small_index)
    ds_path = cat.table_path("docstore")
    qdf = PC.stored_queries(spark, [("q", "and", [T[0], T[1]])])
    stream = (spark.readStream.schema(
        spark.read.parquet(ds_path).schema)
        .option("maxFilesPerTrigger", 2).parquet(ds_path)
        .select("doc_id", "text"))
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    PC.percolate_stream(stream, qdf, out, ck).awaitTermination(120)
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    want = {r["doc_id"] for r in PC.percolate(
        spark.read.parquet(ds_path).select("doc_id", "text"),
        qdf).collect()}
    assert got == want and got


# ---- catalog vacuum ---------------------------------------------------

def test_vacuum_removes_unreferenced_generations(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("vac") / "idx")
    base = transcripts_df(spark, n_convs=40, seed=6, partitions=2)
    build_index(spark, base, idx, num_buckets=2)
    full = transcripts_df(spark, n_convs=80, seed=6, partitions=2)
    w = NRTIndexWriter(spark, idx, rows_per_bucket=100)
    for lo, hi in ((40, 60), (60, 80)):
        b = full.filter((F.col("conv_id") >= f"conv{lo:08d}")
                        & (F.col("conv_id") < f"conv{hi:08d}"))
        assert w.append_batch(b) > 0
    assert w.compact_tiered(target_docs_per_bucket=10 ** 9) > 0
    cat = IndexCatalog(idx)
    s_before = IndexSearcher(spark, idx)
    q = TermQuery(T[1])
    want = s_before.search(q, k=15)
    # default grace period protects fresh (possibly in-flight staging)
    # dirs — nothing is removed even though generations are unreferenced
    assert cat.vacuum(keep_commits=1)["removed_dirs"] == []
    report = cat.vacuum(keep_commits=1, grace_seconds=0)
    assert report["removed_dirs"]  # pre-compaction gens dropped
    # referenced dirs all still exist; index still searches identically
    for name in ("docstore", "segments", "norms", "postings",
                 "termstats", "stats"):
        for p in cat.table_locations(name):
            assert os.path.isdir(p), (name, p)
    s_after = IndexSearcher(spark, idx)
    assert s_after.search(q, k=15) == want
