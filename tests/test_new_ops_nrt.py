"""The session's new surfaces on a MULTI-GENERATION index (base build +
NRT append): termstats delta aggregation, match streams over appended
buckets — grouping collectors, perceptron training, BM25 NB."""

import math
from collections import Counter

import pytest

from lucene_spark.fixtures.transcripts import transcripts_df, term_string
from lucene_spark.index import build_index
from lucene_spark.index.catalog import IndexCatalog
from lucene_spark.kernels.tokenizer import tokenize_one
from lucene_spark.search import IndexSearcher
from lucene_spark.search.query import TermQuery
from lucene_spark.streaming import NRTIndexWriter

Q = TermQuery(term_string(2))


@pytest.fixture(scope="module")
def nrt_searcher(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("nrtops") / "idx")
    base = transcripts_df(spark, n_convs=80, seed=11, partitions=4)
    build_index(spark, base, out, num_buckets=3)
    w = NRTIndexWriter(spark, out, rows_per_bucket=500)
    from pyspark.sql import functions as F
    batch = (transcripts_df(spark, n_convs=95, seed=11, partitions=2)
             .filter(F.col("conv_id") >= "conv00000080"))
    assert w.append_batch(batch, batch_id=1) > 0
    return IndexSearcher(spark, out)


@pytest.fixture(scope="module")
def corpus(spark, nrt_searcher):
    s = nrt_searcher
    rows = (s._read_cached(s.docstore_paths)
            .select("doc_id", "text", "role").collect())
    return [(int(r["doc_id"]), tokenize_one(r["text"] or ""), r["role"])
            for r in rows]


def test_group_collectors_on_multi_generation(nrt_searcher, corpus):
    s = nrt_searcher
    matched = {d for d, _ in s.search(Q, k=10 ** 6)}
    cls_of = {d: r for d, _, r in corpus}
    want = Counter(cls_of[d] for d in matched)
    got = {(r["grp"], int(r["n_docs"]))
           for r in s.all_groups(Q, "role").collect()}
    assert got == set(want.items())


def test_perceptron_on_multi_generation(nrt_searcher, corpus):
    from lucene_spark.ops.perceptron import train_boolean_perceptron
    s = nrt_searcher
    w, b = train_boolean_perceptron(s, "role = 'user'", n_parts=1)
    # init weights came from AGGREGATED (base + delta) termstats: spot
    # check a term's starting ttf feeds through when never updated...
    # instead assert the global invariants that depend on correct stats
    ttf = Counter()
    for _, toks, _ in corpus:
        ttf.update(toks)
    n_tok = sum(len(t) for _, t, _ in corpus)
    assert b == pytest.approx(n_tok / len(corpus), rel=1e-9)
    wmap = {r["term"]: r["weight"] for r in w.collect()}
    assert set(wmap) == set(ttf)  # full merged vocabulary
    assert all(v >= 0 and v == int(v) for v in wmap.values())


def test_bm25_nb_on_multi_generation(spark, tmp_path_factory):
    from lucene_spark.ops.classify import bm25_nb_classify
    out = str(tmp_path_factory.mktemp("nrtkw") / "idx")
    base = transcripts_df(spark, n_convs=60, seed=7, partitions=4)
    build_index(spark, base, out, num_buckets=3,
                keyword_fields=("role", "tool"))
    w = NRTIndexWriter(spark, out, rows_per_bucket=500)
    from pyspark.sql import functions as F
    batch = (transcripts_df(spark, n_convs=70, seed=7, partitions=2)
             .filter(F.col("conv_id") >= "conv00000060"))
    assert w.append_batch(batch, batch_id=1) > 0
    s = IndexSearcher(spark, out)
    res = bm25_nb_classify(s, f"{term_string(2)} {term_string(5)}",
                           class_field="role").collect()
    assert res and sum(r["score"] for r in res) == pytest.approx(1.0)
    # classes span the merged dictionary
    roles = {r["role"] for r in
             (s._read_cached(s.docstore_paths)
              .select("role").distinct().collect()) if r["role"]}
    assert {r["cls"] for r in res} == roles
