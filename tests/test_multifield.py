"""Multi-field indexing: keyword fields (role/tool) indexed alongside
the analyzed text field with per-field options — the FieldInfos
per-field analyzer/IndexOptions capability
(core:index/FieldInfos.java, core:document/KeywordField.java).

Keyword semantics: raw value = one untokenized term, tf=1, omitted
norms (scoring length 1), per-field collection stats.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.fixtures.transcripts import term_string, transcripts_df
from lucene_spark.index import build_index
from lucene_spark.index.catalog import IndexCatalog
from lucene_spark.kernels.bm25 import BM25Scorer
from lucene_spark.search import IndexSearcher
from lucene_spark.search.query import OrQuery, TermQuery
from lucene_spark.streaming import NRTIndexWriter

T = [term_string(k) for k in range(30)]


@pytest.fixture(scope="module")
def mf_index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("mf") / "idx")
    src = transcripts_df(spark, n_convs=80, seed=11, partitions=4)
    build_index(spark, src, out, num_buckets=4,
                keyword_fields=("role", "tool"))
    return out


@pytest.fixture(scope="module")
def docstore_pdf(spark, mf_index):
    cat = IndexCatalog(mf_index)
    return (spark.read.parquet(cat.table_path("docstore"))
            .select("doc_id", "role", "tool").orderBy("doc_id").toPandas())


def test_keyword_field_term_query(spark, mf_index, docstore_pdf):
    s = IndexSearcher(spark, mf_index)
    assert "role" in s.keyword_fields
    want_docs = sorted(docstore_pdf.loc[docstore_pdf["role"] == "user",
                                        "doc_id"].tolist())
    got = s.search(TermQuery("user", field="role"), k=10 ** 6)
    assert sorted(d for d, _ in got) == want_docs
    # every hit scores identically: tf=1, norm length 1, same df
    dc, sttf = s.field_stats["role"]
    expect = BM25Scorer(len(want_docs), dc, sttf).score(
        np.array([1]), np.array([1]))[0]
    assert all(sc == expect for _, sc in got)
    # ties resolve by doc_id asc
    assert [d for d, _ in got] == want_docs


def test_keyword_field_stats_rows(spark, mf_index, docstore_pdf):
    s = IndexSearcher(spark, mf_index)
    n = len(docstore_pdf)
    assert s.field_stats["role"] == (n, n)
    assert s.field_stats["tool"][0] <= n  # nulls unindexed
    # termstats carries per-field rows; text terms unchanged
    ts = spark.read.parquet(s.termstats_path)
    kinds = {r["field"] for r in ts.select("field").distinct().collect()}
    assert kinds == {"text", "role", "tool"}
    role_df = {r["term"]: int(r["df"])
               for r in ts.filter("field = 'role'").collect()}
    want = docstore_pdf["role"].value_counts().to_dict()
    assert role_df == want


def test_text_field_results_unaffected_by_keyword_fields(
        spark, mf_index, tmp_path_factory):
    """The same corpus indexed with and without keyword fields must give
    identical text-field rankings (per-field stats isolation)."""
    plain = str(tmp_path_factory.mktemp("mfplain") / "idx")
    src = transcripts_df(spark, n_convs=80, seed=11, partitions=4)
    build_index(spark, src, plain, num_buckets=4)
    s_mf = IndexSearcher(spark, mf_index)
    s_pl = IndexSearcher(spark, plain)
    q = OrQuery((T[1], T[3], T[7]))
    assert s_mf.search(q, k=15) == s_pl.search(q, k=15)


def test_mixed_field_search_batch(spark, mf_index, docstore_pdf):
    s = IndexSearcher(spark, mf_index)
    qs = {"text_q": TermQuery(T[2]),
          "role_q": TermQuery("assistant", field="role")}
    res = s.search_batch(qs, k=8).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(
            (r["doc_id"], np.float32(r["score"])))
    ser_t = s.search(TermQuery(T[2]), k=8)
    ser_r = s.search(TermQuery("assistant", field="role"), k=8)
    assert sorted(by_q["text_q"], key=lambda x: (-x[1], x[0])) == ser_t
    assert sorted(by_q["role_q"], key=lambda x: (-x[1], x[0])) == ser_r


def test_count_and_explain_on_keyword_field(spark, mf_index, docstore_pdf):
    s = IndexSearcher(spark, mf_index)
    q = TermQuery("user", field="role")
    assert s.count(q) == int((docstore_pdf["role"] == "user").sum())
    d0 = int(docstore_pdf.loc[docstore_pdf["role"] == "user",
                              "doc_id"].iloc[0])
    ex = s.explain(q, d0)
    assert ex["matches"] and ex["norm"] == 1
    got = dict(s.search(q, k=10 ** 6))[d0]
    assert np.float32(ex["score"]) == got


def test_nrt_append_keeps_keyword_fields(spark, mf_index, tmp_path_factory):
    import shutil
    idx = str(tmp_path_factory.mktemp("mfnrt") / "idx")
    shutil.copytree(mf_index, idx)
    batch = (transcripts_df(spark, n_convs=100, seed=11, partitions=2)
             .filter(F.col("conv_id") >= "conv00000080"))
    w = NRTIndexWriter(spark, idx, rows_per_bucket=400)
    assert w.append_batch(batch) > 0
    s = IndexSearcher(spark, idx)
    cat = IndexCatalog(idx)
    from lucene_spark.index.catalog import read_table
    ds = (read_table(spark, cat.table_locations("docstore"))
          .select("doc_id", "role").orderBy("doc_id").toPandas())
    want = sorted(ds.loc[ds["role"] == "user", "doc_id"].tolist())
    got = sorted(d for d, _ in s.search(TermQuery("user", field="role"),
                                        k=10 ** 6))
    assert got == want
    n = len(ds)
    assert s.field_stats["role"] == (n, n)


# ---- PerFieldSimilarityWrapper (similarity={field: factory}) -----------

def test_per_field_similarity_routes_by_field(spark, mf_index):
    from lucene_spark.kernels.bm25 import ClassicScorer
    pf = IndexSearcher(spark, mf_index,
                       similarity={"text": ClassicScorer, "*": BM25Scorer})
    all_classic = IndexSearcher(spark, mf_index, similarity=ClassicScorer)
    all_bm25 = IndexSearcher(spark, mf_index)
    # text field -> Classic; keyword field -> the "*" default (BM25)
    q_text = TermQuery(T[1])
    q_role = TermQuery("user", field="role")
    assert pf.search(q_text, k=10) == all_classic.search(q_text, k=10)
    assert pf.search(q_role, k=10) == all_bm25.search(q_role, k=10)
    # and the per-field results DIFFER from the wrong-similarity runs
    assert pf.search(q_text, k=10) != all_bm25.search(q_text, k=10)


def test_per_field_similarity_nested_tree_and_explain(spark, mf_index):
    from lucene_spark.kernels.bm25 import ClassicScorer
    from lucene_spark.search.query import BooleanQuery
    pf = IndexSearcher(spark, mf_index,
                       similarity={"text": ClassicScorer})
    # nested tree mixing fields: text clauses score Classic, the role
    # FILTER clause is unscored — equal to the all-Classic searcher
    # because only text clauses contribute score
    all_classic = IndexSearcher(spark, mf_index, similarity=ClassicScorer)
    q = BooleanQuery(must=(TermQuery(T[1]),),
                     should=(TermQuery(T[4]),),
                     filter_=(TermQuery("user", field="role"),))
    got = pf.search(q, k=10, pruned=True)
    assert got == all_classic.search(q, k=10, pruned=True)
    assert got == pf.search(q, k=10, pruned=False)
    # explain() uses the field's similarity
    d0 = got[0][0]
    ex = pf.explain(TermQuery(T[1]), d0)
    sc = ClassicScorer(ex["terms"][T[1]]["df"], ex["doc_count"])
    assert ex["terms"][T[1]]["idf"] == pytest.approx(float(sc.idf))
