"""Regression tests for the round-5 self-review findings: NULL-tail
sort paging, null-query synonym contract, multiphrase slot dedup,
lang_id on NULL text, exact-OSA oracle SQL, facet NULL semantics +
label escaping, CJK maxTokenLength, typed regexp errors, degenerate
quantization bounds."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from lucene_spark.fixtures.transcripts import term_string
from lucene_spark.search import IndexSearcher
from lucene_spark.search.query import (MultiPhraseQuery, OrQuery,
                                       PhraseQuery, TermQuery)

T = [term_string(k) for k in range(30)]


@pytest.fixture(scope="module")
def searcher(spark, small_index):
    return IndexSearcher(spark, small_index)


# --- finding 1: NULL sort keys page through, not vanish ---------------------

def _meta_with_nulls(spark, searcher, q):
    """doc-values table where half the matches carry a NULL sort key."""
    m = searcher.matches_df(q).select("doc_id")
    return m.withColumn(
        "v", F.when(F.col("doc_id") % 2 == 0,
                    F.col("doc_id") % 7).cast("long"))


@pytest.mark.parametrize("desc", [True, False])
def test_null_sort_keys_tile_across_pages(spark, searcher, desc):
    q = OrQuery((T[2], T[5]))
    meta = _meta_with_nulls(spark, searcher, q).cache()
    total = meta.count()
    assert meta.filter("v IS NULL").count() > 3
    full = searcher.sort_search_df(q, [("v", "desc" if desc else "asc")],
                                   k=total, metadata=meta).collect()
    assert len(full) == total
    # NULLs must be LAST in either direction
    vals = [r["v"] for r in full]
    first_null = vals.index(None)
    assert all(v is None for v in vals[first_null:])
    # page through with a cursor; NULL cursor values continue the tail
    pages, after = [], None
    for _ in range(0, total, 5):
        rows = searcher.sort_search_df(
            q, [("v", "desc" if desc else "asc")], k=5,
            after=after, metadata=meta).collect()
        if not rows:
            break
        pages.extend(rows)
        after = (rows[-1]["v"], rows[-1]["doc_id"])
    assert [(r["doc_id"], r["v"]) for r in pages] \
        == [(r["doc_id"], r["v"]) for r in full]


# --- finding 2: zero-token synonym query -> None, not MatchAll --------------

def test_empty_synonym_query_returns_none(spark):
    from lucene_spark.kernels.synonyms import (SynonymMap, synonym_query,
                                               synonym_phrase_query)
    sm = SynonymMap(["slow, fast"])
    assert synonym_query("", sm) is None
    assert synonym_query("!!! ---", sm) is None
    assert synonym_phrase_query("", sm) is None
    assert synonym_query("slow", sm) is not None


# --- finding 3: multiphrase slots dedupe duplicated alternatives ------------

def test_multiphrase_duplicate_alternative_scores_as_single(searcher):
    """A slot listing the same term twice must score exactly like the
    plain phrase (duplicates would double tf and break the unique-
    positions contract of the phrase kernel)."""
    plain = searcher.search_df(PhraseQuery((T[2], T[3])), k=10).collect()
    dup = searcher.search_df(
        MultiPhraseQuery(((T[2], T[2]), (T[3],))), k=10).collect()
    assert [(r.doc_id, r.score) for r in plain] \
        == [(r.doc_id, r.score) for r in dup]


def test_multiphrase_stem_collision_dedupes(spark, tmp_path):
    """Two alternatives that analyze to the same index term collapse to
    one member (e.g. 'merge'/'merges' under porter)."""
    rows = [("c0", 0, "user", "merge the fast table", "t", 0),
            ("c1", 0, "user", "merges run slow today", "t", 1)]
    src = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts long")
    from lucene_spark.index import build_index
    out = str(tmp_path / "idx")
    build_index(spark, src, out, num_buckets=2,
                analyzers={"text": "porter"})
    s = IndexSearcher(spark, out)
    mp = s.search_df(MultiPhraseQuery((("merge", "merges"), ("the",))),
                     k=5).collect()
    ph = s.search_df(PhraseQuery(("merge", "the")), k=5).collect()
    assert [(r.doc_id, r.score) for r in mp] \
        == [(r.doc_id, r.score) for r in ph]
    assert len(mp) == 1


# --- finding 4: lang_id on NULL text -> 'unk' -------------------------------

def test_lang_id_null_text_is_unk(spark):
    from lucene_spark.ops.textstats import lang_id
    df = spark.createDataFrame(
        [(0, "the of and to in that it was his he"), (1, None), (2, "")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["lang_pred"] for r in lang_id(df).collect()}
    assert got[0] == "en"
    assert got[1] == "unk"
    assert got[2] == "unk"


# --- finding 5: the oracle's OSA SQL is the kernel's OSA --------------------

def test_osa_sql_matches_kernel():
    import duckdb
    import __spark_entry__ as E
    from lucene_spark.kernels.osa import osa_distances
    rng = random.Random(11)
    words = ["join", "jion", "ixjon", "acb", "ca", "abc", "vectr",
             "vector", "abtch", "batch", ""]
    words += ["".join(rng.choice("abcjv") for _ in range(rng.randint(0, 8)))
              for _ in range(200)]
    con = duckdb.connect()
    con.execute("CREATE TABLE w(t VARCHAR)")
    con.executemany("INSERT INTO w VALUES (?)", [(w,) for w in words])
    for pat in ("jion", "vectr", "ca"):
        got = dict(con.execute(
            f"SELECT t, {E._osa_sql('t', pat)} FROM w").fetchall())
        want = dict(zip(words, osa_distances(words, pat)))
        for t in words:
            assert got[t] == want[t], (pat, t)
    # the documented divergence case: unrestricted DL=2, OSA=3
    assert con.execute(
        "SELECT damerau_levenshtein('ixjon', 'jion')").fetchone()[0] == 2
    assert con.execute(
        f"SELECT {E._osa_sql('t', 'jion')} FROM w WHERE t='ixjon'"
    ).fetchone()[0] == 3


# --- finding 6: association NULLs excluded from n_docs ----------------------

def test_association_sums_skip_null_assoc(spark):
    from lucene_spark.ops.facets import association_sums
    m = spark.createDataFrame([(0,), (1,), (2,)], "doc_id long")
    docs = spark.createDataFrame(
        [(0, "a/b", 10), (1, "a/b", None), (2, "a/c", 5)],
        "doc_id long, path string, assoc long")
    got = {(r["level"], r["path"]): (r["n_docs"], r["sum_assoc"])
           for r in association_sums(m, docs, "path", "assoc").collect()}
    assert got[(1, "a")] == (2, 15)       # doc 1 not visited at all
    assert got[(2, "a/b")] == (1, 10)


# --- finding 9: range labels with quotes survive the unpivot ----------------

def test_range_counts_label_escaping(spark):
    from lucene_spark.ops.facets import range_counts
    m = spark.createDataFrame([(0,), (1,)], "doc_id long")
    docs = spark.createDataFrame([(0, 3), (1, 30)], "doc_id long, v long")
    got = {r["range_label"]: r["n_docs"] for r in range_counts(
        m, docs, "v", [("kid's", 0, True, 10, False),
                       ("big\\one", 10, True, None, True)]).collect()}
    assert got["kid's"] == 1
    assert got["big\\one"] == 1


# --- finding 8: typed regexp errors ------------------------------------------

def test_regexp_unterminated_raises_typed():
    from lucene_spark.kernels.regexp import LuceneRegexpError, translate
    for bad in ('"abc', "a{2", "a<b"):
        with pytest.raises(LuceneRegexpError):
            translate(bad)


# --- finding 7: CJK chain honors maxTokenLength -----------------------------

def test_cjk_long_ascii_run_splits():
    import pandas as pd
    from lucene_spark.kernels.cjk import cjk_tokenize_series
    long_run = "a" * 300
    toks = cjk_tokenize_series(pd.Series([f"{long_run} 東京"]))[0]
    assert toks[0] == "a" * 255 and toks[1] == "a" * 45
    assert "東京" in toks


# --- finding 10: degenerate quantization bounds ------------------------------

def test_quantize_degenerate_bounds():
    import numpy as np
    from lucene_spark.ops.quantized import _quantize_np
    mat = np.full((4, 8), 0.25)
    q, sums = _quantize_np(mat, 0.25, 0.25)
    assert q.dtype == np.uint8 and not np.isnan(q).any()
    assert (q == 0).all() and (sums == 0).all()
