"""FuzzyLikeThisQuery (sandbox/src/java/org/apache/lucene/sandbox/
queries/FuzzyLikeThisQuery.java): per-term fuzzy variant expansion,
variant score = FuzzyTermsEnum boost^2 x ClassicSimilarity idf, global
top-N, rewrite to TermQuerys with ARTIFICIAL df = ttf = 1 (addTerms +
newTermQuery:261-277) — validated by independent recomputation from the
docstore."""

import math
from collections import Counter

import pytest

from lucene_spark.index.catalog import IndexCatalog
from lucene_spark.kernels.osa import osa_distance
from lucene_spark.kernels.tokenizer import tokenize_one
from lucene_spark.search import IndexSearcher
from lucene_spark.search.query import (BooleanQuery, ConstantScoreQuery,
                                       PreAnalyzed, StatsTermQuery,
                                       TermQuery)


@pytest.fixture(scope="module")
def searcher(spark, small_index):
    return IndexSearcher(spark, small_index)


@pytest.fixture(scope="module")
def corpus(spark, small_index):
    """doc_id -> token list, plus df per term (the independent model)."""
    cat = IndexCatalog(small_index)
    pdf = (spark.read.parquet(cat.table_path("docstore"))
           .select("doc_id", "text").toPandas())
    toks = {int(r.doc_id): tokenize_one(r.text)
            for r in pdf.itertuples(index=False)}
    df = Counter()
    for ts in toks.values():
        df.update(set(ts))
    return toks, dict(df)


def _expected_variants(df, n_docs, qt, max_edits=1, prefix_length=0,
                       max_variants_per_term=50):
    """Reference addTerms semantics recomputed from scratch."""
    cands = [t for t in df
             if osa_distance(t, qt) <= max_edits
             and (not prefix_length or t.startswith(qt[:prefix_length]))]
    if not cands:
        return []
    rows = []
    tot = 0
    for v in sorted(cands):
        ed = osa_distance(qt, v)
        boost = 1.0 if ed == 0 else 1.0 - ed / min(len(qt), len(v))
        rows.append((v, boost))
        tot += df[v]
    df_src = df.get(qt, 0)
    df_used = df_src if df_src > 0 else tot // len(rows)
    idf = math.log((n_docs + 1) / (df_used + 1)) + 1.0
    rows.sort(key=lambda r: (-r[1], r[0]))
    return [(v, b * b * idf) for v, b in rows[:max_variants_per_term]]


def _leaves(q):
    assert isinstance(q, PreAnalyzed)
    out = []
    for grp in q.query.should:
        if isinstance(grp, BooleanQuery):
            out.extend(grp.should)
        else:
            out.append(grp)
    return out


def test_variant_selection_and_scores(searcher, corpus):
    toks, df = corpus
    n = searcher.doc_count
    # w00000a is corpus-absent: every variant at ed=1, avg-df idf path
    q = searcher.fuzzy_like_this("w00000a", max_edits=1)
    leaves = _leaves(q)
    want = _expected_variants(df, n, "w00000a")
    assert len(want) > 1, "fixture must yield multiple variants"
    got = sorted((l.term, l.boost) for l in leaves)
    for (gt, gb), (wt, wb) in zip(got, sorted(want)):
        assert gt == wt
        assert gb == pytest.approx(wb, rel=1e-12)
    # artificial stats on every leaf (newTermQuery:261-277)
    assert all(isinstance(l, StatsTermQuery) and l.df == 1 and l.ttf == 1
               for l in leaves)


def test_exact_hit_uses_source_df(searcher, corpus):
    toks, df = corpus
    n = searcher.doc_count
    qt = "w000001"
    assert df.get(qt, 0) > 0
    q = searcher.fuzzy_like_this(qt, max_edits=1)
    got = {l.term: l.boost for l in _leaves(q)}
    # the exact variant's boost is 1^2 x idf(source df) — bigger edits
    # in the same group share that idf
    idf = math.log((n + 1) / (df[qt] + 1)) + 1.0
    assert got[qt] == pytest.approx(idf, rel=1e-12)
    for v, b in got.items():
        if v != qt:
            ed = osa_distance(qt, v)
            bo = 1.0 - ed / min(len(qt), len(v))
            assert b == pytest.approx(bo * bo * idf, rel=1e-12)


def test_max_num_terms_global_cut(searcher, corpus):
    toks, df = corpus
    n = searcher.doc_count
    full = {l.term for l in _leaves(
        searcher.fuzzy_like_this("w00000a", max_edits=1))}
    assert len(full) > 3
    cut = _leaves(searcher.fuzzy_like_this("w00000a", max_edits=1,
                                           max_num_terms=3))
    assert len(cut) == 3
    # the kept 3 are the globally best by (score desc, src, term)
    want = _expected_variants(df, n, "w00000a")
    want.sort(key=lambda r: (-r[1], r[0]))
    assert sorted(l.term for l in cut) == sorted(v for v, _ in want[:3])


def test_prefix_length_filters_variants(searcher):
    q = searcher.fuzzy_like_this("w00000a", max_edits=1, prefix_length=7)
    # prefix 'w00000a' matches nothing (the term itself is absent)
    assert _leaves(q) == [] or all(
        l.term.startswith("w00000a") for l in _leaves(q))


def test_ignore_tf_constant_scores(searcher, corpus):
    toks, df = corpus
    n = searcher.doc_count
    q = searcher.fuzzy_like_this("w00000a", max_edits=1, ignore_tf=True)
    leaves = _leaves(q)
    assert all(isinstance(l, ConstantScoreQuery) for l in leaves)
    vscore = {l.query.term: l.boost for l in leaves}
    hits = dict(searcher.search(q, k=10 ** 6))
    # doc score = sum of variant scores PRESENT in the doc, tf ignored
    for doc_id, s in list(hits.items())[:25]:
        want = sum(v for t, v in vscore.items() if t in set(toks[doc_id]))
        assert s == pytest.approx(want, rel=1e-5)


def test_artificial_df_ratio(searcher, corpus):
    """StatsTermQuery(df=1) rescales every doc's TermQuery score by
    idf(df=1)/idf(df_real): same tf/norm factor, overridden stats."""
    toks, df = corpus
    n = searcher.doc_count
    t = "w000001"
    base = dict(searcher.search(TermQuery(t), k=10 ** 6))
    art = dict(searcher.search(
        PreAnalyzed(StatsTermQuery(t, df=1, ttf=1)), k=10 ** 6))
    assert set(base) == set(art) and base
    idf_real = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
    idf_one = math.log(1 + (n - 0.5) / 1.5)
    ratio = idf_one / idf_real
    for d in base:
        assert art[d] == pytest.approx(base[d] * ratio, rel=1e-5)


def test_explain_agrees_with_search_on_tree_queries(searcher):
    """Tree-shaped queries (boosted/artificial-stats leaves) explain
    with the engine's exact score, not the flat per-term sum."""
    q = searcher.fuzzy_like_this("w00000a", max_edits=1)
    top = searcher.search(q, k=1)
    assert top
    doc, score = top[0]
    ex = searcher.explain(q, doc)
    assert ex["matches"]
    assert ex["score"] == pytest.approx(score, rel=1e-5)
    assert "method" in ex  # marked as tree-decomposed
