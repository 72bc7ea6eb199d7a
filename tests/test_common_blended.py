"""CommonTermsQuery + BlendedTermQuery.

Reference parity:
- CommonTermsQuery (queries/src/java/org/apache/lucene/queries/
  CommonTermsQuery.java; test model queries/src/test/.../
  CommonTermsQueryTest.java): search-time df classification against
  ceil(maxTermFrequency * maxDoc), low-freq terms required / high-freq
  optional, all-high degrades to a conjunction, single term -> plain
  TermQuery, absent terms classify low.
- BlendedTermQuery (core:search/BlendedTermQuery.java; test model
  core/src/test/org/apache/lucene/search/TestBlendedTermQuery.java):
  artificial stats df = max, ttf = sum bound into every leaf, combined
  via DisjunctionMax(tie=0.01) or all-SHOULD boolean.

Strategy: the engine's rewrite is checked for EQUALITY against the
hand-built Lucene rewrite result run through the independent
BruteForceOracle, plus brute per-doc recomputation of the blended
scores with the artificial df.
"""

import math

import numpy as np
import pytest

from lucene_spark.fixtures.transcripts import transcripts_df
from lucene_spark.index import build_index
from lucene_spark.index.catalog import IndexCatalog
from lucene_spark.kernels.bm25 import BM25Scorer
from lucene_spark.search import IndexSearcher
from lucene_spark.search.oracle import BruteForceOracle
from lucene_spark.search.query import (BlendedTermQuery, BooleanQuery,
                                       CommonTermsQuery, TermQuery,
                                       from_dict)


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ctq") / "idx")
    src = transcripts_df(spark, n_convs=60, seed=11, partitions=4)
    build_index(spark, src, out, num_buckets=4,
                keyword_fields=("role", "tool"))
    return out


@pytest.fixture(scope="module")
def searcher(spark, idx):
    return IndexSearcher(spark, idx)


@pytest.fixture(scope="module")
def oracle(spark, idx):
    cat = IndexCatalog(idx)
    pdf = (spark.read.parquet(cat.table_path("docstore"))
           .select("doc_id", "text").orderBy("doc_id").toPandas())
    return BruteForceOracle(pdf)


def _split_terms(oracle, n_common=2, n_rare=2):
    """Pick the corpus' most/least frequent terms plus a threshold
    that separates them the way the reference classifier would."""
    by_df = sorted(oracle.df.items(), key=lambda kv: (-kv[1], kv[0]))
    common = [t for t, _ in by_df[:n_common]]
    rare = [t for t, _ in by_df[-n_rare:]]
    df_hi = min(oracle.df[t] for t in common)
    df_lo = max(oracle.df[t] for t in rare)
    assert df_lo < df_hi, "fixture corpus lacks a df gap"
    # fractional threshold: hi iff df > ceil(f * maxDoc)
    f = (df_lo + (df_hi - df_lo) / 2.0) / oracle.doc_count
    assert df_hi > math.ceil(f * oracle.doc_count) >= df_lo
    return common, rare, f


def _as_rows(df):
    return [(int(r["doc_id"]), float(r["score"]))
            for r in df.orderBy("doc_id").collect()]


# ---------------------------------------------------------------------------
# CommonTermsQuery
# ---------------------------------------------------------------------------

def test_common_terms_split_matches_reference_rewrite(searcher, oracle):
    common, rare, f = _split_terms(oracle)
    q = CommonTermsQuery(tuple(common + rare), max_term_frequency=f)
    # the reference rewrite at these stats: MUST(should-bool over rare)
    # SHOULD(should-bool over common)
    expected = BooleanQuery(
        must=(BooleanQuery(should=tuple(rare)),),
        should=(BooleanQuery(should=tuple(common)),))
    got = _as_rows(searcher.matches_df(q))
    want = _as_rows(searcher.matches_df(expected))
    assert got == want and got
    # independent oracle on the rewritten tree
    ids, sc = oracle.eval_query(expected)
    by_id = dict(zip(ids.tolist(), sc.tolist()))
    assert len(got) == len(by_id)
    for d, s in got:
        assert s == pytest.approx(by_id[d], rel=1e-6)


def test_common_terms_all_high_degrades_to_conjunction(searcher, oracle):
    common, _rare, f = _split_terms(oracle)
    q = CommonTermsQuery(tuple(common), max_term_frequency=f)
    # lowFreq empty + msm 0 + occur SHOULD -> high group becomes MUST
    expected = BooleanQuery(must=tuple(common))
    assert _as_rows(searcher.matches_df(q)) == \
        _as_rows(searcher.matches_df(expected))
    # every returned doc holds all common terms
    rows = _as_rows(searcher.matches_df(q))
    assert rows
    id_to_toks = dict(zip(oracle.doc_ids.tolist(), oracle.tokens))
    for d, _s in rows:
        assert all(t in id_to_toks[d] for t in common)


def test_common_terms_absolute_threshold_and_absent_terms(searcher, oracle):
    common, rare, _f = _split_terms(oracle)
    df_lo = max(oracle.df[t] for t in rare)
    # absolute form: maxTermFrequency >= 1 compares df directly
    q = CommonTermsQuery(tuple(common + rare) + ("zzzmissingzzz",),
                         max_term_frequency=float(df_lo))
    expected = BooleanQuery(
        must=(BooleanQuery(should=tuple(rare) + ("zzzmissingzzz",)),),
        should=(BooleanQuery(should=tuple(common)),))
    assert _as_rows(searcher.matches_df(q)) == \
        _as_rows(searcher.matches_df(expected))


def test_common_terms_msm_and_occur(searcher, oracle):
    common, rare, f = _split_terms(oracle, n_common=3, n_rare=3)
    # fractional msm: round(0.5 * 3) = 2 of the three rare SHOULDs
    q = CommonTermsQuery(tuple(common + rare), max_term_frequency=f,
                         low_freq_msm=0.5)
    expected = BooleanQuery(
        must=(BooleanQuery(should=tuple(rare), min_should_match=2),),
        should=(BooleanQuery(should=tuple(common)),))
    assert _as_rows(searcher.matches_df(q)) == \
        _as_rows(searcher.matches_df(expected))
    # low_freq_occur MUST: every rare term required
    q2 = CommonTermsQuery(tuple(common + rare), max_term_frequency=f,
                          low_freq_occur="must")
    expected2 = BooleanQuery(
        must=(BooleanQuery(must=tuple(rare)),),
        should=(BooleanQuery(should=tuple(common)),))
    assert _as_rows(searcher.matches_df(q2)) == \
        _as_rows(searcher.matches_df(expected2))


def test_common_terms_single_term_and_validation(searcher):
    got = _as_rows(searcher.matches_df(
        CommonTermsQuery(("term03",), max_term_frequency=0.5)))
    want = _as_rows(searcher.matches_df(TermQuery("term03")))
    assert got == want
    with pytest.raises(ValueError):
        CommonTermsQuery(("a",), low_freq_occur="must_not")
    from_q = from_dict({"type": "common_terms", "terms": ["a", "b"],
                        "max_term_frequency": 0.3})
    assert isinstance(from_q, CommonTermsQuery)
    assert from_q.max_term_frequency == 0.3


# ---------------------------------------------------------------------------
# BlendedTermQuery
# ---------------------------------------------------------------------------

def _brute_blended(oracle, pairs, tie, rewrite="dismax", boost=1.0):
    """Per-doc recomputation with the ARTIFICIAL blended stats
    (BlendedTermQuery.java:271-301): df = max, ttf = sum; leaf float32
    scores combined exactly like the engine's dismax/bool kernels."""
    df = max(oracle.df[t] for _f, t, _b in pairs)
    smat = np.zeros((len(pairs), oracle.doc_count), dtype=np.float32)
    for i, (_f, t, b) in enumerate(pairs):
        sc = BM25Scorer(df, oracle.doc_count, oracle.sum_ttf,
                        boost=boost * b)
        tf = np.array([c.get(t, 0) for c in oracle.tfs], dtype=np.int64)
        s = sc.score(tf, oracle.norms)
        s[tf == 0] = 0.0
        smat[i] = s
    matched = (smat > 0).any(axis=0)
    if rewrite == "boolean":
        scores = smat.astype(np.float64).sum(axis=0).astype(np.float32)
    else:
        mx = smat.max(axis=0)
        total = smat.astype(np.float64).sum(axis=0)
        scores = (mx.astype(np.float64)
                  + np.float64(tie) * (total - mx.astype(np.float64))
                  ).astype(np.float32)
    ids = oracle.doc_ids[matched]
    return dict(zip(ids.tolist(), scores[matched].tolist()))


def test_blended_dismax_uses_artificial_df(searcher, oracle):
    common, rare, _f = _split_terms(oracle)
    pairs = (("text", rare[0], 1.0), ("text", common[0], 1.0))
    q = BlendedTermQuery(pairs)  # default dismax, tie 0.01
    got = _as_rows(searcher.matches_df(q))
    want = _brute_blended(oracle, pairs, 0.01)
    assert got and len(got) == len(want)
    for d, s in got:
        assert s == pytest.approx(want[d], rel=1e-6), d
    # the blend is OBSERVABLE: blending drags the rare leaf's idf down
    # to the common term's df while leaving the common leaf unchanged,
    # so total blended mass is strictly below the unblended dismax
    unblended = dict(_as_rows(searcher.matches_df(from_dict(
        {"type": "dismax", "terms": [rare[0], common[0]],
         "tie_breaker": 0.01}))))
    assert set(unblended) == {d for d, _ in got}
    assert sum(unblended.values()) > sum(s for _, s in got)


def test_blended_boolean_rewrite_and_boosts(searcher, oracle):
    common, rare, _f = _split_terms(oracle)
    pairs = (("text", rare[0], 2.0), ("text", common[0], 1.0))
    q = BlendedTermQuery(pairs, rewrite="boolean")
    got = _as_rows(searcher.matches_df(q))
    want = _brute_blended(oracle, pairs, 0.0, rewrite="boolean")
    assert got and len(got) == len(want)
    for d, s in got:
        assert s == pytest.approx(want[d], rel=1e-6), d


def test_blended_cross_field_and_absent(searcher, oracle):
    # role is a keyword field: df(role term) is large, so blending
    # drags the text term's idf down to the role term's scale
    pairs = (("text", "term03", 1.0), ("role", "user", 1.0))
    got = _as_rows(searcher.matches_df(BlendedTermQuery(pairs)))
    assert got
    role_df = searcher.term_stats(["user"], "role")["user"][0]
    text_df = oracle.df["term03"]
    assert role_df > text_df  # the blend direction is meaningful
    # absent term contributes nothing but doesn't kill the query
    pairs2 = (("text", "term03", 1.0), ("text", "zzzmissingzzz", 1.0))
    got2 = dict(_as_rows(searcher.matches_df(BlendedTermQuery(pairs2))))
    solo = dict(_as_rows(searcher.matches_df(TermQuery("term03"))))
    assert set(got2) == set(solo)
    # all-absent -> no matches
    assert not _as_rows(searcher.matches_df(
        BlendedTermQuery((("text", "zzzmissingzzz", 1.0),))))
    with pytest.raises(ValueError):
        BlendedTermQuery((("text", "a", 1.0),), rewrite="nope")


def test_blended_and_common_in_topk_and_nested(searcher, oracle):
    """search_df (pruned top-k path) agrees with the exhaustive
    matches_df ranking, and both types nest inside BooleanQuery."""
    common, rare, f = _split_terms(oracle)
    for q in (CommonTermsQuery(tuple(common + rare), max_term_frequency=f),
              BlendedTermQuery((("text", rare[0], 1.0),
                                ("text", common[0], 1.0)))):
        top = [(int(r["doc_id"]), float(r["score"]))
               for r in searcher.search_df(q, k=5).collect()]
        allm = sorted(((int(r["doc_id"]), float(r["score"]))
                       for r in searcher.matches_df(q).collect()),
                      key=lambda t: (-t[1], t[0]))
        assert top == allm[:5]
        nested = BooleanQuery(must=(q,),
                              must_not=(TermQuery(rare[-1]),))
        rows = searcher.matches_df(nested).collect()
        id_to_toks = dict(zip(oracle.doc_ids.tolist(), oracle.tokens))
        for r in rows:
            assert rare[-1] not in id_to_toks[int(r["doc_id"])]
