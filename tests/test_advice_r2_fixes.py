"""Regression tests for the round-2 advisor findings (ADVICE.md):

1. On-disk format version: a searcher / NRT writer opened against an
   index whose manifest lacks the current format stamp raises loudly
   instead of silently matching zero postings.
2. parse_query keeps boosts on phrases and ranges (no phantom
   empty-term clause) and rejects stray-boost empty atoms.
3. search_after_df / count_df work for MatchAllQuery/FieldExistsQuery
   (deep paging over match-all is a common export/scroll pattern).
4. vacuum() grace period is covered in test_search_after.py.
"""

import json
import os

import pytest

from lucene_spark.fixtures.transcripts import term_string
from lucene_spark.index.catalog import IndexCatalog
from lucene_spark.search import IndexSearcher
from lucene_spark.search.query import (FieldExistsQuery, MatchAllQuery,
                                       MultiTermQuery, PhraseQuery,
                                       parse_query)

T = [term_string(k) for k in range(30)]


# ---- 1. format-version guard ------------------------------------------

def test_unstamped_index_raises(spark, small_index, tmp_path_factory):
    import shutil
    legacy = str(tmp_path_factory.mktemp("legacy") / "idx")
    shutil.copytree(small_index, legacy)
    cat = IndexCatalog(legacy)
    files = cat._commit_files()
    # strip the format stamp from every commit manifest (simulates an
    # index built before the 'h'-prefix term_h change)
    for _, fp in files:
        with open(fp) as fh:
            c = json.load(fh)
        c.get("extra", {}).pop("format", None)
        with open(fp, "w") as fh:
            json.dump(c, fh)
    with pytest.raises(ValueError, match="format"):
        IndexSearcher(spark, legacy)
    from lucene_spark.streaming import NRTIndexWriter
    with pytest.raises(ValueError, match="format"):
        NRTIndexWriter(spark, legacy)._state()


def test_fresh_index_is_stamped(small_index):
    c = IndexCatalog(small_index).latest_commit()
    from lucene_spark.index.catalog import INDEX_FORMAT_VERSION
    assert int(c["extra"]["format"]) == INDEX_FORMAT_VERSION


# ---- 2. parser boosts on phrases / ranges -----------------------------

def test_phrase_boost_parses():
    q = parse_query('"slow fast"^2 batch')
    # boosted phrase SHOULD + term SHOULD — no phantom empty-term clause
    assert len(q.should) == 2 and not q.must and not q.must_not
    ph = [c for c in q.should if isinstance(c, PhraseQuery)]
    assert len(ph) == 1 and ph[0].boost == 2.0
    assert ph[0].terms == ["slow", "fast"]
    assert "batch" in q.should


def test_sloppy_phrase_boost_parses():
    q = parse_query('"slow fast"~3^2.5')
    assert isinstance(q, PhraseQuery)
    assert q.slop == 3 and q.boost == 2.5


def test_range_boost_parses():
    q = parse_query('f:[aa TO bb]^3 other')
    mt = [c for c in q.should if isinstance(c, MultiTermQuery)]
    assert len(mt) == 1
    assert mt[0].kind == "range" and mt[0].boost == 3.0
    assert mt[0].field == "f"


def test_stray_boost_rejected():
    with pytest.raises(ValueError, match="empty term"):
        parse_query("batch ^2")
    with pytest.raises(ValueError, match="empty phrase"):
        parse_query('""')


# ---- 3. searchAfter / count over MatchAll & FieldExists ----------------

def test_search_after_match_all(spark, small_index):
    s = IndexSearcher(spark, small_index)
    q = MatchAllQuery()
    page1 = s.search(q, k=7)
    assert len(page1) == 7
    page2 = s.search_after(q, page1[-1], k=7)
    assert len(page2) == 7
    # constant score => pages are doc_id-ordered and disjoint
    assert {d for d, _ in page1}.isdisjoint({d for d, _ in page2})
    assert max(d for d, _ in page1) < min(d for d, _ in page2)
    # stitched pages == one k=14 search
    assert page1 + page2 == s.search(q, k=14)


def test_search_after_field_exists(spark, small_index):
    s = IndexSearcher(spark, small_index)
    q = FieldExistsQuery("tool")
    page1 = s.search(q, k=5)
    page2 = s.search_after(q, page1[-1], k=5)
    assert page1 + page2 == s.search(q, k=10)


def test_count_df_match_all(spark, small_index):
    s = IndexSearcher(spark, small_index)
    n = s.count_df(MatchAllQuery()).collect()[0]["n"]
    assert n == s.doc_count
    nf = s.count_df(FieldExistsQuery("tool")).collect()[0]["n"]
    docstore = spark.read.parquet(
        IndexCatalog(small_index).table_path("docstore"))
    assert nf == docstore.filter("tool IS NOT NULL").count()


# ---- executor-side multi-term expansion (round-2 verdict #3) ----------

def test_fuzzy_regexp_wildcard_expand_executor_side(spark, small_index):
    """Scan-kind expansions must not depend on the driver term cache —
    they run as pushed-down executor predicates, so fuzzy latency
    cannot scale with |dictionary| on the driver."""
    s = IndexSearcher(spark, small_index)
    base = T[5]
    fuzzy = MultiTermQuery("fuzzy", base[:-1] + "x", max_edits=1)
    wild = MultiTermQuery("wildcard", base[:3] + "*")
    rex = MultiTermQuery("regexp", base[:3] + ".*")
    warm = {k: s.expand_terms(q)
            for k, q in (("f", fuzzy), ("w", wild), ("r", rex))}
    assert warm["f"] and warm["w"] and warm["r"]
    # poison the driver cache: an executor-side path is unaffected,
    # the old driver-loop path would return []
    s._ts_cache = {}
    s._sorted_terms = {}
    cold = {k: s.expand_terms(q)
            for k, q in (("f", fuzzy), ("w", wild), ("r", rex))}
    assert cold == warm


def test_prefix_range_use_bisect_seek(spark, small_index):
    s = IndexSearcher(spark, small_index)
    pre = s.expand_terms(MultiTermQuery("prefix", T[5][:4]))
    rng = s.expand_terms(MultiTermQuery("range", (T[2], T[9])))
    # dict-seek results == pushed-down scan results
    s._ts_cache = None  # force the Spark path
    assert s.expand_terms(MultiTermQuery("prefix", T[5][:4])) == pre
    assert s.expand_terms(MultiTermQuery("range", (T[2], T[9]))) == rng
    assert pre and rng
