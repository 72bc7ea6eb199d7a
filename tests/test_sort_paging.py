"""Field-sort searchAfter paging (TopFieldCollector.create(sort, n,
after), core:search/TopFieldCollector.java) + suggest kinds."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.fixtures.transcripts import term_string
from lucene_spark.index.catalog import IndexCatalog, read_table
from lucene_spark.search import IndexSearcher
from lucene_spark.search.query import OrQuery, TermQuery

T = [term_string(k) for k in range(30)]


@pytest.fixture(scope="module")
def searcher(spark, small_index):
    return IndexSearcher(spark, small_index)


def _pages(s, q, by, page_k, n_pages, desc=True):
    pages, after = [], None
    for _ in range(n_pages):
        rows = s.sort_search_df(q, by, k=page_k, desc=desc,
                                after=after).collect()
        if not rows:
            break
        pages.append(rows)
        last = rows[-1]
        after = (last[by], last["doc_id"])
    return pages


@pytest.mark.parametrize("desc", [True, False])
def test_pages_tile_the_full_sort(spark, searcher, desc):
    """Pages must be a disjoint, gap-free tiling of the full sorted
    match list (no-overlap / no-gap property)."""
    q = OrQuery((T[2], T[5]))
    by = "token_count"
    full = searcher.sort_search_df(q, by, k=28, desc=desc).collect()
    assert len(full) == 28
    pages = _pages(searcher, q, by, page_k=7, n_pages=4, desc=desc)
    tiled = [r for p in pages for r in p]
    assert [(r["doc_id"], r[by]) for r in tiled] \
        == [(r["doc_id"], r[by]) for r in full]


def test_sort_matches_metadata_join(spark, searcher, small_index):
    """Top page equals a plain Catalyst sort over matches + docstore."""
    q = TermQuery(T[2])
    got = searcher.sort_search_df(q, "token_count", k=10).collect()
    cat = IndexCatalog(small_index)
    ds = read_table(spark, cat.table_locations("docstore"))
    want = (searcher.matches_df(q).select("doc_id")
            .join(ds.select("doc_id", "token_count"), "doc_id")
            .orderBy(F.col("token_count").desc(), "doc_id")
            .limit(10).collect())
    assert [(r["doc_id"], r["token_count"]) for r in got] \
        == [(r["doc_id"], r["token_count"]) for r in want]


def test_suggest_kinds(spark, searcher):
    pre = searcher.suggest(T[2][:3], "prefix", n=5).collect()
    assert pre and all(r["term"].startswith(T[2][:3]) for r in pre)
    inf = searcher.suggest(T[2][2:5], "infix", n=5).collect()
    assert inf and all(T[2][2:5] in r["term"] for r in inf)
    # weights descend
    ws = [r["weight"] for r in inf]
    assert ws == sorted(ws, reverse=True)
    fz = searcher.suggest(T[2][:-1] + "x", "fuzzy", n=5,
                          max_edits=2).collect()
    assert T[2] in {r["term"] for r in fz}
    with pytest.raises(ValueError):
        searcher.suggest("x", "soundex")
