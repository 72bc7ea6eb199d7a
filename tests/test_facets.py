"""Hierarchical taxonomy faceting (facet module analogs:
FastTaxonomyFacetCounts / DrillDownQuery / DrillSideways)."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.ops import facets as FC

ROWS = [
    # doc_id, path (a/b hierarchy), src, lang
    (0, "web/en"), (1, "web/en"), (2, "web/de"),
    (3, "code/py"), (4, "code/py/nb"), (5, "code/js"),
    (6, "web/fr"), (7, "code/py"),
]


@pytest.fixture(scope="module")
def docs(spark):
    d = spark.createDataFrame(
        [(i, p, p.split("/")[0], p.split("/")[1]) for i, p in ROWS],
        "doc_id bigint, path string, src string, lng string")
    return d


@pytest.fixture(scope="module")
def matches(spark):
    # docs 0-6 match; 7 does not
    return spark.createDataFrame([(i,) for i in range(7)],
                                 "doc_id bigint")


def test_taxonomy_counts_all_prefix_levels(docs, matches):
    got = {(r["level"], r["path"]): r["n_docs"]
           for r in FC.taxonomy_counts(matches, docs, "path").collect()}
    assert got[(1, "web")] == 4 and got[(1, "code")] == 3
    assert got[(2, "web/en")] == 2 and got[(2, "code/py")] == 2
    assert got[(3, "code/py/nb")] == 1
    # level cap prunes deeper prefixes
    capped = FC.taxonomy_counts(matches, docs, "path", max_level=2)
    assert max(r["level"] for r in capped.collect()) == 2


def test_drill_down_children(docs, matches):
    got = {r["path"]: r["n_docs"]
           for r in FC.drill_down(matches, docs, "path", "code").collect()}
    # matching docs under code: 3 (code/py), 4 (code/py/nb), 5 (code/js);
    # doc 7 matches the prefix but is not in the match stream. Slicing
    # to depth+1 folds code/py/nb into the code/py child ordinal, as
    # taxonomy child counts do.
    assert got == {"code/py": 2, "code/js": 1}


def test_drill_sideways_own_drill_removed(docs, matches):
    got = {(r["dim"], r["value"]): r["n_docs"]
           for r in FC.drill_sideways(
               matches, docs, dims={"src": "src", "lng": "lng"},
               drills={"src": "web", "lng": "en"}).collect()}
    # src counts: own drill (src=web) removed, lng=en applied
    assert got[("src", "web")] == 2
    assert ("src", "code") not in got  # no code docs with lng=en
    # lng counts: own drill removed, src=web applied
    assert got[("lng", "en")] == 2 and got[("lng", "de")] == 1 \
        and got[("lng", "fr")] == 1
    assert ("lng", "py") not in got


def test_drill_sideways_no_drills_is_plain_counts(docs, matches):
    got = {(r["dim"], r["value"]): r["n_docs"]
           for r in FC.drill_sideways(matches, docs,
                                      dims={"src": "src"},
                                      drills={}).collect()}
    assert got == {("src", "web"): 4, ("src", "code"): 3}


def test_range_counts(spark):
    """LongRangeFacetCounts analog: overlapping ranges, open bounds,
    NULL values count nowhere, output preserves input order."""
    from lucene_spark.ops.facets import range_counts
    docs = spark.createDataFrame(
        [(0, 10), (1, 150), (2, 200), (3, 250), (4, 400),
         (5, 999), (6, None), (7, 200)],
        "doc_id long, n long")
    matches = docs.select("doc_id").filter("doc_id != 5")  # 5 not matched
    got = {r["range_label"]: r["n_docs"] for r in range_counts(
        matches, docs, "n",
        [("lt200", None, True, 200, False),
         ("200to400", 200, True, 400, True),
         ("gt150", 150, False, None, True),
         ("all", None, True, None, True),
         ("exact200", 200, True, 200, True)]).collect()}
    # matched docs with values: 10, 150, 200, 250, 400, 200 (6 is NULL)
    assert got == {"lt200": 2, "200to400": 4, "gt150": 4,
                   "all": 6, "exact200": 2}
    # order preserved
    order = [r["range_label"] for r in range_counts(
        matches, docs, "n",
        [("b", None, True, 200, False), ("a", 200, True, None, True)]
    ).collect()]
    assert order == ["b", "a"]


def test_range_counts_plan_is_pure_catalyst(spark):
    from lucene_spark.ops.facets import range_counts
    docs = spark.createDataFrame([(0, 10)], "doc_id long, n long")
    df = range_counts(docs.select("doc_id"), docs, "n",
                      [("x", None, True, 5, False)])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEval" not in plan


def test_association_sums(spark, docs, matches):
    """TaxonomyFacetIntAssociations SUM: per-category sums of a per-doc
    association value, into every ancestor; NULL associations skipped."""
    w = spark.createDataFrame(
        [(0, 10), (1, 20), (2, 5), (3, 7), (4, 3), (5, None), (6, 2),
         (7, 100)],
        "doc_id bigint, weight int")
    d = docs.join(w, "doc_id")
    got = {(r["level"], r["path"]): (r["n_docs"], r["sum_assoc"])
           for r in FC.association_sums(matches, d, "path",
                                        "weight").collect()}
    # doc 7 (weight 100) does not match; doc 5 has NULL weight and is
    # never visited (the reference's MatchingDocs iteration skips docs
    # without the association field — neither counted nor summed)
    assert got[(1, "web")] == (4, 37)        # 10+20+5+2
    assert got[(1, "code")] == (2, 10)       # 7+3; NULL doc skipped
    assert (2, "code/js") not in got         # only doc 5 carried it
    assert got[(2, "code/py")] == (2, 10)
    assert got[(3, "code/py/nb")] == (1, 3)
    assert got[(2, "web/en")] == (2, 30)


def test_dynamic_range_counts(spark):
    # facetset/DynamicRangeUtil.java shape: equal-weight buckets over
    # the matching values; quantile-rule deviation documented
    from lucene_spark.ops.facets import dynamic_range_counts
    docs = spark.createDataFrame(
        [(i, v) for i, v in enumerate([1, 1, 2, 3, 4, 5, 6, 7, 8, 8,
                                       9, 10, None, 12, 100, 100])],
        "doc_id long, val long")
    m = docs.select("doc_id")
    got = {r.range_idx: r for r in
           dynamic_range_counts(m, docs, "val", n_ranges=3).collect()}
    # 15 non-null values -> ~5 per bucket; ties stay in one bucket
    assert set(got) == {0, 1, 2}
    assert sum(r.n_docs for r in got.values()) == 15
    assert got[0].lo == 1 and got[2].hi == 100
    # buckets are contiguous and ordered
    assert got[0].hi <= got[1].lo and got[1].hi <= got[2].lo
    # weights balanced within one value-group of the target
    assert all(3 <= r.n_docs <= 7 for r in got.values())
    # empty match stream -> zero rows (reference returns no ranges)
    empty = dynamic_range_counts(docs.limit(0), docs, "val", 3)
    assert empty.count() == 0


def test_sampled_counts_brute_and_properties(spark):
    """RandomSamplingFacetsCollector analog: the sample is the exact
    md5-threshold subset (deterministic, partition-independent), the
    amortized count is integer (n*total) div sample_size capped at the
    value's true corpus count, and an unsampled stream (total <=
    sample_size) passes counts through unchanged."""
    import hashlib
    n = 400
    docs = spark.createDataFrame(
        [(i, f"v{i % 5}") for i in range(n)], "doc_id bigint, dim string")
    matches = spark.createDataFrame(
        [(i,) for i in range(0, n, 2)], "doc_id bigint")  # 200 hits
    got = {r["value"]: (r["n_sampled"], r["n_amortized"])
           for r in FC.sampled_counts(matches, docs, "dim",
                                      sample_size=50, seed=9).collect()}
    # brute replication
    rate = 50 / 200
    thr = format(int(rate * 16 ** 8), "08x")
    samp = [i for i in range(0, n, 2)
            if hashlib.md5(f"9:{i}".encode()).hexdigest()[:8] < thr]
    want: dict = {}
    cap: dict = {}
    for i in range(n):
        cap[f"v{i % 5}"] = cap.get(f"v{i % 5}", 0) + 1
    for i in samp:
        want[f"v{i % 5}"] = want.get(f"v{i % 5}", 0) + 1
    assert got == {v: (c, min(c * 200 // 50, cap[v]))
                   for v, c in want.items()}
    # no-sampling fast path: counts pass through
    small = spark.createDataFrame([(i,) for i in range(0, 40, 2)],
                                  "doc_id bigint")
    exact = {r["value"]: (r["n_sampled"], r["n_amortized"])
             for r in FC.sampled_counts(small, docs, "dim",
                                        sample_size=50, seed=9).collect()}
    assert all(ns == na for ns, na in exact.values())
    assert sum(ns for ns, _ in exact.values()) == 20


def test_sampled_counts_null_dim_consistent_across_threshold(spark):
    """NULL dimension values count nowhere in BOTH the pass-through
    and the sampled path (previously the threshold flipped the
    result's group set)."""
    from lucene_spark.ops.facets import sampled_counts
    rows = [(i, "a" if i % 3 == 0 else (None if i % 3 == 1 else "b"))
            for i in range(90)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    matches = docs.select("doc_id")
    small = {r["value"] for r in
             sampled_counts(matches, docs, "lang", sample_size=1000)
             .collect()}
    sampled = {r["value"] for r in
               sampled_counts(matches, docs, "lang", sample_size=30)
               .collect()}
    assert None not in small and None not in sampled
    assert small == {"a", "b"}
