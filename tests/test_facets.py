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
