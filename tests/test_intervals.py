"""Unordered interval matching vs a brute-force minimal-window oracle."""

import itertools

import numpy as np
import pytest

from lucene_spark.index.catalog import IndexCatalog
from lucene_spark.search import IndexSearcher
from lucene_spark.search.oracle import BruteForceOracle


@pytest.fixture(scope="module")
def searcher(spark, small_index):
    return IndexSearcher(spark, small_index)


@pytest.fixture(scope="module")
def oracle(spark, small_index):
    cat = IndexCatalog(small_index)
    pdf = (spark.read.parquet(cat.table_path("docstore"))
           .select("doc_id", "text").orderBy("doc_id").toPandas())
    return BruteForceOracle(pdf)


def _brute_min_span(tokens, terms):
    pls = [[i for i, t in enumerate(tokens) if t == term] for term in terms]
    if any(not p for p in pls):
        return None
    best = None
    for combo in itertools.product(*pls):
        s = max(combo) - min(combo) - (len(terms) - 1)
        best = s if best is None else min(best, s)
    return best


@pytest.mark.parametrize("gaps", [0, 2, 5])
def test_interval_matches_vs_brute(searcher, oracle, gaps):
    toks = oracle.tokens[0]
    terms = [toks[0], toks[3], toks[6]]
    if len(set(terms)) < 3:
        terms = list(dict.fromkeys(toks))[:3]
    got = {int(r["doc_id"]): int(r["span"]) for r in
           searcher.interval_matches(terms, max_gaps=gaps).collect()}
    want = {}
    for d, tk in zip(oracle.doc_ids, oracle.tokens):
        s = _brute_min_span(tk, terms)
        if s is not None and s <= gaps:
            want[int(d)] = s
    assert got == want, f"gaps={gaps}"
