"""Duplicate clustering: distributed connected components over
near-dup pairs (training-pipeline canonicalization step)."""

import random

import pytest
from pyspark.sql import functions as F

from lucene_spark.ops.dedup import (duplicate_clusters, jaccard_pairs,
                                    keep_canonical)


def _uf_components(edges, nodes):
    """Independent check: plain union-find on the driver."""
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def _clusters_of(labels):
    out = {}
    for n, c in labels.items():
        out.setdefault(c, set()).add(n)
    return set(frozenset(v) for v in out.values())


@pytest.mark.parametrize("shape", ["random", "chain", "stars"])
def test_components_match_union_find(spark, shape):
    rng = random.Random(99)
    if shape == "random":
        nodes = list(range(500))
        edges = [(rng.randrange(500), rng.randrange(500))
                 for _ in range(300)]
        edges = [(a, b) for a, b in edges if a != b]
    elif shape == "chain":
        # a 300-link chain: the worst case for naive propagation —
        # pointer jumping must close it within max_iter=12 rounds
        nodes = list(range(300))
        edges = [(i, i + 1) for i in range(299)]
    else:
        nodes = list(range(400))
        edges = [(h, h + i) for h in (0, 100, 200, 300)
                 for i in range(1, 100)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["doc_id"]: r["cluster"]
           for r in duplicate_clusters(
               df, max_iter=12 if shape == "chain" else 25).collect()}
    touched = sorted({x for e in edges for x in e})
    want = _uf_components(edges, touched)
    # same partition into clusters AND the canonical min label
    assert _clusters_of(got) == _clusters_of(
        {n: want[n] for n in touched})
    assert got == {n: want[n] for n in touched}


def test_keep_canonical_closes_chains(spark):
    # a ~ b, b ~ c: pairwise min-keep would retain a AND c; clustering
    # keeps only a
    docs = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "x"), (9, "solo")],
        "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    cl = duplicate_clusters(pairs)
    kept = {r["doc_id"]
            for r in keep_canonical(docs, cl).collect()}
    assert kept == {1, 9}


def test_clusters_over_real_jaccard_pairs(spark):
    """End-to-end over text: near-dup texts chain into one cluster."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, base) for i in range(3)]
    rows += [(10, base + " extra"), (20, "completely different words "
                                         "about spark query engines")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = jaccard_pairs(df, threshold=0.5)
    got = {r["doc_id"]: r["cluster"]
           for r in duplicate_clusters(pairs).collect()}
    assert got[0] == got[1] == got[2] == 0
    assert 20 not in got  # unpaired doc stays out (implicit singleton)
