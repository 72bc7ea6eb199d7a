"""Vectorized percolator verification (verdict r04 "what's wrong #2").

_verify_batch factorizes each Arrow batch's tokens once and evaluates
query trees as numpy masks (MTQs over the batch vocabulary); these
tests pin it to the scalar doc_match tree walk across the full query
shape zoo on randomized documents, and check the Spark-level
percolate_registered output is unchanged.
"""

import random

import numpy as np
import pandas as pd
import pytest

from lucene_spark.ops.percolate import _verify_batch, doc_match
from lucene_spark.search.query import (AndQuery, BooleanQuery,
                                       ConstantScoreQuery, DisMaxQuery,
                                       MatchAllQuery, MultiTermQuery,
                                       OrQuery, PhraseQuery, SynonymQuery,
                                       TermQuery)

VOCAB = ["scan", "sort", "merge", "join", "batch", "stream", "window",
         "fast", "slow", "dup", "vector", "query"]


def _docs(seed, n=60):
    rng = random.Random(seed)
    return [[rng.choice(VOCAB) for _ in range(rng.randint(0, 12))]
            for _ in range(n)]


ZOO = [
    ("t0", TermQuery("scan")),
    ("t1", "merge"),
    ("a0", AndQuery(("scan", "sort"))),
    ("o0", OrQuery(("dup", "vector"))),
    ("sy", SynonymQuery(("fast", "slow"))),
    ("p0", PhraseQuery(("slow", "fast"))),
    ("p1", PhraseQuery(("scan", "sort", "merge"))),
    ("ps", PhraseQuery(("scan", "merge"), slop=2)),
    ("dm", DisMaxQuery((TermQuery("join"), PhraseQuery(("fast", "slow"))))),
    ("cs", ConstantScoreQuery(OrQuery(("batch",)))),
    ("ma", MatchAllQuery()),
    ("mp", MultiTermQuery("prefix", "s")),
    ("mw", MultiTermQuery("wildcard", "*oin")),
    ("mr", MultiTermQuery("regexp", "s(can|ort)")),
    ("mf", MultiTermQuery("fuzzy", "jion", max_edits=1)),
    ("mg", MultiTermQuery("range", ("query", "sort"))),
    ("ms", MultiTermQuery("set", ("dup", "window"))),
    ("b0", BooleanQuery(must=(TermQuery("scan"),),
                        should=(TermQuery("sort"), TermQuery("merge")),
                        min_should_match=1)),
    ("b1", BooleanQuery(must=(PhraseQuery(("slow", "fast")),),
                        must_not=(TermQuery("dup"),))),
    ("b2", BooleanQuery(must=(TermQuery("scan"),), min_should_match=2)),
    ("b3", BooleanQuery(should=(TermQuery("join"),
                                MultiTermQuery("prefix", "w")),
                        min_should_match=2)),
    ("bn", BooleanQuery(must=(BooleanQuery(should=(TermQuery("scan"),
                                                   TermQuery("join")),
                                           min_should_match=1),),
                        filter_=(TermQuery("batch"),))),
]


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_verify_batch_equals_scalar_tree_walk(seed):
    docs = _docs(seed)
    reg = dict(ZOO)
    # every query is a candidate for every doc: the vector path must
    # reproduce doc_match exactly, with no presearcher help
    pdf = pd.DataFrame({
        "doc_id": np.arange(len(docs), dtype=np.int64),
        "qids": [list(reg) for _ in docs],
        "toks": docs,
    })
    out = _verify_batch(pdf, reg)
    got = {(q, int(d)) for q, d in zip(out["query_id"], out["doc_id"])}
    want = {(qid, i) for qid, q in ZOO for i, tk in enumerate(docs)
            if doc_match(q, tk, set(tk))}
    assert got == want


def test_verify_batch_empty_and_all_empty_docs():
    reg = {"t": TermQuery("scan"), "m": MatchAllQuery()}
    pdf = pd.DataFrame({"doc_id": np.array([7, 8], dtype=np.int64),
                        "qids": [["t", "m"], ["m"]],
                        "toks": [[], []]})
    out = _verify_batch(pdf, reg)
    got = {(q, int(d)) for q, d in zip(out["query_id"], out["doc_id"])}
    assert got == {("m", 7), ("m", 8)}


def test_percolate_registered_end_to_end_unchanged(spark):
    from lucene_spark.ops.percolate import percolate_registered
    docs = _docs(99, n=40)
    sdf = spark.createDataFrame(
        [(i, " ".join(tk)) for i, tk in enumerate(docs)],
        "doc_id long, text string")
    registered = ZOO
    out = percolate_registered(sdf, registered)
    got = {(r["query_id"], r["doc_id"]) for r in out.collect()}
    want = {(qid, i) for qid, q in registered for i, tk in enumerate(docs)
            if doc_match(q, tk, set(tk))}
    assert got == want
