"""BooleanPerceptronClassifier (classification/.../
BooleanPerceptronClassifier.java): sequential-training parity at
n_parts=1 against an independent pure-Python reference, assignClass
semantics, and the iterative-parameter-mixing distribution."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.index.catalog import IndexCatalog
from lucene_spark.kernels.tokenizer import tokenize_one
from lucene_spark.ops.perceptron import (perceptron_assign,
                                         train_boolean_perceptron)
from lucene_spark.search import IndexSearcher


@pytest.fixture(scope="module")
def searcher(spark, small_index):
    return IndexSearcher(spark, small_index)


@pytest.fixture(scope="module")
def corpus(spark, small_index):
    cat = IndexCatalog(small_index)
    pdf = (spark.read.parquet(cat.table_path("docstore"))
           .select("doc_id", "text", "role").orderBy("doc_id")
           .toPandas())
    docs = [(int(r.doc_id), tokenize_one(r.text or ""), r.role)
            for r in pdf.itertuples(index=False)]
    return docs


def _brute_train(docs, positive, bias, parts=1, epochs=1):
    """Pure-Python reference: per-shard sequential perceptron from the
    shared start, shard deltas averaged (== the single stream at
    parts=1)."""
    from collections import Counter
    ttf = Counter()
    for _, toks, _ in docs:
        ttf.update(toks)
    vocab = sorted(ttf)
    w = np.array([ttf[t] for t in vocab], dtype=np.float64)
    vidx = {t: i for i, t in enumerate(vocab)}
    for _ in range(epochs):
        start = w.copy()
        deltas = []
        for p in range(parts):
            wv = start.copy()
            for d, toks, cls in docs:
                if d % parts != p or cls is None:
                    continue
                idx = [vidx[t] for t in toks if t in vidx]
                if not idx:
                    continue
                ui, tf = np.unique(idx, return_counts=True)
                out = float(wv[ui] @ tf)
                correct = cls == positive
                if (out >= bias) != correct:
                    mod = 1 if correct else -1
                    wv[ui] = np.maximum(0, wv[ui] + mod * tf)
            deltas.append(wv - start)
        w = np.maximum(0.0, start + np.mean(deltas, axis=0))
    return dict(zip(vocab, w))


def _bias(docs):
    n_tok = sum(len(t) for _, t, _ in docs)
    return n_tok / len(docs)


def test_sequential_parity(searcher, corpus):
    w, b = train_boolean_perceptron(searcher, "role = 'user'",
                                    n_parts=1, epochs=1)
    assert b == pytest.approx(_bias(corpus), rel=1e-9)
    want = _brute_train(corpus, "user", b, parts=1)
    got = {r["term"]: r["weight"] for r in w.collect()}
    assert got.keys() == want.keys()
    for t in want:
        assert got[t] == pytest.approx(want[t], abs=1e-9), t
        assert got[t] == int(got[t])  # integer weights at n_parts=1
        assert got[t] >= 0            # clamp


def test_parameter_mixing_matches_brute_and_is_deterministic(
        searcher, corpus):
    w1, b = train_boolean_perceptron(searcher, "role = 'user'",
                                     n_parts=4, epochs=2)
    w2, _ = train_boolean_perceptron(searcher, "role = 'user'",
                                     n_parts=4, epochs=2)
    g1 = {r["term"]: r["weight"] for r in w1.collect()}
    g2 = {r["term"]: r["weight"] for r in w2.collect()}
    assert g1 == g2
    want = _brute_train(corpus, "user", b, parts=4, epochs=2)
    for t in want:
        assert g1[t] == pytest.approx(want[t], abs=1e-6), t


def test_assign_semantics(spark, searcher, corpus):
    w, b = train_boolean_perceptron(searcher, "role = 'user'",
                                    n_parts=1, epochs=1)
    wmap = {r["term"]: r["weight"] for r in w.collect()}
    texts = [(i, " ".join(toks[:8]))
             for i, (_, toks, _) in enumerate(corpus[:6])]
    tdf = spark.createDataFrame(texts, "id long, text string")
    out = {int(r["id"]): r for r in
           perceptron_assign(tdf, w, b).collect()}
    for i, text in texts:
        o = sum(wmap.get(t, 0.0) for t in tokenize_one(text))
        assert out[i]["output"] == pytest.approx(o, rel=1e-9)
        assert out[i]["assigned"] == (o >= b)
        assert out[i]["score"] == pytest.approx(
            1 - math.exp(-abs(b - o) / b), rel=1e-9)


def test_unknown_terms_score_zero(spark, searcher):
    w, b = train_boolean_perceptron(searcher, "role = 'user'")
    tdf = spark.createDataFrame([(0, "zzz qqq www")], "id long, text string")
    r = perceptron_assign(tdf, w, b).collect()[0]
    assert r["output"] == 0.0 and r["assigned"] is False


def test_empty_shards_keep_full_denominator(searcher, corpus):
    # n_parts greater than the doc count leaves shards EMPTY; the
    # McDonald/Hall/Mann averaging still divides by n_parts (an empty
    # shard contributes a zero delta, it does not shrink the
    # denominator) — _brute_train always appends a delta per shard
    parts = len(corpus) + 3
    w, b = train_boolean_perceptron(searcher, "role = 'user'",
                                    n_parts=parts, epochs=1)
    want = _brute_train(corpus, "user", b, parts=parts)
    got = {r["term"]: r["weight"] for r in w.collect()}
    for t in want:
        assert got[t] == pytest.approx(want[t], abs=1e-9), t
