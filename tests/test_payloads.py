"""Delimited-payload analysis chain + PayloadScoreQuery semantics
(analysis/common/.../payloads/DelimitedPayloadTokenFilter.java,
queries/.../payloads/PayloadScoreQuery.java)."""

import datetime

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_spark.kernels.payload import (payload_analyze_one,
                                          payload_stats_frame,
                                          payload_term,
                                          payload_tokenize_series)
from lucene_spark.kernels.tokenizer import analyze_one, analyze_series, \
    analyze_term
from lucene_spark.ops.payloads import payload_score_df
from lucene_spark.search import IndexSearcher
from lucene_spark.search.query import TermQuery

TS = datetime.datetime(2026, 1, 1)

DOCS = [
    "alpha|2.0 beta alpha|0.5 gamma",     # two payloads on alpha
    "alpha beta|3.0 delta",               # alpha occurs, NO payload -> 1
    "beta beta|4.5",                      # no alpha at all
    "Alpha|10 gamma gamma",               # case folds; integer payload
    "alpha|-2.5 epsilon",                 # negative payload -> clamp 0
    "|0.7 alpha|1.25 zeta",               # empty term part dropped
]


def test_chain_tokenization():
    # DelimitedPayloadTokenFilter.java:57-63 — cut at the FIRST '|'
    assert payload_analyze_one("Apple|2.5 banana c|1|2") == \
        ["apple", "banana", "c"]
    assert payload_analyze_one("|0.5 x") == ["x"]   # empty term dropped
    assert payload_analyze_one("") == []
    assert payload_term("Apple|2.5") == "apple"
    # the chain is reachable through the registry dispatchers
    assert analyze_one("A|1 b", "payload") == ["a", "b"]
    assert analyze_term("A|1", "payload") == "a"
    out = analyze_series(pd.Series(["A|1 b", None, "c"]), "payload")
    assert list(out) == [["a", "b"], [], ["c"]]
    ser = payload_tokenize_series(pd.Series(DOCS))
    assert list(ser[:2]) == [["alpha", "beta", "alpha", "gamma"],
                             ["alpha", "beta", "delta"]]


def test_stats_frame():
    s = payload_stats_frame(pd.Series(DOCS), "alpha")
    assert list(s["n_seen"]) == [2, 1, 0, 1, 1, 1]
    # doc 0: payloads 2.0, 0.5
    assert s["p_min"][0] == pytest.approx(0.5)
    assert s["p_max"][0] == pytest.approx(2.0)
    assert s["p_sum"][0] == pytest.approx(2.5)
    # doc 1: occurrence without payload -> factor 1
    assert s["p_sum"][1] == pytest.approx(1.0)
    # doc 3: case-folded match with integer payload
    assert s["p_max"][3] == pytest.approx(10.0)
    # doc 4: negative payload kept here (clamped at doc-score level)
    assert s["p_min"][4] == pytest.approx(-2.5)
    # doc 5: the '|0.7' empty-term token does not hit 'alpha'
    assert s["p_sum"][5] == pytest.approx(1.25)


@pytest.fixture(scope="module")
def payload_searcher(spark, tmp_path_factory):
    from lucene_spark.index import build_index
    out = str(tmp_path_factory.mktemp("pidx"))
    rows = [(f"c{i:04d}", 0, "user", t, "tool_00", TS)
            for i, t in enumerate(DOCS)]
    # pad with payload-free filler docs so BM25 stats are non-trivial
    rows += [(f"c{i:04d}", 0, "user", f"filler{i} beta gamma", "tool_00", TS)
             for i in range(6, 30)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    build_index(spark, df, out, num_buckets=2,
                analyzers={"text": "payload"})
    return IndexSearcher(spark, out)


def _brute(searcher, term, fn, include_span):
    span = {r["doc_id"]: r["score"]
            for r in searcher.matches_df(TermQuery(term)).collect()}
    texts = {r["doc_id"]: r["text"]
             for r in searcher._read_cached(searcher.docstore_paths)
             .select("doc_id", "text").collect()}
    out = {}
    for d, s in span.items():
        pays = []
        for tok in texts[d].lower().split():
            t, _, p = tok.partition("|")
            if t == term:
                pays.append(float(p) if p else 1.0)
        if pays:
            ps = {"min": min(pays), "max": max(pays), "sum": sum(pays),
                  "avg": sum(pays) / len(pays)}[fn]
        else:
            ps = 1.0
        ps = 0.0 if (ps < 0 or ps != ps) else ps
        out[d] = (np.float32(s) * np.float32(ps)) if include_span \
            else np.float32(ps)
    return out


@pytest.mark.parametrize("fn", ["min", "max", "sum", "avg"])
def test_payload_score_matches_brute(payload_searcher, fn):
    got = [(r["doc_id"], r["score"])
           for r in payload_score_df(payload_searcher, "alpha", fn=fn,
                                     k=10).collect()]
    want = _brute(payload_searcher, "alpha", fn, True)
    want_rank = sorted(want.items(), key=lambda t: (-t[1], t[0]))[:10]
    assert [d for d, _ in got] == [d for d, _ in want_rank]
    np.testing.assert_allclose([s for _, s in got],
                               [float(s) for _, s in want_rank], rtol=1e-6)


def test_payload_only_scoring(payload_searcher):
    # includeSpanScore=false -> pure payload score
    got = {r["doc_id"]: r["score"]
           for r in payload_score_df(payload_searcher, "alpha", fn="max",
                                     include_span_score=False,
                                     k=10).collect()}
    want = _brute(payload_searcher, "alpha", "max", False)
    assert set(got) == set(want)
    for d in got:
        assert got[d] == pytest.approx(float(want[d]), rel=1e-6)
    # doc 3 carries the 10.0 payload -> top
    top = max(got.items(), key=lambda t: (t[1], -t[0]))
    assert top[1] == pytest.approx(10.0)


def test_negative_payload_truncates_to_zero(payload_searcher):
    got = {r["doc_id"]: r["score"]
           for r in payload_score_df(payload_searcher, "alpha", fn="min",
                                     include_span_score=False,
                                     k=10).collect()}
    # the doc whose only payload is -2.5 scores 0 (truncation)
    assert min(got.values()) == 0.0


def test_unknown_function_rejected(payload_searcher):
    with pytest.raises(ValueError):
        payload_score_df(payload_searcher, "alpha", fn="median")


# ---------------------------------------------------------------------------
# SpanPayloadCheckQuery
# ---------------------------------------------------------------------------

def _brute_span_check(texts, terms, expected, op="eq", ptype="float"):
    import math

    def dec(p):
        if ptype == "string":
            return p
        try:
            v = float(p)
        except ValueError:
            return math.nan
        if ptype == "int" and v != int(v):
            return math.nan
        return v

    def cmp(v, e):
        if ptype == "string":
            pass
        else:
            e = float(e)
            if v != v:  # NaN
                return False
        return {"eq": v == e, "gt": v > e, "gte": v >= e,
                "lt": v < e, "lte": v <= e}[op]

    out = {}
    for d, t in texts.items():
        toks = [tok.partition("|") for tok in t.lower().split()]
        n = 0
        for i in range(len(toks) - len(terms) + 1):
            ok = True
            for j, (term, exp) in enumerate(zip(terms, expected)):
                w, delim, pay = toks[i + j]
                if w != term:
                    ok = False
                    break
                if exp is None:
                    if delim:
                        ok = False
                        break
                elif not delim or not cmp(dec(pay), exp):
                    ok = False
                    break
            if ok:
                n += 1
        if n:
            out[d] = n
    return out


def _searcher_texts(searcher):
    return {r["doc_id"]: r["text"]
            for r in searcher._read_cached(searcher.docstore_paths)
            .select("doc_id", "text").collect()}


@pytest.mark.parametrize("terms,expected,op", [
    (["alpha"], [2.0], "eq"),
    (["alpha"], [1.0], "gte"),
    (["alpha"], [None], "eq"),      # bare occurrence only
    (["alpha", "beta"], [2.0, None], "eq"),
    (["alpha", "beta"], [None, 3.0], "eq"),
    (["alpha"], [0.0], "lt"),       # negative payload
    (["beta"], [4.0], "gt"),
])
def test_span_payload_check_matches_brute(payload_searcher, terms,
                                          expected, op):
    from lucene_spark.ops.payloads import span_payload_check_df
    got = {r["doc_id"]: r["n_spans"]
           for r in span_payload_check_df(payload_searcher, terms,
                                          expected, op=op).collect()}
    want = _brute_span_check(_searcher_texts(payload_searcher),
                             terms, expected, op)
    assert got == want, (terms, expected, op)


def test_span_payload_check_string_and_int_types():
    from lucene_spark.kernels.payload import span_payload_check_batch
    texts = pd.Series([
        "color|red shape|round",
        "color|blue shape|square",
        "color|red",
        "num|3 num|4.5",
    ])
    # STRING equality
    c = span_payload_check_batch(texts, ["color"], ["red"],
                                 op="eq", ptype="string")
    assert list(c) == [1, 0, 1, 0]
    # STRING lexicographic GT ("red" > "blue")
    c = span_payload_check_batch(texts, ["color"], ["blue"],
                                 op="gt", ptype="string")
    assert list(c) == [1, 0, 1, 0]
    # INT type rejects fractional payloads (4.5 is not a packed int)
    c = span_payload_check_batch(texts, ["num"], [3.0],
                                 op="gte", ptype="int")
    assert list(c) == [0, 0, 0, 1]
    # unknown op / misaligned expectations raise
    with pytest.raises(ValueError):
        span_payload_check_batch(texts, ["color"], ["red"], op="ne")
    with pytest.raises(ValueError):
        span_payload_check_batch(texts, ["color"], ["red", "blue"])


def test_span_payload_check_no_cross_doc_span():
    from lucene_spark.kernels.payload import span_payload_check_batch
    # "x" ends row 0, "y" starts row 1: the flat stream is contiguous,
    # but the span must not straddle the boundary
    texts = pd.Series(["a x|1", "y|2 b"])
    c = span_payload_check_batch(texts, ["x", "y"], [1.0, 2.0], op="eq")
    assert list(c) == [0, 0]
