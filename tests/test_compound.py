"""DictionaryCompoundWordTokenFilter chain specs (kernels/compound.py).

Reference parity targets: analysis/common/.../compound/
DictionaryCompoundWordTokenFilter.java + CompoundWordTokenFilterBase
.java — tokens >= minWordSize (5) emit every dictionary subword of
length 2..15 found at any start position, AFTER the original; a
dictionary word occurring k times emits k times. Decompounding runs
on the raw lowercase stream before the base chain's stop/stem stages,
so subwords normalize like standalone words.
"""

import pandas as pd
import pytest

from lucene_spark.kernels.compound import decompound_one, subwords_of
from lucene_spark.kernels.tokenizer import (analyze_one, analyze_series,
                                            analyze_term,
                                            parse_chain_spec,
                                            tokenize_one)
from lucene_spark.search.oracle import BruteForceOracle
from lucene_spark.search.query import TermQuery

DICT = frozenset({"cust", "omer", "me"})
SPEC = "standard?compound=cust,omer,me"


def test_subword_semantics():
    # every (start, length) dictionary match emits; original kept by
    # the chain wrapper
    assert subwords_of("customer", DICT) == ["cust", "omer", "me"]
    # below minWordSize (5): no decomposition even on exact matches
    assert subwords_of("cust", DICT) == []
    # repeated occurrences emit per position
    assert subwords_of("memento", frozenset({"me"})) == ["me", "me"]
    assert decompound_one(["customer", "book"], DICT) == \
        ["customer", "cust", "omer", "me", "book"]


def test_chain_spec_parsing_and_validation():
    base, prot, over, comp = parse_chain_spec(SPEC)
    assert (base, prot, over) == ("standard", None, None)
    assert comp == DICT
    with pytest.raises(ValueError):
        parse_chain_spec("standard?compound=")
    with pytest.raises(ValueError):
        parse_chain_spec("ngram?compound=abc")  # own tokenize pass
    # composes with stemming-exception params on the english chains
    b, p, o, c = parse_chain_spec(
        "porter?compound=cust&protected=query")
    assert c == frozenset({"cust"}) and p == frozenset({"query"})


def test_series_equals_per_row_across_bases():
    texts = pd.Series(["Customer MErges book", "", "memento customs"])
    for spec in (SPEC, "porter?compound=cust,omer,me",
                 "english?compound=cust,omer,me"):
        got = analyze_series(texts, spec)
        for raw, toks in zip(texts, got):
            assert toks == analyze_one(raw, spec), spec


def test_subwords_stem_like_standalone_words():
    # porter base: parts join the stream BEFORE stemming
    assert analyze_one("Customer", "porter?compound=cust,omer,me") == \
        ["custom", "cust", "omer", "me"]
    # german base: umlaut normalization + stem apply to the parts;
    # the dictionary matches the RAW lowercase compound
    got = analyze_one("Haustür und Häuser", "german?compound=haus,tür")
    assert got == ["haustur", "haus", "tur", "haus"]
    # query terms do NOT decompound (index-side filter)
    assert analyze_term("haustür", "german?compound=haus,tür") == \
        "haustur"


TEXTS = [
    "the customer record merged cleanly",   # 0: customer -> parts
    "customs officers checked the cargo",   # 1: customs -> cust
    "a memento from the summer trip",       # 2: memento -> me me
    "plain words only here",                # 3: no compounds
]


def test_compound_index_end_to_end(spark, tmp_path_factory):
    from lucene_spark.index import build_index
    from lucene_spark.search import IndexSearcher
    rows = [(f"c{i:04d}", 0, "user", t, "none")
            for i, t in enumerate(TEXTS)]
    src = (spark.createDataFrame(rows,
                                 "conv_id string, turn_idx int, role string, "
                                 "text string, tool string")
           .selectExpr("*", "timestamp('2026-01-01') as ts"))
    out = str(tmp_path_factory.mktemp("compound") / "idx")
    build_index(spark, src, out, num_buckets=2,
                analyzers={"text": SPEC})
    s = IndexSearcher(spark, out)
    assert s.analyzers == {"text": SPEC}
    oracle = BruteForceOracle(
        pd.DataFrame({"doc_id": range(len(TEXTS)), "text": TEXTS}),
        analyzer=SPEC)
    # 'cust' is an emitted subword of customer AND customs
    got = s.search(TermQuery("cust"), k=10)
    assert {d for d, _ in got} == {0, 1}
    assert got == oracle.topk({"type": "term", "terms": ["cust"],
                               "k": 10})
    # repeated 'me' emissions raise tf (memento: 2, + summer: 1) vs
    # doc 0's single occurrences (customer, merged) — parity incl.
    # scores
    got = s.search(TermQuery("me"), k=10)
    assert {d for d, _ in got} == {0, 2}
    assert got == oracle.topk({"type": "term", "terms": ["me"],
                               "k": 10})
    assert s.count(TermQuery("omer")) == 1  # customer only
    assert s.count(TermQuery("cargo")) == 1  # plain terms intact
