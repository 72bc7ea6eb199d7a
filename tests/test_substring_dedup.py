"""Exact substring (token-window) deduplication — the distributed
analog of Lee et al. 2021 suffix-array substring dedup: duplicated
window detection, span merging, and keep-one-copy stripping.

Independent check: a brute-force Python implementation over the same
normalized token stream.
"""

import re

import pytest
from pyspark.sql import functions as F

from lucene_spark.ops.dedup import (duplicate_substring_spans,
                                    strip_duplicate_substrings)

TOK = re.compile(r"[0-9a-z]+")


def _toks(t):
    return TOK.findall(t.lower())


def _brute_spans(texts, window, min_count):
    """{(doc, start, end): n_windows} with 1-based inclusive token
    positions, independent of the Spark code path."""
    from collections import Counter
    occ = Counter()
    per_doc = {}
    for d, t in texts.items():
        toks = _toks(t)
        per_doc[d] = toks
        for i in range(len(toks) - window + 1):
            occ[tuple(toks[i:i + window])] += 1
    spans = {}
    for d, toks in per_doc.items():
        pos = [i + 1 for i in range(len(toks) - window + 1)
               if occ[tuple(toks[i:i + window])] >= min_count]
        i = 0
        while i < len(pos):
            j = i
            while j + 1 < len(pos) and pos[j + 1] - pos[j] <= window:
                j += 1
            spans[(d, pos[i], pos[j] + window - 1)] = j - i + 1
            i = j + 1
    return spans


BOILER = "please review the generated summary and confirm output"


@pytest.fixture(scope="module")
def corpus(spark):
    # hand-built so chance 3-gram collisions cannot occur outside the
    # designed duplications: unique filler tokens per doc
    rows = []
    for d in range(8):
        filler = " ".join(f"u{d}x{i}" for i in range(6))
        if d % 2 == 0:
            rows.append((d, f"{filler} {BOILER}"))
        else:
            rows.append((d, filler))
    # within-doc repetition: the same 4 tokens twice in one doc
    rows.append((8, "alpha beta gamma delta filler8 alpha beta gamma delta"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_spans_match_brute(corpus):
    texts = {r["doc_id"]: r["text"] for r in corpus.collect()}
    for window, min_count in ((3, 2), (4, 2), (3, 3)):
        got = {(r["doc_id"], r["start_tok"], r["end_tok"]): r["n_windows"]
               for r in duplicate_substring_spans(
                   corpus, window=window, min_count=min_count).collect()}
        assert got == _brute_spans(texts, window, min_count), \
            (window, min_count)


def test_spans_mark_boilerplate_only(corpus):
    spans = duplicate_substring_spans(corpus, window=3).collect()
    docs_with = {r["doc_id"] for r in spans}
    # every even doc carries the boilerplate; odd docs are clean;
    # doc 8 repeats its own 4-gram
    assert docs_with == {0, 2, 4, 6, 8}
    by_doc = {r["doc_id"]: r for r in spans if r["doc_id"] != 8}
    for d, r in by_doc.items():
        # boilerplate = 8 tokens after 6 unique filler tokens
        assert (r["start_tok"], r["end_tok"]) == (7, 14)
        assert r["n_windows"] == 6  # 8 - 3 + 1


def test_strip_keeps_one_canonical_copy(corpus):
    out = {r["doc_id"]: r["text"]
           for r in strip_duplicate_substrings(corpus, window=3).collect()}
    assert set(out) == set(range(9))
    # doc 0 holds the canonical (min doc_id, pos) occurrence: unchanged
    assert out[0].split(" ")[6:] == BOILER.split(" ")
    # every other even doc loses exactly the boilerplate tokens
    for d in (2, 4, 6):
        assert out[d] == " ".join(f"u{d}x{i}" for i in range(6))
    # odd docs pass through (normalized stream identical)
    for d in (1, 3, 5, 7):
        assert out[d] == " ".join(f"u{d}x{i}" for i in range(6))
    # within-doc repeat: first occurrence canonical, second stripped
    assert out[8] == "alpha beta gamma delta filler8"


def test_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(0, "one two"), (1, ""), (2, "one two")],
        "doc_id long, text string")
    # docs shorter than the window produce no windows and no spans
    assert duplicate_substring_spans(df, window=3).count() == 0
    out = {r["doc_id"]: r["text"]
           for r in strip_duplicate_substrings(df, window=3).collect()}
    assert out == {0: "one two", 1: "", 2: "one two"}


# ---------------------------------------------------------------------------
# C4-style line-level dedup
# ---------------------------------------------------------------------------

def test_line_dedup_keeps_first_occurrence(spark):
    from lucene_spark.ops.dedup import line_dedup
    docs = [
        (0, "unique zero\nShared Boilerplate\nalso zero"),
        (1, "shared boilerplate\nunique one"),      # normalized dup
        (2, "unique two\n\nshared boilerplate"),    # blank line kept
        (3, "unique three"),
        (4, "unique zero"),  # dup of doc 0's first line -> dropped
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r["text"] for r in line_dedup(df).collect()}
    assert out[0] == "unique zero\nShared Boilerplate\nalso zero"
    assert out[1] == "unique one"
    assert out[2] == "unique two\n"       # blank survives, dup dropped
    assert out[3] == "unique three"
    assert out[4] == ""                   # whole doc was a dup line


def test_line_dedup_blank_lines_never_collapse(spark):
    from lucene_spark.ops.dedup import line_dedup
    df = spark.createDataFrame(
        [(0, "a\n\nb"), (1, "c\n\nd"), (2, "e\n \nf")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["text"] for r in line_dedup(df).collect()}
    assert out == {0: "a\n\nb", 1: "c\n\nd", 2: "e\n \nf"}
