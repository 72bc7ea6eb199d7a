"""Interval algebra (queries/intervals Intervals.java analog):
vectorized minimal-interval combinators vs an independent per-doc
brute-force enumeration (all child-interval combinations + minimality
filter)."""

import numpy as np
import pytest

from lucene_spark.index.catalog import IndexCatalog
from lucene_spark.kernels import codec
from lucene_spark.search import IndexSearcher
from lucene_spark.search.intervals import (After, Before, ContainedBy,
                                           Containing, Extend, MaxGaps,
                                           MaxWidth, NonOverlapping,
                                           NotContainedBy, NotContaining,
                                           Or, Ordered, Overlapping, Phrase,
                                           Term, Unordered, candidate_docs,
                                           match_bucket, required_terms)
from lucene_spark.search.kernels import TermChunk, _conj_candidates


# ---- brute-force per-doc oracle ---------------------------------------

def brute(tokens, src):
    """Minimal interval set of a source over one doc's token list."""
    if isinstance(src, Term):
        return [(i, i) for i, t in enumerate(tokens) if t == src.term]
    if isinstance(src, Or):
        out = []
        for s in src.sources:
            out.extend(brute(tokens, s))
        return _minimal(out)
    if isinstance(src, Phrase):
        m = len(src.terms)
        return [(i, i + m - 1) for i in range(len(tokens) - m + 1)
                if tuple(tokens[i:i + m]) == tuple(src.terms)]
    if isinstance(src, Ordered):
        parts = [brute(tokens, s) for s in src.sources]
        if any(not p for p in parts):
            return []
        out = []

        def rec(i, start, prev_end):
            if i == len(parts):
                out.append((start, prev_end))
                return
            for (s, e) in parts[i]:
                if s > prev_end:
                    rec(i + 1, start, e)
        for (s, e) in parts[0]:
            rec(1, s, e)
        return _minimal(out)
    if isinstance(src, Unordered):
        parts = [brute(tokens, s) for s in src.sources]
        if any(not p for p in parts):
            return []
        out = []

        def rec(i, acc):
            if i == len(parts):
                out.append((min(a[0] for a in acc), max(a[1] for a in acc)))
                return
            for iv in parts[i]:
                rec(i + 1, acc + [iv])
        rec(0, [])
        return _minimal(out)
    if isinstance(src, MaxGaps):
        n = _leaves(src.source)
        return [(s, e) for s, e in brute(tokens, src.source)
                if (e - s + 1) - n <= src.gaps]
    if isinstance(src, MaxWidth):
        return [(s, e) for s, e in brute(tokens, src.source)
                if e - s + 1 <= src.width]
    if isinstance(src, (Containing, NotContaining)):
        big = brute(tokens, src.big)
        small = brute(tokens, src.small)
        hit = [(s, e) for s, e in big
               if any(s <= s2 and e2 <= e for s2, e2 in small)]
        if isinstance(src, Containing):
            return hit
        return [iv for iv in big if iv not in hit]
    if isinstance(src, (ContainedBy, NotContainedBy)):
        small = brute(tokens, src.small)
        big = brute(tokens, src.big)
        hit = [(s, e) for s, e in small
               if any(s2 <= s and e <= e2 for s2, e2 in big)]
        if isinstance(src, ContainedBy):
            return hit
        return [iv for iv in small if iv not in hit]
    if isinstance(src, Before):
        ref = brute(tokens, src.reference)
        return [(s, e) for s, e in brute(tokens, src.source)
                if any(r[0] > e for r in ref)]
    if isinstance(src, After):
        ref = brute(tokens, src.reference)
        return [(s, e) for s, e in brute(tokens, src.source)
                if any(r[1] < s for r in ref)]
    if isinstance(src, (Overlapping, NonOverlapping)):
        ref = brute(tokens, src.reference)
        hit = [(s, e) for s, e in brute(tokens, src.source)
               if any(r[0] <= e and r[1] >= s for r in ref)]
        if isinstance(src, Overlapping):
            return hit
        return [iv for iv in brute(tokens, src.source) if iv not in hit]
    if isinstance(src, Extend):
        return _minimal([(max(0, s - src.before), e + src.after)
                         for s, e in brute(tokens, src.source)])
    raise TypeError(type(src))


def _leaves(src):
    if isinstance(src, Term):
        return 1
    if isinstance(src, Phrase):
        return len(src.terms)
    if isinstance(src, Or):
        return _leaves(src.sources[0])
    if isinstance(src, (Ordered, Unordered)):
        return sum(_leaves(s) for s in src.sources)
    if isinstance(src, (MaxGaps, MaxWidth)):
        return _leaves(src.source)
    if isinstance(src, (Before, After, Overlapping, NonOverlapping,
                        Extend)):
        return _leaves(src.source)
    raise TypeError(type(src))


def _minimal(ivs):
    ivs = sorted(set(ivs))
    return [a for a in ivs
            if not any(b != a and a[0] <= b[0] and b[1] <= a[1]
                       for b in ivs)]


# ---- kernel harness over token-list corpora ---------------------------

def _chunks_for(corpus, terms):
    out = {}
    for term in terms:
        docs, tfs, poss = [], [], []
        for d, toks in enumerate(corpus):
            pl = [i for i, t in enumerate(toks) if t == term]
            if pl:
                docs.append(d)
                tfs.append(len(pl))
                poss.append(pl)
        if docs:
            blocks = codec.encode_chunk(np.array(docs), np.array(tfs),
                                        np.ones(len(docs)), poss)
            out[term] = TermChunk(blocks, [0.0] * len(blocks))
    return out


def check(corpus, src):
    terms = sorted({t for toks in corpus for t in toks})
    by_term = _chunks_for(corpus, terms)
    req = [by_term.get(t) for t in sorted(required_terms(src))]
    if any(c is None for c in req):
        cand = np.zeros(0, np.int64)
    else:
        cand = candidate_docs(src, by_term)
    docs, n, w = match_bucket(src, by_term, cand)
    got = {int(d): (int(c), int(mw)) for d, c, mw in zip(docs, n, w)}
    want = {}
    for d, toks in enumerate(corpus):
        req_terms = required_terms(src)
        if not req_terms.issubset(set(toks)):
            continue
        ivs = brute(toks, src)
        if ivs:
            want[d] = (len(ivs), min(e - s + 1 for s, e in ivs))
    assert got == want, f"\nsrc={src}\ngot ={got}\nwant={want}"


CORPUS = [
    list("abcab"), list("bca"), list("aabbcc"), list("cba"),
    list("abacbc"), list("ccc"), list("abc"), list("cab"),
    ["a", "x", "x", "b", "x", "c"], ["b", "a", "c", "b", "a"],
]


@pytest.mark.parametrize("src", [
    Ordered((Term("a"), Term("b"))),
    Ordered((Term("a"), Term("b"), Term("c"))),
    Unordered((Term("a"), Term("b"))),
    Unordered((Term("a"), Term("b"), Term("c"))),
    MaxGaps(Ordered((Term("a"), Term("b"))), 1),
    MaxWidth(Unordered((Term("a"), Term("c"))), 3),
    Containing(Ordered((Term("a"), Term("c"))), Term("b")),
    NotContaining(Ordered((Term("a"), Term("c"))), Term("b")),
    ContainedBy(Term("b"), Ordered((Term("a"), Term("c")))),
    NotContainedBy(Term("b"), Ordered((Term("a"), Term("c")))),
    Containing(Unordered((Term("a"), Term("b"))), Term("c")),
    MaxGaps(Ordered((Term("a"), Unordered((Term("b"), Term("c"))))), 2),
    # non-Term sources (Intervals.or / Intervals.phrase surface)
    Or((Term("a"), Term("b"))),
    Ordered((Or((Term("a"), Term("b"))), Term("c"))),
    MaxGaps(Ordered((Or((Term("a"), Term("b"))), Term("c"))), 2),
    Unordered((Or((Term("a"), Term("c"))), Term("b"))),
    Phrase(("a", "b")),
    Ordered((Phrase(("a", "b")), Term("c"))),
    ContainedBy(Or((Term("b"), Term("c"))),
                MaxWidth(Ordered((Term("a"), Term("c"))), 5)),
    Containing(Ordered((Term("a"), Term("c"))), Or((Term("b"), Term("x")))),
    Or((Phrase(("a", "b")), Phrase(("b", "c")))),
    # positional-relation combinators (Intervals.before/after/
    # overlapping/nonOverlapping/extend)
    Before(Term("a"), Term("c")),
    Before(Phrase(("a", "b")), Term("c")),
    After(Term("c"), Term("a")),
    After(Ordered((Term("b"), Term("c"))), Term("a")),
    Overlapping(Ordered((Term("a"), Term("c"))), Phrase(("b", "c"))),
    Overlapping(Unordered((Term("a"), Term("b"))), Term("c")),
    NonOverlapping(Ordered((Term("a"), Term("c"))), Term("b")),
    NonOverlapping(Term("a"), Phrase(("b", "c"))),
    Extend(Term("b"), 1, 1),
    Extend(Phrase(("a", "b")), 2, 0),
    Containing(Extend(Term("b"), 1, 1), Term("a")),
    Before(Or((Term("a"), Term("b"))), Term("c")),
], ids=lambda s: type(s).__name__ + str(abs(hash(repr(s))) % 1000))
def test_combinators_match_bruteforce(src):
    check(CORPUS, src)


def test_randomized_corpora():
    rng = np.random.default_rng(11)
    vocab = list("abcde")
    corpus = [[vocab[i] for i in rng.integers(0, len(vocab), size=int(n))]
              for n in rng.integers(2, 25, size=80)]
    sources = [
        Ordered((Term("a"), Term("b"))),
        Unordered((Term("b"), Term("c"), Term("d"))),
        MaxGaps(Unordered((Term("a"), Term("c"))), 2),
        Containing(Unordered((Term("a"), Term("b"))), Term("e")),
        ContainedBy(Term("d"), MaxWidth(Ordered((Term("a"), Term("b"))), 6)),
        NotContaining(MaxGaps(Ordered((Term("a"), Term("c"))), 4), Term("b")),
        Ordered((Or((Term("a"), Term("b"))), Term("c"))),
        Or((Phrase(("a", "b")), Term("e"))),
        Unordered((Or((Term("d"), Term("e"))), Phrase(("a", "b")))),
        Before(Ordered((Term("a"), Term("b"))), Term("e")),
        After(Term("e"), Unordered((Term("a"), Term("b")))),
        Overlapping(MaxWidth(Unordered((Term("a"), Term("c"))), 5),
                    Phrase(("b", "d"))),
        NonOverlapping(Ordered((Term("a"), Term("c"))), Term("e")),
        Extend(Ordered((Term("a"), Term("b"))), 1, 2),
    ]
    for src in sources:
        check(corpus, src)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=80, deadline=None)
@given(st.lists(st.lists(st.sampled_from("abcx"), min_size=1, max_size=14),
                min_size=1, max_size=8),
       st.sampled_from([
           Ordered((Term("a"), Term("b"))),
           Unordered((Term("a"), Term("b"))),
           MaxGaps(Ordered((Term("a"), Term("b"))), 2),
           Containing(Unordered((Term("a"), Term("b"))), Term("c")),
           ContainedBy(Term("c"), Ordered((Term("a"), Term("b")))),
       ]))
def test_combinator_property(corpus, src):
    """Property: every combinator equals the brute all-combination +
    minimality enumeration on arbitrary corpora."""
    check(corpus, src)


def test_end_to_end_interval_search(spark, small_index):
    from lucene_spark.kernels.tokenizer import tokenize_one
    s = IndexSearcher(spark, small_index)
    cat = IndexCatalog(small_index)
    pdf = (spark.read.parquet(cat.table_path("docstore"))
           .select("doc_id", "text").orderBy("doc_id").toPandas())
    toks0 = tokenize_one(pdf["text"].iloc[0])
    a, b = toks0[0], toks0[2]
    src = MaxGaps(Ordered((Term(a), Term(b))), 4)
    got = {int(r["doc_id"]): (int(r["n_intervals"]), int(r["min_width"]))
           for r in s.interval_search(src).collect()}
    want = {}
    for d, text in zip(pdf["doc_id"], pdf["text"]):
        ivs = brute(tokenize_one(text), src)
        if ivs:
            want[int(d)] = (len(ivs), min(e - st + 1 for st, e in ivs))
    assert got == want
    assert got  # non-trivial
