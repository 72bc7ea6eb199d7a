"""Hypothesis property tests for the session's Catalyst-only pipeline
ops — invariants that must hold for ANY input, not just fixtures."""

import pytest
from hypothesis import given, settings, strategies as st

from lucene_spark.ops.c4 import c4_clean
from lucene_spark.ops.packing import pack_sequences, pack_stats

WORDS = st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta",
                                  "epsilon"]), min_size=0, max_size=30)


@st.composite
def corpora(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    return [(i, " ".join(draw(WORDS))) for i in range(n)]


@settings(max_examples=12, deadline=None)
@given(docs=corpora(), budget=st.integers(2, 17),
       shards=st.integers(1, 4))
def test_packing_invariants(spark, docs, budget, shards):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = pack_sequences(df, budget=budget, n_shards=shards).collect()
    n_by_doc = {d: len(t.split()) if t else 0 for d, t in docs}
    # 1. total packed tokens == total input tokens (nothing dropped)
    assert sum(int(r.n_toks) for r in a) == sum(n_by_doc.values())
    # 2. every doc's slices are contiguous and cover [0, n)
    spans = {}
    for r in a:
        spans.setdefault(int(r.doc_id), []).append(
            (int(r.doc_tok_start), int(r.doc_tok_end)))
    for d, ss in spans.items():
        ss.sort()
        assert ss[0][0] == 0 and ss[-1][1] == n_by_doc[d]
        assert all(x1 == y0 for (_, x1), (y0, _) in zip(ss, ss[1:]))
    # 3. sample fill == budget except each shard's last sample
    st_rows = pack_stats(
        pack_sequences(df, budget=budget, n_shards=shards)).collect()
    last = {}
    for r in st_rows:
        last[int(r.shard)] = max(last.get(int(r.shard), -1),
                                 int(r.sample_id))
    for r in st_rows:
        if int(r.sample_id) != last[int(r.shard)]:
            assert int(r.fill) == budget
    # 4. sample offsets within a sample are disjoint and in-bounds
    per_sample = {}
    for r in a:
        per_sample.setdefault((int(r.shard), int(r.sample_id)),
                              []).append(
            (int(r.sample_off), int(r.sample_off) + int(r.n_toks)))
    for spans2 in per_sample.values():
        spans2.sort()
        assert spans2[0][0] >= 0 and spans2[-1][1] <= budget
        assert all(a1 <= b0 for (_, a1), (b0, _) in
                   zip(spans2, spans2[1:]))


LINES = st.lists(st.sampled_from([
    "a good long sentence lives here.",
    "short.",
    "no punctuation on this line",
    "the javascript line is filtered even when long and punctuated.",
    "another valid sentence with enough words!",
    ""]), min_size=0, max_size=6)


@settings(max_examples=10, deadline=None)
@given(docs=st.lists(LINES, min_size=1, max_size=6))
def test_c4_invariants(spark, docs):
    rows = [(i, "\n".join(ls)) for i, ls in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {int(r.doc_id): r
           for r in c4_clean(df, min_words=4, min_sentences=1).collect()}
    for i, ls in enumerate(docs):
        r = out[i]
        kept = [l for l in ls
                if l.rstrip().endswith((".", "!", "?"))
                and len(l.split()) >= 4 and "javascript" not in l]
        assert int(r.n_lines) == max(1, len(ls)) if ls else True
        assert int(r.n_kept) == len(kept)
        assert r.clean_text == "\n".join(kept)
        assert bool(r.keep) == (len(kept) >= 1
                                and "{" not in "\n".join(ls))
