"""TRUE sloppy-phrase semantics (SloppyPhraseMatcher): reorderable
within slop, float freq = Σ 1/(1+matchLength) over sweep matches.
Engine kernel (vectorized merge-path for m=2, per-doc sweep m>2)
vs the independent per-doc oracle sweep, plus hand-computed cases."""

import numpy as np
import pytest

from lucene_spark.index.catalog import IndexCatalog
from lucene_spark.kernels import codec
from lucene_spark.search import IndexSearcher
from lucene_spark.search.kernels import TermChunk, sloppy_freqs
from lucene_spark.search.oracle import BruteForceOracle
from lucene_spark.search.query import PhraseQuery


def _chunks_for(docs_tokens, terms):
    """Build TermChunks directly from a token-list corpus."""
    out = []
    for term in terms:
        docs, tfs, poss = [], [], []
        for d, toks in enumerate(docs_tokens):
            pl = [i for i, t in enumerate(toks) if t == term]
            if pl:
                docs.append(d)
                tfs.append(len(pl))
                poss.append(pl)
        if not docs:
            out.append(None)
            continue
        blocks = codec.encode_chunk(np.array(docs), np.array(tfs),
                                    np.ones(len(docs)), poss)
        out.append(TermChunk(blocks, [0.0] * len(blocks)))
    return out


def _oracle_freqs(docs_tokens, terms, slop):
    want = {}
    for d, toks in enumerate(docs_tokens):
        f = BruteForceOracle._sloppy_freq_true(toks, list(terms), slop)
        if f > 0:
            want[d] = np.float32(f)
    return want


def _kernel_freqs(docs_tokens, terms, slop):
    chunks = _chunks_for(docs_tokens, terms)
    if any(c is None for c in chunks):
        return {}
    docs, freqs = sloppy_freqs(chunks, slop)
    return {int(d): np.float32(f) for d, f in zip(docs, freqs)}


def test_reordered_terms_match():
    # "b a" must match phrase "a b" within slop 2 (reorder costs 2)
    corpus = [["b", "a"], ["a", "b"], ["a", "x", "b"], ["b", "x", "a"]]
    got = _kernel_freqs(corpus, ("a", "b"), 2)
    # doc0: b a -> adjusted A=[1], B=[-1+0]= [..]; matchLength 2 -> 1/3
    assert got[0] == np.float32(1.0 / 3.0)
    # doc1: exact -> matchLength 0 -> 1.0
    assert got[1] == np.float32(1.0)
    # doc2: a x b -> stretch 1 -> 1/2
    assert got[2] == np.float32(0.5)
    assert got == _oracle_freqs(corpus, ("a", "b"), 2)


def test_slop_zero_equivalent_is_exact_only():
    corpus = [["a", "b"], ["b", "a"], ["a", "x", "b"]]
    got = _kernel_freqs(corpus, ("a", "b"), 0)
    assert got == {0: np.float32(1.0)}


def test_multiple_occurrences_weighted():
    corpus = [["a", "b", "c", "a", "b"], ["a", "a", "b", "b"]]
    for slop in (0, 1, 2, 3):
        got = _kernel_freqs(corpus, ("a", "b"), slop)
        want = _oracle_freqs(corpus, ("a", "b"), slop)
        assert got == want, f"slop={slop}"


def test_three_term_fallback_sweep():
    corpus = [["a", "b", "c"], ["c", "b", "a"], ["a", "x", "b", "y", "c"],
              ["b", "a", "c", "a", "b", "c"]]
    for slop in (0, 2, 4):
        got = _kernel_freqs(corpus, ("a", "b", "c"), slop)
        want = _oracle_freqs(corpus, ("a", "b", "c"), slop)
        assert got == want, f"slop={slop}"


def test_randomized_against_oracle():
    rng = np.random.default_rng(7)
    vocab = list("abcdefg")
    corpus = [[vocab[i] for i in rng.integers(0, len(vocab), size=int(n))]
              for n in rng.integers(3, 40, size=120)]
    for terms in (("a", "b"), ("c", "a"), ("a", "b", "c")):
        for slop in (1, 3, 6):
            got = _kernel_freqs(corpus, terms, slop)
            want = _oracle_freqs(corpus, terms, slop)
            assert got == want, f"{terms} slop={slop}"


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=120, deadline=None)
@given(st.lists(st.lists(st.sampled_from("abcx"), min_size=2, max_size=18),
                min_size=1, max_size=12),
       st.integers(min_value=0, max_value=6))
def test_merge_path_equals_sweep_property(corpus, slop):
    """Property: the vectorized m=2 merge-path enumeration equals the
    independent per-doc pq sweep on arbitrary corpora (hypothesis
    shrinks any counterexample to a minimal doc set)."""
    got = _kernel_freqs(corpus, ("a", "b"), slop)
    want = _oracle_freqs(corpus, ("a", "b"), slop)
    assert got == want


def test_engine_sloppy_topk_matches_oracle(spark, small_index):
    s = IndexSearcher(spark, small_index)
    cat = IndexCatalog(small_index)
    pdf = (spark.read.parquet(cat.table_path("docstore"))
           .select("doc_id", "text").orderBy("doc_id").toPandas())
    oracle = BruteForceOracle(pdf)
    toks = oracle.tokens[0]
    q = PhraseQuery((toks[2], toks[0]), slop=3)  # reversed pair
    got = s.search(q, k=10)
    want = oracle.topk({"type": "phrase", "terms": list(q.terms),
                        "slop": 3, "k": 10})
    assert got == want
    assert got  # reorderable semantics actually matched something


# ---- m > 2: vectorized global-sort sweep == literal pq sweep -----------

def test_m_gt_2_vectorized_sweep_matches_pq():
    import numpy as np
    from lucene_spark.kernels import codec
    from lucene_spark.search.kernels import TermChunk, sloppy_freqs

    rng = np.random.default_rng(17)

    def pq_sweep(pls, slop):
        m = len(pls)
        ptr = [0] * m
        f = 0.0
        while True:
            vals = [pls[i][ptr[i]] for i in range(m)]
            mn, mx = min(vals), max(vals)
            if mx - mn <= slop:
                f += 1.0 / (1 + mx - mn)
            i_min = vals.index(mn)
            ptr[i_min] += 1
            if ptr[i_min] >= len(pls[i_min]):
                break
        return f

    for trial in range(150):
        m = int(rng.integers(3, 5))
        n_docs = int(rng.integers(1, 6))
        slop = int(rng.integers(0, 8))
        corpus = [rng.integers(0, m + 2, int(rng.integers(m, 25)))
                  for _ in range(n_docs)]
        chunks = []
        for t in range(m):
            docs, tfs, poss = [], [], []
            for d, toks in enumerate(corpus):
                pl = np.flatnonzero(toks == t)
                if pl.size:
                    docs.append(d)
                    tfs.append(pl.size)
                    poss.append(pl.tolist())
            if not docs:
                chunks = None
                break
            blocks = codec.encode_chunk(np.array(docs), np.array(tfs),
                                        np.ones(len(docs)), poss)
            chunks.append(TermChunk(blocks, [0.0] * len(blocks)))
        if chunks is None:
            continue
        gd, gf = sloppy_freqs(chunks, slop, pruned=True)
        got = {int(d): np.float32(f) for d, f in zip(gd, gf)}
        want = {}
        for d, toks in enumerate(corpus):
            pls = [(np.flatnonzero(toks == t) - t + m).tolist()
                   for t in range(m)]
            if any(not p for p in pls):
                continue
            f = pq_sweep(pls, slop)
            if f > 0:
                want[d] = np.float32(f)
        assert got == want, (trial, m, slop)
