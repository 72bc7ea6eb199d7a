"""Block-max pruned nested-tree evaluation (kernels.eval_tree_topk):

- pruned == exhaustive over randomized nested plan trees (CheckHits
  discipline, like the flat-kernel property tests);
- a decoded-blocks counter shows the pruned path skips block decodes on
  a skewed head-term nested query (the round-2 verdict's scale-killer);
- the end-to-end searcher paths (search_df / search_after_df /
  search_batch) agree between pruned and exhaustive modes for nested
  shapes.
"""

import numpy as np
import pytest

from lucene_spark.fixtures.transcripts import term_string
from lucene_spark.kernels import codec
from lucene_spark.kernels.bm25 import BM25Scorer, sum_idf
from lucene_spark.kernels.smallfloat import int_to_byte4
from lucene_spark.search import IndexSearcher
from lucene_spark.search.kernels import (DECODE_COUNTER, TermChunk,
                                         eval_tree, eval_tree_topk,
                                         impact_block_bounds, topk_select)
from lucene_spark.search.query import (BooleanQuery, MultiTermQuery,
                                       PhraseQuery, TermQuery)

T = [term_string(k) for k in range(30)]

N_DOCS = 20_000
VOCAB = [f"t{i}" for i in range(30)]


def _corpus(seed=7, skew_term=None):
    """Synthetic bucket: per-term posting blocks with positions."""
    rng = np.random.default_rng(seed)
    doc_lens = rng.integers(5, 60, N_DOCS)
    norms = np.asarray(int_to_byte4(doc_lens), dtype=np.uint8)
    chunks, stats = {}, {}
    for ti, t in enumerate(VOCAB):
        p = 0.5 / (ti + 1)
        docs = np.flatnonzero(rng.random(N_DOCS) < p).astype(np.int64)
        if docs.size == 0:
            continue
        if t == skew_term:
            docs = np.arange(N_DOCS, dtype=np.int64)  # dense
            tfs = np.where(docs < 1000, 50, 1).astype(np.int64)
        else:
            tfs = rng.integers(1, 5, docs.size).astype(np.int64)
        pos = [np.sort(rng.choice(200, size=min(tf, 200), replace=False))
               .astype(np.int64) for tf in tfs]
        tfs = np.array([len(x) for x in pos], dtype=np.int64)
        blocks = []
        for s in range(0, docs.size, 256):
            e = min(s + 256, docs.size)
            blocks.extend(codec.encode_chunk(
                docs[s:e], tfs[s:e], norms[docs[s:e]].astype(np.int64),
                [list(x) for x in pos[s:e]]))
        chunks[t] = blocks
        stats[t] = int(docs.size)
    return chunks, stats, norms, int(doc_lens.sum())


class _PhraseScorer(BM25Scorer):
    def __init__(self, idfs, doc_count, sum_ttf, boost=1.0):
        super().__init__(1, doc_count, sum_ttf)
        self.idf = sum_idf(idfs)
        self.weight = np.float32(np.float32(boost) * self.idf)


def _env(skew_term=None):
    chunks, stats, norms, sttf = _corpus(skew_term=skew_term)

    def fresh():
        tc = {t: TermChunk(b, [0.0] * len(b)) for t, b in chunks.items()}
        return lambda f, t: tc.get(t)

    def sc(t, boost=1.0):
        return BM25Scorer(stats[t], N_DOCS, sttf, boost=boost)

    def ph(ts, boost=1.0):
        idfs = [BM25Scorer(stats[t], N_DOCS, sttf).idf for t in ts]
        return _PhraseScorer(idfs, N_DOCS, sttf, boost)

    return chunks, stats, norms, sttf, fresh, sc, ph


def _rand_node(rng, sc, ph, stats, sttf, depth=0):
    kinds = (["term", "phrase", "synonym"] if depth >= 2 else
             ["term", "and", "or", "bool", "dismax", "phrase", "synonym",
              "const"])
    kind = rng.choice(kinds)
    R = lambda: _rand_node(rng, sc, ph, stats, sttf, depth + 1)
    if kind == "term":
        t = VOCAB[rng.integers(0, 20)]
        return ("term", "text", t, sc(t, boost=float(rng.choice([1.0, 2.0]))))
    if kind == "phrase":
        ts = [VOCAB[rng.integers(0, 10)] for _ in range(2)]
        if rng.random() < 0.4:
            # MultiPhraseQuery slot: one position carries alternatives;
            # scorer idf sums over ALL members (MultiPhraseWeight)
            alt = tuple(sorted({VOCAB[rng.integers(0, 10)]
                                for _ in range(2)}))
            slot_i = int(rng.integers(0, 2))
            slots = list(ts)
            slots[slot_i] = alt if len(alt) > 1 else alt[0]
            flat = [m for s in slots
                    for m in ((s,) if isinstance(s, str) else s)]
            return ("phrase", "text", slots, ph(flat),
                    int(rng.choice([0, 2])))
        return ("phrase", "text", ts, ph(ts), int(rng.choice([0, 2])))
    if kind == "synonym":
        ts = sorted({VOCAB[rng.integers(0, 15)] for _ in range(2)})
        return ("synonym", "text", ts,
                BM25Scorer(max(stats[t] for t in ts), N_DOCS, sttf))
    if kind == "and":
        return ("and", [R() for _ in range(2)])
    if kind == "or":
        return ("or", [R() for _ in range(2)])
    if kind == "dismax":
        return ("dismax", [R() for _ in range(2)],
                float(rng.choice([0.0, 0.3])))
    if kind == "const":
        return ("const", R(), 1.5)
    must = [R() for _ in range(rng.integers(0, 2))]
    should = [R() for _ in range(rng.integers(0, 3))]
    must_not = [R() for _ in range(rng.integers(0, 2))]
    if not must and not should:
        should = [R()]
    msm = int(rng.integers(0, len(should) + 1)) if should else 0
    return ("bool", must, should, must_not, [], msm)


def test_pruned_equals_exhaustive_randomized():
    chunks, stats, norms, sttf, fresh, sc, ph = _env()
    rng = np.random.default_rng(11)
    for _ in range(60):
        node = _rand_node(rng, sc, ph, stats, sttf)
        k = int(rng.choice([3, 10, 50]))
        g = fresh()
        de, se = eval_tree(node, g, lambda f: norms, 0)
        de, se = topk_select(de, se, k)
        dp, sp = eval_tree_topk(node, fresh(), lambda f: norms, 0, k)
        assert np.array_equal(de, dp), node
        assert np.array_equal(se, sp), node


def test_pruned_skips_decodes_on_skewed_head_term():
    # head-term nested query: a dense MUST term whose high-tf docs
    # concentrate in the first blocks (Zipf head / recency skew) + a
    # SHOULD term living in one region of the doc space (time-ordered
    # corpora) — θ rises after the first window batches and the long
    # uniform tail never decodes
    rng = np.random.default_rng(3)
    doc_lens = rng.integers(5, 60, N_DOCS)
    norms = np.asarray(int_to_byte4(doc_lens), dtype=np.uint8)
    sttf = int(doc_lens.sum())

    def enc(docs, tfs):
        blocks = []
        for s in range(0, docs.size, 256):
            e = min(s + 256, docs.size)
            pos = [list(range(int(t))) for t in tfs[s:e]]
            blocks.extend(codec.encode_chunk(
                docs[s:e], tfs[s:e], norms[docs[s:e]].astype(np.int64), pos))
        return blocks

    head_docs = np.arange(N_DOCS, dtype=np.int64)
    head_tfs = np.where(head_docs < 1000, 50, 1).astype(np.int64)
    loc_docs = np.sort(rng.choice(2000, size=600, replace=False)) \
        .astype(np.int64)
    loc_tfs = rng.integers(1, 4, loc_docs.size).astype(np.int64)
    chunks = {"head": enc(head_docs, head_tfs), "loc": enc(loc_docs, loc_tfs)}
    stats = {"head": int(head_docs.size), "loc": int(loc_docs.size)}

    def fresh():
        tc = {t: TermChunk(b, [0.0] * len(b)) for t, b in chunks.items()}
        return lambda f, t: tc.get(t)

    def sc(t):
        return BM25Scorer(stats[t], N_DOCS, sttf)

    node = ("bool", [("term", "text", "head", sc("head"))],
            [("term", "text", "loc", sc("loc"))], [], [], 0)
    DECODE_COUNTER[0] = 0
    de, se = eval_tree(node, fresh(), lambda f: norms, 0)
    de, se = topk_select(de, se, 10)
    exhaustive = DECODE_COUNTER[0]
    DECODE_COUNTER[0] = 0
    dp, sp = eval_tree_topk(node, fresh(), lambda f: norms, 0, 10)
    pruned = DECODE_COUNTER[0]
    assert pruned < exhaustive / 2, (pruned, exhaustive)
    # and still rank-identical
    assert np.array_equal(de, dp) and np.array_equal(se, sp)


def test_impact_block_bounds_matches_per_block_loop():
    chunks, stats, norms, sttf, fresh, sc, ph = _env()
    for t in ("t0", "t3", "t12"):
        blocks = chunks[t]
        scorer = sc(t)
        vec = impact_block_bounds(blocks, scorer)
        loop = [float(scorer.max_score_for_impacts(
            np.asarray(b["imp_freqs"]), np.asarray(b["imp_norms"])))
            for b in blocks]
        assert np.allclose(vec, np.asarray(loop, np.float32))


# ---- end-to-end searcher parity ---------------------------------------

NESTED = [
    BooleanQuery(must=(PhraseQuery((T[1], T[2])),),
                 should=(MultiTermQuery("prefix", T[4][:4]),)),
    BooleanQuery(must=(BooleanQuery(should=(T[0], T[2])),
                       BooleanQuery(should=(T[5], T[7])))),
    BooleanQuery(should=(PhraseQuery((T[1], T[2]), slop=2),
                         TermQuery(T[9], boost=2.0)),
                 must_not=(T[11],)),
]


@pytest.mark.parametrize("qi", range(len(NESTED)))
def test_search_df_nested_pruned_equals_exhaustive(spark, small_index, qi):
    s = IndexSearcher(spark, small_index)
    q = NESTED[qi]
    assert s.search(q, k=12, pruned=True) == s.search(q, k=12, pruned=False)


def test_search_after_nested_pruned_pages(spark, small_index):
    s = IndexSearcher(spark, small_index)
    q = NESTED[1]
    full = s.search(q, k=20, pruned=False)
    if len(full) < 12:
        pytest.skip("corpus too small for paging test")
    page1 = s.search(q, k=6)
    page2 = s.search_after(q, page1[-1], k=6)
    assert page1 + page2 == full[:12]


def test_search_batch_nested_pruned_equals_exhaustive(spark, small_index):
    s = IndexSearcher(spark, small_index)
    qs = {f"q{i}": q for i, q in enumerate(NESTED)}
    a = {(r["query_id"], r["doc_id"]): np.float32(r["score"])
         for r in s.search_batch(qs, k=10, pruned=True).collect()}
    b = {(r["query_id"], r["doc_id"]): np.float32(r["score"])
         for r in s.search_batch(qs, k=10, pruned=False).collect()}
    assert a == b and a
