"""Regression tests for the round-3 advisor findings (ADVICE.md r03):

1. (high) Sloppy-phrase window bounds in eval_tree_topk: slop>0 phrase
   freq can exceed any single member's tf (SloppyPhraseMatcher.maxFreq
   sums member freqs), so the per-window bound must SUM member bounds,
   not take their minimum — otherwise the pruned tree path can skip the
   window holding the true #1 doc.
2. (medium) Required-clause gating must use block COVERAGE, not
   bound > 0: under a zero-clamping similarity (LMDirichlet) a MUST
   term can match with score 0 inside a block whose impact bound is 0
   while SHOULD siblings score positively — the pruned path must still
   visit those windows.
3. (low) Prefix expansion upper bound must be pat + U+10FFFF, not
   pat + U+FFFF — supplementary-plane letters sort above '￿'.
4. (low) ivf_train seeds via a distributed TakeOrdered top-k, not an
   un-partitioned global Window; seeding semantics (n smallest
   md5(vec_id) rows, cid = md5 rank) are unchanged.
"""

import hashlib

import numpy as np
import pytest

from lucene_spark.kernels import codec
from lucene_spark.kernels.bm25 import (BM25Scorer, LMDirichletScorer,
                                       sum_idf)
from lucene_spark.kernels.smallfloat import int_to_byte4
from lucene_spark.search.kernels import (TermChunk, eval_tree,
                                         eval_tree_topk,
                                         impact_block_bounds, topk_select)

N_DOCS = 20_000


def _encode(docs, tfs, norms, pos):
    blocks = []
    for s in range(0, docs.size, 256):
        e = min(s + 256, docs.size)
        blocks.extend(codec.encode_chunk(
            docs[s:e], tfs[s:e], norms[docs[s:e]].astype(np.int64),
            [list(x) for x in pos[s:e]]))
    return blocks


class _PhraseScorer(BM25Scorer):
    def __init__(self, idfs, doc_count, sum_ttf, boost=1.0):
        super().__init__(1, doc_count, sum_ttf)
        self.idf = sum_idf(idfs)
        self.weight = np.float32(np.float32(boost) * self.idf)


# ---- 1. sloppy-phrase window bound --------------------------------------

def _sloppy_env():
    """Corpus engineered to reproduce the advisor's miss: a 'hero' doc
    in a late block whose sloppy freq (~2.45 via clustered repeated
    'a' positions around one 'b') exceeds every decoy's freq (2.0),
    while the hero's covering 'b' block has max tf 1 — so the OLD
    min-over-members bound understates the hero window below the theta
    set by the 10 decoys and the pruned path would skip it."""
    doc_lens = np.full(N_DOCS, 30, dtype=np.int64)
    norms = np.asarray(int_to_byte4(doc_lens), dtype=np.uint8)
    sttf = int(doc_lens.sum())
    hero = 18_000

    # term 'a': every doc at position 0; decoys add [100, 200]; hero
    # adds a clustered run 10..22 (repeated positions near the 'b')
    a_docs = np.arange(N_DOCS, dtype=np.int64)
    a_pos = [[0]] * N_DOCS
    for d in range(10):
        a_pos[d] = [0, 100, 200]
    a_pos[hero] = [0] + list(range(10, 23))
    a_tfs = np.array([len(p) for p in a_pos], dtype=np.int64)

    # term 'b': docs 0..399 (two 256-posting blocks) + hero. Decoys
    # (docs 0..9, block 1) carry tf=2 at [101, 201] -> sloppy freq 2.0
    # exactly; the rest sit at position 500 (outside any slop-6 window
    # of 'a') -> no match; hero lands in block 2 where max tf is 1.
    b_docs = np.concatenate([np.arange(400, dtype=np.int64),
                             np.array([hero], dtype=np.int64)])
    b_pos = [[101, 201] if d < 10 else [500] for d in range(400)] + [[16]]
    b_tfs = np.array([len(p) for p in b_pos], dtype=np.int64)

    chunks = {"a": _encode(a_docs, a_tfs, norms, a_pos),
              "b": _encode(b_docs, b_tfs, norms, b_pos)}

    def fresh():
        tc = {t: TermChunk(b, [0.0] * len(b)) for t, b in chunks.items()}
        return lambda f, t: tc.get(t)

    idfs = [BM25Scorer(int(a_docs.size), N_DOCS, sttf).idf,
            BM25Scorer(int(b_docs.size), N_DOCS, sttf).idf]
    ph = _PhraseScorer(idfs, N_DOCS, sttf)
    node = ("phrase", "text", ["a", "b"], ph, 6)
    return node, fresh, norms, chunks, ph, hero


def test_sloppy_phrase_pruned_equals_exhaustive():
    node, fresh, norms, chunks, ph, hero = _sloppy_env()
    k = 5
    de, se = eval_tree(node, fresh(), lambda f: norms, 0)
    de, se = topk_select(de, se, k)
    assert de[0] == hero  # the clustered-repeat doc is the true #1
    dp, sp = eval_tree_topk(node, fresh(), lambda f: norms, 0, k)
    assert np.array_equal(de, dp)
    assert np.array_equal(se, sp)


def test_sloppy_scenario_exercises_the_old_min_bound_bug():
    """Prove the fixture would have caught the bug: the hero's true
    score exceeds the OLD min-over-members bound of its window, and
    theta after the decoys exceeds that bound too — the old pruned
    path would have stopped before visiting the hero window."""
    node, fresh, norms, chunks, ph, hero = _sloppy_env()
    de, se = eval_tree(node, fresh(), lambda f: norms, 0)
    order = np.argsort(-se, kind="stable")
    hero_score = float(se[order[0]])
    theta5 = float(np.sort(se)[-5])
    # hero's covering 'b' block: the one whose range contains doc 18000
    b_chunk = TermChunk(chunks["b"], [0.0] * len(chunks["b"]))
    bb = impact_block_bounds(b_chunk.blocks, ph)
    i = int(np.searchsorted(b_chunk.lasts, hero, side="left"))
    assert b_chunk.firsts[i] <= hero <= b_chunk.lasts[i]
    old_min_bound = float(bb[i])  # min(member bounds) <= b's bound
    assert hero_score > old_min_bound  # bound understates the true max
    assert theta5 > old_min_bound      # ...and theta would prune it


def test_sloppy_bound_inside_nested_bool():
    """The advisor's exact shape: a BooleanQuery-style tree containing
    a slop-6 phrase, pruned == exhaustive across the batch boundary."""
    node, fresh, norms, chunks, ph, hero = _sloppy_env()
    doc_lens = np.full(N_DOCS, 30, dtype=np.int64)
    sttf = int(doc_lens.sum())
    a_sc = BM25Scorer(N_DOCS, N_DOCS, sttf)
    tree = ("bool", [node], [("term", "text", "a", a_sc)], [], [], 0)
    for k in (3, 5, 20):
        de, se = eval_tree(tree, fresh(), lambda f: norms, 0)
        de, se = topk_select(de, se, k)
        dp, sp = eval_tree_topk(tree, fresh(), lambda f: norms, 0, k)
        assert np.array_equal(de, dp)
        assert np.array_equal(se, sp)


# ---- 2. coverage gating under zero-clamping similarities ----------------

def test_zero_clamped_must_does_not_hide_should_scores():
    """MUST term scored by LMDirichlet clamps to 0 everywhere (common
    term, long docs); SHOULD term scores positively. The exhaustive
    tree returns positive totals; the pruned path must not zero those
    windows just because the must's impact bound is 0."""
    doc_lens = np.full(N_DOCS, 40, dtype=np.int64)
    norms = np.asarray(int_to_byte4(doc_lens), dtype=np.uint8)
    sttf = int(doc_lens.sum())

    common_docs = np.arange(N_DOCS, dtype=np.int64)
    common_tfs = np.ones(N_DOCS, dtype=np.int64)
    common_pos = [[0]] * N_DOCS
    rng = np.random.default_rng(5)
    rare_docs = np.sort(rng.choice(N_DOCS, size=300, replace=False)) \
        .astype(np.int64)
    rare_tfs = rng.integers(1, 4, rare_docs.size).astype(np.int64)
    rare_pos = [list(range(int(t))) for t in rare_tfs]

    chunks = {
        "common": _encode(common_docs, common_tfs, norms, common_pos),
        "rare": _encode(rare_docs, rare_tfs, norms, rare_pos)}

    def fresh():
        tc = {t: TermChunk(b, [0.0] * len(b)) for t, b in chunks.items()}
        return lambda f, t: tc.get(t)

    # ttf == sum_ttf makes p_col ~ 1 => log1p term ~ 5e-4, dominated by
    # the negative length term for dl=40 => every score clamps to 0
    lm = LMDirichletScorer(N_DOCS, N_DOCS, sttf, ttf=sttf)
    assert float(lm.score(np.array([3]), np.array([norms[0]]))[0]) == 0.0
    bm = BM25Scorer(int(rare_docs.size), N_DOCS, sttf)

    tree = ("bool", [("term", "text", "common", lm)],
            [("term", "text", "rare", bm)], [], [], 0)
    de, se = eval_tree(tree, fresh(), lambda f: norms, 0)
    assert (se > 0).sum() >= 300  # shoulds contribute through the must
    de, se = topk_select(de, se, 10)
    dp, sp = eval_tree_topk(tree, fresh(), lambda f: norms, 0, 10)
    assert np.array_equal(de, dp)
    assert np.array_equal(se, sp)
    assert sp.size == 10 and (sp > 0).all()


def test_zero_clamped_filter_and_const_coverage():
    """Same clamp through FILTER and const gating: a filter child with
    bound 0 must gate on coverage, not on bound."""
    doc_lens = np.full(N_DOCS, 40, dtype=np.int64)
    norms = np.asarray(int_to_byte4(doc_lens), dtype=np.uint8)
    sttf = int(doc_lens.sum())
    common_docs = np.arange(N_DOCS, dtype=np.int64)
    chunks = {
        "common": _encode(common_docs, np.ones(N_DOCS, np.int64), norms,
                          [[0]] * N_DOCS),
        "rare": _encode(np.arange(0, N_DOCS, 37, dtype=np.int64),
                        np.ones((N_DOCS + 36) // 37, np.int64), norms,
                        [[1]] * ((N_DOCS + 36) // 37))}

    def fresh():
        tc = {t: TermChunk(b, [0.0] * len(b)) for t, b in chunks.items()}
        return lambda f, t: tc.get(t)

    lm = LMDirichletScorer(N_DOCS, N_DOCS, sttf, ttf=sttf)
    bm = BM25Scorer((N_DOCS + 36) // 37, N_DOCS, sttf)
    filt = ("bool", [], [("term", "text", "rare", bm)],
            [], [("term", "text", "common", lm)], 0)
    cst = ("const", ("term", "text", "common", lm), 1.5)
    for tree in (filt, cst):
        de, se = eval_tree(tree, fresh(), lambda f: norms, 0)
        de, se = topk_select(de, se, 10)
        dp, sp = eval_tree_topk(tree, fresh(), lambda f: norms, 0, 10)
        assert np.array_equal(de, dp), tree[0]
        assert np.array_equal(se, sp), tree[0]


# ---- 3. prefix expansion above U+FFFF ------------------------------------

def test_prefix_expansion_supplementary_plane(spark, tmp_path_factory):
    from lucene_spark.index import build_index
    from lucene_spark.search import IndexSearcher
    from lucene_spark.search.query import MultiTermQuery

    sup = "zqx\U0001d4b6bc"  # MATHEMATICAL SCRIPT SMALL A: sorts > U+FFFF
    rows = [("c0", 0, "user", f"zqx zqxtail {sup}", "none"),
            ("c0", 1, "assistant", "zqx plain follow", "none")]
    src = (spark.createDataFrame(rows,
                                 "conv_id string, turn_idx int, "
                                 "role string, text string, tool string")
           .selectExpr("conv_id", "turn_idx", "role", "text", "tool",
                       "timestamp('2026-01-01') as ts"))
    out = str(tmp_path_factory.mktemp("sup") / "idx")
    build_index(spark, src, out, num_buckets=2)
    s = IndexSearcher(spark, out)
    got = s.expand_terms(MultiTermQuery("prefix", "zqx"))
    assert sup in got, got
    assert set(got) == {"zqx", "zqxtail", sup}


# ---- 4. ivf_train seeding -------------------------------------------------

def test_ivf_train_seeding_semantics_and_no_global_window(spark):
    from pyspark.sql import functions as F

    from lucene_spark.ops import similarity as SIM
    emb = (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
           .limit(200).cache())
    pdf = emb.toPandas()
    want_ids = sorted(
        pdf["vec_id"],
        key=lambda i: hashlib.md5(str(i).encode()).hexdigest())[:4]
    by_id = {r.vec_id: [float(x) for x in r.embedding]
             for r in pdf.itertuples()}
    cents = SIM.ivf_train(emb, n_centroids=4, iters=0)
    got = {r["cid"]: r["centroid"] for r in cents.collect()}
    assert set(got) == {1, 2, 3, 4}
    for rank, vid in enumerate(want_ids, start=1):
        assert got[rank] == pytest.approx(by_id[vid])
    # trained centroids stay deterministic (seed path changed)
    a = {r["cid"]: r["centroid"]
         for r in SIM.ivf_train(emb, n_centroids=4, iters=1).collect()}
    b = {r["cid"]: r["centroid"]
         for r in SIM.ivf_train(emb, n_centroids=4, iters=1).collect()}
    assert a == b
    emb.unpersist()
