"""Per-bucket scoring kernels — the numpy heart of query execution.

A *bucket* is the Spark analog of a Lucene leaf/segment: a contiguous
global doc_id range with its own posting chunks and packed norms. These
kernels run inside Arrow-batched applyInPandas tasks, one call per
(query, bucket), and return the bucket-local top-k, which Spark's native
ORDER BY ... LIMIT merges globally (TopDocs.merge analog,
core:search/TopDocs.java:203-230).

Two execution modes, equal by construction and by test (CheckHits-style,
tests/search/CheckHits.java:181):

- exhaustive: decode every block, score every posting (the oracle path);
- pruned: block-max pruning — per-block BM25 upper bounds (from the
  competitive impact skylines, materialized at merge) let us skip
  decoding blocks that cannot beat the running k-th score, implementing
  the capability of ImpactsDISI (core:search/ImpactsDISI.java:28-123),
  block-max WAND for disjunctions (core:search/WANDScorer.java:31-213)
  and BlockMaxConjunction (core:search/BooleanScorerSupplier.java:398-418)
  at 256-doc block granularity.

Pruning is always bucket-local (threshold θ from the local heap), which
is provably rank-safe; a cross-bucket θ estimate can only tighten it.
"""

from __future__ import annotations

import numpy as np

from ..kernels import codec
from ..kernels.bm25 import BM25Scorer

__all__ = ["TermChunk", "topk_select", "term_topk", "and_topk", "or_topk",
           "phrase_topk", "phrase_freqs", "sloppy_freqs", "min_span_freqs",
           "synonym_topk", "dismax_topk", "boolean_topk", "score_bucket",
           "eval_tree", "eval_tree_topk", "impact_block_bounds"]

# decoded-blocks counter (diagnostics/tests): incremented on every
# posting-block decode cache miss, so pruning wins are measurable
# (pruned runs must decode strictly fewer blocks than exhaustive ones)
DECODE_COUNTER = [0]


def impact_block_bounds(blocks, scorer) -> np.ndarray:
    """Per-block score upper bounds from the stored (freq, norm) impact
    skylines under ``scorer`` — ONE vectorized score call over the
    concatenated skylines + a segmented max, instead of a per-block
    Python loop (the vectorized MaxScoreCache recompute,
    core:search/MaxScoreCache.java:19-159)."""
    n = len(blocks)
    if n == 0:
        return np.zeros(0, np.float32)
    lens = np.fromiter((len(b["imp_freqs"]) for b in blocks),
                       dtype=np.int64, count=n)
    total = int(lens.sum())
    out = np.zeros(n, dtype=np.float32)
    if total == 0:
        return out
    freqs = np.concatenate([np.asarray(b["imp_freqs"], dtype=np.int64)
                            for b in blocks])
    norms = np.concatenate([np.asarray(b["imp_norms"], dtype=np.int64)
                            for b in blocks])
    s = scorer.score(freqs, norms).astype(np.float32)
    starts = np.cumsum(lens) - lens
    nz = lens > 0
    # zero-length segments have start == end == the next segment's
    # start, so reduceat over the nonzero starts spans each nonzero
    # segment exactly
    out[nz] = np.maximum.reduceat(s, starts[nz])
    return out


class TermChunk:
    """One term's postings within one bucket: lazy block decode + cache."""

    def __init__(self, blocks, block_max_scores):
        self.blocks = list(blocks)
        self.block_max = np.asarray(block_max_scores, dtype=np.float32)
        self.firsts = np.array([b["first_doc"] for b in self.blocks], dtype=np.int64)
        self.lasts = np.array([b["last_doc"] for b in self.blocks], dtype=np.int64)
        self._decoded = {}
        self._positions = {}

    def n_blocks(self):
        return len(self.blocks)

    def rebound(self, block_max_scores):
        """View of this chunk with different block-max bounds (query-time
        recompute from impacts, MaxScoreCache analog) sharing the decode
        caches — used when baked BM25 floats are not valid upper bounds
        (NRT-dirty stats, non-BM25 similarity, boosted query)."""
        c = TermChunk.__new__(TermChunk)
        c.blocks = self.blocks
        c.block_max = np.asarray(block_max_scores, dtype=np.float32)
        c.firsts, c.lasts = self.firsts, self.lasts
        c._decoded, c._positions = self._decoded, self._positions
        return c

    def recompute_bounds(self, scorer):
        """Per-block upper bounds from the stored (freq, norm) impact
        skylines under the given scorer (vectorized across blocks)."""
        return impact_block_bounds(self.blocks, scorer).tolist()

    def decode(self, i):
        d = self._decoded.get(i)
        if d is None:
            DECODE_COUNTER[0] += 1
            d = self._decoded[i] = codec.decode_block_docs_tfs(self.blocks[i])
        return d

    def positions(self, i):
        p = self._positions.get(i)
        if p is None:
            p = self._positions[i] = codec.decode_block_positions(self.blocks[i])
        return p

    def positions_flat(self, i):
        """(flat absolute positions, tfs) for block i — the vectorized
        position path (no per-doc Python)."""
        if not hasattr(self, "_pos_flat"):
            self._pos_flat = {}
        p = self._pos_flat.get(i)
        if p is None:
            p = self._pos_flat[i] = codec.decode_block_positions_flat(
                self.blocks[i])
        return p

    def decode_all(self):
        parts = [self.decode(i) for i in range(len(self.blocks))]
        if not parts:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        return (np.concatenate([p[0] for p in parts]),
                np.concatenate([p[1] for p in parts]))

    def blocks_overlapping(self, lo, hi):
        """Indices of blocks whose [first,last] intersects [lo, hi]."""
        i0 = int(np.searchsorted(self.lasts, lo, side="left"))
        i1 = int(np.searchsorted(self.firsts, hi, side="right"))
        return range(i0, i1)

    def tf_at(self, doc_ids):
        """tf for given sorted candidate docs; 0 where absent."""
        docs, tfs = self.decode_all()
        out = np.zeros(len(doc_ids), dtype=np.int64)
        if docs.size == 0:
            return out
        idx = np.searchsorted(docs, doc_ids)
        idx_c = np.minimum(idx, docs.size - 1)
        hit = docs[idx_c] == doc_ids
        out[hit] = tfs[idx_c[hit]]
        return out


def topk_select(doc_ids, scores, k):
    """Top-k by (score desc, doc_id asc) — the reference tie-break
    (core:search/TopScoreDocCollector.java:26, DocScoreEncoder.java:23-31)."""
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    scores = np.asarray(scores, dtype=np.float32)
    if doc_ids.size == 0:
        return doc_ids, scores
    order = np.lexsort((doc_ids, -scores))[:k]
    return doc_ids[order], scores[order]


def _norms_at(norms_arr, base_doc, doc_ids):
    return norms_arr[np.asarray(doc_ids, dtype=np.int64) - base_doc]


def term_topk(chunk: TermChunk, scorer: BM25Scorer, norms_arr, base_doc,
              k, pruned=True, theta0=-np.inf):
    """Single-term top-k. Pruned mode visits blocks in descending
    block-max order and stops at the first block whose upper bound can't
    beat the running k-th score (ImpactsDISI capability). theta0 is an
    optional GLOBAL minimum-competitive score (cross-partition
    MaxScoreAccumulator analog): blocks bounded below it can be skipped
    even before k local hits, because such docs cannot enter the global
    top-k."""
    if chunk is None:
        return np.zeros(0, np.int64), np.zeros(0, np.float32)
    if not pruned:
        docs, tfs = chunk.decode_all()
        scores = scorer.score(tfs, _norms_at(norms_arr, base_doc, docs))
        return topk_select(docs, scores, k)
    order = np.argsort(-chunk.block_max, kind="stable")
    all_docs, all_scores = [], []
    count = 0
    theta = theta0
    for bi in order:
        if chunk.block_max[bi] < theta and (count >= k
                                            or chunk.block_max[bi] < theta0):
            break
        docs, tfs = chunk.decode(int(bi))
        scores = scorer.score(tfs, _norms_at(norms_arr, base_doc, docs))
        all_docs.append(docs)
        all_scores.append(scores)
        count += docs.size
        if count >= k:
            merged = np.concatenate(all_scores)
            if merged.size >= k:
                theta = max(theta0, np.partition(merged, -k)[-k])
    if not all_docs:
        return np.zeros(0, np.int64), np.zeros(0, np.float32)
    return topk_select(np.concatenate(all_docs), np.concatenate(all_scores), k)


def _conj_candidates(chunks, pruned):
    """Docs present in ALL chunks. Pruned mode first intersects block
    ranges so non-overlapping blocks are never decoded
    (BlockMaxConjunction capability).

    Dense clauses take a counting-array pass over the intersected doc
    span instead of repeated sorted-set intersections — the
    DenseConjunctionBulkScorer capability
    (core:search/DenseConjunctionBulkScorer.java): O(postings + span)
    with no log factors, chosen when the clauses average >= 1 posting
    per doc slot of the span."""
    if any(c is None or c.n_blocks() == 0 for c in chunks):
        return np.zeros(0, np.int64)
    lo = max(int(c.firsts[0]) for c in chunks)
    hi = min(int(c.lasts[-1]) for c in chunks)
    if hi < lo:
        return np.zeros(0, np.int64)
    span = hi - lo + 1
    total = sum(sum(b["num_docs"] for b in c.blocks) for c in chunks)
    if total >= span and len(chunks) < 255:
        m = len(chunks)
        counts = np.zeros(span, dtype=np.uint8)
        for c in chunks:
            docs = c.decode_all()[0]
            sel = docs[(docs >= lo) & (docs <= hi)]
            counts[sel - lo] += 1
        return (lo + np.flatnonzero(counts == m)).astype(np.int64)
    order = sorted(chunks, key=lambda c: sum(b["num_docs"] for b in c.blocks))
    if not pruned:
        cand = order[0].decode_all()[0]
        for c in order[1:]:
            cand = cand[np.isin(cand, c.decode_all()[0], assume_unique=True)]
            if cand.size == 0:
                return cand
        return cand
    # leader = sparsest chunk (fewest postings) — the reference orders
    # conjunctions by ascending cost too (ConjunctionDISI leader choice)
    lead = order[0]
    cand_parts = []
    for bi in range(lead.n_blocks()):
        lo, hi = int(lead.firsts[bi]), int(lead.lasts[bi])
        ok = True
        for c in order[1:]:
            if len(c.blocks_overlapping(lo, hi)) == 0:
                ok = False
                break
        if ok:
            cand_parts.append(lead.decode(bi)[0])
    if not cand_parts:
        return np.zeros(0, np.int64)
    cand = np.concatenate(cand_parts)
    if cand.size == 0:
        return cand
    for c in order[1:]:
        # decode only blocks overlapping the candidate span
        keep_docs = []
        for bi in c.blocks_overlapping(int(cand[0]), int(cand[-1])):
            keep_docs.append(c.decode(bi)[0])
        other = np.concatenate(keep_docs) if keep_docs else np.zeros(0, np.int64)
        cand = cand[np.isin(cand, other, assume_unique=True)]
        if cand.size == 0:
            break
    return cand


def and_topk(chunks, scorers, norms_arr, base_doc, k, pruned=True):
    """Conjunction: docs matching every term, score = Σ term scores
    (BooleanQuery all-MUST; sort-merge intersection ≙ join on doc_id)."""
    cand = _conj_candidates(chunks, pruned)
    if cand.size == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.float32)
    norms = _norms_at(norms_arr, base_doc, cand)
    # per-term float32 scores summed in double, cast to float at the end —
    # exactly ConjunctionScorer.score() (double sum, :57-62)
    total = np.zeros(cand.size, dtype=np.float64)
    for c, sc in zip(chunks, scorers):
        total += sc.score(c.tf_at(cand), norms).astype(np.float64)
    return topk_select(cand, total.astype(np.float32), k)


def or_topk(chunks, scorers, norms_arr, base_doc, k, pruned=True,
            theta0=-np.inf):
    """Disjunction: score = Σ over matching terms (DisjunctionSumScorer).

    Pruned mode is block-max WAND at window granularity: window
    boundaries are the union of all block edges, so within a window each
    term has exactly 0 or 1 covering block; the window upper bound is the
    sum of covering blocks' max scores; windows are processed in
    descending bound order and processing stops once the bound falls
    below the running k-th score (WANDScorer.java:31-213 capability).

    Within a surviving window, terms are split into ESSENTIAL and
    NON-ESSENTIAL lists once θ is live (MaxScoreBulkScorer.java:26-110):
    the maximal ascending-bound suffix whose float32 bound sum is < θ
    is non-essential — a doc matching only those terms cannot reach θ,
    so candidates come from essential blocks only; non-essential blocks
    are decoded lazily, best-bound first, with candidates re-filtered
    against (partial + remaining bounds) after each, so weak windows
    skip low-bound block decodes entirely. Float discipline: exclusion
    only when float32(cap) < θ — float32 rounding of a true sum can
    never exceed float32 of its upper bound, so ties at θ survive and
    ranking stays identical to the exhaustive path.
    """
    live = [(c, s) for c, s in zip(chunks, scorers) if c is not None and c.n_blocks()]
    if not live:
        return np.zeros(0, np.int64), np.zeros(0, np.float32)
    if not pruned:
        parts_d, parts_s = [], []
        for c, s in live:
            docs, tfs = c.decode_all()
            parts_d.append(docs)
            parts_s.append(s.score(tfs, _norms_at(norms_arr, base_doc, docs)))
        alld = np.concatenate(parts_d)
        udocs, inv = np.unique(alld, return_inverse=True)
        # per-doc sum of float32 sub-scores in double, cast to float —
        # DisjunctionSumScorer.score() (double sum, :40-46)
        sums = np.zeros(udocs.size, dtype=np.float64)
        np.add.at(sums, inv, np.concatenate(parts_s).astype(np.float64))
        return topk_select(udocs, sums.astype(np.float32), k)
    # --- WAND ---
    floor = _score_floor(s for _, s in live)
    negative = floor == -np.inf
    edges = np.unique(np.concatenate(
        [c.firsts for c, _ in live] + [c.lasts + 1 for c, _ in live]))
    windows = list(zip(edges[:-1], edges[1:]))  # [lo, hi)
    # covering block index per (term, window): -1 if none
    ub = np.zeros(len(windows), dtype=np.float64)
    cover = np.full((len(live), len(windows)), -1, dtype=np.int64)
    w_lo = edges[:-1]
    if negative:
        # sum-of-maxima is NOT an upper bound when per-term maxima can
        # be negative (matching FEWER terms scores higher): the best
        # achievable disjunction sum is Σ max(bm, 0) over covering
        # terms, or — when every covering max is negative — the single
        # largest max (a match must include at least one term)
        possum = np.zeros(len(windows), dtype=np.float64)
        maxbm = np.full(len(windows), -np.inf, dtype=np.float64)
    for ti, (c, _) in enumerate(live):
        idx = np.searchsorted(c.lasts, w_lo, side="left")
        idx_c = np.minimum(idx, c.n_blocks() - 1)
        covers = (c.firsts[idx_c] <= w_lo) & (c.lasts[idx_c] >= w_lo)
        cover[ti, covers] = idx_c[covers]
        bm = c.block_max[idx_c[covers]]
        ub[covers] += bm
        if negative:
            possum[covers] += np.maximum(bm, 0.0)
            maxbm[covers] = np.maximum(maxbm[covers], bm)
    if negative:
        ub = np.where(possum > 0.0, possum, maxbm)
    worder = np.argsort(-ub, kind="stable")
    # accumulate candidate scores doc->float32 (dict of arrays per window)
    got_d, got_s = [], []
    count = 0
    theta = theta0
    for wi in worder:
        if ub[wi] <= floor:
            break
        if ub[wi] < theta and (count >= k or ub[wi] < theta0):
            break
        lo, hi = windows[wi]
        cov_t = np.flatnonzero(cover[:, wi] >= 0)
        t_bounds = np.array(
            [float(live[ti][0].block_max[cover[ti, wi]]) for ti in cov_t],
            dtype=np.float64)
        order_t = np.argsort(-t_bounds, kind="stable")
        ess_n = cov_t.size
        # θ is the running local k-th (rank-safe) or the global θ₀
        # (docs below it cannot enter the global top-k either).
        # The essential/non-essential split's remainder arithmetic
        # assumes non-negative sub-scores — skip it for negative-score
        # similarities (window-level pruning above stays exact)
        th32 = (np.float32(theta)
                if np.isfinite(theta) and not negative else None)
        if th32 is not None and cov_t.size > 1:
            sorted_b = t_bounds[order_t]
            suffix = np.cumsum(sorted_b[::-1])[::-1]
            droppable = np.flatnonzero(suffix.astype(np.float32) < th32)
            if droppable.size:
                ess_n = max(int(droppable[0]), 1)
        parts_d, parts_s = [], []
        for i in range(ess_n):
            ti = int(cov_t[order_t[i]])
            c, s = live[ti]
            docs, tfs = c.decode(int(cover[ti, wi]))
            m0 = np.searchsorted(docs, lo, side="left")
            m1 = np.searchsorted(docs, hi, side="left")
            if m1 > m0:
                d = docs[m0:m1]
                parts_d.append(d)
                parts_s.append(s.score(tfs[m0:m1],
                                       _norms_at(norms_arr, base_doc, d)))
        if not parts_d:
            continue
        alld = np.concatenate(parts_d)
        udocs, inv = np.unique(alld, return_inverse=True)
        sums = np.zeros(udocs.size, dtype=np.float64)
        np.add.at(sums, inv, np.concatenate(parts_s).astype(np.float64))
        if ess_n < cov_t.size:
            rem = float(t_bounds[order_t[ess_n:]].sum())
            keepm = (sums + rem).astype(np.float32) >= th32
            udocs, sums = udocs[keepm], sums[keepm]
            for i in range(ess_n, cov_t.size):
                if udocs.size == 0:
                    break
                ti = int(cov_t[order_t[i]])
                c, s = live[ti]
                docs, tfs = c.decode(int(cover[ti, wi]))
                idx = np.searchsorted(docs, udocs)
                idx_c = np.minimum(idx, docs.size - 1)
                hit = docs[idx_c] == udocs
                if hit.any():
                    sc = s.score(tfs[idx_c[hit]],
                                 _norms_at(norms_arr, base_doc, udocs[hit]))
                    sums[hit] += sc.astype(np.float64)
                rem -= float(t_bounds[order_t[i]])
                keepm = (sums + rem).astype(np.float32) >= th32
                udocs, sums = udocs[keepm], sums[keepm]
            if udocs.size == 0:
                continue
        got_d.append(udocs)
        got_s.append(sums.astype(np.float32))
        count += udocs.size
        if count >= k:
            merged = np.concatenate(got_s)
            if merged.size >= k:
                theta = max(theta0, np.partition(merged, -k)[-k])
    if not got_d:
        return np.zeros(0, np.int64), np.zeros(0, np.float32)
    return topk_select(np.concatenate(got_d), np.concatenate(got_s), k)


# Doc-key offset for concatenated position arrays: positions < 2^32 by
# construction (doc length <= maxPosition), candidate ranks < 2^31, so
# key*OFF + pos is collision-free in int64 and keeps per-doc segments
# disjoint AND ordered — one global numpy pass replaces per-candidate
# Python loops (the SURVEY §7.3(5) "no per-row Python" discipline).
POS_OFF = np.int64(1) << 32


def _inner_chunk(chunk):
    """Unwrap MaskedChunk/RangeChunk layers — positions of a surviving
    candidate doc are identical in the raw chunk, so position gathering
    can use the cached raw block decode."""
    while isinstance(chunk, (MaskedChunk, RangeChunk)):
        chunk = chunk.inner
    return chunk


def _positions_for_docs(chunk, cand):
    """Positions of every candidate doc in one concatenated, sorted,
    doc-keyed int64 array: value = cand_rank * POS_OFF + position.

    cand must be sorted asc and a subset of the chunk's docs (the
    conjunction candidates). Fully vectorized: one segment-gather per
    touched block (repeat/arange indexing), no per-doc Python."""
    raw = _inner_chunk(chunk)
    cand = np.asarray(cand, dtype=np.int64)
    ranks = np.arange(cand.size, dtype=np.int64)
    bidx = np.searchsorted(raw.lasts, cand, side="left")
    parts = []
    for bi in np.unique(bidx):
        docs, _ = raw.decode(int(bi))
        flat, tfs = raw.positions_flat(int(bi))
        in_block = bidx == bi
        cdocs = cand[in_block]
        j = np.searchsorted(docs, cdocs)
        ends = np.cumsum(tfs)
        starts = ends - tfs
        seg_starts, seg_lens = starts[j], tfs[j]
        total = int(seg_lens.sum())
        if total == 0:
            continue
        head = np.repeat(seg_starts, seg_lens)
        local = (np.arange(total, dtype=np.int64)
                 - np.repeat(np.cumsum(seg_lens) - seg_lens, seg_lens))
        pos = flat[head + local]
        keys = np.repeat(ranks[in_block], seg_lens)
        parts.append(pos + keys * POS_OFF)
    if not parts:
        return np.zeros(0, dtype=np.int64)
    return np.concatenate(parts)  # ascending by construction


def phrase_freqs(chunks, pruned=True, slop=0):
    """Docs containing the phrase + per-doc occurrence count.

    slop == 0: exact phrase — conjunction candidates, then
    consecutive-position verification by intersecting shifted,
    doc-keyed position arrays in ONE pass over all candidates
    (ExactPhraseMatcher.java:37, vectorized across docs).

    slop > 0: ORDERED sloppy interval — an occurrence is an in-order
    chain of positions built greedily (each term takes its smallest
    position after the previous term) whose stretch
    ``last - first - (m-1)`` is <= slop; freq = number of start
    positions admitting such a chain. This is the ordered interval
    operator (Intervals.ordered/maxwidth family); the reference's
    reorderable SloppyPhraseMatcher semantics live in sloppy_freqs.

    Returns (doc_ids, freqs) with freqs > 0 only.
    """
    cand = _conj_candidates(chunks, pruned)
    if cand.size == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    m = len(chunks)
    plists = [_positions_for_docs(c, cand) for c in chunks]
    if slop == 0:
        cur = plists[0]
        for off, pk in enumerate(plists[1:], 1):
            cur = np.intersect1d(cur, pk - off, assume_unique=True)
            if cur.size == 0:
                break
        freqs = np.bincount((cur >> 32).astype(np.int64),
                            minlength=cand.size) if cur.size else \
            np.zeros(cand.size, dtype=np.int64)
    else:
        starts = plists[0]
        chain = starts
        ok = np.ones(starts.size, dtype=bool)
        for pk in plists[1:]:
            idx = np.searchsorted(pk, chain, side="right")
            ok &= idx < pk.size
            nxt = pk[np.minimum(idx, pk.size - 1)]
            ok &= (nxt >> 32) == (chain >> 32)  # chain stays in-doc
            chain = nxt
        stretch = (chain - starts) - (m - 1)
        valid = ok & (stretch <= slop)
        freqs = np.bincount((starts[valid] >> 32).astype(np.int64),
                            minlength=cand.size)
    hit = freqs > 0
    return cand[hit], freqs[hit]


def sloppy_freqs(chunks, slop, pruned=True):
    """TRUE sloppy-phrase matching (SloppyPhraseMatcher semantics,
    core/src/java/org/apache/lucene/search/SloppyPhraseMatcher.java):
    terms may appear in ANY order within the window; each match found
    by the min-pointer sweep over offset-adjusted positions contributes
    ``1 / (1 + matchLength)`` to a FLOAT freq (sloppyWeight,
    matchLength = window stretch after subtracting phrase offsets).

    The sweep: adjusted position lists (pos - phrase_offset) per term;
    repeatedly emit when max-min <= slop, then advance the minimum
    pointer (ties: lowest term index); stop when a list is exhausted.

    m == 2 is evaluated for ALL candidate docs at once via the
    merge-path characterization of the sweep's visited pairs
    ((i, j) visited iff A[i-1] <= B[j] and B[j-1] < A[i]). m > 2 is
    ALSO fully vectorized via the global-sort characterization of the
    pq sweep: minima are popped in ascending (value, term-index) order,
    so the sweep's t-th state pins each list's pointer at its first
    element with sort rank >= t — one reverse min-accumulate per term
    recovers every state's pointed values, and states are valid while
    every list still holds an in-doc element.

    KNOWN DEVIATION (documented; the oracle replicates the same sweep,
    so the gate is internally consistent): phrases with REPEATED terms
    (e.g. phrase ('a','a')) may count a match where two phrase
    positions land on the same token after offset adjustment — the
    reference's SloppyPhraseMatcher carries extra repeat-collision
    bookkeeping (hasRepeats/advanceRepeats) that we do not implement.
    Distinct-term phrases (the overwhelmingly common shape) match the
    reference exactly.

    Returns (doc_ids, float32 freqs) with freqs > 0 only.
    """
    cand = _conj_candidates(chunks, pruned)
    if cand.size == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.float32)
    m = len(chunks)
    # offset-adjusted positions, shifted up by +m so every adjusted
    # value stays STRICTLY above its doc's key base (key*OFF): position
    # 0 of term with offset off maps to key*OFF + m - off >= key*OFF+1,
    # keeping `>> 32` a valid doc-key extraction after adjustment
    plists = [_positions_for_docs(c, cand) + (m - off)
              for off, c in enumerate(chunks)]
    freqs64 = np.zeros(cand.size, dtype=np.float64)
    if m == 2:
        A, B = plists
        # per-element previous value WITHIN the same doc (doc start ->
        # sentinel below every in-doc value but above the previous doc)
        def prev_in_doc(x):
            p = np.empty_like(x)
            p[1:] = x[:-1]
            doc_start = np.empty(x.size, dtype=bool)
            doc_start[0] = True
            doc_start[1:] = (x[1:] >> 32) != (x[:-1] >> 32)
            p[doc_start] = (x[doc_start] >> 32) * POS_OFF
            return p
        Aprev = prev_in_doc(A)
        lo = np.searchsorted(B, Aprev, side="left")
        hi = np.minimum(np.searchsorted(B, A, side="left"), B.size - 1)
        counts = np.maximum(hi - lo + 1, 0)
        total = int(counts.sum())
        if total:
            i_idx = np.repeat(np.arange(A.size), counts)
            j_idx = (np.repeat(lo, counts)
                     + np.arange(total, dtype=np.int64)
                     - np.repeat(np.cumsum(counts) - counts, counts))
            d = np.abs(A[i_idx] - B[j_idx])
            emit = d <= slop  # cross-doc pairs have d >= POS_OFF/2
            w = 1.0 / (1.0 + d[emit].astype(np.float64))
            np.add.at(freqs64, (A[i_idx[emit]] >> 32).astype(np.int64), w)
    else:
        # global-sort sweep: state t's min is the t-th element of the
        # (value, term-index)-sorted union; each list's pointed value is
        # its first element at sort rank >= t (reverse min-accumulate —
        # values ascend, so the future minimum IS the next element)
        vals_all = np.concatenate(plists)
        tags = np.concatenate([np.full(p.size, i, dtype=np.int64)
                               for i, p in enumerate(plists)])
        order = np.lexsort((tags, vals_all))
        v, g = vals_all[order], tags[order]
        INF = np.iinfo(np.int64).max
        maxv = v.copy()
        valid = np.ones(v.size, dtype=bool)
        vdoc = v >> 32
        for j in range(m):
            w = np.where(g == j, v, INF)
            nxt = np.minimum.accumulate(w[::-1])[::-1]
            valid &= (nxt != INF) & ((nxt >> 32) == vdoc)
            maxv = np.maximum(maxv, np.where(nxt == INF, v, nxt))
        d = maxv - v
        emit = valid & (d <= slop)
        w = 1.0 / (1.0 + d[emit].astype(np.float64))
        np.add.at(freqs64, vdoc[emit].astype(np.int64), w)
    hit = freqs64 > 0
    return cand[hit], freqs64[hit].astype(np.float32)


def min_span_freqs(chunks, pruned=True):
    """Unordered interval matching (queries/intervals Intervals.unordered
    analog): for docs containing ALL terms, the minimal window span =
    max(pos) - min(pos) - (m-1) over one occurrence of each term.
    Returns (doc_ids, min_spans) for all conjunction candidates.

    Vectorized minimal-window sweep: merge ALL candidate docs' positions
    into one doc-keyed event array; for each event (window end), the
    window start is the minimum over per-term last-occurrence
    (forward-fill via one maximum.accumulate per term); per-doc minima
    by one np.minimum.at. Events whose min-last leaks from a previous
    doc have a different doc key and are discarded — no per-doc loop.
    """
    cand = _conj_candidates(chunks, pruned)
    if cand.size == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    m = len(chunks)
    plists = [_positions_for_docs(c, cand) for c in chunks]
    allpos = np.concatenate(plists)
    tags = np.concatenate([np.full(p.size, i, dtype=np.int64)
                           for i, p in enumerate(plists)])
    order = np.argsort(allpos, kind="stable")
    ap, at = allpos[order], tags[order]
    minlast = np.full(ap.size, np.iinfo(np.int64).max, dtype=np.int64)
    for i in range(m):
        v = np.where(at == i, ap, np.int64(-1))
        minlast = np.minimum(minlast, np.maximum.accumulate(v))
    valid = (minlast >= 0) & ((minlast >> 32) == (ap >> 32))
    span = ap - minlast - (m - 1)
    sp = np.where(valid, span, np.iinfo(np.int64).max)
    spans = np.full(cand.size, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(spans, (ap >> 32).astype(np.int64), sp)
    return cand, spans


def phrase_topk(chunks, phrase_scorer, norms_arr, base_doc, k, pruned=True,
                slop=0):
    """Phrase top-k (PhraseQuery.java:71-143): slop == 0 is the exact
    matcher (integer freq); slop > 0 is TRUE sloppy-phrase semantics —
    reorderable within slop, float freq weighted 1/(1+matchLength)
    (SloppyPhraseMatcher, see sloppy_freqs). Weight = Σ term idf."""
    if slop > 0:
        cand, freqs = sloppy_freqs(chunks, slop, pruned)
    else:
        cand, freqs = phrase_freqs(chunks, pruned, 0)
    if cand.size == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.float32)
    scores = phrase_scorer.score(freqs, _norms_at(norms_arr, base_doc, cand))
    return topk_select(cand, scores, k)


def _union_tfs(chunks):
    """Union of docs over chunks with per-chunk tf aligned; returns
    (udocs, tf_matrix[len(chunks), n]) with 0 where absent."""
    live = [(i, c) for i, c in enumerate(chunks) if c is not None and c.n_blocks()]
    if not live:
        return np.zeros(0, np.int64), np.zeros((len(chunks), 0), np.int64)
    udocs = np.unique(np.concatenate([c.decode_all()[0] for _, c in live]))
    tfm = np.zeros((len(chunks), udocs.size), dtype=np.int64)
    for i, c in live:
        tfm[i] = c.tf_at(udocs)
    return udocs, tfm


def termauto_freqs(chunks_by_term: dict, paths):
    """TermAutomatonQuery match counting (sandbox/src/java/org/apache/
    lucene/sandbox/search/TermAutomatonScorer.java:215-340
    countMatches): per doc, freq = the number of (start position,
    accepted path) pairs — the determinized automaton tracks every
    in-flight run as a separate state-multiset entry, so each accepted
    path occurrence counts once, and occurrences of DIFFERENT paths at
    the same start both count (e.g. [a, ANY, c] and [a, b, c] on
    "a b c").

    ``paths`` is the enumerated language of the (acyclic, determinized)
    automaton: sequences of terms with None = the ANY transition.
    Reference semantics (verified against countMatches' event loop):

      * an occurrence's term slots sit on consecutive positions
        (tokens transition state pos -> pos+1: the posLength=1 model
        the scorer itself assumes, see its in-code comment);
      * an interior ANY slot matches ANY position — including index
        holes (stop-filtered positions): the scorer's advance loop
        steps anyTermID per integer position between events, token or
        not, and the state chain below a live run is always populated
        so the loop's peter-out break can never strand it;
      * paths may not START or END with ANY — the reference REJECTS
        such automatons at finish() (IllegalStateException,
        TestTermAutomatonQuery testInvalidLeadWithAny /
        testInvalidTrailWithAny; the scorer never seeds a fresh run on
        an ANY arc and never checks accept states in the ANY-advance
        loop). Builders enforce this; the kernel skips them
        defensively.

    Fully vectorized: per-path shifted-position intersections — the
    exact-phrase kernel's method with ANY slots contributing no
    constraint. Returns (doc_ids, int64 freqs) with freqs > 0 only.
    """
    live = {t: c for t, c in chunks_by_term.items()
            if c is not None and c.n_blocks()}
    if not live:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    doc_parts = [c.decode_all()[0] for c in live.values()]
    doc_parts = [d for d in doc_parts if d.size]
    if not doc_parts:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    cand = np.unique(np.concatenate(doc_parts))

    def _pos_global(c):
        # _positions_for_docs contracts cand ⊆ chunk docs, so gather
        # against the term's OWN docs and remap its local rank keys to
        # global cand ranks (order-preserving: global rank increases
        # with local rank)
        tdocs = c.decode_all()[0]
        pl = _positions_for_docs(c, tdocs)
        if pl.size == 0:
            return pl
        g = np.searchsorted(cand, tdocs)
        lr = (pl >> 32).astype(np.int64)
        return pl + (g[lr] - lr) * POS_OFF

    plists = {t: _pos_global(c) for t, c in live.items()}
    freqs = np.zeros(cand.size, dtype=np.int64)
    for path in paths:
        if not path or path[0] is None or path[-1] is None:
            continue  # lead/trail ANY: rejected at finish (docstring)
        cur = None
        dead = False
        for j, s in enumerate(path):
            if s is None:
                continue
            pl = plists.get(s)
            if pl is None:
                dead = True
                break
            shifted = pl - j
            cur = shifted if cur is None else np.intersect1d(
                cur, shifted, assume_unique=True)
            if cur.size == 0:
                break
        if dead or cur is None or cur.size == 0:
            continue
        freqs += np.bincount((cur >> 32).astype(np.int64),
                             minlength=cand.size)
    hit = freqs > 0
    return cand[hit], freqs[hit]


def synonym_topk(chunks, scorer, norms_arr, base_doc, k, pruned=True):
    """SynonymQuery: all terms scored as ONE pseudo-term — per-doc tf is
    the Σ of member tfs, scored once with blended stats (df = max member
    df, ttf = Σ; core:search/SynonymQuery.java:52,387,588)."""
    udocs, tfm = _union_tfs(chunks)
    if udocs.size == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.float32)
    tfs = tfm.sum(axis=0)
    scores = scorer.score(tfs, _norms_at(norms_arr, base_doc, udocs))
    return topk_select(udocs, scores, k)


def dismax_topk(chunks, scorers, norms_arr, base_doc, k, tie_breaker=0.0,
                pruned=True):
    """DisjunctionMaxQuery: score = max(sub) + tie·Σ(others)
    (core:search/DisjunctionMaxQuery.java:51-63; per-clause float32 scores
    combined in float32 max, tie sum in double like DisjunctionMaxScorer)."""
    udocs, tfm = _union_tfs(chunks)
    if udocs.size == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.float32)
    norms = _norms_at(norms_arr, base_doc, udocs)
    smat = np.zeros(tfm.shape, dtype=np.float32)
    for i, (c, sc) in enumerate(zip(chunks, scorers)):
        if c is None:
            continue
        s = sc.score(tfm[i], norms)
        s[tfm[i] == 0] = 0.0
        smat[i] = s
    mx = smat.max(axis=0)
    if tie_breaker:
        total = smat.astype(np.float64).sum(axis=0)
        scores = (mx.astype(np.float64)
                  + np.float64(tie_breaker) * (total - mx.astype(np.float64))
                  ).astype(np.float32)
    else:
        scores = mx
    return topk_select(udocs, scores, k)


class DocSetChunk:
    """A TermChunk-compatible doc-id set (no tf, no positions): the
    kernel-side face of a pushed-down metadata filter (role/ts/numeric
    predicates on native columns — IndexOrDocValuesQuery's doc-values
    side, core:search/IndexOrDocValuesQuery.java). Built from a packed
    bitmap over the bucket's contiguous doc range."""

    def __init__(self, bitmap: bytes, base_doc: int, num_docs: int):
        bits = np.unpackbits(np.frombuffer(bitmap, dtype=np.uint8),
                             count=num_docs)
        self._docs = np.flatnonzero(bits).astype(np.int64) + base_doc
        n = self._docs.size
        self.blocks = [{"num_docs": int(n)}] if n else []
        self.firsts = self._docs[:1]
        self.lasts = self._docs[-1:]
        self.block_max = np.zeros(1 if n else 0, dtype=np.float32)

    def n_blocks(self):
        return len(self.blocks)

    def decode(self, i):
        return self._docs, np.ones(self._docs.size, dtype=np.int64)

    def decode_all(self):
        return self._docs, np.ones(self._docs.size, dtype=np.int64)

    def blocks_overlapping(self, lo, hi):
        if not self.blocks or self._docs[-1] < lo or self._docs[0] > hi:
            return range(0, 0)
        return range(0, 1)

    def tf_at(self, doc_ids):
        if self._docs.size == 0:
            # all-deleted / empty-filter bucket: nothing matches (indexing
            # an empty array with idx_c would raise)
            return np.zeros(len(doc_ids), dtype=np.int64)
        idx = np.searchsorted(self._docs, doc_ids)
        idx_c = np.minimum(idx, self._docs.size - 1)
        hit = self._docs[idx_c] == doc_ids
        return hit.astype(np.int64)


def pack_docset(doc_ids: np.ndarray, base_doc: int, num_docs: int) -> bytes:
    """Inverse of DocSetChunk: sorted global doc_ids -> packed bitmap."""
    bits = np.zeros(num_docs, dtype=np.uint8)
    bits[np.asarray(doc_ids, dtype=np.int64) - base_doc] = 1
    return np.packbits(bits).tobytes()


class MaskedChunk:
    """A TermChunk filtered through a DocSetChunk: decode/positions/tf
    see only allowed docs. Block metadata (ranges, maxima) passes
    through unchanged — still valid upper bounds, so every pruning path
    stays rank-safe. This is how a metadata FILTER clause composes with
    any scoring kernel (ReqExcl/semi-join shape, BooleanQuery FILTER)."""

    def __init__(self, inner, docset: DocSetChunk):
        self.inner, self.ds = inner, docset
        self.blocks = inner.blocks
        self.firsts, self.lasts = inner.firsts, inner.lasts
        self.block_max = inner.block_max
        self._dec = {}
        self._pos = {}

    def n_blocks(self):
        return self.inner.n_blocks()

    def decode(self, i):
        d = self._dec.get(i)
        if d is None:
            docs, tfs = self.inner.decode(i)
            keep = self.ds.tf_at(docs) > 0
            d = self._dec[i] = (docs[keep], tfs[keep], keep)
        return d[0], d[1]

    def positions(self, i):
        p = self._pos.get(i)
        if p is None:
            self.decode(i)
            keep = self._dec[i][2]
            pos = self.inner.positions(i)
            p = self._pos[i] = [q for q, k in zip(pos, keep) if k]
        return p

    def decode_all(self):
        parts = [self.decode(i) for i in range(self.n_blocks())]
        if not parts:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        return (np.concatenate([p[0] for p in parts]),
                np.concatenate([p[1] for p in parts]))

    def blocks_overlapping(self, lo, hi):
        return self.inner.blocks_overlapping(lo, hi)

    def tf_at(self, doc_ids):
        return self.inner.tf_at(doc_ids) * self.ds.tf_at(doc_ids)


class RangeChunk:
    """A chunk view restricted to a union of doc-id ranges
    ``[(lo, hi))`` — the window-restriction device of the pruned tree
    evaluator. Blocks outside every range are invisible: decode_all
    never touches them, which is where block-max pruning saves decode
    work. Wraps any chunk (TermChunk or MaskedChunk); position
    gathering unwraps to the raw chunk via _inner_chunk."""

    def __init__(self, inner, los: np.ndarray, his: np.ndarray):
        self.inner = inner
        self.los, self.his = los, his  # sorted, disjoint; hi exclusive
        # visible blocks: any overlap with any range
        keep = []
        for bi in range(inner.n_blocks()):
            f, l = int(inner.firsts[bi]), int(inner.lasts[bi])
            j = int(np.searchsorted(his, f, side="right"))
            if j < los.size and los[j] <= l:
                keep.append(bi)
        self._vis = keep
        self.blocks = [inner.blocks[i] for i in keep]
        self.firsts = inner.firsts[keep]
        self.lasts = inner.lasts[keep]
        self.block_max = inner.block_max[keep]
        self._dec = {}

    def n_blocks(self):
        return len(self._vis)

    def _member(self, docs):
        idx = np.searchsorted(self.los, docs, side="right") - 1
        ok = idx >= 0
        idx_c = np.maximum(idx, 0)
        return ok & (docs < self.his[idx_c])

    def decode(self, i):
        d = self._dec.get(i)
        if d is None:
            docs, tfs = self.inner.decode(self._vis[i])
            keep = self._member(docs)
            d = self._dec[i] = (docs[keep], tfs[keep])
        return d

    def decode_all(self):
        parts = [self.decode(i) for i in range(len(self._vis))]
        if not parts:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        return (np.concatenate([p[0] for p in parts]),
                np.concatenate([p[1] for p in parts]))

    def blocks_overlapping(self, lo, hi):
        i0 = int(np.searchsorted(self.lasts, lo, side="left"))
        i1 = int(np.searchsorted(self.firsts, hi, side="right"))
        return range(i0, i1)

    def tf_at(self, doc_ids):
        doc_ids = np.asarray(doc_ids, dtype=np.int64)
        return self.inner.tf_at(doc_ids) * self._member(doc_ids)


class UnionChunk:
    """Union of several terms' postings in one bucket — the
    UnionPostingsEnum capability backing one MultiPhraseQuery position
    (core:search/MultiPhraseQuery.java:480-560): docs = union of member
    docs, tf = Σ member tfs, positions = per-doc sorted merge of every
    member's positions. Materialized eagerly as ONE logical block:
    phrase evaluation touches all of a slot's candidate docs anyway,
    and the merge is a single lexsort over the batch (no per-doc
    Python). block_max is +inf — union postings carry no impacts,
    exactly the reference (MultiPhraseWeight scores through
    SlowImpactsEnum, so its block maxima are unbounded too); rank
    safety of pruned paths is preserved because +inf never prunes.

    Members may be TermChunk, MaskedChunk, or RangeChunk views; the
    union is built over their EFFECTIVE (masked/restricted) postings.
    """

    def __init__(self, members):
        members = [m for m in members if m is not None and m.n_blocks() > 0]
        docs_parts, tfs_parts = [], []
        posdoc_parts, pos_parts = [], []
        for m in members:
            docs, tfs = m.decode_all()
            if docs.size == 0:
                continue
            docs_parts.append(docs)
            tfs_parts.append(tfs)
            pk = _positions_for_docs(m, docs)
            posdoc_parts.append(docs[(pk // POS_OFF).astype(np.int64)])
            pos_parts.append(pk % POS_OFF)
        if not docs_parts:
            self._docs = np.zeros(0, np.int64)
            self._tfs = np.zeros(0, np.int64)
            self._flat = np.zeros(0, np.int64)
        else:
            alld = np.concatenate(docs_parts)
            allt = np.concatenate(tfs_parts)
            self._docs, inv = np.unique(alld, return_inverse=True)
            sums = np.zeros(self._docs.size, dtype=np.int64)
            np.add.at(sums, inv, allt)
            self._tfs = sums
            pd_ = np.concatenate(posdoc_parts)
            pp = np.concatenate(pos_parts)
            order = np.lexsort((pp, pd_))
            self._flat = pp[order]
        n = self._docs.size
        self.blocks = [{"num_docs": int(n)}] if n else []
        self.firsts = self._docs[:1]
        self.lasts = self._docs[-1:]
        self.block_max = np.full(1 if n else 0, np.inf, dtype=np.float32)

    def n_blocks(self):
        return len(self.blocks)

    def decode(self, i):
        return self._docs, self._tfs

    def decode_all(self):
        return self._docs, self._tfs

    def positions_flat(self, i):
        return self._flat, self._tfs

    def blocks_overlapping(self, lo, hi):
        if not self.blocks or self._docs[-1] < lo or self._docs[0] > hi:
            return range(0, 0)
        return range(0, 1)

    def tf_at(self, doc_ids):
        doc_ids = np.asarray(doc_ids, dtype=np.int64)
        out = np.zeros(doc_ids.size, dtype=np.int64)
        if self._docs.size == 0:
            return out
        idx = np.searchsorted(self._docs, doc_ids)
        idx_c = np.minimum(idx, self._docs.size - 1)
        hit = self._docs[idx_c] == doc_ids
        out[hit] = self._tfs[idx_c[hit]]
        return out


def slot_chunk(get_chunk, field, slot):
    """Resolve one phrase position to its kernel chunk: a plain term
    maps straight through; a tuple of alternatives (MultiPhraseQuery
    slot) maps to the UnionChunk of its members. None when nothing in
    the slot has postings in this bucket."""
    if isinstance(slot, str):
        return get_chunk(field, slot)
    u = UnionChunk([get_chunk(field, t) for t in slot])
    return u if u.n_blocks() else None


def constant_or_topk(chunks, boost, norms_arr, base_doc, k):
    """Constant-score union: docs matching ANY chunk score ``boost``
    (MultiTermQuery CONSTANT_SCORE rewrites / ConstantScoreQuery,
    core:search/ConstantScoreQuery.java). Ties resolve by doc_id asc."""
    udocs, _ = _union_tfs(chunks)
    if udocs.size == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.float32)
    scores = np.full(udocs.size, np.float32(boost), dtype=np.float32)
    return topk_select(udocs, scores, k)


def boolean_topk(must, should, must_not, filters, scorers_must, scorers_should,
                 norms_arr, base_doc, k, min_should_match=0, pruned=True):
    """General BooleanQuery (core:search/BooleanQuery.java:125-147):

      MUST      -> sort-merge intersection, scored      (ConjunctionScorer)
      SHOULD    -> union, scored, optional msm          (DisjunctionSumScorer / WANDScorer msm)
      FILTER    -> intersection, NOT scored             (semi-join)
      MUST_NOT  -> exclusion                            (ReqExclScorer ≙ anti-join)

    Per-clause float32 scores are summed in double and cast to float32
    at the end, matching the reference's double score accumulation.
    """
    if must:
        if any(c is None for c in must):
            return np.zeros(0, np.int64), np.zeros(0, np.float32)
        cand = _conj_candidates(must, pruned)
    else:
        cand, _ = _union_tfs(should)
    if cand.size == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.float32)
    for c in filters:
        if c is None or c.n_blocks() == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.float32)
        cand = cand[c.tf_at(cand) > 0]
        if cand.size == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.float32)
    for c in must_not:
        if c is None or c.n_blocks() == 0:
            continue
        cand = cand[c.tf_at(cand) == 0]
        if cand.size == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.float32)
    norms = _norms_at(norms_arr, base_doc, cand)
    total = np.zeros(cand.size, dtype=np.float64)
    for c, sc in zip(must, scorers_must):
        total += sc.score(c.tf_at(cand), norms).astype(np.float64)
    n_should = np.zeros(cand.size, dtype=np.int64)
    for c, sc in zip(should, scorers_should):
        if c is None or c.n_blocks() == 0:
            continue
        tfs = c.tf_at(cand)
        hit = tfs > 0
        s = sc.score(tfs, norms)
        s[~hit] = 0.0
        total += s.astype(np.float64)
        n_should += hit
    msm = min_should_match if should else 0
    if must and min_should_match == 0:
        keep = np.ones(cand.size, dtype=bool)
    else:
        keep = n_should >= max(msm, 0 if must else 1)
    cand, total = cand[keep], total[keep]
    if cand.size == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.float32)
    return topk_select(cand, total.astype(np.float32), k)


# ---------------------------------------------------------------------------
# recursive nested-query evaluation (BooleanQuery with arbitrary
# sub-query clauses, core:search/BooleanQuery.java:125-147)
# ---------------------------------------------------------------------------
#
# A compiled plan node is a plain tuple (picklable, built driver-side
# with scorers already bound to collection stats):
#
#   ("term",    field, term, scorer)
#   ("phrase",  field, [terms], scorer, slop)
#   ("synonym", field, [terms], scorer)
#   ("combined",[(field, term, weight)], scorer, [(norm_field, weight)])
#                                             BM25F combined field
#   ("and",     [children])                  sum of child scores
#   ("or",      [children])                  sum over matching children
#   ("dismax",  [children], tie_breaker)     max + tie * rest
#   ("const",   child, boost)                matching docs score boost
#   ("bool",    [musts], [shoulds], [must_nots], [filters], msm)
#
# eval_tree returns ALL matching (docs asc, float32 scores) for one
# bucket; the caller takes the bucket-local top-k. Float discipline
# matches the reference scorer tree: every node emits float32, every
# combining node accumulates child float32 scores in double and casts
# once (ConjunctionScorer.java:57-62, DisjunctionSumScorer.java:40-46,
# ReqOptSumScorer) — so a nested sum rounds at each tree level exactly
# like Lucene's scorer composition does.


def _empty_hits():
    return np.zeros(0, np.int64), np.zeros(0, np.float32)


def _combined_norm_codes(norms_for, norm_fields, probe_field) -> np.ndarray:
    """Per-doc combined norm codes for a bucket: SmallFloat re-encode of
    Math.round(sum of weight * decoded field length) over the fields
    that HAVE norms (MultiNormsLeafSimScorer.MultiFieldNormValues,
    core:search/MultiNormsLeafSimScorer.java:163-174; float32
    accumulation, Java Math.round = floor(x + 0.5f)). With no norms
    field at all, the reference scores with the default norm 1L
    (getNormValue's else branch) -> code 1 everywhere.

    When norms_for is a _CachingNorms wrapper (the pruned path), the
    re-encode is memoized per norm_fields tuple — eval_tree runs once
    per window batch over the same bucket, and the codes are
    window-invariant (advisor r04 #3)."""
    from ..kernels.smallfloat import LENGTH_TABLE, int_to_byte4
    cache = getattr(norms_for, "combined_cache", None)
    if cache is not None:
        got = cache.get(norm_fields)
        if got is not None:
            return got
    if not norm_fields:
        out = np.ones(norms_for(probe_field).size, dtype=np.uint8)
    else:
        total = None
        for f, w in norm_fields:
            ln = LENGTH_TABLE[norms_for(f).astype(np.int64) & 0xFF]
            part = np.float32(w) * ln.astype(np.float32)
            total = part if total is None else total + part
        out = np.asarray(
            int_to_byte4(np.floor(total + np.float32(0.5)).astype(np.int64)),
            dtype=np.uint8)
    if cache is not None:
        cache[norm_fields] = out
    return out


class _CachingNorms:
    """Per-bucket memo wrapper around a norms_for callable: caches the
    per-field norm arrays AND the combined-field norm re-encode across
    the pruned path's per-window eval_tree calls (the bucket's norms
    never change between windows)."""

    __slots__ = ("_fn", "_fields", "combined_cache")

    def __init__(self, fn):
        self._fn = fn
        self._fields = {}
        self.combined_cache = {}

    def __call__(self, f):
        a = self._fields.get(f)
        if a is None:
            a = self._fields[f] = self._fn(f)
        return a


def _intersect_sum(parts):
    """Fold sorted (docs, scores) parts: docs in ALL parts, scores
    summed (double accumulate, float32 out)."""
    docs, s0 = parts[0]
    acc = s0.astype(np.float64)
    for d2, s2 in parts[1:]:
        if docs.size == 0:
            break
        docs, i1, i2 = np.intersect1d(docs, d2, assume_unique=True,
                                      return_indices=True)
        acc = acc[i1] + s2[i2].astype(np.float64)
    if docs.size == 0:
        return _empty_hits()
    return docs, acc.astype(np.float32)


def _union_sum(parts):
    """Union of (docs, scores) parts, scores summed per doc."""
    live = [p for p in parts if p[0].size]
    if not live:
        return _empty_hits()
    alld = np.concatenate([p[0] for p in live])
    alls = np.concatenate([p[1] for p in live])
    udocs, inv = np.unique(alld, return_inverse=True)
    sums = np.zeros(udocs.size, dtype=np.float64)
    np.add.at(sums, inv, alls.astype(np.float64))
    return udocs, sums.astype(np.float32)


def _scores_at(docs, sd, ss):
    """Scores of sorted (sd, ss) aligned to sorted docs; 0 + miss mask
    where absent."""
    out = np.zeros(docs.size, dtype=np.float32)
    if sd.size == 0:
        return out, np.zeros(docs.size, dtype=bool)
    idx = np.searchsorted(sd, docs)
    idx_c = np.minimum(idx, sd.size - 1)
    hit = sd[idx_c] == docs
    out[hit] = ss[idx_c[hit]]
    return out, hit


def eval_tree(node, get_chunk, norms_for, base_doc, universe=None):
    """Evaluate one compiled plan node against one bucket.

    get_chunk(field, term) -> TermChunk/MaskedChunk or None;
    norms_for(field) -> uint8 norm-code array for the bucket (ones for
    keyword fields — omitted norms); universe -> absolute doc ids a
    "matchall" leaf may emit (the bucket's filter/live-docs mask) or
    None for the bucket's full contiguous range.
    """
    kind = node[0]
    if kind == "matchall":
        # MatchAllDocsQuery as a CLAUSE (core:search/
        # MatchAllDocsQuery.java; SimpleQueryParser wraps negations as
        # bool(MUST_NOT=branch, SHOULD=MatchAll)): every doc in the
        # bucket (minus filter/live masks) at constant score
        _, boost, f = node
        if universe is not None:
            docs = universe
        else:
            docs = np.arange(norms_for(f).size, dtype=np.int64) + base_doc
        return docs, np.full(docs.size, np.float32(boost),
                             dtype=np.float32)
    if kind == "term":
        _, f, t, sc = node
        ch = get_chunk(f, t)
        if ch is None:
            return _empty_hits()
        docs, tfs = ch.decode_all()
        if docs.size == 0:
            return _empty_hits()
        return docs, sc.score(tfs, norms_for(f)[docs - base_doc])
    if kind == "phrase":
        # terms entries are plain terms or tuples of alternatives
        # (MultiPhraseQuery slots -> UnionChunk)
        _, f, terms, sc, slop = node
        chunks = [slot_chunk(get_chunk, f, t) for t in terms]
        if any(c is None for c in chunks):
            return _empty_hits()
        if slop > 0:
            docs, freqs = sloppy_freqs(chunks, slop, pruned=True)
        else:
            docs, freqs = phrase_freqs(chunks, pruned=True, slop=0)
        if docs.size == 0:
            return _empty_hits()
        return docs, sc.score(freqs, norms_for(f)[docs - base_doc])
    if kind == "synonym":
        _, f, terms, sc = node
        udocs, tfm = _union_tfs([get_chunk(f, t) for t in terms])
        if udocs.size == 0:
            return _empty_hits()
        return udocs, sc.score(tfm.sum(axis=0),
                               norms_for(f)[udocs - base_doc])
    if kind == "termauto":
        # TermAutomatonQuery (sandbox/.../TermAutomatonScorer.java):
        # freq = accepted (start, path) count over the enumerated
        # automaton language; scored with the summed-idf multi-term
        # stats like the reference's TermAutomatonWeight. Trees holding
        # this node run exhaustively — the reference's own getMaxScore
        # is Float.MAX_VALUE (no pruning), see TermAutomatonScorer:364.
        # paths/terms are plain LISTS (of lists), not tuples: the
        # generic tree walkers (node_has_matchall and friends) treat
        # any tuple whose first element is a str as a plan node, and a
        # path starting with the literal corpus term "matchall" must
        # not be mistaken for one
        _, f, paths, sc, terms = node
        docs, freqs = termauto_freqs({t: get_chunk(f, t) for t in terms},
                                     paths)
        if docs.size == 0:
            return _empty_hits()
        return docs, sc.score(freqs, norms_for(f)[docs - base_doc])
    if kind == "combined":
        # CombinedFieldQuery: one pseudo-term over a synthetic combined
        # field (core:search/CombinedFieldQuery.java:412-443). freq =
        # float32 sum of weight * tf across every (field, term) posting
        # list (CombinedFieldScorer.freq accumulates in float); norm =
        # SmallFloat re-encode of Math.round(sum of weight * decoded
        # length) over fields with norms (MultiNormsLeafSimScorer.java)
        _, pairs, sc, norm_fields = node
        parts = []
        for f, t, w in pairs:
            ch = get_chunk(f, t)
            if ch is None:
                continue
            docs, tfs = ch.decode_all()
            if docs.size:
                parts.append((docs,
                              np.float32(w) * tfs.astype(np.float32)))
        if not parts:
            return _empty_hits()
        alld = np.concatenate([p[0] for p in parts])
        allf = np.concatenate([p[1] for p in parts])
        udocs, inv = np.unique(alld, return_inverse=True)
        freqs = np.zeros(udocs.size, dtype=np.float32)
        np.add.at(freqs, inv, allf)
        codes = _combined_norm_codes(norms_for, norm_fields, pairs[0][0])
        return udocs, sc.score(freqs, codes[udocs - base_doc])
    if kind == "and":
        parts = [eval_tree(c, get_chunk, norms_for, base_doc, universe)
                 for c in node[1]]
        if any(p[0].size == 0 for p in parts):
            return _empty_hits()
        return _intersect_sum(parts)
    if kind == "or":
        return _union_sum([eval_tree(c, get_chunk, norms_for, base_doc, universe)
                           for c in node[1]])
    if kind == "dismax":
        _, children, tie = node
        parts = [eval_tree(c, get_chunk, norms_for, base_doc, universe)
                 for c in children]
        live = [p for p in parts if p[0].size]
        if not live:
            return _empty_hits()
        udocs = np.unique(np.concatenate([p[0] for p in live]))
        smat = np.zeros((len(live), udocs.size), dtype=np.float32)
        for i, (sd, ss) in enumerate(live):
            smat[i], _ = _scores_at(udocs, sd, ss)
        mx = smat.max(axis=0)
        if tie:
            total = smat.astype(np.float64).sum(axis=0)
            scores = (mx.astype(np.float64)
                      + np.float64(tie) * (total - mx.astype(np.float64))
                      ).astype(np.float32)
        else:
            scores = mx
        return udocs, scores
    if kind == "const":
        _, child, boost = node
        docs, _ = eval_tree(child, get_chunk, norms_for, base_doc, universe)
        return docs, np.full(docs.size, np.float32(boost), dtype=np.float32)
    if kind == "bool":
        _, musts, shoulds, must_nots, filters, msm = node
        if musts:
            mparts = [eval_tree(c, get_chunk, norms_for, base_doc, universe)
                      for c in musts]
            if any(p[0].size == 0 for p in mparts):
                return _empty_hits()
            docs, mscore = _intersect_sum(mparts)
            total = mscore.astype(np.float64)
        else:
            docs = None
            total = None
        sparts = [eval_tree(c, get_chunk, norms_for, base_doc, universe)
                  for c in shoulds]
        if docs is None:
            docs, _ = _union_sum(sparts)
            total = np.zeros(docs.size, dtype=np.float64)
        if docs.size == 0:
            return _empty_hits()
        for c in filters:
            fd, _ = eval_tree(c, get_chunk, norms_for, base_doc, universe)
            keep = np.isin(docs, fd, assume_unique=True)
            docs, total = docs[keep], total[keep]
            if docs.size == 0:
                return _empty_hits()
        for c in must_nots:
            nd, _ = eval_tree(c, get_chunk, norms_for, base_doc, universe)
            if nd.size == 0:
                continue
            keep = ~np.isin(docs, nd, assume_unique=True)
            docs, total = docs[keep], total[keep]
            if docs.size == 0:
                return _empty_hits()
        n_should = np.zeros(docs.size, dtype=np.int64)
        for sd, ss in sparts:
            svals, hit = _scores_at(docs, sd, ss)
            total = total + svals.astype(np.float64)
            n_should += hit
        if musts and msm == 0:
            keep = np.ones(docs.size, dtype=bool)
        else:
            keep = n_should >= max(msm, 0 if musts else 1)
        docs, total = docs[keep], total[keep]
        if docs.size == 0:
            return _empty_hits()
        return docs, total.astype(np.float32)
    raise ValueError(f"unknown plan node {kind}")


# ---------------------------------------------------------------------------
# block-max pruned tree evaluation (the WANDScorer / BooleanScorerSupplier
# bound-composition applied to the nested plan tree,
# core:search/WANDScorer.java:31-213, BooleanScorerSupplier.java:176-455)
# ---------------------------------------------------------------------------


def _score_floor(scorers) -> float:
    """Window bounds at or below this value are non-competitive. 0.0
    for the standard similarities (scores are non-negative; a 0 bound
    means either no covering blocks or a zero-clamping similarity like
    LMDirichlet treating the match as worthless). Similarities that
    produce NEGATIVE scores (IndriDirichlet's unclamped
    log-probabilities) advertise ``negative_scores = True`` and get a
    -inf floor so genuinely-negative top-k windows still evaluate."""
    return (-np.inf if any(getattr(s, "negative_scores", False)
                           for s in scorers) else 0.0)


def _any_negative_scorer(obj) -> bool:
    """Recursive plan-tree scan for a negative-score similarity (plan
    trees are term-count-sized tuples; this is driver-side and cheap)."""
    if getattr(obj, "negative_scores", False):
        return True
    if isinstance(obj, (tuple, list)):
        return any(_any_negative_scorer(x) for x in obj)
    return False


def _tree_leaf_chunks(node, get_chunk, out: dict):
    """All distinct (field, term) chunks a plan tree touches."""
    kind = node[0]
    if kind == "term":
        out.setdefault((node[1], node[2]), get_chunk(node[1], node[2]))
    elif kind in ("phrase", "synonym"):
        for t in node[2]:
            for m in ((t,) if isinstance(t, str) else t):
                out.setdefault((node[1], m), get_chunk(node[1], m))
    elif kind == "combined":
        for f, t, _w in node[1]:
            out.setdefault((f, t), get_chunk(f, t))
    elif kind in ("and", "or"):
        for c in node[1]:
            _tree_leaf_chunks(c, get_chunk, out)
    elif kind == "dismax":
        for c in node[1]:
            _tree_leaf_chunks(c, get_chunk, out)
    elif kind == "const":
        _tree_leaf_chunks(node[1], get_chunk, out)
    elif kind == "bool":
        for grp in node[1:5]:
            for c in grp:
                _tree_leaf_chunks(c, get_chunk, out)
    else:
        raise ValueError(f"unknown plan node {kind}")


class _ScaledFreqBound:
    """Bound scorer for one combined-field pair: scores the stored
    impact skyline with tf scaled by the field weight (the pair's
    contribution to the combined freq is weight * tf). zero_norm=True
    replaces the stored norm with code 0 (minimum length -> maximum
    score) for omitted-norms fields, whose baked impact norms (length
    1) need not lower-bound the combined length."""

    def __init__(self, base, weight, zero_norm: bool = False):
        self.base = base
        self.weight = np.float64(weight)
        self.zero_norm = zero_norm
        # value-identity cache key: wrappers are ephemeral (built per
        # _node_window_bounds call), so keying the bound cache on
        # id(wrapper) could serve a stale entry after CPython reuses the
        # id for a wrapper with a different weight/zero_norm (advisor
        # r04 #1). The BASE scorer lives in the plan node for the whole
        # tree walk, so id(base) is stable.
        self.cache_key = ("scaled", id(base), float(weight), bool(zero_norm))

    def score(self, freqs, norm_codes):
        f = np.asarray(freqs, dtype=np.float64) * self.weight
        n = (np.zeros(f.size, dtype=np.int64) if self.zero_norm
             else norm_codes)
        return self.base.score(f, n)


def _window_leaf_bounds(chunk, scorer, w_lo, bound_cache):
    """Per-window (bound, coverage) of one (chunk, scorer) pair: the
    covering block's impact-derived bound, 0 where no block covers the
    window; coverage = a block covers the window AT ALL (independent of
    the bound's value — a zero-clamping similarity like LMDirichlet can
    bound a block at 0 while its docs still MATCH with score 0).
    Bounds come from the stored impacts under the NODE's scorer (exact
    for any boost/similarity — baked floats are boost-1.0 BM25)."""
    if chunk is None or chunk.n_blocks() == 0:
        z = np.zeros(w_lo.size, dtype=np.float64)
        return z, np.zeros(w_lo.size, dtype=bool)
    key = (id(chunk), getattr(scorer, "cache_key", None) or id(scorer))
    bb = bound_cache.get(key)
    if bb is None:
        bb = bound_cache[key] = impact_block_bounds(chunk.blocks, scorer)
    out = np.zeros(w_lo.size, dtype=np.float64)
    idx = np.searchsorted(chunk.lasts, w_lo, side="left")
    idx_c = np.minimum(idx, chunk.n_blocks() - 1)
    covers = (chunk.firsts[idx_c] <= w_lo) & (chunk.lasts[idx_c] >= w_lo)
    out[covers] = bb[idx_c[covers]]
    return out, covers


def _node_window_bounds(node, chunks: dict, w_lo, bound_cache):
    """Combine per-window (upper bound, coverage) bottom-up through the
    plan tree — the scorer-tree analog of WANDScorer's sum-of-maxScore
    bounds. Returns (bounds float64[n_w], coverage bool[n_w]) where
    coverage means "some doc in the window COULD match this node" —
    required-clause gating uses COVERAGE, not bound > 0, so a required
    term whose block bound is 0 under a zero-clamping similarity
    (LMDirichlet) does not wrongly zero a window whose siblings score
    positively (advisor r03 finding #2):

      term     -> covering-block bound under the leaf scorer
      phrase   -> exact (slop=0): min over member terms (phrase freq <=
                  each member tf; PhraseWeight's impacts-based bound);
                  sloppy (slop>0): SUM over member terms — sloppy freq
                  can exceed any single member's tf but is <= Σ member
                  freqs (SloppyPhraseMatcher.java maxFreq,
                  PhraseScorer.java:57-62), and score(Σtf) <= Σscore(tf)
                  for the concave score(0)=0 similarities (same argument
                  as the synonym bound). Coverage: all members covered.
      synonym  -> sum over members (BM25 is concave with score(0)=0, so
                  score(Σtf) <= Σ score(tf)); coverage: any member
      and/bool -> Σ children, 0 where any required child is UNCOVERED
      or       -> Σ children; coverage: any child
      dismax   -> max + tie * (Σ - max); coverage: any child
      const    -> boost where the child is covered
      filters  -> mask windows where a filter child is uncovered
      must_not -> ignored (can only remove matches — bound stays valid)
    """
    kind = node[0]
    B = _node_window_bounds
    if kind == "term":
        return _window_leaf_bounds(chunks[(node[1], node[2])], node[3],
                                   w_lo, bound_cache)
    if kind == "phrase":
        # per SLOT: a plain term's leaf bound, or — for a
        # MultiPhraseQuery slot tuple — the SUM of member bounds
        # (slot tf = Σ member tfs; score(Σtf) <= Σ score(tf) by the
        # synonym concavity argument) with coverage = ANY member
        pairs = []
        for t in node[2]:
            mems = [_window_leaf_bounds(chunks[(node[1], m)], node[3],
                                        w_lo, bound_cache)
                    for m in ((t,) if isinstance(t, str) else t)]
            pairs.append((np.add.reduce([v for v, _ in mems]),
                          np.logical_or.reduce([c for _, c in mems])))
        cov = np.logical_and.reduce([c for _, c in pairs])
        vs = [v for v, _ in pairs]
        slop = node[4]
        out = np.add.reduce(vs) if slop > 0 else np.minimum.reduce(vs)
        out = np.where(cov, out, 0.0)
        return out, cov
    if kind == "synonym":
        pairs = [_window_leaf_bounds(chunks[(node[1], t)], node[3], w_lo,
                                     bound_cache) for t in node[2]]
        return (np.add.reduce([v for v, _ in pairs]),
                np.logical_or.reduce([c for _, c in pairs]))
    if kind == "combined":
        # per-pair bound: score the pair's stored impact skyline with
        # tf scaled by the field weight, against the FIELD's impact
        # norm for norm-bearing fields (combined length >= w_f * field
        # length >= field length when every weight >= 1, and BM25-family
        # scores decrease with length) or against code 0 (minimum
        # length) for omitted-norms fields whose baked impact norm
        # (length 1) can exceed the combined length of an empty-text
        # doc. score(sum w*tf, norm) <= sum score(w*tf, .) by the same
        # concavity argument as the synonym bound.
        _, cpairs, sc, norm_fset = node
        nf = {f for f, _ in norm_fset}
        # wrappers carry a value-identity cache_key, so the bound cache
        # stays correct even though the wrappers are ephemeral
        wrapped = [_ScaledFreqBound(sc, w, zero_norm=f not in nf)
                   for f, _t, w in cpairs]
        bps = [_window_leaf_bounds(chunks[(f, t)], s2, w_lo, bound_cache)
               for (f, t, _w), s2 in zip(cpairs, wrapped)]
        return (np.add.reduce([v for v, _ in bps]),
                np.logical_or.reduce([c for _, c in bps]))
    if kind == "and":
        pairs = [B(c, chunks, w_lo, bound_cache) for c in node[1]]
        out = np.add.reduce([v for v, _ in pairs])
        cov = np.logical_and.reduce([c for _, c in pairs])
        out = np.where(cov, out, 0.0)
        return out, cov
    if kind == "or":
        pairs = [B(c, chunks, w_lo, bound_cache) for c in node[1]]
        return (np.add.reduce([v for v, _ in pairs]),
                np.logical_or.reduce([c for _, c in pairs]))
    if kind == "dismax":
        _, children, tie = node
        pairs = [B(c, chunks, w_lo, bound_cache) for c in children]
        vs = [v for v, _ in pairs]
        cov = np.logical_or.reduce([c for _, c in pairs])
        mx = np.maximum.reduce(vs)
        if tie:
            return mx + np.float64(tie) * (np.add.reduce(vs) - mx), cov
        return mx, cov
    if kind == "const":
        _, child_cov = B(node[1], chunks, w_lo, bound_cache)
        return (np.where(child_cov, np.float64(max(node[2], 0.0)), 0.0),
                child_cov)
    if kind == "bool":
        _, musts, shoulds, must_nots, filters, msm = node

        spairs = [B(c, chunks, w_lo, bound_cache) for c in shoulds]
        s_sum = (np.add.reduce([v for v, _ in spairs]) if spairs
                 else np.zeros(w_lo.size))
        if musts:
            mpairs = [B(c, chunks, w_lo, bound_cache) for c in musts]
            out = np.add.reduce([v for v, _ in mpairs]) + s_sum
            cov = np.logical_and.reduce([c for _, c in mpairs])
        else:
            out = s_sum
            cov = np.ones(w_lo.size, dtype=bool)
        need = max(msm, 0 if musts else 1)
        if need > 0 and spairs:
            n_cov = np.add.reduce([c.astype(np.int64) for _, c in spairs])
            cov = cov & (n_cov >= need)
        elif not musts and not spairs:
            return (np.zeros(w_lo.size),
                    np.zeros(w_lo.size, dtype=bool))
        for c in filters:
            _, fcov = B(c, chunks, w_lo, bound_cache)
            cov = cov & fcov
        out = np.where(cov, out, 0.0)
        return out, cov
    raise ValueError(f"unknown plan node {kind}")


def node_has_termauto(node) -> bool:
    """True if a compiled plan tree contains a "termauto" leaf — those
    trees run exhaustively: the reference's TermAutomatonScorer
    advertises getMaxScore = Float.MAX_VALUE (TermAutomatonScorer.java:
    362-365), i.e. it opts out of dynamic pruning, and so do we."""
    if not isinstance(node, tuple) or not node:
        return False
    if node[0] == "termauto":
        return True
    for el in node[1:]:
        if isinstance(el, tuple) and el and isinstance(el[0], str):
            if node_has_termauto(el):
                return True
        elif isinstance(el, list):
            for c in el:
                if (isinstance(c, tuple) and c and isinstance(c[0], str)
                        and node_has_termauto(c)):
                    return True
    return False


def node_has_matchall(node) -> bool:
    """True if a compiled plan node contains a "matchall" leaf — those
    trees must run exhaustively (no block-max windows exist for a
    postings-free leaf) over EVERY bucket (chunkless buckets still
    match)."""
    if not isinstance(node, tuple) or not node:
        return False
    if node[0] == "matchall":
        return True
    for el in node[1:]:
        if isinstance(el, tuple) and el and isinstance(el[0], str):
            if node_has_matchall(el):
                return True
        elif isinstance(el, list):
            for c in el:
                if (isinstance(c, tuple) and c and isinstance(c[0], str)
                        and node_has_matchall(c)):
                    return True
    return False


def eval_tree_topk(node, get_chunk, norms_for, base_doc, k,
                   theta0=-np.inf, after=None, window_batch: int = 16):
    """Block-max pruned top-k evaluation of a compiled plan tree.

    Windows are the elementary intervals of the union of every leaf
    chunk's block edges (each leaf has 0 or 1 covering block per
    window, like or_topk's WAND). Per-window upper bounds combine
    bottom-up through the tree (_node_window_bounds); windows are
    visited in descending bound order, evaluated in batches by running
    the EXHAUSTIVE tree kernel over leaf chunks restricted to the
    batch's doc ranges (RangeChunk), and evaluation stops once the next
    window's bound cannot beat the running k-th score — rank-identical
    to eval_tree + topk_select by the same argument as the flat WAND
    kernel (bounds are exact score maxima from the stored impacts).

    after: optional (score, doc_id) searchAfter cursor applied to each
    batch's hits BEFORE the heap (the cursor filters hits, the
    θ-pruning then works on post-cursor scores — deep pages prune as
    well as page one).

    Like the flat kernels, windows with bound <= 0 are never visited —
    a similarity that clamps scores to 0 (LMDirichlet) treats
    zero-score matches as non-competitive everywhere, consistently.
    A NEGATIVE-score similarity anywhere in the tree (IndriDirichlet's
    unclamped log-probabilities — advertised via negative_scores)
    bypasses the pruned path entirely: composed sum/remainder bounds
    assume non-negative sub-scores, so the tree evaluates exhaustively
    and heap-selects (same results, no pruning).
    """
    if _any_negative_scorer(node):
        # composed sum/remainder bounds assume non-negative sub-scores
        # (the reference's Similarity contract for dynamic pruning);
        # a negative-score similarity (IndriDirichlet) in the tree
        # falls back to exhaustive evaluation + heap — same results,
        # no pruning
        docs, scores = eval_tree(node, get_chunk, norms_for, base_doc)
        if after is not None:
            s_a, d_a = np.float32(after[0]), np.int64(after[1])
            keep = (scores < s_a) | ((scores == s_a) & (docs > d_a))
            docs, scores = docs[keep], scores[keep]
        return topk_select(docs, scores, k)
    norms_for = _CachingNorms(norms_for)
    chunks: dict = {}
    _tree_leaf_chunks(node, get_chunk, chunks)
    live = [c for c in chunks.values() if c is not None and c.n_blocks()]
    if not live:
        return _empty_hits()
    edges = np.unique(np.concatenate(
        [c.firsts for c in live] + [c.lasts + 1 for c in live]))
    w_lo, w_hi = edges[:-1], edges[1:]
    bound_cache: dict = {}
    ub, _ = _node_window_bounds(node, chunks, w_lo, bound_cache)
    order = np.argsort(-ub, kind="stable")
    got_d, got_s = [], []
    theta = theta0
    count = 0
    i = 0
    n_w = order.size
    while i < n_w:
        batch = []
        while i < n_w and len(batch) < window_batch:
            wi = order[i]
            if ub[wi] <= 0:
                i = n_w
                break
            if ub[wi] < theta and (count >= k or ub[wi] < theta0):
                i = n_w
                break
            batch.append(wi)
            i += 1
        if not batch:
            break
        bw = np.sort(np.asarray(batch))
        los, his = w_lo[bw], w_hi[bw]
        # merge adjacent windows into maximal disjoint ranges (tiny
        # arrays — one pass per batch)
        r_los, r_his = [int(los[0])], [int(his[0])]
        for lo2, hi2 in zip(los[1:], his[1:]):
            if int(lo2) == r_his[-1]:
                r_his[-1] = int(hi2)
            else:
                r_los.append(int(lo2))
                r_his.append(int(hi2))
        r_lo = np.asarray(r_los, dtype=np.int64)
        r_hi = np.asarray(r_his, dtype=np.int64)
        rcache: dict = {}

        def ranged(f, t):
            got = rcache.get((f, t))
            if got is None:
                ch = chunks.get((f, t))
                if ch is None:
                    ch = get_chunk(f, t)
                if ch is None:
                    return None
                got = rcache[(f, t)] = RangeChunk(ch, r_lo, r_hi)
            return got

        docs, scores = eval_tree(node, ranged, norms_for, base_doc)
        if after is not None and docs.size:
            s_a, d_a = np.float32(after[0]), np.int64(after[1])
            keep_m = (scores < s_a) | ((scores == s_a) & (docs > d_a))
            docs, scores = docs[keep_m], scores[keep_m]
        if docs.size:
            got_d.append(docs)
            got_s.append(scores)
            count += docs.size
            if count >= k:
                merged = np.concatenate(got_s)
                if merged.size >= k:
                    theta = max(theta0,
                                float(np.partition(merged, -k)[-k]))
    if not got_d:
        return _empty_hits()
    return topk_select(np.concatenate(got_d), np.concatenate(got_s), k)


def score_bucket(qtype, chunks, scorers, norms_arr, base_doc, k,
                 pruned=True, slop=0, theta0=-np.inf):
    """Dispatch one (query, bucket) evaluation.

    chunks: list aligned with query terms; None where the term has no
    postings in this bucket. scorers: BM25Scorer per term, or a single
    scorer for phrase (sum-idf weight). theta0: optional global
    minimum-competitive score for term/or pruning.
    """
    if qtype == "term":
        return term_topk(chunks[0], scorers[0], norms_arr, base_doc, k,
                         pruned, theta0)
    if qtype == "and":
        if any(c is None for c in chunks):
            return np.zeros(0, np.int64), np.zeros(0, np.float32)
        return and_topk(chunks, scorers, norms_arr, base_doc, k, pruned)
    if qtype == "or":
        return or_topk(chunks, scorers, norms_arr, base_doc, k, pruned,
                       theta0)
    if qtype == "phrase":
        if any(c is None for c in chunks):
            return np.zeros(0, np.int64), np.zeros(0, np.float32)
        return phrase_topk(chunks, scorers[0], norms_arr, base_doc, k, pruned, slop)
    if qtype == "synonym":
        return synonym_topk(chunks, scorers[0], norms_arr, base_doc, k, pruned)
    raise ValueError(f"unknown query type {qtype}")
