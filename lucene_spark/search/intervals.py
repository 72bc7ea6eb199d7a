"""Interval algebra — the queries/intervals module capability
(lucene/queries/src/java/org/apache/lucene/queries/intervals/
Intervals.java): composable positional sources with MINIMAL-interval
semantics.

Combinators: Term, Ordered, Unordered, MaxGaps, MaxWidth, Containing,
NotContaining, ContainedBy, NotContainedBy, Before, After,
Overlapping, NonOverlapping, Extend — plus non-Term interval
SOURCES: Or (Intervals.or, union of child interval sets), Phrase
(Intervals.phrase, one interval per exact-phrase occurrence) and
Prefix (Intervals.prefix, resolved against the term dictionary to an
Or of Term leaves by the searcher) — so proximity shapes like
"ordered(or(a, b), c)" compose (Intervals.java:63-210).

Every source evaluates — for ALL candidate docs of a bucket at once —
to a doc-keyed minimal interval set: int64 arrays (starts, ends) with
value = cand_rank * 2^32 + position, sorted ascending. Minimality
(no interval contains another) gives the invariant that BOTH starts
and ends are strictly increasing within a doc, which is what makes
each combinator a single searchsorted / running-extremum pass instead
of a per-doc loop (the same "no per-row Python" discipline as the
phrase kernels).

Gap accounting matches the reference for term-leaf trees:
``gaps = width - n_leaf_terms`` (IntervalIterator.gaps() with width-1
leaves).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .kernels import POS_OFF, _conj_candidates, _inner_chunk

__all__ = ["Term", "Or", "Phrase", "Prefix", "Ordered", "Unordered",
           "MaxGaps", "MaxWidth", "Containing", "NotContaining",
           "ContainedBy", "NotContainedBy", "Before", "After",
           "Overlapping", "NonOverlapping", "Extend", "eval_intervals",
           "leaf_terms", "required_terms", "candidate_docs",
           "resolve_prefixes", "map_terms"]


# ---------------------------------------------------------------------------
# source AST (picklable frozen dataclasses)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Term:
    term: str


@dataclass(frozen=True)
class Or:
    """Union of child interval sets, minimalized (Intervals.or,
    queries/intervals/DisjunctionIntervalsSource). Gap accounting for
    an enclosing MaxGaps uses the FIRST child's leaf count — children
    of different widths share the reference's subtlety that gaps
    derive from matched widths; keep alternatives width-uniform when
    exact gap semantics matter."""
    sources: tuple


@dataclass(frozen=True)
class Phrase:
    """One interval [p, p+m-1] per EXACT phrase occurrence
    (Intervals.phrase over term leaves)."""
    terms: tuple


@dataclass(frozen=True)
class Prefix:
    """All positions of dictionary terms starting with ``prefix``
    (Intervals.prefix). The searcher resolves it against the term
    dictionary into Or(Term, ...) before kernel evaluation
    (resolve_prefixes); evaluating an unresolved Prefix raises."""
    prefix: str
    max_expansions: int = 128


@dataclass(frozen=True)
class Ordered:
    sources: tuple


@dataclass(frozen=True)
class Unordered:
    sources: tuple


@dataclass(frozen=True)
class MaxGaps:
    source: object
    gaps: int


@dataclass(frozen=True)
class MaxWidth:
    source: object
    width: int


@dataclass(frozen=True)
class Containing:
    big: object
    small: object


@dataclass(frozen=True)
class NotContaining:
    big: object
    small: object


@dataclass(frozen=True)
class ContainedBy:
    small: object
    big: object


@dataclass(frozen=True)
class NotContainedBy:
    small: object
    big: object


@dataclass(frozen=True)
class Before:
    """Source intervals that end before the start of SOME reference
    interval in the same doc (Intervals.before,
    queries/intervals/Intervals.java)."""
    source: object
    reference: object


@dataclass(frozen=True)
class After:
    """Source intervals that start after the end of SOME reference
    interval in the same doc (Intervals.after)."""
    source: object
    reference: object


@dataclass(frozen=True)
class Overlapping:
    """Source intervals overlapping at least one reference interval
    (Intervals.overlapping)."""
    source: object
    reference: object


@dataclass(frozen=True)
class NonOverlapping:
    """Minuend intervals with NO overlap with any subtrahend interval
    (Intervals.nonOverlapping). The subtrahend is not required — its
    absence lets every minuend interval pass."""
    source: object
    reference: object


@dataclass(frozen=True)
class Extend:
    """Intervals of the source widened by ``before`` positions on the
    left (clamped at position 0) and ``after`` on the right
    (Intervals.extend). Gap accounting treats the extension as width —
    an enclosing MaxGaps sees the widened interval (documented; the
    reference's ExtendedIntervalsSource reports adjusted ends the same
    way)."""
    source: object
    before: int = 0
    after: int = 0


def leaf_terms(src) -> set:
    if isinstance(src, Term):
        return {src.term}
    if isinstance(src, Phrase):
        return set(src.terms)
    if isinstance(src, (Ordered, Unordered, Or)):
        out = set()
        for s in src.sources:
            out |= leaf_terms(s)
        return out
    if isinstance(src, (MaxGaps, MaxWidth)):
        return leaf_terms(src.source)
    if isinstance(src, (Containing, NotContaining)):
        return leaf_terms(src.big) | leaf_terms(src.small)
    if isinstance(src, (ContainedBy, NotContainedBy)):
        return leaf_terms(src.small) | leaf_terms(src.big)
    if isinstance(src, (Before, After, Overlapping, NonOverlapping)):
        return leaf_terms(src.source) | leaf_terms(src.reference)
    if isinstance(src, Extend):
        return leaf_terms(src.source)
    if isinstance(src, Prefix):
        raise TypeError("Prefix must be resolved against the term "
                        "dictionary first (resolve_prefixes)")
    raise TypeError(type(src))


def required_terms(src) -> set:
    """Terms a doc MUST contain to yield any interval — the conjunction
    that prunes candidate docs. The `small` side of NotContaining /
    NotContainedBy is NOT required (its absence lets everything pass);
    an Or branch requires only what EVERY alternative requires."""
    if isinstance(src, Term):
        return {src.term}
    if isinstance(src, Phrase):
        return set(src.terms)
    if isinstance(src, Or):
        outs = [required_terms(s) for s in src.sources]
        if not outs:
            return set()
        return set.intersection(*outs)
    if isinstance(src, (Ordered, Unordered)):
        out = set()
        for s in src.sources:
            out |= required_terms(s)
        return out
    if isinstance(src, (MaxGaps, MaxWidth)):
        return required_terms(src.source)
    if isinstance(src, Containing):
        return required_terms(src.big) | required_terms(src.small)
    if isinstance(src, ContainedBy):
        return required_terms(src.small) | required_terms(src.big)
    if isinstance(src, NotContaining):
        return required_terms(src.big)
    if isinstance(src, NotContainedBy):
        return required_terms(src.small)
    if isinstance(src, (Before, After, Overlapping)):
        # a match needs both an interval AND a qualifying reference
        return required_terms(src.source) | required_terms(src.reference)
    if isinstance(src, NonOverlapping):
        return required_terms(src.source)
    if isinstance(src, Extend):
        return required_terms(src.source)
    if isinstance(src, Prefix):
        raise TypeError("Prefix must be resolved against the term "
                        "dictionary first (resolve_prefixes)")
    raise TypeError(type(src))


def _n_leaves(src) -> int:
    if isinstance(src, Term):
        return 1
    if isinstance(src, Phrase):
        return len(src.terms)
    if isinstance(src, Or):
        # alternatives of one Or occupy ONE slot each occurrence; gap
        # accounting uses the first child's leaf count (see Or doc)
        return _n_leaves(src.sources[0]) if src.sources else 1
    if isinstance(src, (Ordered, Unordered)):
        return sum(_n_leaves(s) for s in src.sources)
    if isinstance(src, (MaxGaps, MaxWidth)):
        return _n_leaves(src.source)
    if isinstance(src, (Containing, NotContaining)):
        return _n_leaves(src.big)
    if isinstance(src, (ContainedBy, NotContainedBy)):
        return _n_leaves(src.small)
    if isinstance(src, (Before, After, Overlapping, NonOverlapping,
                        Extend)):
        return _n_leaves(src.source)
    raise TypeError(type(src))


def map_terms(src, fn):
    """Rewrite every Term/Phrase LEAF term through ``fn`` (the query
    analysis step for analyzed fields — QueryBuilder's per-slot term
    analysis applied to interval sources). Prefix patterns are NOT
    analyzed (MTQ patterns match the dictionary as stored)."""
    M = lambda s: map_terms(s, fn)
    if isinstance(src, Term):
        return Term(fn(src.term))
    if isinstance(src, Phrase):
        return Phrase(tuple(fn(t) for t in src.terms))
    if isinstance(src, Prefix):
        return src
    if isinstance(src, (Ordered, Unordered, Or)):
        return type(src)(tuple(M(s) for s in src.sources))
    if isinstance(src, MaxGaps):
        return MaxGaps(M(src.source), src.gaps)
    if isinstance(src, MaxWidth):
        return MaxWidth(M(src.source), src.width)
    if isinstance(src, (Containing, NotContaining)):
        return type(src)(M(src.big), M(src.small))
    if isinstance(src, (ContainedBy, NotContainedBy)):
        return type(src)(M(src.small), M(src.big))
    if isinstance(src, (Before, After, Overlapping, NonOverlapping)):
        return type(src)(M(src.source), M(src.reference))
    if isinstance(src, Extend):
        return Extend(M(src.source), src.before, src.after)
    raise TypeError(type(src))


def resolve_prefixes(src, expand):
    """Replace Prefix leaves with Or(Term, ...) via ``expand(prefix,
    max_expansions) -> [terms]`` (the term-dictionary rewrite)."""
    R = lambda s: resolve_prefixes(s, expand)
    if isinstance(src, Prefix):
        return Or(tuple(Term(t) for t in expand(src.prefix,
                                                src.max_expansions)))
    if isinstance(src, (Term, Phrase)):
        return src
    if isinstance(src, (Ordered, Unordered, Or)):
        return type(src)(tuple(R(s) for s in src.sources))
    if isinstance(src, MaxGaps):
        return MaxGaps(R(src.source), src.gaps)
    if isinstance(src, MaxWidth):
        return MaxWidth(R(src.source), src.width)
    if isinstance(src, (Containing, NotContaining)):
        return type(src)(R(src.big), R(src.small))
    if isinstance(src, (ContainedBy, NotContainedBy)):
        return type(src)(R(src.small), R(src.big))
    if isinstance(src, (Before, After, Overlapping, NonOverlapping)):
        return type(src)(R(src.source), R(src.reference))
    if isinstance(src, Extend):
        return Extend(R(src.source), src.before, src.after)
    raise TypeError(type(src))


# ---------------------------------------------------------------------------
# evaluation
# ---------------------------------------------------------------------------

def _minimal_by_suffix_end(starts, ends):
    """Keep intervals whose end is strictly below every later interval's
    end (starts are ascending => interval i contains a later j iff
    ends[j] <= ends[i]). Later DOCS have larger keyed ends, so one
    global reversed running-min works across all docs at once."""
    if starts.size == 0:
        return starts, ends
    suf = np.empty_like(ends)
    suf[-1] = np.iinfo(np.int64).max
    if ends.size > 1:
        suf[:-1] = np.minimum.accumulate(ends[::-1])[::-1][1:]
    keep = ends < suf
    return starts[keep], ends[keep]


def _minimal_by_prefix_start(starts, ends):
    """Dual filter for end-sorted windows: keep i iff start_i is
    strictly above every earlier start (earlier docs' keyed starts are
    smaller, so the global prefix-max is doc-safe)."""
    if starts.size == 0:
        return starts, ends
    pre = np.empty_like(starts)
    pre[0] = np.iinfo(np.int64).min
    if starts.size > 1:
        pre[1:] = np.maximum.accumulate(starts)[:-1]
    keep = starts > pre
    return starts[keep], ends[keep]


def _same_doc(a, b):
    return (a >> 32) == (b >> 32)


def eval_intervals(src, pos_of) -> tuple:
    """Evaluate a source -> (starts, ends) doc-keyed minimal intervals.

    pos_of(term) -> sorted doc-keyed positions of the term over the
    candidate docs (empty where absent)."""
    E = eval_intervals
    if isinstance(src, Term):
        p = pos_of(src.term)
        return p, p
    if isinstance(src, Or):
        parts = [E(s, pos_of) for s in src.sources]
        live = [p for p in parts if p[0].size]
        if not live:
            return _empty()
        all_s = np.concatenate([p[0] for p in live])
        all_e = np.concatenate([p[1] for p in live])
        # sort by (end asc, start desc): among same-end intervals the
        # tightest (largest start) comes first and survives the
        # prefix-start minimality filter; duplicates collapse
        order = np.lexsort((-all_s, all_e))
        return _minimal_by_prefix_start(all_s[order], all_e[order])
    if isinstance(src, Phrase):
        parts = [pos_of(t) for t in src.terms]
        if any(p.size == 0 for p in parts):
            return _empty()
        cur = parts[0]
        for off, pk in enumerate(parts[1:], 1):
            # pk - off stays intersectable only within the same doc key:
            # an underflow across the key boundary yields a position
            # ~2^32 that can never match a real position
            cur = np.intersect1d(cur, pk - off, assume_unique=True)
            if cur.size == 0:
                return _empty()
        return cur, cur + (len(src.terms) - 1)
    if isinstance(src, Ordered):
        parts = [E(s, pos_of) for s in src.sources]
        if any(p[0].size == 0 for p in parts):
            return _empty()
        starts, chain_end = parts[0]
        ok = np.ones(starts.size, dtype=bool)
        for S_k, E_k in parts[1:]:
            idx = np.searchsorted(S_k, chain_end, side="right")
            ok &= idx < S_k.size
            idx_c = np.minimum(idx, S_k.size - 1)
            nxt_s, nxt_e = S_k[idx_c], E_k[idx_c]
            ok &= _same_doc(nxt_s, chain_end)
            chain_end = nxt_e
        s, e = starts[ok], chain_end[ok]
        return _minimal_by_suffix_end(s, e)
    if isinstance(src, Unordered):
        parts = [E(s, pos_of) for s in src.sources]
        if any(p[0].size == 0 for p in parts):
            return _empty()
        # events sorted by end; per-child forward-fill of the largest
        # start with end <= current end (minimal sets: start asc <=>
        # end asc), window = [min child start, event end]
        all_e = np.concatenate([p[1] for p in parts])
        all_s = np.concatenate([p[0] for p in parts])
        tags = np.concatenate([np.full(p[0].size, i, dtype=np.int64)
                               for i, p in enumerate(parts)])
        order = np.argsort(all_e, kind="stable")
        ev_e, ev_s, ev_t = all_e[order], all_s[order], tags[order]
        minstart = np.full(ev_e.size, np.iinfo(np.int64).max, dtype=np.int64)
        for i in range(len(parts)):
            v = np.where(ev_t == i, ev_s, np.int64(-1))
            minstart = np.minimum(minstart, np.maximum.accumulate(v))
        valid = (minstart >= 0) & _same_doc(minstart, ev_e)
        s, e = minstart[valid], ev_e[valid]
        return _minimal_by_prefix_start(s, e)
    if isinstance(src, MaxGaps):
        s, e = E(src.source, pos_of)
        width = e - s + 1
        keep = (width - _n_leaves(src.source)) <= src.gaps
        return s[keep], e[keep]
    if isinstance(src, MaxWidth):
        s, e = E(src.source, pos_of)
        keep = (e - s + 1) <= src.width
        return s[keep], e[keep]
    if isinstance(src, (Containing, NotContaining)):
        bs, be = E(src.big, pos_of)
        ss, se = E(src.small, pos_of)
        if bs.size == 0:
            return _empty()
        if ss.size == 0:
            hit = np.zeros(bs.size, dtype=bool)
        else:
            # first small with start >= big.start has the min end among
            # those (minimal set: ends ascend with starts)
            idx = np.searchsorted(ss, bs, side="left")
            idx_c = np.minimum(idx, ss.size - 1)
            hit = ((idx < ss.size) & _same_doc(ss[idx_c], bs)
                   & (se[idx_c] <= be))
        keep = hit if isinstance(src, Containing) else ~hit
        return bs[keep], be[keep]
    if isinstance(src, (ContainedBy, NotContainedBy)):
        ss, se = E(src.small, pos_of)
        bs, be = E(src.big, pos_of)
        if ss.size == 0:
            return _empty()
        if bs.size == 0:
            hit = np.zeros(ss.size, dtype=bool)
        else:
            # rightmost big with start <= small.start has the max end
            idx = np.searchsorted(bs, ss, side="right") - 1
            idx_c = np.maximum(idx, 0)
            hit = ((idx >= 0) & _same_doc(bs[idx_c], ss)
                   & (se <= be[idx_c]))
        keep = hit if isinstance(src, ContainedBy) else ~hit
        return ss[keep], se[keep]
    if isinstance(src, (Before, After)):
        ss, se = E(src.source, pos_of)
        rs, re_ = E(src.reference, pos_of)
        if ss.size == 0 or rs.size == 0:
            return _empty()
        if isinstance(src, Before):
            # exists r with r.start > i.end <=> i.end < LAST ref start
            # of the doc (keyed arrays ascend; the last start of doc d
            # is the last value below (d+1) << 32)
            idx = np.searchsorted(rs, ((ss >> 32) + 1) << 32,
                                  side="left") - 1
            idx_c = np.maximum(idx, 0)
            hit = ((idx >= 0) & _same_doc(rs[idx_c], ss)
                   & (se < rs[idx_c]))
        else:
            # exists r with r.end < i.start <=> i.start > FIRST ref
            # end of the doc
            idx = np.searchsorted(re_, (ss >> 32) << 32, side="left")
            idx_c = np.minimum(idx, re_.size - 1)
            hit = ((idx < re_.size) & _same_doc(re_[idx_c], ss)
                   & (ss > re_[idx_c]))
        return ss[hit], se[hit]
    if isinstance(src, (Overlapping, NonOverlapping)):
        ss, se = E(src.source, pos_of)
        rs, re_ = E(src.reference, pos_of)
        if ss.size == 0:
            return _empty()
        if rs.size == 0:
            hit = np.zeros(ss.size, dtype=bool)
        else:
            # first ref with end >= i.start has the smallest start
            # among that suffix (minimal sets: starts ascend with
            # ends); overlap iff that start <= i.end in the same doc
            idx = np.searchsorted(re_, ss, side="left")
            idx_c = np.minimum(idx, re_.size - 1)
            hit = ((idx < re_.size) & _same_doc(rs[idx_c], ss)
                   & (rs[idx_c] <= se))
        keep = hit if isinstance(src, Overlapping) else ~hit
        return ss[keep], se[keep]
    if isinstance(src, Extend):
        s, e = E(src.source, pos_of)
        if s.size == 0:
            return _empty()
        base = (s >> 32) << 32
        s2 = np.maximum(base, s - np.int64(src.before))
        e2 = e + np.int64(src.after)
        # clamping at position 0 can break minimality — re-minimalize
        # like Or does
        order = np.lexsort((-s2, e2))
        return _minimal_by_prefix_start(s2[order], e2[order])
    raise TypeError(type(src))


def _empty():
    return np.zeros(0, np.int64), np.zeros(0, np.int64)


def positions_sparse(chunk, cand):
    """Doc-keyed positions of every candidate doc PRESENT in the chunk
    (docs absent from the chunk contribute nothing) — the tolerant
    variant of the phrase kernels' gather, for optional interval
    sources."""
    raw = _inner_chunk(chunk)
    cand = np.asarray(cand, dtype=np.int64)
    if raw is None or cand.size == 0 or raw.n_blocks() == 0:
        return np.zeros(0, dtype=np.int64)
    ranks = np.arange(cand.size, dtype=np.int64)
    bidx = np.searchsorted(raw.lasts, cand, side="left")
    bidx = np.minimum(bidx, raw.n_blocks() - 1)
    parts = []
    for bi in np.unique(bidx):
        docs, _ = raw.decode(int(bi))
        flat, tfs = raw.positions_flat(int(bi))
        in_block = bidx == bi
        cdocs = cand[in_block]
        j = np.searchsorted(docs, cdocs)
        j_c = np.minimum(j, docs.size - 1)
        present = docs[j_c] == cdocs
        if not present.any():
            continue
        j, sel_ranks = j_c[present], ranks[in_block][present]
        ends = np.cumsum(tfs)
        starts = ends - tfs
        seg_starts, seg_lens = starts[j], tfs[j]
        total = int(seg_lens.sum())
        head = np.repeat(seg_starts, seg_lens)
        local = (np.arange(total, dtype=np.int64)
                 - np.repeat(np.cumsum(seg_lens) - seg_lens, seg_lens))
        pos = flat[head + local]
        keys = np.repeat(sel_ranks, seg_lens)
        parts.append(pos + keys * POS_OFF)
    if not parts:
        return np.zeros(0, dtype=np.int64)
    return np.concatenate(parts)


def candidate_docs(src, by_term: dict) -> np.ndarray:
    """Candidate docs for one bucket: the conjunction of the source's
    required terms when any exist; otherwise (a top-level Or with no
    common requirement) the union of docs containing ANY leaf term."""
    req = sorted(required_terms(src))
    if req:
        chunks = [by_term.get(t) for t in req]
        if any(c is None for c in chunks):
            return np.zeros(0, np.int64)
        return _conj_candidates(chunks, pruned=True)
    parts = [by_term[t].decode_all()[0] for t in sorted(leaf_terms(src))
             if t in by_term]
    parts = [p for p in parts if p.size]
    if not parts:
        return np.zeros(0, np.int64)
    return np.unique(np.concatenate(parts))


def match_bucket(src, by_term: dict, cand) -> tuple:
    """Evaluate one interval source for one bucket.

    by_term: {term: chunk}; cand: sorted candidate docs (must contain
    every required term). Returns (doc_ids, n_intervals, min_width)
    for docs with >= 1 interval."""
    cand = np.asarray(cand, dtype=np.int64)
    if cand.size == 0:
        return (np.zeros(0, np.int64), np.zeros(0, np.int64),
                np.zeros(0, np.int64))
    cache: dict = {}

    def pos_of(term):
        got = cache.get(term)
        if got is None:
            ch = by_term.get(term)
            got = cache[term] = (positions_sparse(ch, cand)
                                 if ch is not None
                                 else np.zeros(0, np.int64))
        return got

    s, e = eval_intervals(src, pos_of)
    if s.size == 0:
        return (np.zeros(0, np.int64), np.zeros(0, np.int64),
                np.zeros(0, np.int64))
    keys = (s >> 32).astype(np.int64)
    n = np.bincount(keys, minlength=cand.size)
    width = e - s + 1
    minw = np.full(cand.size, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(minw, keys, width)
    hit = n > 0
    return cand[hit], n[hit], minw[hit]
