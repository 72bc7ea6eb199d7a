"""Query profiler — the QueryProfilerIndexSearcher analog
(sandbox/src/java/org/apache/lucene/sandbox/search/
QueryProfilerIndexSearcher.java + QueryProfilerTimingType.java +
ProfilerCollector.java).

The reference wraps every Weight/Scorer/DISI call with nanosecond
timers inside one JVM. A distributed engine's observable phases live
at a coarser granularity, so the breakdown here maps the reference's
timing types onto the phases this architecture actually has:

    REWRITE                  -> 'rewrite_ms'  (analyzer chains +
                                 fixpoint rewrite + MTQ expansion
                                 against the term dictionary)
    CREATE_WEIGHT            -> 'stats_ms'    (termstats lookups /
                                 pushed-down scans — Lucene's stats
                                 binding in Weight construction)
    BUILD_SCORER             -> 'plan_ms'     (plan-tree compile +
                                 DataFrame assembly, driver-side)
    NEXT_DOC/ADVANCE/SCORE/
    MATCH                    -> 'execute_ms'  (the Spark job: postings
                                 scan, kernels, top-k merge — the
                                 reference's per-DISI time is executor
                                 time here, indivisible from the
                                 driver without per-task tracing)

plus 'total_ms', 'n_rows', and 'collector' = the ProfilerCollector
reduce name. Per-phase attribution is exact because the phases are
run explicitly in sequence against the same memoized searcher state a
plain search_df uses (stats prime the same cache the search consumes).
"""

from __future__ import annotations

import time

from .query import rewrite
from .searcher import IndexSearcher

__all__ = ["profile_search"]


def profile_search(searcher: IndexSearcher, query, k: int = 10,
                   pruned: bool = True,
                   doc_filter: str | None = None):
    """Run ``query`` like ``search_df(...).collect()`` while timing
    each lifecycle phase. Returns (rows, profile dict). The result
    rows are identical to an unprofiled search — profiling only
    observes."""
    prof: dict = {"collector": "TopScoreDocCollector"}
    t0 = time.perf_counter()

    # REWRITE: analysis + fixpoint rewrite + term-dictionary expansion
    t = time.perf_counter()
    q = searcher._expand_mtq_tree(rewrite(searcher._analyze_query(query)))
    q = rewrite(q)
    prof["rewrite_ms"] = (time.perf_counter() - t) * 1e3

    # CREATE_WEIGHT: stats binding — primes the same bounded term
    # cache the search path reads, so the cost is counted HERE and not
    # inside plan/execute
    t = time.perf_counter()
    pairs: set = set()
    searcher._collect_pairs(q, pairs, getattr(q, "field", searcher.field))
    by_field: dict[str, list] = {}
    for f, term in pairs:
        by_field.setdefault(f, []).append(term)
    for f, terms in by_field.items():
        searcher.term_stats(sorted(terms), f)
    prof["stats_ms"] = (time.perf_counter() - t) * 1e3

    # BUILD_SCORER: plan compile + DataFrame assembly (driver only —
    # Spark is lazy, no job runs here)
    t = time.perf_counter()
    df = searcher.search_df(query, k=k, pruned=pruned,
                            doc_filter=doc_filter)
    prof["plan_ms"] = (time.perf_counter() - t) * 1e3

    # NEXT_DOC/SCORE: the distributed job
    t = time.perf_counter()
    rows = df.collect()
    prof["execute_ms"] = (time.perf_counter() - t) * 1e3

    prof["total_ms"] = (time.perf_counter() - t0) * 1e3
    prof["n_rows"] = len(rows)
    return rows, prof
