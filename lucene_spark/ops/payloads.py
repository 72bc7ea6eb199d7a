"""PayloadScoreQuery over a delimited-payload index
(queries/src/java/org/apache/lucene/queries/payloads/PayloadScoreQuery.java).

The reference wraps a SpanQuery, walks its matching spans with
Postings.PAYLOADS, folds each span's payload factor through a
PayloadFunction (Min/Max/Sum/Average), and scores each doc as

    includeSpanScore ? spanScore * payloadScore : payloadScore

with docScore = 1 when no payloads were seen (MinPayloadFunction.java:41
et al.) and a negative-or-NaN payloadScore truncated to 0
(PayloadScoreQuery.java:259-282).

Spark-first shape: the wrapped query's exhaustive match stream
(matches_df — one kernel pass per bucket) hash-joins the docstore, and
ONE Arrow-batched pass re-derives the term's payload factors from the
stored field (kernels/payload.py — the no-second-copy storage model:
the postings stay payload-free, the deterministic chain re-attaches
payloads for MATCHING docs only). The final top-k is a single
TakeOrderedAndProject. At 100 TB the extra cost over a plain term query
is one join against matching docs — the same class as stored-field
retrieval.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels.payload import payload_stats_frame, payload_term

__all__ = ["payload_score_df", "PAYLOAD_FUNCTIONS"]

PAYLOAD_FUNCTIONS = ("min", "max", "sum", "avg")


def payload_score_df(searcher, term: str, fn: str = "max",
                     include_span_score: bool = True, k: int = 10,
                     text_col: str = "text") -> DataFrame:
    """PayloadScoreQuery(SpanTermQuery(term), fn, FLOAT decode,
    includeSpanScore) -> top-k (doc_id, score).

    ``fn``: 'min' | 'max' | 'sum' | 'avg' (MinPayloadFunction,
    MaxPayloadFunction, SumPayloadFunction, AveragePayloadFunction).
    Occurrences without a payload decode to factor 1
    (PayloadDecoder.java:29); docs whose matching term saw no payload
    occurrences at all score payloadScore = 1 (docScore contract);
    negative or NaN payload scores truncate to 0.
    """
    if fn not in PAYLOAD_FUNCTIONS:
        raise ValueError(f"unknown payload function {fn!r}; "
                         f"expected one of {PAYLOAD_FUNCTIONS}")
    from ..search.query import TermQuery

    analyzed = payload_term(term)
    m = searcher.matches_df(TermQuery(term))
    ds = (searcher._read_cached(searcher.docstore_paths)
          .select("doc_id", F.col(text_col).alias("_ptext")))
    j = m.join(ds, "doc_id", "inner")

    use_span = bool(include_span_score)

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            stats = payload_stats_frame(pdf["_ptext"], analyzed)
            n = stats["n_seen"].to_numpy()
            if fn == "min":
                ps = stats["p_min"].to_numpy()
            elif fn == "max":
                ps = stats["p_max"].to_numpy()
            elif fn == "sum":
                ps = stats["p_sum"].to_numpy()
            else:  # avg
                with np.errstate(invalid="ignore"):
                    ps = (stats["p_sum"].to_numpy()
                          / np.maximum(n, 1).astype(np.float32))
            pay = np.where(n > 0, ps, np.float32(1.0)).astype(np.float32)
            # negative / NaN truncation (PayloadScoreQuery.java:259-282)
            pay = np.where(np.isnan(pay) | (pay < 0), np.float32(0.0), pay)
            span = pdf["score"].to_numpy(dtype=np.float32)
            score = (span * pay) if use_span else pay
            yield pdf[["doc_id"]].assign(score=score.astype(np.float64))

    scored = j.mapInPandas(run, schema="doc_id long, score double")
    return (scored.orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(k))


def span_payload_check_df(searcher, terms, expected, op: str = "eq",
                          ptype: str = "float",
                          text_col: str = "text") -> DataFrame:
    """SpanPayloadCheckQuery
    (queries/payloads/SpanPayloadCheckQuery.java): return the documents
    holding at least one span of the ordered ``terms`` whose per-position
    payloads satisfy (``op``, ``ptype``) against ``expected`` — None in
    ``expected`` demands a MISSING payload at that position; a missing
    payload fails any non-None expectation. ``op``: eq|gt|gte|lt|lte
    (MatchOperation; EQ is binary payload equality); ``ptype``:
    float|int|string (PayloadType decode).

    Returns (doc_id, n_spans) with n_spans = accepted span count (the
    SpanScorer's freq), ordered by doc_id.

    Distributed shape: the underlying span query (phrase/term over the
    payload chain's positions) prefilters via the postings — only docs
    containing the term sequence AT ALL reach the payload re-derivation
    pass, which is one Arrow-batched kernel over their stored fields.
    """
    from ..kernels.payload import span_payload_check_batch
    from ..search.query import PhraseQuery, TermQuery

    analyzed = [payload_term(t) for t in terms]
    q = TermQuery(terms[0]) if len(terms) == 1 \
        else PhraseQuery(tuple(terms))
    m = searcher.matches_df(q).select("doc_id")
    ds = (searcher._read_cached(searcher.docstore_paths)
          .select("doc_id", F.col(text_col).alias("_ptext")))
    j = m.join(ds, "doc_id", "inner")
    exp = list(expected)

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cnt = span_payload_check_batch(pdf["_ptext"], analyzed, exp,
                                           op=op, ptype=ptype)
            out = pdf[["doc_id"]].assign(n_spans=cnt)
            yield out[out["n_spans"] > 0]

    return (j.mapInPandas(run, schema="doc_id long, n_spans long")
            .orderBy("doc_id"))
