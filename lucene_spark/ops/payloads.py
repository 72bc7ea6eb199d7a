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
