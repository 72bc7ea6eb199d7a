"""Relevance-quality statistics (the ``lucene/benchmark`` quality module).

Reimplements, as pure Catalyst aggregations, the search-quality metrics
the reference benchmark harness computes when replaying a judged query
set (reference: ``lucene/benchmark/src/java/org/apache/lucene/benchmark/
quality/QualityStats.java:25-135`` for the per-query accumulation,
``QualityStats.java:192-235`` for the multi-query average, and
``quality/trec/TrecJudge.java:90-110`` for qrel-based relevance):

- **P@n** (``getPrecisionAt``): relevant-in-top-n / n, with the
  reference's short-result extrapolation — when the result list holds
  fewer than ``n`` points, ``P@n = numPoints * P@numPoints / n``
  (= numGoodPoints / n), ``QualityStats.java:112-119``.
- **Average precision** (``getAvp``): sum of P@rank over the ranks
  where a relevant doc appeared, normalized by ``maxGoodPoints`` (the
  judge's total relevant count, NOT the retrieved count); 0 when the
  judge knows no relevant docs, ``QualityStats.java:121-124``.
- **MRR** (``addResult``): 1/rank of the first relevant hit, but only
  when that rank is within the top 5 — otherwise 0,
  ``QualityStats.java:88-91``.
- **Recall**: numGoodPoints / maxGoodPoints, falling back to the last
  precision point when maxGoodPoints <= 0, ``QualityStats.java:100``.
- **Average over queries** (``average``): every quality measure is
  averaged over the *judged* queries only (maxGoodPoints > 0); MAP is
  the mean of per-query AvP over those queries,
  ``QualityStats.java:219-233``.

Scale shape: one broadcast-able join of results against judgments, one
bounded window (partitioned by query id over at most ``top-k`` ranks —
never a global sort), one groupBy(qid). The per-query result lists a
quality run scores are top-k-sized by construction, so the window state
is O(k) per query and the whole computation is one shuffle on qid.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAX_POINTS = 20  # QualityStats.MAX_POINTS (QualityStats.java:28)
MRR_WINDOW = 5   # first relevant hit counts for MRR only within top 5


def quality_stats(results: DataFrame, judgments: DataFrame,
                  p_points: Sequence[int] = (5, 10, 20),
                  ndigits: int = 6) -> DataFrame:
    """Per-query QualityStats.

    ``results``: (qid, doc_id, rank) — rank is 1-based and dense within
    each query, exactly the ordinal the reference feeds ``addResult``.
    ``judgments``: (qid, doc_id) pairs the judge deems relevant
    (TrecJudge keeps qrel rows with judgment > 0; filter upstream).

    Returns one row per qid appearing in *either* input (a judged query
    the engine returned nothing for still scores: numPoints=0, avp=0,
    recall=0) with columns: qid, num_points, num_good, max_good,
    p_at_{n} for each requested point, mrr, avp, recall — floats
    rounded to ``ndigits`` so the values are stable across summation
    orders.
    """
    for n in p_points:
        if not 1 <= n <= MAX_POINTS:
            raise ValueError(f"precision point {n} outside [1, {MAX_POINTS}]"
                             " (QualityStats.getPrecisionAt)")
    rel = judgments.select("qid", "doc_id").distinct()
    max_good = rel.groupBy("qid").agg(F.count("*").alias("max_good"))

    r = (results.select("qid", "doc_id", "rank")
         .join(rel.withColumn("rel", F.lit(1)), ["qid", "doc_id"], "left")
         .withColumn("rel", F.coalesce(F.col("rel"), F.lit(0))))
    w = Window.partitionBy("qid").orderBy("rank")
    r = (r.withColumn("cum", F.sum("rel").over(w))
          .withColumn("p", F.col("cum") / F.col("rank")))

    p_cols = [F.max(F.when(F.col("rank") == n, F.col("p")))
              .alias(f"_p{n}") for n in p_points]
    agg = r.groupBy("qid").agg(
        F.max("rank").alias("num_points"),
        F.sum("rel").alias("num_good"),
        F.sum(F.when(F.col("rel") == 1, F.col("p"))).alias("_prelsum"),
        F.min(F.when(F.col("rel") == 1, F.col("rank"))).alias("_first"),
        *p_cols,
    )

    out = (agg.join(max_good, "qid", "full")
           .withColumn("num_points",
                       F.coalesce(F.col("num_points"), F.lit(0)))
           .withColumn("num_good", F.coalesce(F.col("num_good"), F.lit(0)))
           .withColumn("max_good", F.coalesce(F.col("max_good"), F.lit(0))))

    # P@n extrapolation for short result lists (QualityStats.java:116):
    # n > numPoints  ->  numGoodPoints / n.
    for n in p_points:
        out = out.withColumn(
            f"p_at_{n}",
            F.round(F.when(F.col("num_points") >= n, F.col(f"_p{n}"))
                    .otherwise(F.col("num_good") / F.lit(float(n))),
                    ndigits))
    out = (out
           .withColumn("mrr",
                       F.round(F.when(F.col("_first") <= MRR_WINDOW,
                                      1.0 / F.col("_first"))
                               .otherwise(F.lit(0.0)), ndigits))
           .withColumn("avp",
                       F.round(F.when(F.col("max_good") > 0,
                                      F.coalesce(F.col("_prelsum"),
                                                 F.lit(0.0))
                                      / F.col("max_good"))
                               .otherwise(F.lit(0.0)), ndigits))
           .withColumn("recall",
                       F.round(F.when(F.col("max_good") > 0,
                                      F.col("num_good")
                                      / F.col("max_good"))
                               .otherwise(
                                   F.when(F.col("num_points") > 0,
                                          F.col("num_good")
                                          / F.col("num_points"))
                                   .otherwise(F.lit(0.0))), ndigits)))
    keep = (["qid", "num_points", "num_good", "max_good"]
            + [f"p_at_{n}" for n in p_points] + ["mrr", "avp", "recall"])
    return out.select(*[F.col(c) for c in keep])


def quality_average(stats: DataFrame,
                    p_points: Sequence[int] = (5, 10, 20),
                    ndigits: int = 6) -> DataFrame:
    """QualityStats.average: mean of every measure over the judged
    queries only (max_good > 0, ``QualityStats.java:206-218``); the
    avp mean IS the query set's MAP."""
    judged = stats.filter(F.col("max_good") > 0)
    cols = ([F.round(F.avg(c), ndigits).alias(c)
             for c in ("num_points", "num_good", "max_good")]
            + [F.round(F.avg(f"p_at_{n}"), ndigits).alias(f"p_at_{n}")
               for n in p_points]
            + [F.round(F.avg(c), ndigits).alias(c)
               for c in ("mrr", "avp", "recall")])
    return judged.agg(*cols).withColumn("qid", F.lit("__avg__")) \
                 .select("qid", *[c for c in judged.columns if c != "qid"])
