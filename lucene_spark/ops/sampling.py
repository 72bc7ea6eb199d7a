"""Deterministic stratified sampling for training-mix construction.

Building a training mixture means sampling each stratum (language,
source, quality band, ...) at its own rate — reproducibly, so the same
(seed, corpus) always yields the same mix, resumable shard by shard
with no coordination. The standard trick: hash each row's stable id
with the seed and keep the row iff the hash falls under the rate
threshold. No RNG state, no shuffle, no driver coordination — a pure
pushed-down filter that runs at parquet-scan speed on any number of
executors, and membership of a row is independent of partitioning,
executor count, and execution order.

Hashing is md5 (engine-independent, like ops/dedup): the first 8 hex
chars of md5(seed || ':' || id) compared LEXICOGRAPHICALLY against the
rate's 8-hex-char threshold — string comparison gives identical
results in Spark, DuckDB, or any ANSI engine with md5, with no
integer-parsing edge cases. rate >= 1.0 keeps everything ('g' sorts
above every hex digit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["rate_threshold", "stratified_sample", "sample_rates_table",
           "unimax_allocation", "temperature_allocation"]

_HEX_SPAN = 16 ** 8


def rate_threshold(rate: float) -> str:
    """8-hex-char lexicographic threshold for a sampling rate in [0, 1];
    'g' (> 'f') for rate >= 1.0 so the filter keeps every row."""
    if rate >= 1.0:
        return "g"
    if rate <= 0.0:
        return "0" * 8
    return format(int(rate * _HEX_SPAN), "08x")


def _key(seed: int, id_col: str) -> F.Column:
    return F.substring(
        F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col)
                          .cast("string"))), 1, 8)


def stratified_sample(df: DataFrame, stratum_col: str,
                      rates: dict[str, float], seed: int = 0,
                      id_col: str = "doc_id",
                      default_rate: float = 0.0) -> DataFrame:
    """Keep each row of ``df`` independently with its stratum's rate.

    ``rates`` maps stratum value -> rate in [0, 1]; strata not listed
    use ``default_rate``. Deterministic in (seed, id): re-running, or
    running distributed over any partitioning, selects the same rows.
    Returns the input rows (all columns) that survive.
    """
    thr = F.lit(rate_threshold(default_rate))
    for val, rate in sorted(rates.items()):
        thr = F.when(F.col(stratum_col) == F.lit(val),
                     F.lit(rate_threshold(rate))).otherwise(thr)
    return df.filter(_key(seed, id_col) < thr)


def sample_rates_table(df: DataFrame, stratum_col: str,
                       rates: dict[str, float], seed: int = 0,
                       id_col: str = "doc_id",
                       default_rate: float = 0.0) -> DataFrame:
    """Audit view of a stratified sample: per-stratum population,
    sampled count, and realized rate (one map-side-combined groupBy)."""
    sampled = stratified_sample(df, stratum_col, rates, seed=seed,
                                id_col=id_col, default_rate=default_rate)
    pop = (df.groupBy(stratum_col)
           .agg(F.count("*").alias("n_total")))
    got = (sampled.groupBy(stratum_col)
           .agg(F.count("*").alias("n_sampled")))
    return (pop.join(got, stratum_col, "left")
            .select(stratum_col, "n_total",
                    F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
                    F.round(F.coalesce("n_sampled", F.lit(0))
                            / F.col("n_total"), 4).alias("realized_rate")))


def unimax_allocation(df: DataFrame, stratum_col: str, budget: float,
                      max_epochs: float = 1.0,
                      weight_col: str | None = None,
                      text_col: str = "text") -> DataFrame:
    """UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer and
    More Effective Language Sampling for Large-Scale Multilingual
    Pretraining"): split a total token ``budget`` across strata
    (languages) as uniformly as possible, capping each stratum at
    ``max_epochs`` passes over its available tokens — the waterfill:
    walk strata by available tokens ASCENDING (ties: stratum asc) and
    give each min(max_epochs * available, remaining / strata_left).

    Available tokens per stratum come from ``weight_col`` if given,
    else from counting analyzer-equivalent tokens of ``text_col``.
    The count is a map-side-combined distributed aggregate; the
    waterfill itself runs driver-side over the strata table (languages
    are enum-small — the same scale the paper allocates over).

    Returns (stratum, available, allocated, epochs, rate): ``rate`` =
    min(1, allocated / available) is the per-stratum Bernoulli rate to
    feed :func:`stratified_sample` for single-pass construction;
    ``epochs`` > 1 means the training loader repeats the stratum."""
    if budget <= 0:
        raise ValueError("budget must be > 0")
    if max_epochs <= 0:
        raise ValueError("max_epochs must be > 0")
    from .dedup import tokens_expr
    w = (F.col(weight_col).cast("double") if weight_col
         else F.size(tokens_expr(text_col)).cast("double"))
    counts = (df.select(F.col(stratum_col).cast("string")
                        .alias("stratum"),
                        F.coalesce(w, F.lit(0.0)).alias("w"))
              .groupBy("stratum").agg(F.sum("w").alias("available"))
              .collect())
    rows = sorted(((float(r["available"]), r["stratum"])
                   for r in counts), key=lambda t: (t[0], str(t[1])))
    remaining = float(budget)
    out = []
    for i, (avail, stratum) in enumerate(rows):
        alloc = min(max_epochs * avail, remaining / (len(rows) - i))
        remaining -= alloc
        out.append((stratum, avail, alloc, alloc / avail if avail else 0.0,
                    min(1.0, alloc / avail) if avail else 0.0))
    spark = df.sparkSession
    return spark.createDataFrame(
        out, "stratum string, available double, allocated double, "
             "epochs double, rate double")


def temperature_allocation(df: DataFrame, stratum_col: str, budget: float,
                           alpha: float = 0.3,
                           max_epochs: float | None = None,
                           weight_col: str | None = None,
                           text_col: str = "text") -> DataFrame:
    """Temperature-based budget allocation — the exponential-smoothing
    sampling rule of multilingual pretraining (mT5 / XLM-R style:
    q_i = n_i^alpha / sum_j n_j^alpha, alpha in (0, 1] flattening the
    head-language dominance; alpha=1 is proportional, alpha->0
    approaches uniform). Each stratum gets ``budget * q_i`` tokens.

    ``max_epochs`` optionally caps a stratum at that many passes over
    its available tokens; the capped excess redistributes among the
    uncapped strata proportionally to their q — computed exactly in
    ONE pass by walking strata ASCENDING by their cap-to-weight ratio
    (max_epochs * available^(1-alpha), ties stratum asc): a stratum
    caps out iff it would cap under every later water level, so
    alloc_i = min(cap_i, q_i * remaining / Q_left) is exact.

    Same input aggregation and output schema as
    :func:`unimax_allocation` (stratum, available, allocated, epochs,
    rate) — ``rate`` feeds :func:`stratified_sample` the same way.
    """
    if budget <= 0:
        raise ValueError("budget must be > 0")
    if not 0 < alpha <= 1:
        raise ValueError("alpha must be in (0, 1]")
    if max_epochs is not None and max_epochs <= 0:
        raise ValueError("max_epochs must be > 0")
    from .dedup import tokens_expr
    w = (F.col(weight_col).cast("double") if weight_col
         else F.size(tokens_expr(text_col)).cast("double"))
    counts = (df.select(F.col(stratum_col).cast("string")
                        .alias("stratum"),
                        F.coalesce(w, F.lit(0.0)).alias("w"))
              .groupBy("stratum").agg(F.sum("w").alias("available"))
              .collect())
    rows = [(float(r["available"]), r["stratum"]) for r in counts]
    qs = {s: a ** alpha if a > 0 else 0.0 for a, s in rows}
    out = []
    if max_epochs is None:
        q_total = sum(qs.values())
        for avail, stratum in sorted(rows, key=lambda t: (t[0],
                                                          str(t[1]))):
            alloc = budget * qs[stratum] / q_total if q_total else 0.0
            out.append((stratum, avail, alloc,
                        alloc / avail if avail else 0.0,
                        min(1.0, alloc / avail) if avail else 0.0))
    else:
        ordered = sorted(
            rows, key=lambda t: (max_epochs * t[0] ** (1.0 - alpha)
                                 if t[0] > 0 else 0.0, str(t[1])))
        remaining = float(budget)
        q_left = sum(qs.values())
        for avail, stratum in ordered:
            q = qs[stratum]
            alloc = (min(max_epochs * avail,
                         q * remaining / q_left) if q_left else 0.0)
            remaining -= alloc
            q_left -= q
            out.append((stratum, avail, alloc,
                        alloc / avail if avail else 0.0,
                        min(1.0, alloc / avail) if avail else 0.0))
    spark = df.sparkSession
    return spark.createDataFrame(
        out, "stratum string, available double, allocated double, "
             "epochs double, rate double")
