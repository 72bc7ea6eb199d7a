"""FeatureField: static document features folded into the ranking
(core/src/java/org/apache/lucene/document/FeatureField.java).

The reference smuggles per-document feature values (pagerank, recency,
quality score) into a postings freq and scores them with one of four
pluggable functions, so a feature can sit in a BooleanQuery SHOULD
clause next to BM25 text clauses. On Spark the natural home for a
static per-doc value is a docstore/doc-values COLUMN; the functions
become Catalyst expressions (whole-stage codegen), and the SHOULD-
clause composition is score addition over the match stream.

Score functions (FeatureField.java:325-560, javadoc :585-690):

- linear:     weight * S                         (:585)
- log:        weight * ln(scalingFactor + S)     (:356, :606)
- saturation: weight * S / (S + pivot)           (:450, :634)
- sigmoid:    weight * S^a / (S^a + pivot^a)     (:531, :681)

NULL feature values score 0 (a doc without the feature term simply
does not match the feature query in the reference).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["feature_score", "boost_by_feature",
           "distance_feature_score", "boost_by_distance"]


def feature_score(value_col, fn: str = "saturation", weight: float = 1.0,
                  pivot: float = 1.0, scaling: float = 1.0,
                  exponent: float = 1.0) -> Column:
    """Catalyst expression for one feature function over a value
    column (name or Column). Matches the reference formulas exactly;
    NULLs -> 0."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    v = v.cast("double")
    if fn == "linear":
        s = F.lit(weight) * v
    elif fn == "log":
        s = F.lit(weight) * F.log(F.lit(scaling) + v)
    elif fn == "saturation":
        s = F.lit(weight) * v / (v + F.lit(pivot))
    elif fn == "sigmoid":
        p = F.pow(v, F.lit(exponent))
        s = (F.lit(weight) * p
             / (p + F.lit(float(pivot) ** float(exponent))))
    else:
        raise ValueError(f"unknown feature function {fn!r}")
    return F.coalesce(s, F.lit(0.0))


def boost_by_feature(searcher, query, value_col: str,
                     fn: str = "saturation", k: int = 10,
                     weight: float = 1.0, **params) -> DataFrame:
    """BooleanQuery(should=[query, FeatureField.new*Query(...)]) —
    the reference's recommended composition (FeatureField javadoc
    example): total = BM25(query) + feature(fn). Ranks the FULL match
    stream (the feature term matches every doc carrying the feature,
    so the reference's WAND bound comes from the feature maximum; here
    the exhaustive match stream joins the doc-values column and ONE
    TakeOrdered cuts the top-k). Returns (doc_id, score)."""
    m = searcher.matches_df(query)
    ds = searcher._read_cached(searcher.docstore_paths)
    j = ds.join(m, "doc_id", "inner")
    total = (F.col("score").cast("double")
             + feature_score(value_col, fn, weight, **params))
    return (j.select("doc_id", total.alias("score"))
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(k))


def distance_feature_score(value_col, origin: float, pivot: float,
                           weight: float = 1.0) -> Column:
    """DistanceFeatureQuery score as a Catalyst expression
    (core/src/java/org/apache/lucene/document/LongDistanceFeatureQuery.java:121,265):

        weight * pivot / (pivot + |value - origin|)

    — the recency/proximity boost behind
    ``LongPoint.newDistanceFeatureQuery`` (LongPoint.java). The
    reference requires pivot > 0 (:53-55) and skips docs without the
    field (they don't match the SHOULD clause): NULLs score 0 here.
    Arithmetic is double (the reference casts the same expression to
    float at :121; sub-ulp divergence only)."""
    if pivot <= 0:
        raise ValueError(f"pivotDistance must be > 0, got {pivot}")
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    dist = F.abs(v.cast("double") - F.lit(float(origin)))
    s = F.lit(float(weight)) * F.lit(float(pivot)) / (F.lit(float(pivot)) + dist)
    return F.coalesce(s, F.lit(0.0))


def boost_by_distance(searcher, query, value_col: str, origin: float,
                      pivot: float, k: int = 10,
                      weight: float = 1.0) -> DataFrame:
    """BooleanQuery(should=[query, LongPoint.newDistanceFeatureQuery])
    — the reference's recommended recency-boost composition
    (LongDistanceFeatureQuery.java javadoc): total = BM25(query) +
    weight * pivot / (pivot + |value - origin|). Same distributed
    shape as :func:`boost_by_feature` — the feature clause matches
    every doc carrying the field, so the match stream is ranked
    exhaustively (the reference's iterator-skipping optimization
    kicks in only once minCompetitiveScore exceeds the text clause's
    ceiling; our TakeOrderedAndProject tail keeps the top-k cut in one
    pass). The reference's bound story holds trivially: the clause's
    maximum contribution is ``weight`` (distance 0). Returns
    (doc_id, score)."""
    m = searcher.matches_df(query)
    ds = searcher._read_cached(searcher.docstore_paths)
    j = ds.join(m, "doc_id", "inner")
    total = (F.col("score").cast("double")
             + distance_feature_score(value_col, origin, pivot, weight))
    return (j.select("doc_id", total.alias("score"))
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(k))
