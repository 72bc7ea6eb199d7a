"""Hierarchical (taxonomy) faceting over match streams.

The reference facet module counts '/'-separated taxonomy paths for the
docs a query matches, supports drilling into a path prefix, and
computes drill-SIDEWAYS counts (a dimension's counts with every OTHER
dimension's drill applied but its own removed):
- facet/src/java/org/apache/lucene/facet/taxonomy/FastTaxonomyFacetCounts.java:40
- facet/src/java/org/apache/lucene/facet/DrillDownQuery.java
- facet/src/java/org/apache/lucene/facet/DrillSideways.java

Spark-first shape: everything here is a pure Catalyst expression tree —
split + prefix explode + groupBy count, whole-stage codegen end to end,
one map-side-combined shuffle per aggregation, no UDFs. The match
stream (doc_id rows from any query) is joined to the doc metadata once;
at 100 TB the join is a broadcast when matches are selective and a
plain shuffle join otherwise — Catalyst/AQE picks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def taxonomy_counts(matches: DataFrame, docs: DataFrame, path_col: str,
                    max_level: int | None = None,
                    id_col: str = "doc_id") -> DataFrame:
    """Counts for EVERY prefix of every matching doc's taxonomy path
    (FastTaxonomyFacetCounts: each doc increments each ancestor ordinal
    once). Returns (level, path, n_docs), level = component count.

    One posexplode over the path's prefixes -> groupBy count; prefixes
    are built with slice + array_join (no UDF)."""
    j = matches.select(id_col).join(docs.select(id_col, path_col), id_col)
    parts = F.split(F.col(path_col), "/")
    prefixes = F.expr(
        f"transform(sequence(1, size(split({path_col}, '/'))), "
        f"i -> array_join(slice(split({path_col}, '/'), 1, i), '/'))")
    ex = j.select(F.posexplode(prefixes).alias("lvl0", "path"))
    out = (ex.groupBy((F.col("lvl0") + 1).alias("level"), "path")
           .agg(F.count("*").alias("n_docs")))
    if max_level is not None:
        out = out.filter(F.col("level") <= max_level)
    return out


def sampled_counts(matches: DataFrame, docs: DataFrame, dim_col: str,
                   sample_size: int, seed: int = 0,
                   id_col: str = "doc_id") -> DataFrame:
    """RandomSamplingFacetsCollector analog (facet/src/java/org/apache/
    lucene/facet/RandomSamplingFacetsCollector.java:42): facet counts
    over a SAMPLE of the match stream, amortized back to the full
    population — the knob that makes faceting over a billion-hit match
    stream cost a ``sample_size``-bounded aggregate.

    Sampling is the md5-threshold Bernoulli filter from ops/sampling
    (deterministic in (seed, doc_id), partition-independent, pushed
    down to the match stream) at rate = sample_size / total_hits; the
    reference draws a per-segment binomial with an XORShift stream
    seeded likewise. When total_hits <= sample_size no sampling
    happens (the reference's constructor fast path).

    Amortization mirrors amortizeFacetCounts: corrected = floor(
    sampled / rate), capped at the dimension value's TRUE doc count
    over the full match stream's corpus column (the reference caps at
    reader.docFreq(dim path)); counts over an unsampled stream pass
    through unchanged. Returns (value, n_sampled, n_amortized)."""
    from .sampling import rate_threshold
    # NULL dimension values count nowhere in BOTH paths (a doc with no
    # facet value has no ordinal in the reference); without this, the
    # no-sampling pass-through kept a NULL group that the sampled
    # path's equi-join silently dropped — same data, different result
    # schema across the sampling threshold
    j = (matches.select(id_col)
         .join(docs.select(id_col, F.col(dim_col).alias("value")), id_col)
         .filter(F.col("value").isNotNull()))
    total = j.count()
    cap = docs.groupBy(F.col(dim_col).alias("value")) \
        .agg(F.count("*").alias("_cap"))
    if total <= sample_size:
        ex = j.groupBy("value").agg(F.count("*").alias("n_sampled"))
        return ex.select("value", "n_sampled",
                         F.col("n_sampled").alias("n_amortized"))
    rate = sample_size / total
    thr = rate_threshold(rate)
    key = F.substring(
        F.md5(F.concat_ws(":", F.lit(str(seed)),
                          F.col(id_col).cast("string"))), 1, 8)
    samp = (j.filter(key < F.lit(thr))
            .groupBy("value").agg(F.count("*").alias("n_sampled")))
    # amortize with INTEGER arithmetic (floor(n/rate) =
    # (n*total) div sample_size) — engine-exact where a float 1/rate
    # multiply could round differently, and overflow-safe past 2^53
    return (samp.join(cap, "value")
            .select("value", "n_sampled",
                    F.least(F.expr(f"n_sampled * {int(total)}L DIV "
                                   f"{int(sample_size)}L"),
                            F.col("_cap")).alias("n_amortized")))


def drill_down(matches: DataFrame, docs: DataFrame, path_col: str,
               prefix: str, id_col: str = "doc_id") -> DataFrame:
    """DrillDownQuery analog: restrict the match stream to docs whose
    taxonomy path is under ``prefix``, then count the NEXT level
    (children of the drilled node). Returns (path, n_docs)."""
    j = matches.select(id_col).join(docs.select(id_col, path_col), id_col)
    depth = prefix.count("/") + 1
    under = j.filter((F.col(path_col) == prefix)
                     | F.col(path_col).startswith(prefix + "/"))
    child = F.expr(f"array_join(slice(split({path_col}, '/'), 1, "
                   f"{depth + 1}), '/')")
    return (under.filter(F.size(F.split(F.col(path_col), "/")) > depth)
            .groupBy(child.alias("path"))
            .agg(F.count("*").alias("n_docs")))


def drill_sideways(matches: DataFrame, docs: DataFrame, dims: dict,
                   drills: dict, id_col: str = "doc_id") -> DataFrame:
    """DrillSideways analog over flat dimension columns: for each dim in
    ``dims`` (name -> doc column), counts are computed with every OTHER
    drilled dim's constraint applied and the dim's OWN drill removed
    (DrillSideways.java's near-miss counting); undrilled dims get all
    drills applied. Returns (dim, value, n_docs)."""
    cols = list(dict.fromkeys(dims.values()))
    j = matches.select(id_col).join(docs.select(id_col, *cols), id_col)
    out = None
    for dim, col in dims.items():
        cond = None
        for d, v in drills.items():
            if d == dim:
                continue
            c = F.col(dims[d]) == v
            cond = c if cond is None else (cond & c)
        side = j.filter(cond) if cond is not None else j
        part = (side.groupBy(F.col(col).alias("value"))
                .agg(F.count("*").alias("n_docs"))
                .select(F.lit(dim).alias("dim"), "value", "n_docs"))
        out = part if out is None else out.unionByName(part)
    return out


def range_counts(matches: DataFrame, docs: DataFrame, value_col: str,
                 ranges: list, id_col: str = "doc_id") -> DataFrame:
    """Numeric range facets (facet/range/LongRangeFacetCounts.java,
    DoubleRangeFacetCounts.java): count matching docs per range.
    ``ranges``: [(label, lo, lo_inclusive, hi, hi_inclusive)] with None
    bounds open — the LongRange constructor surface. Ranges MAY overlap
    (each doc increments every range containing it, unlike taxonomy
    buckets); NULL values count nowhere (missing doc-values docs are
    skipped by the reference's MatchingDocs iteration).

    Pure Catalyst: ONE pass with a conditional sum per range (map-side
    combined), then a literal unpivot — no explode, no UDF, no
    per-range scan. Returns (range_label, n_docs) in input order."""
    j = matches.select(id_col).join(docs.select(id_col, value_col), id_col)
    v = F.col(value_col)
    aggs = []
    for i, (label, lo, lo_inc, hi, hi_inc) in enumerate(ranges):
        cond = v.isNotNull()
        if lo is not None:
            cond = cond & (v >= lo if lo_inc else v > lo)
        if hi is not None:
            cond = cond & (v <= hi if hi_inc else v < hi)
        # count(when(...)): sum() over ZERO rows is NULL, and the
        # reference's LongRangeFacetCounts reports 0 per range for an
        # empty match set
        aggs.append(F.count(F.when(cond, F.lit(1))).alias(f"_r{i}"))
    row = j.agg(*aggs)
    # escape quotes/backslashes: the label lands inside a selectExpr
    # string literal
    def _lit(s: str) -> str:
        return "'" + str(s).replace("\\", "\\\\").replace("'", "\\'") + "'"
    stack = ", ".join(f"{_lit(label)}, _r{i}"
                      for i, (label, *_x) in enumerate(ranges))
    return row.selectExpr(
        f"stack({len(ranges)}, {stack}) AS (range_label, n_docs)")


def dynamic_range_counts(matches: DataFrame, docs: DataFrame,
                         value_col: str, n_ranges: int = 4,
                         id_col: str = "doc_id") -> DataFrame:
    """Dynamic (equal-weight) range facets
    (facet/facetset/DynamicRangeUtil.java — computeDynamicNumericRanges
    splits the matching values into ``n_ranges`` buckets of roughly
    equal total weight). DOCUMENTED DEVIATION: the reference's greedy
    sequential accumulate-until-target walk is replaced by the
    quantile rule bucket(v) = floor(cum_weight_before(v) * n / total)
    — same equal-weight intent, deterministic, and expressible as a
    prefix sum instead of an inherently sequential scan (the reference
    itself collects every matching value into one array, which cannot
    exist at 100 TB).

    Scale shape: one map-side-combined groupBy(value) collapses the
    corpus to its DISTINCT facet values — metadata-sized, same
    assumption as the taxonomy counts — and the cumulative window runs
    over that value table, never over docs. NULLs count nowhere.

    Returns (range_idx, lo, hi, n_docs) with lo/hi the actual data
    values bounding each bucket (the reference reports actual values,
    not interpolated quantiles)."""
    from pyspark.sql import Window
    j = (matches.select(id_col)
         .join(docs.select(id_col, value_col), id_col)
         .filter(F.col(value_col).isNotNull()))
    per_v = j.groupBy(value_col).agg(F.count("*").alias("w"))
    # the value table is facet-dimension-sized; this window is over
    # distinct values only (bounded, like the taxonomy), not over docs
    win = Window.orderBy(value_col).rowsBetween(
        Window.unboundedPreceding, -1)
    tot = per_v.agg(F.sum("w")).collect()[0][0] or 0
    if tot == 0:
        return per_v.select(
            F.lit(0).alias("range_idx"),
            F.col(value_col).alias("lo"), F.col(value_col).alias("hi"),
            F.col("w").alias("n_docs")).limit(0)
    bucket = F.least(
        F.floor(F.coalesce(F.sum("w").over(win), F.lit(0))
                * n_ranges / F.lit(int(tot))),
        F.lit(n_ranges - 1))
    return (per_v.select(F.col(value_col), "w",
                         bucket.cast("int").alias("range_idx"))
            .groupBy("range_idx")
            .agg(F.min(value_col).alias("lo"),
                 F.max(value_col).alias("hi"),
                 F.sum("w").alias("n_docs"))
            .orderBy("range_idx"))


def association_sums(matches: DataFrame, docs: DataFrame, path_col: str,
                     assoc_col: str, max_level: int | None = None,
                     id_col: str = "doc_id") -> DataFrame:
    """Facet associations (facet/taxonomy/TaxonomyFacetIntAssociations
    .java / TaxonomyFacetFloatAssociations.java with
    AssociationAggregationFunction.SUM): instead of counting matching
    docs per category, SUM each doc's association value into every
    ancestor of its taxonomy path — e.g. a per-doc confidence or
    revenue weight attached to the category (IntAssociationFacetField /
    FloatAssociationFacetField). Returns (level, path, n_docs, sum_assoc):
    the reference's associations API reports both the aggregated value
    and the doc count.

    Same Catalyst shape as taxonomy_counts: one prefix posexplode, one
    map-side-combined groupBy — NULL associations contribute nothing
    (docs without the association field are skipped, matching the
    reference's per-doc ords iteration)."""
    j = matches.select(id_col).join(
        docs.select(id_col, path_col, assoc_col), id_col)
    # a doc without the association value is never visited by the
    # reference's MatchingDocs iteration — drop it from n_docs too,
    # not just from the sum
    j = j.filter(F.col(assoc_col).isNotNull())
    prefixes = F.expr(
        f"transform(sequence(1, size(split({path_col}, '/'))), "
        f"i -> array_join(slice(split({path_col}, '/'), 1, i), '/'))")
    ex = j.select(F.posexplode(prefixes).alias("lvl0", "path"),
                  F.col(assoc_col).alias("_assoc"))
    out = (ex.groupBy((F.col("lvl0") + 1).alias("level"), "path")
           .agg(F.count("*").alias("n_docs"),
                F.sum("_assoc").alias("sum_assoc")))
    if max_level is not None:
        out = out.filter(F.col("level") <= max_level)
    return out
