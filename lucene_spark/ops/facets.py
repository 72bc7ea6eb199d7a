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
