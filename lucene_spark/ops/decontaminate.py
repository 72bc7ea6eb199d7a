"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set.

The standard LLM training-data hygiene pass (GPT-3 appendix C /
PaLM / Llama style: 8-13-token overlap against eval sets): a training
document is contaminated when its token stream contains an n-gram that
also occurs in any benchmark document. We report the per-document
overlap (distinct shared n-grams + fraction of the doc's distinct
n-grams) rather than hard-dropping, so callers can threshold.

Scale shape (100 TB corpus, benchmark = eval sets, small by nature):
- the benchmark side reduces to DISTINCT n-gram strings and is
  BROADCAST — eval suites are at most ~10^7 n-grams, a few hundred MB;
- the corpus side is one projection (tokenize + slide + array_distinct)
  feeding a broadcast-hash-join: NO corpus-side shuffle for matching;
- the per-doc rollup aggregates only HIT rows (sparse — most docs have
  zero hits), map-side combinable; clean docs never leave their
  partition and are recovered by the caller joining back to the corpus
  (or via `contaminated=0` defaults).

Tokenization matches the engine's StandardAnalyzer-equivalent stream
(ops/dedup.tokens_expr), so "the same n-gram" is whitespace/case/
punctuation-insensitive — the normalization the published recipes use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles_expr, tokens_expr

__all__ = ["ngram_sets", "decontaminate"]


def ngram_sets(df: DataFrame, n: int, text_col: str = "text",
               id_col: str | None = "doc_id") -> DataFrame:
    """(id, gram) with per-document DISTINCT word n-grams; id omitted
    when id_col is None (the benchmark side, globally distinct)."""
    grams = F.array_distinct(
        shingles_expr("toks", n)).alias("grams")
    base = df.select(*([F.col(id_col)] if id_col else []),
                     tokens_expr(text_col).alias("toks"))
    out = base.select(*([id_col] if id_col else []),
                      F.explode(grams).alias("gram"))
    return out if id_col else out.distinct()


def decontaminate(corpus: DataFrame, benchmark: DataFrame, n: int = 13,
                  text_col: str = "text", id_col: str = "doc_id",
                  bench_text_col: str | None = None) -> DataFrame:
    """Per-document contamination report against a benchmark table.

    Returns (id_col, n_grams, n_contaminated, contamination_frac) for
    EVERY corpus document (clean docs carry zeros). `n_grams` is the
    count of distinct n-grams in the doc; `n_contaminated` of those
    also occur in the benchmark.
    """
    bench = ngram_sets(benchmark, n, bench_text_col or text_col,
                       id_col=None)
    doc_grams = ngram_sets(corpus, n, text_col, id_col)
    hits = (doc_grams
            .join(F.broadcast(bench), "gram")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_contaminated")))
    totals = (corpus
              .select(F.col(id_col), tokens_expr(text_col).alias("toks"))
              .select(id_col, F.size(F.array_distinct(
                  shingles_expr("toks", n))).alias("n_grams")))
    return (totals.join(hits, id_col, "left")
            .select(
                id_col, "n_grams",
                F.coalesce("n_contaminated", F.lit(0))
                .alias("n_contaminated"),
                F.round(F.coalesce("n_contaminated", F.lit(0))
                        / F.greatest("n_grams", F.lit(1)), 4)
                .alias("contamination_frac")))
