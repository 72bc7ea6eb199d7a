"""LM-perplexity quality scoring — the CCNet pipeline stage (Wenzek et
al. 2020, "CCNet: Extracting High Quality Monolingual Datasets from Web
Crawl Data"): score every document by a language model's perplexity and
bucket the corpus into head/middle/tail quality tertiles. CCNet uses a
5-gram Kneser-Ney KenLM trained on Wikipedia; here the LM is a TRIGRAM
stupid-backoff model (Brants et al. 2007 — the same smoothing the
FreeTextSuggester port uses, ops/freetext.py) trained on any reference
DataFrame, which keeps every stage a Catalyst expression.

Model:  S(w | a b) = c(a b w) / c(a b)            if the trigram is seen
                   = alpha * S(w | b)             otherwise
        S(w | b)   = c(b w) / c(b)                if the bigram is seen
                   = alpha * S(w)                 otherwise
        S(w)       = c(w) / total                 (OOV floor: 1 / total)

Documents score ppl = exp(-mean ln S) over their token stream; short
histories (the first two tokens) start at the highest available order
with no backoff penalty; no BOS/EOS markers (documented deviation from
KenLM's sentence markers).

Distributed shape (100 TB): training is one tokenize projection + three
map-side-combined groupBys on n-gram keys (uniform by construction).
Scoring is the same projection + three hash joins against the model
tables + ONE per-document window (lag fetches each position's context
count from the previous position — a trigram's context count IS the
bigram count ending one position earlier, saving two more joins) + a
per-doc mean. Bucketing uses ntile over a global sort — exact tertiles
for the oracle-gated path; at petabyte scale swap in approx-quantile
thresholds (documented).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import tokens_expr

__all__ = ["train_trigram_lm", "lm_perplexity", "perplexity_buckets",
           "LM_ALPHA"]

LM_ALPHA = 0.4  # Brants et al. 2007 backoff factor (FreeTextSuggester.java:126)


def _positions(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc, pos 0-based, w, ctx1 = previous token, ctx2 = previous two
    tokens space-joined; NULL where the history is short)."""
    tok = docs.select(F.col(id_col).alias("_doc"),
                      tokens_expr(text_col).alias("toks"))
    return (tok.select("_doc", F.posexplode("toks").alias("pos", "w"),
                       F.col("toks"))
            .select(
                "_doc", "pos", "w",
                F.when(F.col("pos") >= 1,
                       F.expr("element_at(toks, pos)")).alias("ctx1"),
                F.when(F.col("pos") >= 2,
                       F.expr("concat(element_at(toks, pos - 1), ' ', "
                              "element_at(toks, pos))")).alias("ctx2")))


def train_trigram_lm(ref_docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id"):
    """-> (uni, bi, tri, total_tokens): count tables
    uni(w, c1), bi(ctx1, w, c2), tri(ctx2, w, c3). The count tables
    come back PERSISTED (vocabulary-sized, reused per scoring join) —
    unpersist them when done with the model; the much larger positions
    projection is released before returning."""
    p = _positions(ref_docs, text_col, id_col).persist()
    try:
        uni = p.groupBy("w").agg(F.count("*").alias("c1")).persist()
        bi = (p.filter(F.col("ctx1").isNotNull())
              .groupBy("ctx1", "w").agg(F.count("*").alias("c2"))
              .persist())
        tri = (p.filter(F.col("ctx2").isNotNull())
               .groupBy("ctx2", "w").agg(F.count("*").alias("c3"))
               .persist())
        total = p.count()
        # materialize the counts while p is still cached, then drop it
        uni.count(), bi.count(), tri.count()
    finally:
        p.unpersist()
    return uni, bi, tri, float(total)


def lm_perplexity(docs: DataFrame, lm, text_col: str = "text",
                  id_col: str = "doc_id",
                  alpha: float = LM_ALPHA) -> DataFrame:
    """Score ``docs`` against a trained LM -> (id_col, n_toks, ppl).
    Empty documents get NULL ppl."""
    uni, bi, tri, total = lm
    pos = _positions(docs, text_col, id_col)
    j = (pos
         .join(uni, "w", "left")
         .join(bi, ["ctx1", "w"], "left")
         .join(tri, ["ctx2", "w"], "left"))
    w = Window.partitionBy("_doc").orderBy("pos")
    # context counts: the trigram context "a b" is the bigram ending at
    # the previous position; the bigram context "b" is the unigram there
    j = (j.withColumn("c2ctx", F.lag("c2").over(w))
         .withColumn("c1ctx", F.lag("c1").over(w)))
    a = float(alpha)
    p1f = (F.when(F.coalesce(F.col("c1"), F.lit(0)) > 0,
                  F.col("c1").cast("double") / F.lit(total))
           .otherwise(F.lit(1.0 / total)))  # OOV floor
    p2 = F.col("c2").cast("double") / F.col("c1ctx").cast("double")
    p3 = F.col("c3").cast("double") / F.col("c2ctx").cast("double")
    s = (F.when((F.col("pos") >= 2) & F.col("c3").isNotNull(), p3)
         .when((F.col("pos") >= 2) & F.col("c2").isNotNull(),
               F.lit(a) * p2)
         .when(F.col("pos") >= 2, F.lit(a * a) * p1f)
         .when((F.col("pos") == 1) & F.col("c2").isNotNull(), p2)
         .when(F.col("pos") == 1, F.lit(a) * p1f)
         .otherwise(p1f))
    per_tok = j.select("_doc", F.log(s).alias("lp"))
    scored = (per_tok.groupBy("_doc")
              .agg(F.count("*").alias("n_toks"),
                   F.avg("lp").alias("mlp")))
    # docs with zero tokens never reach per_tok: restore them with NULLs
    ids = docs.select(F.col(id_col).alias("_doc")).distinct()
    return (ids.join(scored, "_doc", "left")
            .select(F.col("_doc").alias(id_col),
                    F.coalesce("n_toks", F.lit(0)).alias("n_toks"),
                    F.exp(-F.col("mlp")).alias("ppl")))


def perplexity_buckets(scored: DataFrame, id_col: str = "doc_id",
                       n_buckets: int = 3) -> DataFrame:
    """CCNet head/middle/tail: bucket 1 = lowest perplexity. Exact
    ntile over (ppl, id) — a global sort, right for the oracle-gated
    path; production at petabyte scale should precompute approximate
    quantile thresholds instead (one pass, no global sort). NULL ppl
    (empty docs) sorts last and still receives a bucket (documented:
    CCNet drops empty lines before scoring)."""
    w = Window.orderBy(F.col("ppl").asc_nulls_last(), F.col(id_col).asc())
    return scored.withColumn("bucket", F.ntile(n_buckets).over(w))
