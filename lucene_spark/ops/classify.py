"""Index-backed text classification (the reference's classification
module, classification/src/java/org/apache/lucene/classification/).

Four classifiers, re-expressed as Catalyst plans over the engine's
index tables instead of per-term IndexSearcher.count()/search() loops:

- ``naive_bayes_classify`` — SimpleNaiveBayesClassifier.java: add-one-
  smoothed multinomial NB whose "training set" IS the index. Where the
  reference issues one boolean count() per (word, class) pair, this
  implementation makes ONE pushed-down postings scan for the input
  batch's whole vocabulary, joins doc -> class once, and finishes with
  map-side-combined aggregates — the per-(word, class) count matrix is
  bounded by |vocab| x |classes|, never by the corpus.

- ``knn_classify`` — KNearestNeighborClassifier.java: MoreLikeThis
  top-k retrieval + rank-weighted class voting over the k neighbors.

- ``knn_fuzzy_classify`` — KNearestFuzzyClassifier.java: the same vote
  over a NearestFuzzyQuery (= fuzzy-like-this rewrite) of free text.

- ``bm25_nb_classify`` — BM25NBClassifier.java: naive bayes whose
  likelihoods are BM25 top-1 scores; the reference's per-(class, word)
  search() loop decomposes into one match-stream union + per-class max
  because the keyword class clause scores a class constant.

Scale shape (100 TB lens): NB's heavy stage is the postings scan, which
is directory-pruned on (field, term_h) exactly like a TermQuery seek;
everything after it is aggregation over (term, class) cells. KNN rides
the existing WAND/TakeOrdered search path; the vote runs on k rows.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["naive_bayes_classify", "knn_classify", "knn_fuzzy_classify",
           "bm25_nb_classify"]


# ---------------------------------------------------------------------------
# shared: per-(term, class) document-frequency matrix
# ---------------------------------------------------------------------------

def _class_docs(searcher, class_field: str) -> DataFrame:
    """(class, class_docs): docFreq of each class term — the reference's
    docCount(term=class) (SimpleNaiveBayesClassifier.java:283)."""
    ds = searcher._read_cached(searcher.docstore_paths)
    return (ds.filter(F.col(class_field).isNotNull())
            .groupBy(F.col(class_field).alias("cls"))
            .agg(F.count("*").cast("double").alias("class_docs")))


def _word_class_hits(searcher, words: list, text_field: str,
                     class_field: str) -> DataFrame:
    """(term, class, hits): number of docs of each class containing each
    word — the reference's getWordFreqForClass boolean count
    (SimpleNaiveBayesClassifier.java:263-276), batched: ONE postings
    scan pruned to the vocabulary, one block decode, one join to the
    doc -> class map, one aggregate. Deleted docs are masked exactly
    like term_postings."""
    pairs = searcher.terms_postings(words, text_field) \
        .select("term", "doc_id")
    cls = (searcher._read_cached(searcher.docstore_paths)
           .filter(F.col(class_field).isNotNull())
           .select("doc_id", F.col(class_field).alias("cls")))
    # postings hold each (term, doc) once, so count(*) == distinct docs
    return (pairs.join(cls, "doc_id")
            .groupBy("term", "cls")
            .agg(F.count("*").cast("double").alias("hits")))


# ---------------------------------------------------------------------------
# SimpleNaiveBayesClassifier
# ---------------------------------------------------------------------------

def naive_bayes_classify(searcher, texts: DataFrame,
                         id_col: str = "id", text_col: str = "text",
                         class_field: str = "role",
                         text_field: str = "text",
                         all_scores: bool = False) -> DataFrame:
    """Classify a batch of texts with the index as the training set
    (SimpleNaiveBayesClassifier.java:106-236). Per class c and
    tokenized input d = w1..wn:

        score(d, c) = log P(c) + sum_i log P(wi | c)
        P(c)        = docCount(c) / docsWithClass          (:279-281)
        P(w | c)    = (hits(w, c) + 1) / den(c)            (:209-231)
        den(c)      = avgUniqueTerms * docCount(c) + docsWithClass
        avgUniqueTerms = sumDocFreq(text_field) / docCount(text_field)
                                                           (:241-252)

    hits(w, c) = docs of class c containing w (doc freq, not ttf).
    Unseen (w, c) pairs contribute log(1/den(c)), so the score
    decomposes as  prior(c) - n * log(den(c)) + sum_{hits>0}
    cnt(w) * log(hits+1)  — the last term is the ONLY one needing the
    (term, class) matrix, and missing cells contribute exactly 0,
    which a plain inner-join-then-sum computes without densifying.

    Input texts are analyzed with ``text_field``'s analyzer chain (the
    reference tokenizes with the index analyzer, :195-207). Returns
    (id, cls, score): the argmax class per input (ties -> class asc),
    or every class's log score with ``all_scores=True``. Raw log
    scores, not the reference's normalized posteriors — normalization
    is a per-id softmax the caller can apply; ranking is identical.
    """
    an = searcher.analyzers.get(text_field, "standard")

    def tok(batches):
        from ..kernels.tokenizer import analyze_series
        for pdf in batches:
            toks = analyze_series(pdf[text_col], an)
            lens = toks.str.len().to_numpy(np.int64)
            if lens.sum() == 0:
                continue
            flat = np.concatenate([np.asarray(t, object) for t in toks])
            yield pd.DataFrame(
                {"id": np.repeat(pdf[id_col].to_numpy(np.int64), lens),
                 "term": flat})

    tokens = (texts.select(F.col(id_col).cast("long").alias(id_col),
                           text_col)
              .mapInPandas(tok, schema="id bigint, term string")
              .groupBy("id", "term")
              .agg(F.count("*").cast("double").alias("cnt")))
    tokens = tokens.persist()
    try:
        words = [r["term"] for r in tokens.select("term")
                 .distinct().collect()]
        if not words:
            raise ValueError("no analyzable tokens in the input batch")

        # corpus-level scalars: one termstats aggregate + two docstore
        # aggregates (metadata-sized)
        ts = searcher._termstats_df(F.col("field") == text_field)
        sum_df = ts.agg(F.sum("df")).collect()[0][0] or 0
        ds = searcher._read_cached(searcher.docstore_paths)
        field_docs = ds.filter(F.col("token_count") > 0).count()
        cls_df = _class_docs(searcher, class_field)
        classes = cls_df.collect()
        if not classes or not field_docs:
            raise ValueError("index has no class values / no text docs")
        docs_with_class = float(sum(r["class_docs"] for r in classes))
        avg_unique = float(sum_df) / float(field_docs)

        # per-class constants, broadcast-sized
        const = searcher.spark.createDataFrame(
            [(r["cls"],
              math.log(r["class_docs"]) - math.log(docs_with_class),
              math.log(avg_unique * r["class_docs"] + docs_with_class))
             for r in classes],
            "cls string, prior double, log_den double")

        hits = _word_class_hits(searcher, words, text_field, class_field)
        sumlog = (tokens.join(hits, "term")
                  .groupBy("id", "cls")
                  .agg(F.sum(F.col("cnt") * F.log(F.col("hits") + 1.0))
                       .alias("sl")))
        totals = tokens.groupBy("id").agg(F.sum("cnt").alias("n"))
        scored = (totals.crossJoin(F.broadcast(const))
                  .join(sumlog, ["id", "cls"], "left")
                  .select("id", "cls",
                          (F.col("prior")
                           - F.col("n") * F.col("log_den")
                           + F.coalesce(F.col("sl"), F.lit(0.0)))
                          .alias("score")))
        if all_scores:
            return scored
        w = Window.partitionBy("id").orderBy(F.col("score").desc(),
                                             F.col("cls").asc())
        return (scored.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1).drop("_rn"))
    finally:
        tokens.unpersist()


# ---------------------------------------------------------------------------
# KNearestNeighborClassifier
# ---------------------------------------------------------------------------

def knn_classify(searcher, doc_id: int, k: int = 10,
                 class_field: str = "role", max_terms: int = 10,
                 min_df: int = 2) -> DataFrame:
    """k-nearest-neighbor classification of an indexed document
    (KNearestNeighborClassifier.java:150-240): build the MoreLikeThis
    query from the doc's top tf·idf terms (:156-180; the reference's
    mlt.like), retrieve the top-k docs that HAVE a class value (:174
    adds class-exists as a MUST clause — expressed here as the
    doc_filter semi-join), then vote (:191-240):

        boost(doc)  = score(doc) / maxScore
        score(c)    = (count(c) * avg boost(c)) / k
                    = sum boost(c) / k
        if fewer than k voters carry a class, scale by k / sumdoc
        (:231-238) -> sum boost(c) / sumdoc.

    Returns (cls, score) for every class among the neighbors, ordered
    score desc, cls asc. The source doc votes for itself at boost 1,
    exactly like the reference (its javadoc suggests callers exclude
    it; keep parity with the raw behavior)."""
    q = searcher.more_like_this(doc_id, max_terms=max_terms,
                                min_df=min_df)
    top = searcher.search_df(q, k=k,
                             doc_filter=f"{class_field} is not null")
    return _vote_topk(searcher, top, class_field, k)


def _vote_topk(searcher, top: DataFrame, class_field: str,
               k: int) -> DataFrame:
    """The shared rank-weighted class vote both KNN classifiers use
    (KNearestNeighborClassifier.java:191-240 ==
    KNearestFuzzyClassifier.java buildListFromTopDocs)."""
    ds = (searcher._read_cached(searcher.docstore_paths)
          .select("doc_id", F.col(class_field).alias("cls")))
    j = top.join(ds, "doc_id").select(
        "cls", F.col("score").cast("double").alias("s"))
    mx = j.agg(F.max("s").alias("mx"))
    votes = (j.crossJoin(F.broadcast(mx))
             .groupBy("cls")
             .agg(F.sum(F.col("s") / F.col("mx")).alias("sboost"),
                  F.count("*").alias("cnt")))
    # sum of per-class counts == number of classed voters (sumdoc)
    tot = votes.agg(F.sum("cnt").alias("sumdoc"))
    out = (votes.crossJoin(F.broadcast(tot))
           .select("cls",
                   (F.col("sboost")
                    / F.when(F.col("sumdoc") >= k, F.lit(float(k)))
                    .otherwise(F.col("sumdoc").cast("double")))
                   .alias("score")))
    return out.orderBy(F.col("score").desc(), F.col("cls").asc())


def knn_fuzzy_classify(searcher, text: str, k: int = 10,
                       class_field: str = "role", max_edits: int = 1,
                       prefix_length: int = 2,
                       max_variants_per_term: int = 50) -> DataFrame:
    """k-nearest-neighbor classification of FREE TEXT via fuzzy term
    expansion (KNearestFuzzyClassifier.java + utils/
    NearestFuzzyQuery.java): the query is the fuzzy-like-this rewrite
    of the input — per analyzed term, dictionary variants within
    max_edits sharing the source term's prefix, variant score =
    boost^2 x Classic idf with the source-df / avg-df fallback,
    artificial df = ttf = 1 leaves (NearestFuzzyQuery.newTermQuery's
    TermStates trick, identical to FuzzyLikeThisQuery's) — MUST'd with
    a class-field-exists clause (:141-143, the doc_filter here), then
    the same top-k rank-weighted vote as the plain KNN classifier.
    NearestFuzzyQuery has NO global maxNumTerms cut (only the per-term
    MAX_VARIANTS_PER_TERM = 50), hence the unbounded max_num_terms."""
    q = searcher.fuzzy_like_this(
        text, max_edits=max_edits, prefix_length=prefix_length,
        max_num_terms=1 << 30,
        max_variants_per_term=max_variants_per_term)
    top = searcher.search_df(q, k=k,
                             doc_filter=f"{class_field} is not null")
    return _vote_topk(searcher, top, class_field, k)


def bm25_nb_classify(searcher, text: str,
                     class_field: str = "role") -> DataFrame:
    """Naive Bayes over BM25 scores (BM25NBClassifier.java): for each
    class term c in the class field's dictionary,

        score(c) = log(prior) + sum over INPUT TOKENS w (duplicates
                   included, calculateLogLikelihood:197-203) of
                   log(P(w|c))

    where prior = the top-1 score of MUST TermQuery(class=c) (:222-231,
    log 0 when classless) and P(w|c) = the top-1 score of MUST class +
    SHOULD word (:205-220, 1 when hitless). The class field is a
    keyword field (tf = 1, norms omitted -> norm code 1), so the MUST
    clause scores a CONSTANT s_c for every doc of the class — the
    reference's top-1 therefore decomposes exactly into
    s_c + max(score of w within class c, or 0), computed here as ONE
    match-stream union over the distinct input words joined to the
    doc->class column with a map-side-combined (class, word) max —
    no per-(word, class) search() loop. The final softmax is the
    reference's normClassificationResults log-sum-exp (:147-173).
    Returns (cls, score) with scores summing to 1, score desc."""
    from ..kernels.tokenizer import analyze_one
    from ..search.query import (MultiTermQuery, PreAnalyzed,
                                TermQuery)

    toks = analyze_one(text, searcher._field_chain(searcher.field))
    classes = sorted(searcher.expand_terms(
        MultiTermQuery("wildcard", "*", class_field)))
    spark = searcher.spark
    if not classes or not toks:
        return spark.createDataFrame([], "cls string, score double")
    st = searcher.term_stats(classes, class_field)
    dc_f, sttf_f = searcher._field_stats(class_field)
    sim = searcher._sim_for(class_field)
    s_c = {c: float(sim(st[c][0], dc_f, sttf_f)
                    .score(np.array([1.0], dtype=np.float32),
                           np.array([1], dtype=np.int64))[0])
           for c in classes}

    words = list(dict.fromkeys(toks))
    allm = None
    for w in words:
        # toks are already INDEX terms (analyzed above): PreAnalyzed
        # stops the searcher re-stemming them on analyzed fields
        mw = (searcher.matches_df(
                  PreAnalyzed(TermQuery(w, searcher.field)))
              .select("doc_id", "score", F.lit(w).alias("w")))
        allm = mw if allm is None else allm.unionByName(mw)
    ds = (searcher._read_cached(searcher.docstore_paths)
          .select("doc_id", F.col(class_field).alias("cls")))
    if searcher.livedocs_path is not None:
        # the reference prior is the top-1 of an actual class search —
        # a class whose docs are ALL deleted gets log(0) and drops out;
        # term_stats keep counting deleted docs (Lucene semantics), so
        # liveness needs one live-masked pass (only when deletes exist)
        from ..search.query import MatchAllQuery
        live_cls = {r["cls"] for r in
                    (searcher.matches_df(MatchAllQuery(searcher.field))
                     .join(ds, "doc_id").select("cls").distinct()
                     .collect())}
        classes = [c for c in classes if c in live_cls]
        if not classes:
            return spark.createDataFrame([], "cls string, score double")
    cells = (allm.join(ds, "doc_id")
             .groupBy("cls", "w")
             .agg(F.max("score").cast("double").alias("mw")).collect())
    mx = {(r["cls"], r["w"]): float(r["mw"]) for r in cells}

    logs = {}
    for c in classes:
        ll = math.log(s_c[c])
        for w in toks:  # duplicates contribute per occurrence
            ll += math.log(s_c[c] + mx.get((c, w), 0.0))
        logs[c] = ll
    a = max(logs.values())
    z = a + math.log(sum(math.exp(v - a) for v in logs.values()))
    out = [(c, math.exp(logs[c] - z)) for c in classes]
    return (spark.createDataFrame(out, "cls string, score double")
            .orderBy(F.col("score").desc(), F.col("cls").asc()))
