"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the engine's operator surface (SURVEY.md §2) over
the driver-provided tables: the fulltext index + BM25 engine runs on
``documents`` (mapped into the transcript schema), the training-data
ops run on ``documents``/``embeddings``. Every query has a DuckDB
oracle in ``oracle_sql()``.

Float policy: integer quantities (tf, df, counts, offsets, hashes) are
exact; BM25/cosine scores are emitted as ``round(double, 3|4)`` on BOTH
sides — our engine scores in float32 (Lucene parity), the oracle in
float64, and rounding absorbs the representation gap (verified
empirically at sf=0.01 by tools/check_entry.py).
"""

from __future__ import annotations

import os
import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lucene_spark.index import build_index
from lucene_spark.index.catalog import IndexCatalog
from lucene_spark.ops import dedup as D
from lucene_spark.ops import multimodal as MM
from lucene_spark.ops import similarity as SIM
from lucene_spark.ops import textstats as TS
from lucene_spark.ops import percolate as PC
from lucene_spark.search.query import (AndQuery, BooleanQuery, DisMaxQuery,
                                       MultiPhraseQuery, MultiTermQuery,
                                       OrQuery, PhraseQuery, SynonymQuery,
                                       TermQuery)
from lucene_spark.search.searcher import IndexSearcher

_FORMAT_VERSION = "v8"  # v8: (field, term_h) partitioned postings
_CACHE_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           ".idxcache")

# the designed cross-doc duplicated substring for dedup_substring
# (8 tokens, none in the corpus vocabulary)
_BOILERPLATE = "please review the generated summary and confirm output"


# ---------------------------------------------------------------------------
# corpus adapter + cached index build
# ---------------------------------------------------------------------------

def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _as_transcripts(docs: DataFrame) -> DataFrame:
    """documents -> transcript schema. conv_id is zero-padded doc_id, so
    the build's global (conv_id, turn_idx) ordering assigns global
    doc_id == the original documents.doc_id (dense from 0)."""
    return docs.select(
        F.format_string("d%010d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.col("lang").alias("role"),
        F.col("text").alias("text"),
        F.col("source").alias("tool"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("ts"),
    )


# One IndexSearcher per (session, index dir): the searcher memoizes its
# base DataFrames (schema inference + fixed projections are pure driver
# latency, ~0.1-0.2 s per spark.read.parquet), so reusing it across the
# 50 queries() entries turns that cost from per-query into one-time —
# the same one-open-IndexReader-per-searcher discipline the reference
# requires of its users. Keyed on the SparkSession object: a new
# session (driver restart) gets fresh searchers.
_SEARCHERS: dict = {}


def _cached_searcher(spark: SparkSession, out: str) -> IndexSearcher:
    # keyed on the session OBJECT (identity equality): holding the ref
    # pins it alive, so a dead session's id can never be reused by a
    # new one and serve a searcher bound to a stopped session
    key = (spark, out)
    s = _SEARCHERS.get(key)
    if s is None:
        s = _SEARCHERS[key] = IndexSearcher(spark, out)
    return s


def _searcher(spark: SparkSession, sf_dir: str) -> IndexSearcher:
    key = _FORMAT_VERSION + "_" + re.sub(r"\W+", "_", os.path.abspath(sf_dir))
    out = os.path.join(_CACHE_ROOT, key)
    if not IndexCatalog(out).has_table("postings"):
        build_index(spark, _as_transcripts(_docs(spark, sf_dir)), out,
                    num_buckets=4, keyword_fields=("role", "tool"))
    return _cached_searcher(spark, out)


def _as_conversations(docs: DataFrame) -> DataFrame:
    """documents -> MULTI-TURN transcripts: 5 docs per conversation
    (conv = doc_id // 5, turn = doc_id % 5). The build's global
    (conv_id, turn_idx) ordering keeps doc_id == documents.doc_id."""
    return docs.select(
        F.format_string("c%09d", (F.col("doc_id") / 5).cast("long"))
        .alias("conv_id"),
        (F.col("doc_id") % 5).cast("int").alias("turn_idx"),
        F.col("lang").alias("role"),
        F.col("text").alias("text"),
        F.col("source").alias("tool"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("ts"),
    )


def _searcher_conv(spark: SparkSession, sf_dir: str) -> IndexSearcher:
    """Index over the multi-turn conversation mapping (block-join
    entries need parents with >1 child)."""
    key = (_FORMAT_VERSION + "_conv_"
           + re.sub(r"\W+", "_", os.path.abspath(sf_dir)))
    out = os.path.join(_CACHE_ROOT, key)
    if not IndexCatalog(out).has_table("postings"):
        build_index(spark, _as_conversations(_docs(spark, sf_dir)), out,
                    num_buckets=4)
    return _cached_searcher(spark, out)


def _searcher_stem(spark: SparkSession, sf_dir: str,
                   chain: str = "porter") -> IndexSearcher:
    """Index built with a stemming analyzer chain on 'text':
    'porter' = StandardTokenizer + lowercase + PorterStemFilter;
    'english' = the full EnglishAnalyzer (possessive strip + stop set
    + Porter stem). Corpus terms are stored analyzed, query terms go
    through the same chain at search time."""
    key = (_FORMAT_VERSION + "_" + re.sub(r"\W+", "_", chain) + "_"
           + re.sub(r"\W+", "_", os.path.abspath(sf_dir)))
    out = os.path.join(_CACHE_ROOT, key)
    if not IndexCatalog(out).has_table("postings"):
        build_index(spark, _as_transcripts(_docs(spark, sf_dir)), out,
                    num_buckets=4, analyzers={"text": chain})
    return _cached_searcher(spark, out)


def _searcher_payload(spark: SparkSession, sf_dir: str) -> IndexSearcher:
    """Index built with the delimited-payload chain: every doc gains
    ' relevance|<doc_id%20>' and every 3rd doc an extra bare
    ' relevance' (a payload-free occurrence)."""
    key = (_FORMAT_VERSION + "_payload_"
           + re.sub(r"\W+", "_", os.path.abspath(sf_dir)))
    out = os.path.join(_CACHE_ROOT, key)
    if not IndexCatalog(out).has_table("postings"):
        d = _docs(spark, sf_dir).withColumn(
            "text",
            F.concat(F.col("text"), F.lit(" relevance|"),
                     (F.col("doc_id") % 20).cast("string"),
                     F.when(F.col("doc_id") % 3 == 0, F.lit(" relevance"))
                     .otherwise(F.lit(""))))
        build_index(spark, _as_transcripts(d), out, num_buckets=4,
                    analyzers={"text": "payload"})
    return _cached_searcher(spark, out)


def _topk_df(spark, sf_dir, query, k) -> DataFrame:
    s = _searcher(spark, sf_dir)
    res = s.search_df(query, k=k)
    return res.select(
        "doc_id", F.round(F.col("score").cast("double"), 3).alias("score_r"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 disjunction top-10 over sf0.001 documents, with
    stored-field retrieval of the hit text."""
    sf_dir = "/root/testdata/sf0.001"
    s = _searcher(spark, sf_dir)
    top = s.search_df(OrQuery(("scan", "sort", "merge")), k=10)
    return (s.retrieve(top)
            .select("doc_id", "score", "text")
            .orderBy(F.col("score").desc(), F.col("doc_id")))


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # --- fulltext engine (SURVEY.md §2.4-2.7) ---
    q["ft_term_topk"] = lambda sp, sf: _topk_df(sp, sf, TermQuery("vector"), 10)
    q["ft_and_topk"] = lambda sp, sf: _topk_df(
        sp, sf, AndQuery(("slow", "fast")), 10)
    q["ft_or_topk"] = lambda sp, sf: _topk_df(
        sp, sf, OrQuery(("scan", "sort", "merge")), 10)
    def ft_phrase_topk(sp, sf):
        # two op-tagged phrase surfaces: 'exact' = PhraseQuery
        # (consecutive positions); 'multi' = MultiPhraseQuery — a
        # position with ALTERNATIVE terms (core:search/
        # MultiPhraseQuery.java): "slow (fast|scan)" matches either
        # continuation, idf summed over all three terms
        a = (_topk_df(sp, sf, PhraseQuery(("slow", "fast")), 10)
             .select(F.lit("exact").alias("op"), "doc_id", "score_r"))
        b = (_topk_df(sp, sf,
                      MultiPhraseQuery((("slow",), ("fast", "scan"))), 10)
             .select(F.lit("multi").alias("op"), "doc_id", "score_r"))
        return a.unionByName(b)
    q["ft_phrase_topk"] = ft_phrase_topk
    q["ft_bool_must_not"] = lambda sp, sf: _topk_df(
        sp, sf, BooleanQuery(must=("slow",), must_not=("fast",)), 100000)
    q["ft_bool_filter_msm"] = lambda sp, sf: _topk_df(
        sp, sf, BooleanQuery(must=("scan",), should=("sort", "merge"),
                             filter_=("batch",), min_should_match=1), 10)
    def ft_synonym_topk(sp, sf):
        # two op-tagged synonym surfaces: 'blend' = query-level
        # SynonymQuery (blended df=max stats); 'graph' = dictionary-
        # driven SynonymGraphFilter/QueryBuilder expansion — the rules
        # ["slow, fast", "merge join, join"] turn the text
        # "slow merge join" into Bool(should=[SynonymQuery(fast, slow),
        # Bool(should=[Term(join), Phrase(merge join)])]), multi-word
        # paths scored with their OWN stats (analyzeGraphBoolean)
        from lucene_spark.kernels.synonyms import SynonymMap, synonym_query
        blend = (_topk_df(sp, sf, SynonymQuery(("slow", "fast")), 10)
                 .select(F.lit("blend").alias("op"), "doc_id", "score_r"))
        sm = SynonymMap(["slow, fast", "merge join, join"])
        gq = synonym_query("slow merge join", sm)
        graph = (_topk_df(sp, sf, gq, 10)
                 .select(F.lit("graph").alias("op"), "doc_id", "score_r"))
        return blend.unionByName(graph)
    q["ft_synonym_topk"] = ft_synonym_topk
    q["ft_dismax_topk"] = lambda sp, sf: _topk_df(
        sp, sf, DisMaxQuery(("scan", "merge")), 10)

    def ft_common_blended(sp, sf):
        # five op-tagged surfaces over the two stats-driven rewrites:
        # CommonTermsQuery (queries/.../CommonTermsQuery.java:145-205)
        # classifies terms by ACTUAL df at search time against
        # ceil(0.4 * maxDoc): 'dup' (df ~5%) lands low-frequency and is
        # required, 'scan'/'merge' (~78%) land high-frequency and only
        # add score to docs the low group already matched ('common');
        # all-high degrades to a conjunction ('common_hi').
        # BlendedTermQuery (core:search/BlendedTermQuery.java:271-301)
        # binds ARTIFICIAL stats df = max / ttf = sum into every leaf:
        # 'blend' = DisjunctionMax(tie=0.01) rewrite, 'blend_bool' =
        # all-SHOULD boolean rewrite with a per-leaf boost, 'xfield' =
        # cross-field blend over analyzed text + keyword role.
        from lucene_spark.search.query import (BlendedTermQuery,
                                               CommonTermsQuery)
        cm = (_topk_df(sp, sf, CommonTermsQuery(
                  ("dup", "scan", "merge"), max_term_frequency=0.4),
                  100000)
              .select(F.lit("common").alias("op"), "doc_id", "score_r"))
        ch = (_topk_df(sp, sf, CommonTermsQuery(
                  ("scan", "merge"), max_term_frequency=0.4), 10)
              .select(F.lit("common_hi").alias("op"), "doc_id",
                      "score_r"))
        bl = (_topk_df(sp, sf, BlendedTermQuery(
                  (("text", "dup", 1.0), ("text", "merge", 1.0))), 10)
              .select(F.lit("blend").alias("op"), "doc_id", "score_r"))
        bb = (_topk_df(sp, sf, BlendedTermQuery(
                  (("text", "dup", 2.0), ("text", "merge", 1.0)),
                  rewrite="boolean"), 10)
              .select(F.lit("blend_bool").alias("op"), "doc_id",
                      "score_r"))
        xf = (_topk_df(sp, sf, BlendedTermQuery(
                  (("text", "vector", 1.0), ("role", "en", 1.0))), 10)
              .select(F.lit("xfield").alias("op"), "doc_id", "score_r"))
        return cm.unionByName(ch).unionByName(bl).unionByName(bb) \
                 .unionByName(xf)
    q["ft_common_blended"] = ft_common_blended

    def ft_simple_query(sp, sf):
        # SimpleQueryParser (queryparser/.../simple/SimpleQueryParser.
        # java): fault-tolerant human syntax -> query tree, default
        # operator MUST, four op-tagged surfaces:
        # 'complex'  "scan|sort merge" — an operator CHANGE wraps the
        #            accumulated (scan|sort) run as one MUST clause
        # 'not'      "vector -batch" — negation wraps as
        #            bool(MUST_NOT=batch, SHOULD=MatchAll), so the NOT
        #            arm contributes the MatchAll's constant 1.0
        # 'pure_not' "-dup" — a standalone negation matches every doc
        #            WITHOUT the term at constant score
        # 'ph_pre'   '"slow fast"|mer*' — phrase + trailing-* prefix
        #            (scoring_boolean expansion), OR'd
        from lucene_spark.search.simple_parser import parse_simple
        Ps = lambda s: parse_simple(s, default_operator="must")
        cpx = (_topk_df(sp, sf, Ps("scan|sort merge"), 10)
               .select(F.lit("complex").alias("op"), "doc_id", "score_r"))
        nt = (_topk_df(sp, sf, Ps("vector -batch"), 10)
              .select(F.lit("not").alias("op"), "doc_id", "score_r"))
        pn = (_topk_df(sp, sf, Ps("-dup"), 100000)
              .select(F.lit("pure_not").alias("op"), "doc_id", "score_r"))
        pp = (_topk_df(sp, sf, Ps('"slow fast"|mer*'), 10)
              .select(F.lit("ph_pre").alias("op"), "doc_id", "score_r"))
        return cpx.unionByName(nt).unionByName(pn).unionByName(pp)
    q["ft_simple_query"] = ft_simple_query

    def ft_matches(sp, sf):
        # the two exhaustive match streams, one entry with an op tag:
        # TermQuery postings (v=tf) + exact PhraseQuery matches (v=freq)
        s = _searcher(sp, sf)
        t = (s.term_postings("dup")
             .select(F.lit("term").alias("op"), "doc_id",
                     F.col("tf").alias("v")))
        p = (s.phrase_matches(["slow", "fast"])
             .select(F.lit("phrase").alias("op"), "doc_id",
                     F.col("freq").alias("v")))
        return t.unionByName(p)
    q["ft_matches"] = ft_matches

    def ft_counts(sp, sf):
        # Weight#count paths, one entry: the single-term df shortcut
        # (no postings read) + the sort-free boolean count kernel
        s = _searcher(sp, sf)
        n1 = s.count(TermQuery("batch"))
        n2 = s.count(BooleanQuery(must=("slow",), must_not=("fast",)))
        return sp.createDataFrame(
            [("term_batch", n1), ("bool_slow_not_fast", n2)],
            "qkind string, cnt bigint")
    q["ft_counts"] = ft_counts

    def ft_term_dict(sp, sf):
        s = _searcher(sp, sf)
        return (sp.read.parquet(s.termstats_path)
                .filter(F.col("field") == "text")
                .select("term", "df", "ttf"))
    q["ft_term_dict"] = ft_term_dict

    def ft_term_dict_scan(sp, sf):
        # Term-dictionary seek family, one entry with an op tag:
        # PrefixQuery range scan, TermRangeQuery, and the suggest module
        # (prefix / infix / fuzzy completion weighted by ttf,
        # suggest/.../AnalyzingInfixSuggester.java:97 +
        # FuzzySuggester.java) — all pushed-down scans over the sorted
        # termstats table, top-n via TakeOrderedAndProject
        s = _searcher(sp, sf)
        ts = (sp.read.parquet(s.termstats_path)
              .filter(F.col("field") == "text"))
        prefix = (ts.filter(F.col("term").startswith("c"))
                  .select(F.lit("prefix").alias("op"), "term",
                          F.col("df").alias("v")))
        rng = (ts.filter((F.col("term") >= "query")
                         & (F.col("term") < "sort"))
               .select(F.lit("range").alias("op"), "term",
                       F.col("df").alias("v")))
        sug = (s.suggest("s", "prefix", n=5)
               .select(F.lit("suggest").alias("op"), "term",
                       F.col("weight").alias("v")))
        inf = (s.suggest("or", "infix", n=5)
               .select(F.lit("infix").alias("op"), "term",
                       F.col("weight").alias("v")))
        fz = (s.suggest("jion", "fuzzy", n=5, max_edits=2)
              .select(F.lit("fuzzy").alias("op"), "term",
                      F.col("weight").alias("v")))
        # context-filtered completion (AnalyzingInfixSuggester contexts):
        # the suggester builds its OWN (context, term, weight) index
        # from the corpus; lookup filters to lang='en' docs only
        from lucene_spark.search.suggest import (ContextSuggester,
                                                 build_suggester)
        sg_path = os.path.join(
            _CACHE_ROOT,
            _FORMAT_VERSION + "_sugg_"
            + re.sub(r"\W+", "_", os.path.abspath(sf)))
        if not os.path.exists(os.path.join(sg_path, "_SUCCESS")):
            build_suggester(_docs(sp, sf), sg_path, context_col="lang")
        ctx = (ContextSuggester(sp, sg_path)
               .lookup("s", "prefix", n=5, contexts=["en"])
               .select(F.lit("ctx").alias("op"), "term",
                       F.col("weight").alias("v")))
        return (prefix.unionByName(rng).unionByName(sug)
                .unionByName(inf).unionByName(fz).unionByName(ctx))
    q["ft_term_dict_scan"] = ft_term_dict_scan

    def ft_range_filter(sp, sf):
        # 'range' — text term AND numeric range (IndexOrDocValuesQuery
        # analog); 'multi' — MultiRangeQuery (sandbox/.../
        # MultiRangeQuery.java): THREE ranges over n_chars with two
        # deliberately overlapping — merged driver-side exactly like
        # the reference rewrite (150-250 + 240-320 -> 150-320), one
        # disjunctive predicate pushed to the scan
        from lucene_spark.search.query import multi_range_predicate
        s = _searcher(sp, sf)
        docs = _docs(sp, sf).select("doc_id", "n_chars")
        base = (s.term_postings("hash")
                .join(docs, "doc_id")
                .filter(F.col("n_chars").between(200, 400))
                .select(F.lit("range").alias("op"), "doc_id", "tf",
                        "n_chars"))
        pred = multi_range_predicate(
            "n_chars", [(150, 250), (240, 320), (500, 600)])
        assert pred == "(n_chars BETWEEN 150 AND 320 " \
                       "OR n_chars BETWEEN 500 AND 600)"
        multi = (s.term_postings("hash")
                 .join(docs, "doc_id")
                 .filter(F.expr(pred))
                 .select(F.lit("multi").alias("op"), "doc_id", "tf",
                         "n_chars"))
        return base.unionByName(multi)
    q["ft_range_filter"] = ft_range_filter

    def ft_facet_lang(sp, sf):
        # 'exact' — facet counts over matching docs (facet module
        # analog); 'sampled' — RandomSamplingFacetsCollector analog:
        # counts over the deterministic md5-threshold sample of the
        # 402-hit match stream at sample_size=64, amortized back by
        # integer (n*total) div sample_size and capped at the value's
        # true corpus count (amortizeFacetCounts)
        from lucene_spark.ops.facets import sampled_counts
        s = _searcher(sp, sf)
        docs = _docs(sp, sf).select("doc_id", "lang")
        m = s.term_postings("batch")
        exact = (m.join(docs, "doc_id")
                 .groupBy("lang").agg(F.count("*").alias("n_docs"))
                 .select(F.lit("exact").alias("op"),
                         F.col("lang"), "n_docs",
                         F.col("n_docs").alias("n_amortized")))
        samp = (sampled_counts(m.select("doc_id"), docs, "lang",
                               sample_size=64, seed=3)
                .select(F.lit("sampled").alias("op"),
                        F.col("value").alias("lang"),
                        F.col("n_sampled").alias("n_docs"),
                        "n_amortized"))
        return exact.unionByName(samp)
    q["ft_facet_lang"] = ft_facet_lang

    def ft_group_top_source(sp, sf):
        # grouping module analog: per-group aggregates of matches
        s = _searcher(sp, sf)
        docs = _docs(sp, sf).select("doc_id", "source")
        return (s.term_postings("join")
                .join(docs, "doc_id")
                .groupBy("source")
                .agg(F.count("*").alias("n_docs"),
                     F.sum("tf").alias("sum_tf")))
    q["ft_group_top_source"] = ft_group_top_source

    def ft_grouped_topk(sp, sf):
        # TopGroups (grouping/FirstPassGroupingCollector +
        # TopGroupsCollector): top groups by best-hit score, each with
        # its within-group top docs — one match stream, per-group
        # window quota, broadcast head cut (no second postings scan)
        s = _searcher(sp, sf)
        g = s.grouped_search(TermQuery("vector"), "role",
                             k_groups=3, docs_per_group=2)
        return g.select(
            "grp",
            F.round(F.col("group_score").cast("double"), 3).alias("gs_r"),
            "doc_id",
            F.round(F.col("score").cast("double"), 3).alias("score_r"),
            "grp_rank")
    q["ft_grouped_topk"] = ft_grouped_topk

    def ft_group_collectors(sp, sf):
        # the grouping module's remaining collectors over ONE match
        # stream each: 'all' = AllGroupsCollector (every distinct group
        # + doc count); 'heads' = AllGroupHeadsCollector (per-group
        # most-relevant doc, score desc / doc order tie); 'distinct' =
        # DistinctValuesCollector (distinct role values within the top-3
        # first-pass groups); 'gfacet' = TermGroupFacetCollector (facet
        # counts where each GROUP counts once per value)
        s = _searcher(sp, sf)
        q0 = TermQuery("vector")
        allg = (s.all_groups(q0, "tool")
                .select(F.lit("all").alias("op"),
                        F.col("grp").alias("k"),
                        F.col("n_docs").cast("bigint").alias("v")))
        heads = (s.group_heads(q0, "tool")
                 .select(F.lit("heads").alias("op"),
                         F.col("grp").alias("k"),
                         F.col("doc_id").cast("bigint").alias("v")))
        dv = (s.distinct_values(q0, "tool", "role", k_groups=3)
              .select(F.lit("distinct").alias("op"),
                      F.col("grp").alias("k"),
                      F.col("n_distinct").cast("bigint").alias("v")))
        gf = (s.group_facets(q0, "tool", "role", n=5)
              .select(F.lit("gfacet").alias("op"),
                      F.col("fv").alias("k"),
                      F.col("n_groups").cast("bigint").alias("v")))
        return (allg.unionByName(heads).unionByName(dv)
                .unionByName(gf))
    q["ft_group_collectors"] = ft_group_collectors

    def ft_dv_stats(sp, sf):
        # DocValuesStatsCollector: single-pass numeric stats over a
        # doc-values column for the matching docs; every 7th doc's
        # value is NULLed to exercise the missing counter
        s = _searcher(sp, sf)
        md = _docs(sp, sf).select(
            "doc_id",
            F.when(F.col("doc_id") % 7 != 0,
                   F.col("n_chars")).alias("nc"))
        st = s.docvalues_stats(TermQuery("vector"), "nc", metadata=md)
        return st.select(
            "count", "missing", "vmin", "vmax", "vsum",
            F.round("mean", 6).alias("mean_r"),
            F.round("variance", 3).alias("var_r"),
            F.round("stdev", 3).alias("stdev_r"))
    q["ft_dv_stats"] = ft_dv_stats

    def ft_highlight(sp, sf):
        # unified-highlighter analog: first match offset in stored text
        s = _searcher(sp, sf)
        docs = _docs(sp, sf).select("doc_id", "text")
        return (s.phrase_matches(["slow", "fast"])
                .join(docs, "doc_id")
                .select("doc_id",
                        F.instr(F.lower("text"), "slow fast").alias("off")))
    q["ft_highlight"] = ft_highlight

    # --- multi-term expansion queries (SURVEY.md §2.4 MultiTermQuery) ---
    q["ft_wildcard_or"] = lambda sp, sf: _topk_df(
        sp, sf, MultiTermQuery("wildcard", "s*"), 10)
    def ft_fuzzy(sp, sf):
        # FuzzyQuery with the reference's default transpositions=true
        # (OSA distance), two op-tagged shapes: 'sub' = substitution
        # pattern joim->join; 'osa' = abtch->batch, reachable ONLY via
        # the transposition primitive (plain Levenshtein distance is 2)
        sub = (_topk_df(sp, sf, MultiTermQuery("fuzzy", "joim",
                                               max_edits=1), 10)
               .select(F.lit("sub").alias("op"), "doc_id", "score_r"))
        osa = (_topk_df(sp, sf, MultiTermQuery("fuzzy", "abtch",
                                               max_edits=1), 10)
               .select(F.lit("osa").alias("op"), "doc_id", "score_r"))
        return sub.unionByName(osa)
    q["ft_fuzzy"] = ft_fuzzy

    def ft_fuzzy_like_this(sp, sf):
        # FuzzyLikeThisQuery (sandbox/queries/FuzzyLikeThisQuery.java):
        # fuzz each query term against the dictionary, score variants
        # boost^2 x ClassicSimilarity idf (source df, or the INTEGER
        # average of variant dfs when the source is corpus-absent),
        # keep the global top-N, rewrite to TermQuerys with ARTIFICIAL
        # df = ttf = 1 boosted by the variant score (:261-277).
        # Query "port batch vectr": 'port' hits TWO variants (part,
        # sort — equal boost, term-order tie), 'batch' is an exact
        # dictionary hit (boost 1, source-df idf), 'vectr' is absent
        # (avg-df idf path). Ops: 'flt' = the default rewrite; 'cut' =
        # maxNumTerms=3 global cut (drops the tied loser 'sort');
        # 'itf' = ignoreTF — constant-score leaves at the variant score
        s = _searcher(sp, sf)

        def run(tag, **kw):
            fq = s.fuzzy_like_this("port batch vectr", max_edits=1,
                                   **kw)
            return (s.search_df(fq, k=10)
                    .select(F.lit(tag).alias("op"), "doc_id",
                            F.round(F.col("score").cast("double"),
                                    3).alias("score_r")))
        return (run("flt")
                .unionByName(run("cut", max_num_terms=3))
                .unionByName(run("itf", ignore_tf=True)))
    q["ft_fuzzy_like_this"] = ft_fuzzy_like_this
    q["ft_constant_set"] = lambda sp, sf: _topk_df(
        sp, sf, MultiTermQuery("set", ("vector", "stream", "window"),
                               rewrite="constant_score"), 100000)
    # RegexpQuery: automaton-style term-dictionary intersection
    def ft_regexp(sp, sf):
        # RegexpQuery over Lucene's RegExp syntax (util/automaton/
        # RegExp.java), three op-tagged operators: 'core' = the shared
        # Java-regex subset; 'inter' = intersection (s.*&.*t — starts
        # with s AND ends with t); 'comp' = complement (s~(can) — s
        # followed by anything but "can")
        core = (_topk_df(sp, sf, MultiTermQuery("regexp", "s(low|ort)"),
                         10)
                .select(F.lit("core").alias("op"), "doc_id", "score_r"))
        inter = (_topk_df(sp, sf, MultiTermQuery("regexp", "s.*&.*t"),
                          10)
                 .select(F.lit("inter").alias("op"), "doc_id", "score_r"))
        comp = (_topk_df(sp, sf, MultiTermQuery("regexp", "s~(can)"), 10)
                .select(F.lit("comp").alias("op"), "doc_id", "score_r"))
        # 'auto' = NON-TAIL intersection ((s.*&.*a)n — an s-word whose
        # body ends in a, then n): inexpressible as a Java regex
        # lookahead, so expand_terms falls back to the true code-point
        # DFA (kernels/automaton.py) evaluated as a vectorized Arrow
        # filter over the term scan
        auto = (_topk_df(sp, sf, MultiTermQuery("regexp", "(s.*&.*a)n"),
                         10)
                .select(F.lit("auto").alias("op"), "doc_id", "score_r"))
        return (core.unionByName(inter).unionByName(comp)
                .unionByName(auto))
    q["ft_regexp"] = ft_regexp

    def ft_xml_query(sp, sf):
        # XML query syntax (queryparser/xml/CoreParser.java): the
        # element vocabulary built into engine query trees. Ops:
        # 'bool' = BooleanQuery/Clause occurs + mnm; 'terms' =
        # analyzed TermsQuery with mnm; 'dismax' =
        # DisjunctionMaxQuery tieBreaker; 'range' = PointRangeQuery
        # filter clause folded into the doc_filter pushdown; 'user' =
        # UserQuery classic-parser passthrough
        from lucene_spark.search.xmlquery import parse_xml_query
        s = _searcher(sp, sf)
        xmls = {
            "bool": """<BooleanQuery fieldName="text"
                        minimumNumberShouldMatch="1">
              <Clause occurs="must"><TermQuery>scan</TermQuery></Clause>
              <Clause occurs="should"><TermQuery>sort</TermQuery></Clause>
              <Clause occurs="should"><TermQuery>merge</TermQuery></Clause>
              <Clause occurs="mustNot"><TermQuery>dup</TermQuery></Clause>
            </BooleanQuery>""",
            "terms": '<TermsQuery fieldName="text" '
                     'minimumNumberShouldMatch="2">scan sort merge'
                     '</TermsQuery>',
            "dismax": """<DisjunctionMaxQuery fieldName="text"
                          tieBreaker="0.3">
              <TermQuery>vector</TermQuery>
              <TermQuery>batch</TermQuery>
            </DisjunctionMaxQuery>""",
            "range": """<BooleanQuery fieldName="text">
              <Clause occurs="must"><TermQuery>vector</TermQuery></Clause>
              <Clause occurs="filter"><PointRangeQuery
                fieldName="token_count" lowerTerm="30"
                upperTerm="70"/></Clause>
            </BooleanQuery>""",
            "user": '<UserQuery>merge AND (scan OR sort)</UserQuery>',
        }
        out = None
        for op, x in xmls.items():
            p = parse_xml_query(x, searcher=s)
            d = (s.search_df(p.query, k=10, doc_filter=p.doc_filter)
                 .select(F.lit(op).alias("op"), "doc_id",
                         F.round(F.col("score").cast("double"), 3)
                         .alias("score_r")))
            out = d if out is None else out.unionByName(d)
        return out
    q["ft_xml_query"] = ft_xml_query

    def ft_sort_by_field(sp, sf):
        # TopFieldCollector + field-sort searchAfter paging
        # (core:search/TopFieldCollector.java create(sort, n, after)):
        # page 1 = top-10 'vector' matches by n_chars desc; page 2
        # resumes from page 1's last (n_chars, doc_id) cursor
        from lucene_spark.search.query import TermQuery as TQ
        s = _searcher(sp, sf)
        docs = _docs(sp, sf).select("doc_id", "n_chars")
        p1 = s.sort_search_df(TQ("vector"), "n_chars", k=10,
                              metadata=docs)
        last = p1.collect()[-1]
        p2 = s.sort_search_df(TQ("vector"), "n_chars", k=10,
                              metadata=docs,
                              after=(last["n_chars"], last["doc_id"]))
        # multi-field Sort (Sort.java with two SortFields): (lang asc,
        # n_chars desc), paged by the 3-part lexicographic cursor
        docs2 = _docs(sp, sf).select("doc_id", "lang", "n_chars")
        spec = [("lang", "asc"), ("n_chars", "desc")]
        m1 = s.sort_search_df(TQ("vector"), spec, k=10, metadata=docs2)
        ml = m1.collect()[-1]
        m2 = s.sort_search_df(TQ("vector"), spec, k=10, metadata=docs2,
                              after=(ml["lang"], ml["n_chars"],
                                     ml["doc_id"]))
        single = (p1.select(F.lit(1).alias("page"), "doc_id", "n_chars")
                  .unionByName(p2.select(F.lit(2).alias("page"), "doc_id",
                                         "n_chars")))
        multi = (m1.select(F.lit(3).alias("page"), "doc_id", "n_chars")
                 .unionByName(m2.select(F.lit(4).alias("page"), "doc_id",
                                        "n_chars")))
        return single.unionByName(multi)
    q["ft_sort_by_field"] = ft_sort_by_field

    def ft_proximity_matches(sp, sf):
        # the two proximity match shapes, one entry: ordered sloppy
        # phrase "slow ... fast" (slop=2) + unordered interval (slow &
        # fast within <=2 intervening tokens), full-outer on doc_id;
        # -1 marks "no match on this side" (null-free for hashing)
        s = _searcher(sp, sf)
        o = (s.phrase_matches(["slow", "fast"], slop=2)
             .select("doc_id", F.col("freq").alias("ord_freq")))
        u = (s.interval_matches(["slow", "fast"], max_gaps=2)
             .select("doc_id", F.col("span").alias("unord_span")))
        return (o.join(u, "doc_id", "full_outer")
                .select("doc_id",
                        F.coalesce("ord_freq", F.lit(-1)).alias("ord_freq"),
                        F.coalesce("unord_span", F.lit(-1))
                        .alias("unord_span")))
    q["ft_proximity_matches"] = ft_proximity_matches

    def ft_filtered_topk(sp, sf):
        # BooleanQuery FILTER on native metadata (lang -> role column)
        s = _searcher(sp, sf)
        res = s.search_df(TermQuery("vector"), k=10, doc_filter="role = 'en'")
        return res.select("doc_id", F.round(F.col("score").cast("double"), 3)
                          .alias("score_r"))
    q["ft_filtered_topk"] = ft_filtered_topk

    def ft_sloppy_topk(sp, sf):
        # TRUE sloppy phrase (SloppyPhraseMatcher semantics): terms may
        # reorder within slop; freq = sum of 1/(1+matchLength) over the
        # min-pointer sweep's matches; BM25 with the float freq
        return _topk_df(sp, sf, PhraseQuery(("slow", "fast"), slop=2), 10)
    q["ft_sloppy_topk"] = ft_sloppy_topk

    def ft_nested_bool(sp, sf):
        # nested clauses: exact phrase as MUST + prefix MultiTermQuery
        # as SHOULD (BooleanQuery.Builder.add(Query, Occur) surface)
        q = BooleanQuery(must=(PhraseQuery(("slow", "fast")),),
                         should=(MultiTermQuery("prefix", "qu"),))
        return _topk_df(sp, sf, q, 10)
    q["ft_nested_bool"] = ft_nested_bool

    def ft_bool_of_bool(sp, sf):
        # boolean-of-boolean: (scan OR sort) AND (merge OR join)
        qq = BooleanQuery(must=(BooleanQuery(should=("scan", "sort")),
                                BooleanQuery(should=("merge", "join"))))
        return _topk_df(sp, sf, qq, 10)
    q["ft_bool_of_bool"] = ft_bool_of_bool

    def ft_parsed_query(sp, sf):
        # classic QueryParser subset v2 end-to-end:
        # +"slow fast" batch -dup
        from lucene_spark.search.query import parse_query
        qq = parse_query('+"slow fast" batch -dup')
        return _topk_df(sp, sf, qq, 10)
    q["ft_parsed_query"] = ft_parsed_query

    def ft_stemmed_topk(sp, sf):
        # Analysis chains end-to-end, one entry with an op tag:
        # 'porter'  — StandardAnalyzer + PorterStemFilter: the index
        #   stores stems, query terms are stemmed at search time, BM25
        #   stats are computed over stems. "merging"/"queries"/"tables"
        #   never occur in the corpus — they match via the stem classes
        #   merg/queri/tabl, whose complete corpus inflection classes
        #   are {merge}/{query}/{table} (verified over the full
        #   sf0.001/0.01/0.1 vocabularies; the pytest suite covers
        #   multi-member class merging)
        # 'english' — the full EnglishAnalyzer (possessive strip +
        #   33-word stop set + Porter stem): stop words drop out of
        #   the stream, so dl/avgdl and every BM25 stat move — the
        #   oracle recomputes the whole prelude over the stop-filtered
        #   stream
        sp_ = _searcher_stem(sp, sf, "porter")
        a = (sp_.search_df(OrQuery(("merging", "queries", "tables")), k=10)
             .select(F.lit("porter").alias("op"), "doc_id",
                     F.round(F.col("score").cast("double"), 3)
                     .alias("score_r")))
        se = _searcher_stem(sp, sf, "english")
        b = (se.search_df(OrQuery(("merging", "queries", "tables")), k=10)
             .select(F.lit("english").alias("op"), "doc_id",
                     F.round(F.col("score").cast("double"), 3)
                     .alias("score_r")))
        return a.unionByName(b)
    q["ft_stemmed_topk"] = ft_stemmed_topk

    def ft_shingle_edge(sp, sf):
        # Gram-producing analyzer chains end-to-end (kernels/shingle.py):
        # 'shingle' — ShingleAnalyzerWrapper(outputUnigrams=false): the
        #   index stores word BIGRAMS ("table hash" is ONE term), so
        #   phrase-ish matching runs at TermQuery speed; BM25 stats
        #   (dl = n_tokens-1, df/tf over bigrams) are computed over the
        #   shingle stream (analysis/common/.../shingle/ShingleFilter.java)
        # 'edge'    — EdgeNGramTokenFilter(1, 8, preserveOriginal): the
        #   index stores every token prefix, so the typed prefix "vect"
        #   IS an index term — search-as-you-type without MultiTermQuery
        #   expansion (analysis/common/.../ngram/EdgeNGramTokenFilter.java).
        #   Edge dl is the gram count (up to ~8x tokens), exercising the
        #   norm LUT beyond the standard 255 range.
        ssh = _searcher_stem(sp, sf, "shingle")
        a = (ssh.search_df(TermQuery("table hash"), k=10)
             .select(F.lit("shingle").alias("op"), "doc_id",
                     F.round(F.col("score").cast("double"), 3)
                     .alias("score_r")))
        sed = _searcher_stem(sp, sf, "edge")
        b = (sed.search_df(TermQuery("vect"), k=10)
             .select(F.lit("edge").alias("op"), "doc_id",
                     F.round(F.col("score").cast("double"), 3)
                     .alias("score_r")))
        return a.unionByName(b)
    q["ft_shingle_edge"] = ft_shingle_edge

    def ft_substring(sp, sf):
        # Trigram-accelerated substring grep (search/substring.py over
        # the 'ngram' chain, kernels/ngram.py = NGramTokenFilter(3, 3,
        # preserveOriginal)) — the reference's WildcardQuery('*pat*')
        # surface without its full dictionary scan:
        # 'long'  — pattern > 3 chars ("ustome" inside "customer"):
        #   PhraseQuery over the pattern's trigrams prunes, candidates
        #   verify against stored text with the engine tokenizer
        # 'short' — pattern < 3 ("qu"): wildcard over the TRIGRAM
        #   dictionary + TermInSet match is exact, no verify pass
        # 'tri'   — pattern == 3 ("que" inside "query"): ONE exact
        #   TermQuery against the gram dictionary, no scan, no verify
        # 'neg'   — absent pattern: zero rows (false-positive gate)
        from lucene_spark.search.substring import substring_search
        s = _searcher_stem(sp, sf, "ngram")
        parts = [substring_search(s, pat)
                 .select(F.lit(op).alias("op"), "doc_id")
                 for op, pat in (("long", "ustome"), ("short", "qu"),
                                 ("tri", "que"), ("neg", "zzqxv"))]
        out = parts[0]
        for p_ in parts[1:]:
            out = out.unionByName(p_)
        return out.orderBy("op", "doc_id")
    q["ft_substring"] = ft_substring

    def ft_high_freq(sp, sf):
        # HighFreqTerms diagnostic (misc/.../HighFreqTerms.java): top
        # terms of the text field by docFreq ('df' op) and by
        # totalTermFreq ('ttf' op) — one pushed-down termstats scan +
        # TakeOrderedAndProject per op, ties broken term asc
        s = _searcher(sp, sf)
        a = (s.high_freq_terms(15, by="df")
             .select(F.lit("df").alias("op"), "term",
                     F.col("df").alias("v")))
        b = (s.high_freq_terms(15, by="ttf")
             .select(F.lit("ttf").alias("op"), "term",
                     F.col("ttf").alias("v")))
        return a.unionByName(b).orderBy("op", F.col("v").desc(), "term")
    q["ft_high_freq"] = ft_high_freq

    def ft_stem_override(sp, sf):
        # KeywordMarkerFilter + StemmerOverrideFilter as a chain spec
        # (kernels/tokenizer.py parse_chain_spec; analysis/common/
        # .../miscellaneous/SetKeywordMarkerFilter.java,
        # StemmerOverrideFilter.java) on the porter chain:
        #   porter?protected=query&override=merge:combine
        # Stats parity with the standard prelude: porter is injective
        # on this corpus vocabulary (ft_stemmed_topk's verified
        # premise), the override target 'combine' collides with no
        # corpus stem, the protected 'query' stays its own class, and
        # porter never drops tokens — so every chain term is a 1:1
        # rename and BM25 scores equal standard-index scoring.
        # 'override'  — query 'merge' analyzes to the override term
        #               'combine' and ranks exactly like 'merge'
        # 'protected' — query 'query' stays surface-form
        # 'prot_miss' — query 'queries' stems to 'queri', which is a
        #               DIFFERENT class than the protected 'query':
        #               zero rows (on the plain porter index of
        #               ft_stemmed_topk the same query DOES match) —
        #               protection observably changes behavior
        spec = "porter?protected=query&override=merge:combine"
        s = _searcher_stem(sp, sf, spec)
        parts = []
        for op, term in (("override", "merge"), ("protected", "query"),
                         ("prot_miss", "queries")):
            parts.append(
                s.search_df(TermQuery(term), k=10)
                .select(F.lit(op).alias("op"), "doc_id",
                        F.round(F.col("score").cast("double"), 3)
                        .alias("score_r")))
        out = parts[0]
        for p_ in parts[1:]:
            out = out.unionByName(p_)
        return out.orderBy("op", F.col("score_r").desc(), "doc_id")
    q["ft_stem_override"] = ft_stem_override

    def ft_compound(sp, sf):
        # DictionaryCompoundWordTokenFilter chain spec
        # (kernels/compound.py; analysis/common/.../compound/
        # DictionaryCompoundWordTokenFilter.java): tokens >= 5 chars
        # emit every dictionary subword found at any position AFTER
        # the original; BM25 stats run over the expanded stream.
        # 'sub'   — TermQuery('cust'): an emitted subword of
        #           'customer' ranks compound docs
        # 'multi' — TermQuery('me'): emitted by BOTH 'merge' (pos 0)
        #           and 'customer' (pos 5), repeated emissions raise tf
        spec = "standard?compound=cust,omer,me"
        s = _searcher_stem(sp, sf, spec)
        parts = [s.search_df(TermQuery(t), k=10)
                 .select(F.lit(op).alias("op"), "doc_id",
                         F.round(F.col("score").cast("double"), 3)
                         .alias("score_r"))
                 for op, t in (("sub", "cust"), ("multi", "me"))]
        return (parts[0].unionByName(parts[1])
                .orderBy("op", F.col("score_r").desc(), "doc_id"))
    q["ft_compound"] = ft_compound

    def ft_search_after(sp, sf):
        # deep paging: page 2 of the 'vector' ranking via searchAfter
        s = _searcher(sp, sf)
        page1 = s.search(TermQuery("vector"), k=10)
        res = s.search_after_df(TermQuery("vector"), page1[-1], k=10)
        return res.select(
            "doc_id",
            F.round(F.col("score").cast("double"), 3).alias("score_r"))
    q["ft_search_after"] = ft_search_after

    def ft_mlt(sp, sf):
        # MoreLikeThis (queries/mlt): top tf-idf terms of doc 7 -> OR
        s = _searcher(sp, sf)
        q = s.more_like_this(7, max_terms=5, min_df=2)
        return _topk_df(sp, sf, q, 10)
    q["ft_mlt"] = ft_mlt

    def ft_rescore(sp, sf):
        # QueryRescorer: BM25 top-50 re-ranked by a Catalyst expression
        # over native doc columns (score + 1/(1+token_count))
        s = _searcher(sp, sf)
        top = s.search_df(TermQuery("vector"), k=50)
        res = s.rescore(top, "score + 1.0 / (1 + token_count)", k=50)
        return res.select("doc_id",
                          F.round(F.col("new_score"), 3).alias("ns_r"))
    q["ft_rescore"] = ft_rescore

    def ft_feature_boost(sp, sf):
        # FeatureField (document/FeatureField.java): static per-doc
        # feature scored by SaturationFunction (:634) in a SHOULD
        # clause beside the BM25 text clause — here over the FULL
        # match stream with the feature read from a doc-values column
        from lucene_spark.ops.features import boost_by_feature
        s = _searcher(sp, sf)
        top = boost_by_feature(s, TermQuery("vector"), "token_count",
                               fn="saturation", k=10,
                               weight=2.0, pivot=40.0)
        return top.select("doc_id",
                          F.round(F.col("score"), 3).alias("score_r"))
    q["ft_feature_boost"] = ft_feature_boost

    def ft_distance_feature(sp, sf):
        # DistanceFeatureQuery (document/LongDistanceFeatureQuery
        # .java:121, LongPoint.newDistanceFeatureQuery): the
        # recency/proximity SHOULD clause — total = BM25('vector') +
        # weight * pivot / (pivot + |token_count - origin|), ranked
        # over the full match stream like ft_feature_boost
        from lucene_spark.ops.features import boost_by_distance
        s = _searcher(sp, sf)
        top = boost_by_distance(s, TermQuery("vector"), "token_count",
                                origin=50, pivot=10, k=10, weight=2.0)
        return top.select("doc_id",
                          F.round(F.col("score"), 3).alias("score_r"))
    q["ft_distance_feature"] = ft_distance_feature

    def ft_payload_score(sp, sf):
        # PayloadScoreQuery over a DelimitedPayloadTokenFilter index
        # (queries/payloads/PayloadScoreQuery.java + analysis/common/
        # payloads/DelimitedPayloadTokenFilter.java): every doc gains
        # ' relevance|<doc_id%20>' (a payload-bearing occurrence) and
        # every 3rd doc an extra bare ' relevance' (payload-free ->
        # factor 1, PayloadDecoder.java:29); ops score
        # span*payload for Max/Sum/Average payload functions
        from lucene_spark.ops.payloads import payload_score_df
        s = _searcher_payload(sp, sf)
        parts = [payload_score_df(s, "relevance", fn=fn, k=10)
                 .select(F.lit(fn).alias("op"), "doc_id",
                         F.round(F.col("score"), 3).alias("score_r"))
                 for fn in ("max", "sum", "avg")]
        return parts[0].unionByName(parts[1]).unionByName(parts[2])
    q["ft_payload_score"] = ft_payload_score

    def ft_payload_check(sp, sf):
        # SpanPayloadCheckQuery (queries/payloads/SpanPayloadCheck
        # Query.java): spans accepted only where per-position payloads
        # satisfy the matcher — ops: EQ 7.0 (docs with doc_id%20==7),
        # GTE 10.0 (%20 in 10..19), and a None expectation (payload
        # MUST be absent — the bare ' relevance' occurrences, :222-224)
        from lucene_spark.ops.payloads import span_payload_check_df
        s = _searcher_payload(sp, sf)
        specs = [("eq7", [7.0], "eq"), ("gte10", [10.0], "gte"),
                 ("nul", [None], "eq")]
        parts = [span_payload_check_df(s, ["relevance"], exp, op=op)
                 .select(F.lit(tag).alias("op"), "doc_id", "n_spans")
                 for tag, exp, op in specs]
        return parts[0].unionByName(parts[1]).unionByName(parts[2])
    q["ft_payload_check"] = ft_payload_check

    def ft_html_search(sp, sf):
        # HTMLStripCharFilter chain end-to-end (analysis/common/
        # charfilter/HTMLStripCharFilter.jflex): every doc is wrapped
        # in real markup — a block heading with an inline <b>, a
        # <script> whose CONTENT must vanish, an inline <a> whose
        # anchor text must survive, entities, and a comment. The
        # oracle states the expected stripped token stream as a GOLDEN
        # ('doc heading ' || text || ' footer link tail'), so any leak
        # (script body, comment words, tag/attribute names) shifts
        # tf/dl and breaks the hash. Ops: 'top' = BM25 top-10 for a
        # content term over the html index; 'count' = per-probe-term
        # doc counts (injected terms present everywhere, markup terms
        # in NO doc)
        key = (_FORMAT_VERSION + "_html_"
               + re.sub(r"\W+", "_", os.path.abspath(sf)))
        out = os.path.join(_CACHE_ROOT, key)
        if not IndexCatalog(out).has_table("postings"):
            d = _docs(sp, sf).withColumn(
                "text",
                F.concat(
                    F.lit('<div class="hd"><b>doc</b> heading</div>'
                          '<script>var x = "<p>ignored tokens</p>";'
                          '</script>'),
                    F.col("text"),
                    F.lit(' <br><a href="#f">footer link</a> &amp; '
                          '&#33; tail<!-- hidden comment words -->')))
            build_index(sp, _as_transcripts(d), out, num_buckets=4,
                        analyzers={"text": "html"})
        s = _cached_searcher(sp, out)
        top = (s.search_df(TermQuery("vector"), k=10)
               .select(F.lit("top").alias("op"),
                       F.col("doc_id").cast("string").alias("k"),
                       F.round(F.col("score").cast("double"), 3)
                       .alias("v")))
        probes = ["doc", "heading", "footer", "tail", "var", "ignored",
                  "hidden", "href", "script", "div"]
        rows = [("count", t, float(s.count(TermQuery(t))))
                for t in probes]
        cnt = sp.createDataFrame(rows, "op string, k string, v double")
        return top.unionByName(cnt)
    q["ft_html_search"] = ft_html_search

    def ft_phonetic(sp, sf):
        # PhoneticFilter(Soundex, inject=false) chain end-to-end
        # (analysis/phonetic/.../PhoneticFilter.java:33, encoder
        # golden-tested vs the commons-codec jar): every doc gains a
        # surname whose SPELLING varies by doc_id — smith / smyth /
        # smithe / even schmidt all share code S530 (the census
        # classic), jones (J520) is the decoy — and
        # the whole corpus is soundex-encoded, so vocabulary words
        # collapse too (e.g. 'merge' and 'mark' both index as M620).
        # Ops: 'name' = top-10 for query "smyth" (analyzes to S530,
        # matching all three spellings with merged tf/df stats);
        # 'word' = top-10 for "merge" (M620 — BM25 over the collapsed
        # vocabulary class); 'decoy' = count for "jones" (only the
        # J520 quarter of the corpus).
        key = (_FORMAT_VERSION + "_phonetic_"
               + re.sub(r"\W+", "_", os.path.abspath(sf)))
        out = os.path.join(_CACHE_ROOT, key)
        variants = ["smith", "smyth", "smithe", "jones"]
        if not IndexCatalog(out).has_table("postings"):
            d = _docs(sp, sf).withColumn(
                "text",
                F.concat(
                    F.element_at(F.array(*[F.lit(v) for v in variants]),
                                 (F.col("doc_id") % 4 + 1).cast("int")),
                    F.lit(" "), F.col("text")))
            build_index(sp, _as_transcripts(d), out, num_buckets=4,
                        analyzers={"text": "phonetic"})
        s = _cached_searcher(sp, out)
        a = (s.search_df(TermQuery("smyth"), k=10)
             .select(F.lit("name").alias("op"), "doc_id",
                     F.round(F.col("score").cast("double"), 3)
                     .alias("score_r")))
        b = (s.search_df(TermQuery("merge"), k=10)
             .select(F.lit("word").alias("op"), "doc_id",
                     F.round(F.col("score").cast("double"), 3)
                     .alias("score_r")))
        c = sp.createDataFrame(
            [("decoy", -1, float(s.count(TermQuery("jones"))))],
            "op string, doc_id long, score_r double")
        return a.unionByName(b).unionByName(c)
    q["ft_phonetic"] = ft_phonetic

    def ft_expression(sp, sf):
        # Expressions module (expressions/js/JavascriptCompiler.java):
        # the JS-like scoring language compiled to one Catalyst SQL
        # expression, driving second-pass rescoring
        # (ExpressionRescorer): BM25 top-50 for 'vector' re-ranked by
        # sqrt(_score) + a ternary over token_count + ln + min —
        # exercising functions, the conditional, comparison-as-double,
        # and bindings (_score/token_count -> columns).
        from lucene_spark.search.expressions import compile_expression
        s = _searcher(sp, sf)
        top = s.search_df(TermQuery("vector"), k=50)
        sql = compile_expression(
            "sqrt(_score) + (token_count > 40 ? 0.25 : 0.0) "
            "+ ln(1 + token_count) / 10 + min(_score, 2.0)",
            {"_score": "score", "token_count": "token_count"})
        res = s.rescore(top, sql, k=10)
        return res.select(
            "doc_id",
            F.round(F.col("new_score").cast("double"), 3)
            .alias("score_r"))
    q["ft_expression"] = ft_expression

    def ft_term_vector(sp, sf):
        # TermVectors (core:index/TermVectors.java,
        # IndexReader.getTermVector): per-doc (term, freq, positions)
        # reconstructed from the stored field + the persisted analyzer
        # chain — no second copy of the corpus
        s = _searcher(sp, sf)
        tv = s.term_vectors([7, 11])
        return tv.select("doc_id", "term", "freq",
                         F.array_min("positions").alias("fp"))
    q["ft_term_vector"] = ft_term_vector

    def ft_match_all(sp, sf):
        # MatchAllDocsQuery: every live doc, constant score, built from
        # the norms table alone (no postings scan)
        from lucene_spark.search.query import MatchAllQuery
        s = _searcher(sp, sf)
        res = s.search_df(MatchAllQuery(), k=100000)
        return res.select("doc_id",
                          F.round(F.col("score").cast("double"), 3)
                          .alias("score_r"))
    q["ft_match_all"] = ft_match_all

    def ft_intervals(sp, sf):
        # the intervals algebra, one entry with an op tag (each shape
        # remains its own combinator tree in search/intervals.py):
        # ordered  — minimal ordered slow..fast, <=3 interior gaps
        #            (Intervals.maxgaps(Intervals.ordered))
        # contained — 'data' inside a minimal ordered slow..fast
        #            interval of width <=8 (Intervals.containedBy);
        #            min_width = -1 (not emitted by this shape)
        # or_phrase — non-Term sources through the combinators:
        #            ordered((scan|sort), "slow fast"), <=6 gaps
        from lucene_spark.search.intervals import (ContainedBy, MaxGaps,
                                                   MaxWidth, Or, Ordered,
                                                   Phrase, Term)
        s = _searcher(sp, sf)
        a = (s.interval_search(
                MaxGaps(Ordered((Term("slow"), Term("fast"))), 3))
             .select(F.lit("ordered").alias("op"), "doc_id",
                     "n_intervals", "min_width"))
        b = (s.interval_search(
                ContainedBy(Term("data"),
                            MaxWidth(Ordered((Term("slow"), Term("fast"))),
                                     8)))
             .select(F.lit("contained").alias("op"), "doc_id",
                     "n_intervals", F.lit(-1).alias("min_width")))
        c = (s.interval_search(
                MaxGaps(Ordered((Or((Term("scan"), Term("sort"))),
                                 Phrase(("slow", "fast")))), 6))
             .select(F.lit("or_phrase").alias("op"), "doc_id",
                     "n_intervals", "min_width"))
        return a.unionByName(b).unionByName(c)
    q["ft_intervals"] = ft_intervals

    def ft_surround(sp, sf):
        # surround query language (queryparser/surround/parser/
        # QueryParser.jj): dW/dN distance operators parsed onto the
        # intervals algebra, boolean AND/OR/NOT as doc-set joins,
        # `*` truncation resolved against the term dictionary
        from lucene_spark.search.surround import surround_search
        s = _searcher(sp, sf)

        def tag(op, df):
            return df.select(F.lit(op).alias("op"), "doc_id")

        return (tag("w3", surround_search(s, "3W(slow, fast)"))
                .unionByName(tag("n2", surround_search(s, "2N(slow, fast)")))
                .unionByName(tag("bool", surround_search(
                    s, "OR(slow, fast) NOT data")))
                .unionByName(tag("trunc", surround_search(s, "sca*")))
                .unionByName(tag("nested", surround_search(
                    s, "2W(OR(scan, sort), data)"))))
    q["ft_surround"] = ft_surround

    def ft_field_term(sp, sf):
        # TermQuery on an untokenized keyword field (StringField analog):
        # lang maps to the indexed 'role' keyword field; every match
        # scores BM25 with tf=1, omitted norms (length 1), per-field stats
        return _topk_df(sp, sf, TermQuery("en", field="role"), 100000)
    q["ft_field_term"] = ft_field_term

    def ft_facet_hier(sp, sf):
        # hierarchical taxonomy faceting over the 'batch' match stream
        # (facet/.../FastTaxonomyFacetCounts.java, DrillDownQuery,
        # DrillSideways), taxonomy path = source/lang, one entry:
        # 'count'    — per-level prefix counts (level 1 roots + level 2)
        # 'drill'    — children counts under the drilled node 'src3'
        # 'sideways' — per-dim counts with the OTHER dim's drill applied
        #              and its own removed (drills: source=src3, lang=en)
        from lucene_spark.ops import facets as FC
        s = _searcher(sp, sf)
        m = s.term_postings("batch").select("doc_id")
        docs = (_docs(sp, sf)
                .withColumn("path", F.concat_ws("/", "source", "lang")))
        cnt = (FC.taxonomy_counts(m, docs, "path", max_level=2)
               .select(F.lit("count").alias("op"), "level", "path",
                       "n_docs"))
        dr = (FC.drill_down(m, docs, "path", "src3")
              .select(F.lit("drill").alias("op"), F.lit(2).alias("level"),
                      "path", "n_docs"))
        sw = (FC.drill_sideways(m, docs,
                                dims={"source": "source", "lang": "lang"},
                                drills={"source": "src3", "lang": "en"})
              .select(F.lit("sideways").alias("op"),
                      F.lit(-1).alias("level"),
                      F.concat_ws("/", "dim", "value").alias("path"),
                      "n_docs"))
        # 'range' — numeric range facets over n_chars
        # (facet/range/LongRangeFacetCounts.java): overlapping ranges,
        # open upper bound, one conditional-sum pass
        rg = (FC.range_counts(m, docs, "n_chars", [
                  ("short", None, True, 200, False),
                  ("mid", 200, True, 400, False),
                  ("long", 400, True, None, True),
                  ("over300", 300, True, None, True),
              ])
              .select(F.lit("range").alias("op"), F.lit(0).alias("level"),
                      F.col("range_label").alias("path"), "n_docs"))
        return cnt.unionByName(dr).unionByName(sw).unionByName(rg)
    q["ft_facet_hier"] = ft_facet_hier

    def ft_combined_field(sp, sf):
        # CombinedFieldQuery (BM25F, core:search/CombinedFieldQuery.java):
        # terms ('vector', 'en') scored as one pseudo-term over the
        # synthetic combination of the analyzed text field (w=1) and the
        # keyword role field (w=2): freq = tf_text + 2*[role match],
        # df = max over (term, field), avgdl blends both fields'
        # sumTotalTermFreq, norms come from text alone (role omits norms)
        from lucene_spark.search.query import CombinedFieldQuery
        s = _searcher(sp, sf)
        q = CombinedFieldQuery(terms=("vector", "en"),
                               fields=(("text", 1.0), ("role", 2.0)))
        res = s.search_df(q, k=10)
        return res.select(
            "doc_id",
            F.round(F.col("score").cast("double"), 3).alias("score_r"))
    q["ft_combined_field"] = ft_combined_field

    def ft_block_join_topk(sp, sf):
        # join module, two op-tagged surfaces:
        # 'block' — ToParentBlockJoinQuery (ScoreMode.Max): top
        # conversations for a child-turn disjunction over the 5-turn
        # conversation index;
        # 'term_join' — JoinUtil.createJoinQuery: from-side 'vector'
        # matches aggregated per role value (ScoreMode.Max), to-side =
        # docs whose role holds a matched value (broadcast value join)
        s = _searcher_conv(sp, sf)
        res = s.block_join_search(OrQuery(("scan", "merge")), k=10,
                                  score_mode="max")
        bj = res.select(
            F.lit("block").alias("op"), F.col("conv_id").alias("key"),
            "n_children",
            F.round(F.col("score").cast("double"), 3).alias("score_r"))
        s2 = _searcher(sp, sf)
        tj = (s2.join_search(TermQuery("vector"), "role", "role", k=10,
                             score_mode="max")
              .select(F.lit("term_join").alias("op"),
                      F.col("doc_id").cast("string").alias("key"),
                      F.lit(-1).alias("n_children"),
                      F.round(F.col("score").cast("double"), 3)
                      .alias("score_r")))
        # 'to_child' — ToChildBlockJoinQuery (join/.../
        # ToChildBlockJoinQuery.java:47): the same parent rollup joined
        # back DOWN — every turn of a matching conversation scored with
        # its parent's ScoreMode.Max score, top-10 by (score desc,
        # doc_id asc)
        tc = (s.to_child_join_search(OrQuery(("scan", "merge")), k=10,
                                     parent_score_mode="max")
              .select(F.lit("to_child").alias("op"),
                      F.col("doc_id").cast("string").alias("key"),
                      F.lit(-1).alias("n_children"),
                      F.round(F.col("score").cast("double"), 3)
                      .alias("score_r")))
        return bj.unionByName(tj).unionByName(tc)
    q["ft_block_join_topk"] = ft_block_join_topk

    def ft_term_automaton(sp, sf):
        # TermAutomatonQuery (sandbox/src/java/org/apache/lucene/
        # sandbox/search/TermAutomatonQuery.java): the graph query
        # "slow (merge join | join | * fast)" built state-by-state via
        # the reference's createState/addTransition/addAnyTransition
        # surface; freq = accepted (start, path) occurrences summed
        # over the three enumerated paths (interior ANY matches any
        # position, TermAutomatonScorer.countMatches), scored with the
        # summed-idf stats over all four involved terms
        from lucene_spark.search.query import TermAutomaton
        s = _searcher(sp, sf)
        a = TermAutomaton()
        s1, s2, s3, s4 = (a.create_state() for _ in range(4))
        a.add_transition(0, s1, "slow")
        a.add_transition(s1, s2, "merge")
        a.add_transition(s2, s3, "join")
        a.add_transition(s1, s3, "join")
        a.add_any_transition(s1, s4)
        a.add_transition(s4, s3, "fast")
        a.set_accept(s3)
        res = s.search_df(a.finish(), k=10)
        return res.select(
            "doc_id",
            F.round(F.col("score").cast("double"), 3).alias("score_r"))
    q["ft_term_automaton"] = ft_term_automaton

    def ft_word_break(sp, sf):
        # WordBreakSpellChecker (suggest/.../WordBreakSpellChecker
        # .java): 'break' splits the compound "vectorbatch" against
        # the term dictionary (one batched substring lookup, bisect
        # recursion); 'combine' fuses adjacent query terms ("vec tor"
        # -> "vector", runs up to max_changes+1 terms, not_in_index
        # gate = at least one member absent)
        s = _searcher(sp, sf)
        br = (s.word_break_suggest("vectorbatch", n=5)
              .select(F.lit("break").alias("op"), "suggestion",
                      "n_changes", "freq"))
        cb = (s.word_combine_suggest(["vec", "tor", "batch"], n=5,
                                     max_changes=2)
              .select(F.lit("combine").alias("op"), "suggestion",
                      "n_changes", "freq"))
        return br.unionByName(cb)
    q["ft_word_break"] = ft_word_break

    def ft_covering(sp, sf):
        # CoveringQuery (sandbox/src/java/org/apache/lucene/sandbox/
        # search/CoveringQuery.java): per-DOCUMENT minimum-number-match
        # from a LongValuesSource — here 1 + (doc_id % 3), so a third
        # of the corpus needs 1 of the 3 terms, a third needs 2, a
        # third needs all 3; score = SUM of the matching sub-queries'
        # BM25 scores (CoveringScorer.score, double accumulate)
        s = _searcher(sp, sf)
        res = s.covering_search(
            [TermQuery("scan"), TermQuery("merge"), TermQuery("sort")],
            "1 + (doc_id % 3)", k=15)
        return res.select(
            "doc_id", "n_matches",
            F.round(F.col("score").cast("double"), 3).alias("score_r"))
    q["ft_covering"] = ft_covering

    def pc_percolate(sp, sf):
        # Monitor/percolator, both registration surfaces in one entry:
        # q0-q4 via the flat stored-query table; q5-q7 via
        # Monitor.register with ARBITRARY query trees (nested boolean
        # with msm + must_not, a prefix MultiTermQuery — the ANYTOKEN
        # presearcher path — and a phrase-must + filter boolean),
        # candidates pruned by the QueryAnalyzer presearcher term sets
        from lucene_spark.search.query import (BooleanQuery as BQ,
                                               MultiTermQuery as MTQ,
                                               PhraseQuery as PQ)
        queries_df = PC.stored_queries(sp, [
            ("q0", "term", ["dup"]),
            ("q1", "and", ["slow", "fast"]),
            ("q2", "or", ["vector", "stream"]),
            ("q3", "and", ["scan", "sort", "merge"]),
            ("q4", "phrase", ["slow", "fast"]),
        ])
        flat = PC.percolate(_docs(sp, sf), queries_df)
        registered = [
            ("q5", BQ(must=("slow",), should=("vector", "stream"),
                      min_should_match=1, must_not=("dup",))),
            ("q6", MTQ("prefix", "qu")),
            ("q7", BQ(must=(PQ(("slow", "fast")),), filter_=("batch",))),
        ]
        arb = PC.percolate_registered(_docs(sp, sf), registered)
        return flat.unionByName(arb)
    q["pc_percolate"] = pc_percolate

    def ev_window_agg(sp, sf):
        # event-time tumbling-window aggregation (the Structured
        # Streaming windowed-agg shape, run in batch for the oracle);
        # session TZ pinned to UTC so windows match DuckDB's naive ts
        sp.conf.set("spark.sql.session.timeZone", "UTC")
        ev = sp.read.parquet(os.path.join(sf, "events.parquet"))
        return (ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
                .agg(F.count("*").alias("n"),
                     F.round(F.sum("value"), 2).alias("sum_v"))
                .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                        .alias("w_start"), "event_type", "n", "sum_v"))
    q["ev_window_agg"] = ev_window_agg

    def ev_sessionize(sp, sf):
        # gap-based sessionization (30-min inactivity): lag + cumsum on
        # gap>threshold — the batch shape of session_window
        from pyspark.sql import Window
        ev = sp.read.parquet(os.path.join(sf, "events.parquet"))
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        secs = F.col("ts").cast("timestamp").cast("long")  # NTZ-safe; the
        # lag difference cancels any session-TZ offset
        gap = secs - F.lag(secs).over(w)
        return (ev.withColumn("_new", F.when(gap.isNull() | (gap > 1800), 1)
                              .otherwise(0))
                .groupBy("user_id")
                .agg(F.sum("_new").alias("n_sessions"),
                     F.count("*").alias("n_events")))
    q["ev_sessionize"] = ev_sessionize

    # --- training-data ops ---
    def dedup_exact(sp, sf):
        return D.exact_duplicates(_docs(sp, sf))
    q["dedup_exact"] = dedup_exact

    def dedup_substring(sp, sf):
        # exact SUBSTRING dedup at token-window granularity (the
        # distributed Lee et al. 2021 suffix-array-dedup analog,
        # ops/dedup.py duplicate_substring_spans): every 10th doc gets
        # a deterministic 8-token boilerplate appended (a designed
        # cross-doc duplicated substring over tokens absent from the
        # corpus vocabulary); any 5-token window occurring >= 2 times
        # corpus-wide marks its occurrences, overlapping windows merge
        # into maximal per-doc spans. Chance window repeats in the
        # natural text are detected identically by the oracle
        d = _docs(sp, sf).withColumn(
            "text",
            F.when(F.col("doc_id") % 10 == 0,
                   F.concat(F.col("text"), F.lit(" " + _BOILERPLATE)))
            .otherwise(F.col("text")))
        return D.duplicate_substring_spans(d, window=5, min_count=2)
    q["dedup_substring"] = dedup_substring

    def dedup_lines(sp, sf):
        # C4-style LINE-level dedup (ops/dedup.py line_dedup): every
        # doc gains a corpus-wide shared boilerplate line plus a
        # 'section <doc_id%7>' line shared within its mod-7 class;
        # keep-first drops all but the (doc_id, line_no)-minimal
        # occurrence. Naturally-duplicated whole-doc texts (the
        # dedup_exact groups) dedup as lines too — mirrored exactly by
        # the oracle. Gated on the cleaned-text fingerprint
        d = _docs(sp, sf).withColumn(
            "text",
            F.concat(F.col("text"),
                     F.lit("\nplease visit our website today"),
                     F.lit("\nsection "),
                     (F.col("doc_id") % 7).cast("string")))
        out = D.line_dedup(d)
        return out.select("doc_id",
                          F.length("text").alias("n_chars"),
                          F.md5("text").alias("fp"))
    q["dedup_lines"] = dedup_lines

    def dedup_minhash_pairs(sp, sf):
        return D.minhash_pairs(_docs(sp, sf), num_hashes=8, bands=4)
    q["dedup_minhash_pairs"] = dedup_minhash_pairs

    def dedup_jaccard(sp, sf):
        # both n-gram Jaccard paths, one entry with a path tag:
        # 'exact' — lossless shared-shingle self-join (oracle/verify
        # path), threshold 0.8; 'lsh' — the documented 100 TB default:
        # MinHash band-bucket candidates -> exact Jaccard verify, 0.5
        d = _docs(sp, sf)
        ex = (D.jaccard_pairs(d, threshold=0.8)
              .select(F.lit("exact").alias("path"), "a", "b",
                      F.round("jaccard", 4).alias("jaccard_r")))
        ls = (D.jaccard_pairs_lsh(d, threshold=0.5)
              .select(F.lit("lsh").alias("path"), "a", "b",
                      F.round("jaccard", 4).alias("jaccard_r")))
        return ex.unionByName(ls)
    q["dedup_jaccard"] = dedup_jaccard

    def dedup_simhash(sp, sf):
        return D.simhash(_docs(sp, sf), bits=32)
    q["dedup_simhash"] = dedup_simhash

    def dedup_clusters(sp, sf):
        # duplicate-cluster canonicalization: connected components
        # over the exact-Jaccard pair list (chained dups a~b~c
        # collapse into ONE cluster labeled by the min doc_id).
        # Pointer-jumping min-label propagation, O(log diameter)
        # rounds of hash joins, no driver-side graph
        pairs = D.jaccard_pairs(_docs(sp, sf), threshold=0.8)
        return D.duplicate_clusters(pairs)
    q["dedup_clusters"] = dedup_clusters

    def dedup_cosine_pairs(sp, sf):
        # embedding-cosine near-duplicate detection (exact verify path)
        return (SIM.cosine_pairs(_embeddings(sp, sf), threshold=0.4)
                .select("a", "b", F.round("cos", 4).alias("cos_r")))
    q["dedup_cosine_pairs"] = dedup_cosine_pairs

    def ann_cosine_topk(sp, sf):
        # 'exact' = brute-force cosine top-5 (the oracle baseline);
        # 'quant' = int8 scalar-quantized scan (Lucene99 scalar
        # quantization analog: min/max bounds, 7-bit codes, int GEMM +
        # correction terms, top-20 candidates, full-precision re-rank)
        # — the RECALL gate: at these settings the quantized path must
        # recover the exact top-5, so both ops share the brute oracle
        from lucene_spark.ops.quantized import quantized_topk
        emb = _embeddings(sp, sf)
        qs = (emb.filter(F.col("vec_id") < 5)
              .select(F.col("vec_id").alias("q_id"), "embedding"))
        exact = (SIM.cosine_topk(emb, qs, k=5)
                 .select(F.lit("exact").alias("op"), "q_id", "vec_id",
                         F.round("cos", 4).alias("cos_r")))
        quant = (quantized_topk(emb, qs, k=5, n_candidates=20)
                 .select(F.lit("quant").alias("op"), "q_id", "vec_id",
                         F.round("cos", 4).alias("cos_r")))
        # 'binary' = 1-bit centroid-centered codes (Lucene102 binary
        # quantization analog: sign bits + per-vector corrective
        # scale, 32x smaller scan, asymmetric scoring) — same recall
        # gate: must recover the exact top-5, here through a
        # 250-candidate cut. The deep cut is forced by the SYNTHETIC
        # near-random embeddings (one true top-5 member ranks ~216th
        # in 1-bit approx order at sf0.01 — measured, not tuned);
        # clustered real corpora prune far harder at equal recall
        # (same caveat as ann_lsh_recall; pruning power is gated on a
        # clustered fixture in tests/test_binary_ann.py)
        from lucene_spark.ops.binaryq import binary_topk
        binq = (binary_topk(emb, qs, k=5, n_candidates=250)
                .select(F.lit("binary").alias("op"), "q_id", "vec_id",
                        F.round("cos", 4).alias("cos_r")))
        # 'pq' = 8-byte product-quantization codes (Jégou et al. 2011;
        # completes the scalar/binary/product quantization trio): 8
        # subspaces x 256 centroids trained on the deterministic
        # md5-ordered sample, ADC LUT scoring, 32x smaller scan — same
        # recall gate via a 100-candidate cut (worst true-top-5 member
        # ranks 34th in PQ approx order at sf0.01 — measured; ~3x
        # margin) + full-precision re-rank
        from lucene_spark.ops.pq import pq_topk
        pq = (pq_topk(emb, qs, k=5, n_candidates=100, m=8, ks=256,
                      sample_n=4096)
              .select(F.lit("pq").alias("op"), "q_id", "vec_id",
                      F.round("cos", 4).alias("cos_r")))
        return (exact.unionByName(quant).unionByName(binq)
                .unionByName(pq))
    q["ann_cosine_topk"] = ann_cosine_topk

    def ann_lsh_recall(sp, sf):
        # ANN scale path gated on recall: sign-LSH bucketed top-k vs
        # exact brute-force top-k, per-query recall@5. The LSH pipeline
        # (md5-derived hyperplanes, 16 planes / 8 bands, band-bucket
        # join, exact re-rank) is replicated verbatim in the oracle SQL.
        # 2-bit bands because the synthetic embeddings are near-random
        # (weak neighbor structure); real clustered corpora keep recall
        # with wider bands and far smaller candidate sets.
        emb = _embeddings(sp, sf)
        qs = (emb.filter(F.col("vec_id") < 5)
              .select(F.col("vec_id").alias("q_id"), "embedding"))
        lsh = SIM.lsh_cosine_topk(emb, qs, dim=64, k=5,
                                  n_planes=16, bands=8)
        brute = SIM.cosine_topk(emb, qs, k=5)
        inter = (lsh.select("q_id", "vec_id")
                 .join(brute.select("q_id", "vec_id"), ["q_id", "vec_id"]))
        return (brute.groupBy("q_id").agg(F.count("*").alias("nb"))
                .join(inter.groupBy("q_id").agg(F.count("*").alias("ni")),
                      "q_id", "left")
                .select("q_id",
                        F.round(F.coalesce(F.col("ni"), F.lit(0))
                                / F.col("nb"), 4).alias("recall_r")))
    q["ann_lsh_recall"] = ann_lsh_recall

    def ann_filtered(sp, sf):
        # metadata-filtered ANN (KnnFloatVectorQuery with a filter,
        # core:search/KnnFloatVectorQuery.java:48), one entry, two ops:
        # 'selective' — the filter's cardinality is <= factor*k, so the
        #   reference-shape fallback runs EXACT search over the filtered
        #   corpus (rows are the exact top-5: op, q_id, vec_id, cos)
        # 'broad' — half the corpus stays eligible; the sign-LSH band
        #   path runs on the FILTERED corpus; gated as recall@5 vs the
        #   exact filtered top-5 (op, q_id, -1, recall)
        emb = _embeddings(sp, sf)
        qs = (emb.filter(F.col("vec_id") < 4)
              .select(F.col("vec_id").alias("q_id"), "embedding"))
        sel_res, sel_m = SIM.filtered_ann_topk(
            emb, qs, dim=64, k=5,
            filter_cond="label = 5 AND vec_id < 250")
        assert sel_m == "exact", sel_m
        sel = sel_res.select(F.lit("selective").alias("op"), "q_id",
                             "vec_id", F.round("cos", 4).alias("v"))
        broad_cond = "label % 2 = 0"
        lsh_res, lsh_m = SIM.filtered_ann_topk(
            emb, qs, dim=64, k=5, filter_cond=broad_cond, bands=8)
        assert lsh_m == "lsh", lsh_m
        brute = SIM.cosine_topk(emb.filter(broad_cond), qs, k=5)
        inter = (lsh_res.select("q_id", "vec_id")
                 .join(brute.select("q_id", "vec_id"), ["q_id", "vec_id"]))
        rec = (brute.groupBy("q_id").agg(F.count("*").alias("nb"))
               .join(inter.groupBy("q_id").agg(F.count("*").alias("ni")),
                     "q_id", "left")
               .select(F.lit("broad").alias("op"), "q_id",
                       F.lit(-1).cast("bigint").alias("vec_id"),
                       F.round(F.coalesce(F.col("ni"), F.lit(0))
                               / F.col("nb"), 4).alias("v")))
        return sel.unionByName(rec)
    q["ann_filtered"] = ann_filtered

    def text_analysis(sp, sf):
        # the four text-analysis operators (token stats, quality
        # scoring, language-ID, fingerprint), one entry: each remains
        # its own operator in lucene_spark.ops.textstats; the entry
        # joins their outputs on doc_id so every column of every op is
        # oracle-gated (all pure projections — the join is only gate
        # plumbing, not part of any operator)
        d = _docs(sp, sf)
        return (TS.token_stats(d)
                .join(TS.text_quality(d).drop("n_tokens"), "doc_id")
                .join(TS.lang_id(d), "doc_id")
                .join(TS.fingerprint(d), "doc_id"))
    q["text_analysis"] = text_analysis

    def text_repetition(sp, sf):
        # Gopher/MassiveText within-doc repetition filters (Rae et al.
        # 2021 A1.1): word-dup fraction (pure projection) + heaviest-
        # 2gram and duplicated-5gram character-mass fractions (tf-shaped
        # map-side-combined groupBys) — ops/textstats.repetition_signals
        return TS.repetition_signals(_docs(sp, sf))
    q["text_repetition"] = text_repetition

    def dedup_decontaminate(sp, sf):
        # benchmark decontamination (GPT-3 appx C shape): eval set =
        # every 25th doc; the rest of the corpus is scored by distinct
        # shared 3-grams (n=13 in production; 3 here so the synthetic
        # corpus actually collides). Benchmark n-grams broadcast; no
        # corpus-side shuffle before the sparse hit rollup
        # (ops/decontaminate.py)
        from lucene_spark.ops.decontaminate import decontaminate
        d = _docs(sp, sf)
        rep = decontaminate(d.filter("doc_id % 25 <> 0"),
                            d.filter("doc_id % 25 = 0"), n=3)
        return rep.filter("n_contaminated > 0")
    q["dedup_decontaminate"] = dedup_decontaminate

    def text_sample_stratified(sp, sf):
        # deterministic stratified training-mix sampling: md5(seed:id)
        # under a per-stratum hex threshold — membership independent of
        # partitioning/executors, zero shuffle (ops/sampling.py). The
        # entry returns the SAMPLED IDS (identity, not just counts) for
        # per-lang rates {en:.5, de:1, fr:.25, zh:0, default(es):.1}
        from lucene_spark.ops.sampling import stratified_sample
        s = stratified_sample(
            _docs(sp, sf), "lang",
            {"en": 0.5, "de": 1.0, "fr": 0.25, "zh": 0.0},
            seed=7, default_rate=0.1)
        return s.select("doc_id", "lang")
    q["text_sample_stratified"] = text_sample_stratified

    def text_bpe_budget(sp, sf):
        # training-budget token estimation: GPT-2-pretokenizer piece
        # counts (RE2-compatible subset, deviation documented on
        # BPE_PRETOKEN_RE) — one JVM projection, zero shuffle
        return TS.bpe_token_stats(_docs(sp, sf))
    q["text_bpe_budget"] = text_bpe_budget

    def text_chunks(sp, sf):
        # document chunking (the pre-training windowing stage): sliding
        # 40-token windows with 10-token overlap over the shared
        # normalized-token model, interior starts at stride 30 plus ONE
        # end-aligned final window — pure Catalyst projection, zero
        # shuffle (plan-asserted in tests/test_chunking.py); the
        # original-text span variant is test-gated (UAX#29 spans are
        # not SQL-expressible)
        from lucene_spark.ops.chunking import chunk_documents
        return chunk_documents(_docs(sp, sf), window=40, overlap=10)
    q["text_chunks"] = text_chunks

    def text_pack(sp, sf):
        # sequence packing (GPT-style concat-and-chunk): documents
        # concatenated in doc order within 4 deterministic shards, cut
        # into 200-token samples; one row per (doc, sample) slice
        # assignment. Window cumsum partitions on the shard key (shards
        # pack in parallel — the 100 TB shape), span explode via
        # sequence(), no token-level explode
        from lucene_spark.ops.packing import pack_sequences
        return pack_sequences(_docs(sp, sf), budget=200, n_shards=4)
    q["text_pack"] = text_pack

    def text_c4_filter(sp, sf):
        # C4 cleaning rules (Raffel et al. 2020 §2.2): line-level
        # terminal-punctuation / min-words / no-javascript retention +
        # page-level min-sentences / lorem-ipsum / curly-brace drops.
        # The corpus has no punctuation, so sentence structure is
        # synthesized DETERMINISTICALLY: '.\n' breaks at every ' the ',
        # a terminal period on doc_id%7, a javascript line on %53, a
        # lorem-ipsum line on %31, a curly-brace line on %43 —
        # identical string ops on both engines
        from lucene_spark.ops.c4 import c4_clean
        synth = _docs(sp, sf).select(
            "doc_id",
            F.concat(
                F.regexp_replace("text", " the ", ".\n"),
                F.when(F.col("doc_id") % 7 == 0, F.lit("."))
                .otherwise(F.lit("")),
                F.when(F.col("doc_id") % 53 == 0,
                       F.lit("\nthis javascript line ends badly."))
                .otherwise(F.lit("")),
                F.when(F.col("doc_id") % 31 == 0,
                       F.lit("\nlorem ipsum dolor."))
                .otherwise(F.lit("")),
                F.when(F.col("doc_id") % 43 == 0,
                       F.lit("\nvar x = { a };"))
                .otherwise(F.lit(""))).alias("text"))
        out = c4_clean(synth, min_words=3, min_sentences=2)
        return out.select("doc_id", "n_lines", "n_kept", "has_lorem",
                          "has_brace", "keep",
                          F.md5("clean_text").alias("clean_md5"))
    q["text_c4_filter"] = text_c4_filter

    def text_sample_unimax(sp, sf):
        # UniMax budget allocation (Chung et al. 2023): waterfill a
        # 15k-token budget over languages ascending by availability,
        # each capped at 2 epochs; rate feeds stratified_sample
        from lucene_spark.ops.sampling import unimax_allocation
        a = unimax_allocation(_docs(sp, sf), "lang", budget=15000,
                              max_epochs=2.0)
        return a.select("stratum", "available",
                        F.round("allocated", 4).alias("alloc_r"),
                        F.round("epochs", 6).alias("epochs_r"),
                        F.round("rate", 6).alias("rate_r"))
    q["text_sample_unimax"] = text_sample_unimax

    def text_sample_temperature(sp, sf):
        # temperature sampling (the mT5/XLM-R alpha rule,
        # ops/sampling.temperature_allocation): q_i ∝ available^alpha.
        # 'a05'  — alpha=0.5 uncapped: the closed-form share
        # 'a02c' — alpha=0.2 with a 2-epoch cap: capped excess
        #   redistributes proportionally among uncapped strata (the
        #   one-pass ascending cap/q walk; the oracle replays it as a
        #   recursive CTE)
        from lucene_spark.ops.sampling import temperature_allocation
        d = _docs(sp, sf)
        a = (temperature_allocation(d, "lang", budget=15000, alpha=0.5)
             .select(F.lit("a05").alias("op"), "stratum", "available",
                     F.round("allocated", 4).alias("alloc_r"),
                     F.round("epochs", 6).alias("epochs_r"),
                     F.round("rate", 6).alias("rate_r")))
        b = (temperature_allocation(d, "lang", budget=15000, alpha=0.2,
                                    max_epochs=2.0)
             .select(F.lit("a02c").alias("op"), "stratum", "available",
                     F.round("allocated", 4).alias("alloc_r"),
                     F.round("epochs", 6).alias("epochs_r"),
                     F.round("rate", 6).alias("rate_r")))
        return a.unionByName(b).orderBy("op", "stratum")
    q["text_sample_temperature"] = text_sample_temperature

    def text_gopher_filter(sp, sf):
        # composite Gopher quality verdict (Rae et al. 2021 A1.1): one
        # boolean per published rule + the conjunction; min_tokens
        # lowered to 30 so the synthetic corpus splits on BOTH sides
        # of the gate (defaults would fail ~every doc on length alone)
        return TS.gopher_quality(_docs(sp, sf), min_tokens=30)
    q["text_gopher_filter"] = text_gopher_filter

    def ft_facet_dynamic(sp, sf):
        # dynamic equal-weight range facets over the 'batch' match
        # stream's n_chars (facet/facetset/DynamicRangeUtil.java;
        # quantile-rule deviation documented on dynamic_range_counts):
        # 4 buckets, actual data values as bounds
        from lucene_spark.ops import facets as FC
        s = _searcher(sp, sf)
        m = s.term_postings("batch").select("doc_id")
        return FC.dynamic_range_counts(m, _docs(sp, sf), "n_chars",
                                       n_ranges=4)
    q["ft_facet_dynamic"] = ft_facet_dynamic

    def text_redact(sp, sf):
        # PII scrub (the C4-style pass, ops/redact.py): every 10th doc
        # gets deterministic synthetic PII appended (email + IP + SSN
        # shape — the corpus itself has none), then the full redaction
        # chain runs; counts + the redacted-text fingerprint are gated.
        # Clean docs double as the false-positive gate (counts 0, text
        # unchanged)
        from lucene_spark.ops.redact import redact
        d = _docs(sp, sf).withColumn(
            "text",
            F.when(
                F.col("doc_id") % 10 == 0,
                F.concat(F.col("text"), F.lit(" contact user"),
                         F.col("doc_id").cast("string"),
                         F.lit("@example.com at 10.0.0."),
                         (F.col("doc_id") % 256).cast("string"),
                         F.lit(" ssn 123-45-6789")))
            .otherwise(F.col("text")))
        r = redact(d)
        return r.select("doc_id", "n_email", "n_id", "n_ip", "n_phone",
                        F.md5("redacted").alias("fp"))
    q["text_redact"] = text_redact

    def text_perplexity(sp, sf):
        # CCNet-style LM quality scoring (ops/perplexity.py, Wenzek et
        # al. 2020): a trigram stupid-backoff LM trained on the EVEN
        # half of the corpus scores EVERY doc (held-out odd docs
        # exercise the backoff orders and the OOV floor); head/middle/
        # tail buckets via exact ntile. Bucketing orders by the ROUNDED
        # perplexity (ties -> doc_id) so the order is engine-exact.
        from lucene_spark.ops.perplexity import (lm_perplexity,
                                                 train_trigram_lm)
        from pyspark.sql.window import Window
        d = _docs(sp, sf)
        lm = train_trigram_lm(d.filter(F.col("doc_id") % 2 == 0))
        scored = (lm_perplexity(d, lm)
                  .withColumn("ppl_r", F.round("ppl", 3)))
        w = Window.orderBy(F.col("ppl_r").asc_nulls_last(),
                           F.col("doc_id").asc())
        return scored.select("doc_id", "n_toks", "ppl_r",
                             F.ntile(3).over(w).alias("bucket"))
    q["text_perplexity"] = text_perplexity

    def mm_features(sp, sf):
        packed = MM.pack_binary(_docs(sp, sf), "text", "doc_id")
        return MM.extract_features(packed).select("id", "n_bytes", "sha")
    q["mm_features"] = mm_features

    def ft_spell(sp, sf):
        # DirectSpellChecker ("did you mean", suggest/src/java/org/
        # apache/lucene/search/spell/DirectSpellChecker.java): dictionary
        # terms within OSA distance (LuceneLevenshteinDistance — a
        # transposition counts one edit) of a misspelled query term,
        # sharing its first char, ranked (similarity desc, df desc,
        # term asc) where similarity = 1 - dist/min(|q|, |cand|).
        # 'vectr' — one close candidate; 'sark' — three candidates
        # exercising the similarity ordering + the df tie-break
        s = _searcher(sp, sf)
        out = []
        for pat in ("vectr", "sark"):
            out.append(
                s.spell_suggest(pat, n=5, max_edits=2)
                .select(F.lit(pat).alias("op"), "term",
                        F.col("df").cast("long").alias("df"),
                        F.col("dist").cast("int").alias("dist"),
                        F.round(F.col("score"), 3).alias("score_r")))
        return out[0].unionByName(out[1])
    q["ft_spell"] = ft_spell

    def ft_facet_assoc(sp, sf):
        # facet associations (facet/taxonomy/TaxonomyFacetIntAssociations
        # .java with AssociationAggregationFunction.SUM): SUM each
        # matching doc's association value (n_chars here) into every
        # ancestor of its source/lang taxonomy path, reported alongside
        # the doc count — one posexplode of path prefixes + one
        # map-side-combined groupBy, pure Catalyst
        from lucene_spark.ops import facets as FC
        s = _searcher(sp, sf)
        m = s.term_postings("batch").select("doc_id")
        docs = (_docs(sp, sf)
                .withColumn("path", F.concat_ws("/", "source", "lang")))
        return (FC.association_sums(m, docs, "path", "n_chars",
                                    max_level=2)
                .select(F.col("level").cast("int").alias("level"), "path",
                        F.col("n_docs").cast("long").alias("n_docs"),
                        F.col("sum_assoc").cast("long").alias("sum_assoc")))
    q["ft_facet_assoc"] = ft_facet_assoc

    def ft_geo_point(sp, sf):
        # LatLonPoint.newBoxQuery / newDistanceQuery
        # (core:document/LatLonPoint.java:160,199) — the corpus has no
        # geo columns, so per-doc coordinates derive from doc_id by
        # integer arithmetic (identical expression in the oracle).
        # 'box' crosses the antimeridian (splits into two pushed-down
        # lon ranges, the reference's dateline handling); 'dist' runs
        # the circle-bounding-box prefilter + exact haversine at
        # GeoUtils.EARTH_MEAN_RADIUS_METERS inside codegen
        from lucene_spark.ops import geo as GEO
        d = _docs(sp, sf).select(
            "doc_id",
            ((F.col("doc_id") * 7919 % 18001) / 100.0 - 90.0).alias("lat"),
            ((F.col("doc_id") * 104729 % 36001) / 100.0 - 180.0)
            .alias("lon"))
        box = (GEO.box_query(d, "lat", "lon", 10.0, 60.0, 170.0, -170.0)
               .select(F.lit("box").alias("op"), "doc_id", "lat", "lon"))
        dist = (GEO.distance_query(d, "lat", "lon", 40.0, -74.0,
                                   3_000_000.0)
                .select(F.lit("dist").alias("op"), "doc_id", "lat", "lon"))
        # newPolygonQuery: engine even-odd ray-casts a convex quad;
        # the oracle proves membership with half-plane sign tests (a
        # DIFFERENT algorithm, so agreement is evidence)
        quad = [(-30.007, -120.008), (20.003, -60.004),
                (70.001, -90.006), (30.005, -150.002)]
        poly = (GEO.polygon_query(d, "lat", "lon", quad)
                .select(F.lit("poly").alias("op"), "doc_id", "lat", "lon"))
        return box.unionByName(dist).unionByName(poly)
    q["ft_geo_point"] = ft_geo_point

    def ft_quality(sp, sf):
        # benchmark-quality harness (benchmark/quality/QualityStats.java
        # + trec/TrecJudge.java): replay a judged query set, score
        # P@5/10/20 (with the short-list extrapolation), AvP, MRR
        # (top-5 window), recall per query, then the judged-queries
        # average (the avp mean = MAP). Judgments derive from the
        # corpus itself: relevant(q, d) := d contains BOTH qrel terms
        # (a deterministic TrecJudge the oracle replicates exactly);
        # 't_zero' has an unsatisfiable qrel -> max_good=0 -> excluded
        # from the average like the reference's m-counter does.
        from pyspark.sql.window import Window
        from lucene_spark.ops import quality as QS
        s = _searcher(sp, sf)
        qset = {"t_vector": TermQuery("vector"),
                "or_ssm": OrQuery(("scan", "sort", "merge")),
                "t_slow": TermQuery("slow"),
                "t_zero": TermQuery("merge")}
        w = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("doc_id"))
        res = (s.search_batch(qset, k=20)
               .select(F.col("query_id").alias("qid"), "doc_id",
                       F.row_number().over(w).alias("rank")))
        qrel_terms = {"t_vector": ("vector", "index"),
                      "or_ssm": ("scan", "sort"),
                      "t_slow": ("slow", "fast"),
                      "t_zero": ("merge", "zzqxunseen")}
        qrels = None
        for qid, (t1, t2) in qrel_terms.items():
            j = (s.term_postings(t1).select("doc_id")
                 .join(s.term_postings(t2).select("doc_id"), "doc_id")
                 .select(F.lit(qid).alias("qid"), "doc_id"))
            qrels = j if qrels is None else qrels.unionByName(j)
        per = QS.quality_stats(res, qrels)
        cast = [F.col("qid")] + [F.col(c).cast("double")
                                 for c in per.columns if c != "qid"]
        return per.select(*cast).unionByName(
            QS.quality_average(per).select(*cast))
    q["ft_quality"] = ft_quality

    def cls_naive_bayes(sp, sf):
        # classification module: SimpleNaiveBayesClassifier
        # (classification/.../SimpleNaiveBayesClassifier.java) with the
        # index as the training set — class field 'role' (= lang), one
        # pushed-down postings scan for the batch vocabulary. Ops:
        # 'all' = every class's log score; 'best' = argmax class.
        from pyspark.sql.window import Window
        from lucene_spark.ops.classify import naive_bayes_classify
        s = _searcher(sp, sf)
        ids = [3, 7, 11, 19, 23, 31]
        texts = (_docs(sp, sf).filter(F.col("doc_id").isin(ids))
                 .select(F.col("doc_id").alias("id"), "text"))
        allsc = naive_bayes_classify(s, texts, class_field="role",
                                     all_scores=True).persist()
        a = allsc.select(F.lit("all").alias("op"),
                         F.col("id").alias("doc_id"), "cls",
                         F.round("score", 3).alias("score_r"))
        w = Window.partitionBy("id").orderBy(F.col("score").desc(),
                                             F.col("cls").asc())
        b = (allsc.withColumn("_rn", F.row_number().over(w))
             .filter(F.col("_rn") == 1)
             .select(F.lit("best").alias("op"),
                     F.col("id").alias("doc_id"), "cls",
                     F.round("score", 3).alias("score_r")))
        return a.unionByName(b)
    q["cls_naive_bayes"] = cls_naive_bayes

    def cls_knn(sp, sf):
        # classification module: KNearestNeighborClassifier
        # (classification/.../KNearestNeighborClassifier.java) — MLT
        # top-10 neighbors of doc 7, rank-weighted class vote.
        from lucene_spark.ops.classify import knn_classify
        s = _searcher(sp, sf)
        out = knn_classify(s, 7, k=10, class_field="role",
                           max_terms=5, min_df=2)
        return out.select("cls", F.round("score", 3).alias("score_r"))
    q["cls_knn"] = cls_knn

    def cls_knn_fuzzy(sp, sf):
        # KNearestFuzzyClassifier (classification/.../
        # KNearestFuzzyClassifier.java + utils/NearestFuzzyQuery.java):
        # free-text input fuzzy-expanded against the dictionary
        # (artificial df = ttf = 1 leaves; prefix 1 keeps 'part' but
        # drops 'sort' as a 'port' variant), class-exists filter,
        # top-10 neighbors, the same rank-weighted vote as cls_knn
        from lucene_spark.ops.classify import knn_fuzzy_classify
        s = _searcher(sp, sf)
        out = knn_fuzzy_classify(s, "port batch vectr", k=10,
                                 class_field="role", max_edits=1,
                                 prefix_length=1)
        return out.select("cls", F.round("score", 3).alias("score_r"))
    q["cls_knn_fuzzy"] = cls_knn_fuzzy

    def cls_bm25_nb(sp, sf):
        # BM25NBClassifier (classification/.../BM25NBClassifier.java):
        # per class, log(top-1 BM25 of the class term) + sum over input
        # tokens of log(class-constant + best in-class word BM25),
        # softmax-normalized (normClassificationResults log-sum-exp)
        from lucene_spark.ops.classify import bm25_nb_classify
        s = _searcher(sp, sf)
        out = bm25_nb_classify(s, "vector batch window slow",
                               class_field="role")
        return out.select("cls", F.round("score", 5).alias("score_r"))
    q["cls_bm25_nb"] = cls_bm25_nb

    def cls_perceptron(sp, sf):
        # BooleanPerceptronClassifier (classification/.../
        # BooleanPerceptronClassifier.java): integer term weights init
        # to ttf, bias = avg doc length, one sequential pass over the
        # classed docs in doc order, mistake -> +-tf clamped at 0
        # (n_parts=1 = the reference rule exactly; fresh-weight reads,
        # the stale-FST batch being an FST artifact)
        from lucene_spark.ops.perceptron import train_boolean_perceptron
        s = _searcher(sp, sf)
        w, _ = train_boolean_perceptron(s, "role = 'en'",
                                        n_parts=1, epochs=1)
        return w.select("term",
                        F.col("weight").cast("bigint").alias("weight"))
    q["cls_perceptron"] = cls_perceptron

    def ft_free_text(sp, sf):
        # FreeTextSuggester (suggest/analyzing/FreeTextSuggester.java):
        # bigram stupid-backoff LM over the corpus. Ops: 'pfx' =
        # context + word prefix ("slow f"); 'ctx' = trailing separator
        # upgrades to bigram-only ("slow "); 'uni' = single-token key
        # backs off nowhere ("vec").
        from lucene_spark.ops.freetext import FreeTextSuggester
        sug = FreeTextSuggester.build(_docs(sp, sf), grams=2)
        out = None
        for op, key, num in (("pfx", "slow f", 10),
                             ("ctx", "slow ", 10),
                             ("uni", "vec", 5)):
            part = (sug.lookup(key, num)
                    .select(F.lit(op).alias("op"), "suggestion",
                            F.round(F.col("score"), 6).alias("score_r")))
            out = part if out is None else out.unionByName(part)
        return out
    q["ft_free_text"] = ft_free_text

    def ft_wdgf_topk(sp, sf):
        # WordDelimiterGraphFilter chain end-to-end (analysis/common/
        # miscellaneous/WordDelimiterGraphFilter.java, parts config):
        # each doc's text gains a case/compound prefix
        # "PowerShot{doc_id%97} O'Neil's", the wdgf index stores the
        # split parts (power, shot, <n>, o, neil — possessive
        # dropped), BM25 stats move with the +5 dl. Ops: 'or' queries
        # "Power" (query-side analysis lowers it) + "shot"; 'num'
        # queries the split-off number part "42".
        key = (_FORMAT_VERSION + "_wdgf_"
               + re.sub(r"\W+", "_", os.path.abspath(sf)))
        out = os.path.join(_CACHE_ROOT, key)
        if not IndexCatalog(out).has_table("postings"):
            d = _docs(sp, sf).withColumn(
                "text",
                F.concat(F.lit("PowerShot"),
                         (F.col("doc_id") % 97).cast("string"),
                         F.lit(" O'Neil's "), F.col("text")))
            build_index(sp, _as_transcripts(d), out, num_buckets=4,
                        analyzers={"text": "wdgf"})
        s = _cached_searcher(sp, out)
        a = (s.search_df(OrQuery(("Power", "shot")), k=10)
             .select(F.lit("or").alias("op"), "doc_id",
                     F.round(F.col("score").cast("double"), 3)
                     .alias("score_r")))
        b = (s.search_df(TermQuery("42"), k=10)
             .select(F.lit("num").alias("op"), "doc_id",
                     F.round(F.col("score").cast("double"), 3)
                     .alias("score_r")))
        return a.unionByName(b)
    q["ft_wdgf_topk"] = ft_wdgf_topk

    def ft_diversified(sp, sf):
        # DiversifiedTopDocsCollector (misc/search/
        # DiversifiedTopDocsCollector.java): top-10 for
        # OR(scan, sort, merge) with at most 2 hits per role (= lang)
        s = _searcher(sp, sf)
        out = s.diversified_search(OrQuery(("scan", "sort", "merge")),
                                   "role", max_per_key=2, k=10)
        return out.select(
            "doc_id", F.col("key").alias("cls"),
            F.round(F.col("score").cast("double"), 3).alias("score_r"))
    q["ft_diversified"] = ft_diversified

    def ft_phrase_wildcard(sp, sf):
        # PhraseWildcardQuery (sandbox/search/PhraseWildcardQuery.java):
        # phrase "slow f*" — the prefix slot expands against the term
        # dictionary, then MultiPhraseQuery semantics (union positions,
        # idf summed over every expanded term)
        # op 'api' = the direct phrase_wildcard surface; op 'parsed' =
        # the SAME query through ComplexPhraseQueryParser (queryparser/
        # complexPhrase/ComplexPhraseQueryParser.java) — '"slow f*"'
        # with the prefix atom inside the quoted phrase
        from lucene_spark.search.query import parse_complex_phrase_query
        s = _searcher(sp, sf)
        qq = s.phrase_wildcard(["slow", MultiTermQuery("prefix", "f")])
        parsed = parse_complex_phrase_query('"slow f*"')
        parts = [
            s.search_df(qq, k=10).select(
                F.lit("api").alias("op"), "doc_id",
                F.round(F.col("score").cast("double"), 3)
                .alias("score_r")),
            s.search_df(parsed, k=10).select(
                F.lit("parsed").alias("op"), "doc_id",
                F.round(F.col("score").cast("double"), 3)
                .alias("score_r")),
        ]
        return parts[0].unionByName(parts[1])
    q["ft_phrase_wildcard"] = ft_phrase_wildcard

    def ft_function_score(sp, sf):
        # FunctionScoreQuery (queries/function/FunctionScoreQuery.java):
        # score REPLACED by an expression over the original score and
        # doc values, ranked over the FULL match stream (unlike the
        # top-N rescorer)
        s = _searcher(sp, sf)
        out = s.function_score_df(
            TermQuery("vector"),
            "score * (1.0 + 1.0 / (1 + token_count))", k=10)
        return out.select(
            "doc_id",
            F.round(F.col("score").cast("double"), 3).alias("score_r"))
    q["ft_function_score"] = ft_function_score

    return q


def _osa_sql(col: str, pat: str) -> str:
    """EXACT restricted Damerau-Levenshtein (OSA) of ``col`` against the
    literal ``pat`` as one DuckDB expression — the engine's
    kernels/osa.py distance, NOT duckdb's unrestricted
    damerau_levenshtein (they disagree from distance 2 up: 'ixjon' vs
    'jion' is DL=2 via transpose-then-insert-inside-the-pair but OSA=3,
    which Lucene's LevenshteinAutomata also rejects). The two-row DP
    runs as nested list_reduce folds; the accumulator rides in an
    INT[][] ([prev2, prev, [i]]) because DuckDB struct-typed
    accumulators alias their fields. Fuzz-verified against the OSA
    kernel in tests/test_advice_r5_fixes.py."""
    m = len(pat)
    row0 = "[" + ",".join(str(j) for j in range(m + 1)) + "]::INT[]"
    pl = "'" + pat.replace("'", "''") + "'"
    big = 1 << 20
    return f"""(list_reduce(
 [[NULL::INT[], {row0}, [0]::INT[]]] ||
 list_transform(range(1, len({col}) + 1),
   ii -> [NULL::INT[], NULL::INT[], [ii::INT]]),
 (st, cur) -> [st[2],
   list_reduce(
      [[cur[3][1]]::INT[]] ||
      list_transform(range(1, {m} + 1), jj -> [jj::INT]),
      (a, c) -> a || [least(
            st[2][c[1] + 1] + 1,
            a[c[1]] + 1,
            st[2][c[1]] + CASE WHEN {col}[cur[3][1]] = {pl}[c[1]]
                          THEN 0 ELSE 1 END,
            CASE WHEN cur[3][1] > 1 AND c[1] > 1
                      AND {col}[cur[3][1]] = {pl}[c[1] - 1]
                      AND {col}[cur[3][1] - 1] = {pl}[c[1]]
                 THEN st[1][c[1] - 1] + 1 ELSE {big} END)]),
   cur[3]]))[2][{m + 1}]"""


def _lang_pred_sql() -> str:
    """DuckDB mirror of ops.textstats.lang_id: per-language
    function-word counts over the SAME six stop-set profiles, argmax
    with the same priority tie-break, 'unk' when nothing hits."""
    profs = TS.lang_profiles()
    counts = {}
    for lang, words in profs:
        lits = ", ".join("'" + w + "'" for w in words)
        counts[lang] = (f"len(list_filter(t.toks, "
                        f"x -> list_contains([{lits}], x)))")
    mx = "greatest(" + ", ".join(counts[l] for l, _ in profs) + ")"
    branches = "".join(f" WHEN {counts[l]} = {mx} THEN '{l}'"
                       for l, _ in profs)
    # ELSE 'unk': NULL toks (NULL text) makes every count NULL, so no
    # WHEN matches — mirrors the engine's coalesce-to-empty 'unk' path
    return f"(CASE WHEN {mx} = 0 THEN 'unk'{branches} ELSE 'unk' END)"


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB) — shared prelude replicating analyzer + BM25 stats
# ---------------------------------------------------------------------------

def _norm_lut_sql(max_len: int = 255) -> str:
    from lucene_spark.kernels.smallfloat import byte4_to_int, int_to_byte4
    vals = ", ".join(f"({i}, {int(byte4_to_int(int_to_byte4(i)))})"
                     for i in range(max_len + 1))
    return vals


_AVGDL = "(SELECT sttf / n FROM st)"


def _soundex_sql(var: str) -> str:
    """Independent DuckDB implementation of commons-codec Soundex with
    PhoneticFilter replace semantics (letterless tokens pass through) —
    the oracle side of the 'phonetic' analyzer chain. RE2 has no
    backreferences, so adjacent-duplicate collapse runs as one
    run-collapse per consonant code 1-6 (runs of '0' are dropped whole
    afterwards); H/W are deleted from position >= 1 BEFORE mapping
    (commons Soundex.java specialCaseHW: skipped without updating the
    collapse state). Cross-checked against kernels/phonetic.py over
    every golden word in tests/test_phonetic.py."""
    letters = f"regexp_replace(upper({var}), '[^A-Z]', '', 'g')"
    body = (f"substr({letters}, 1, 1) || "
            f"regexp_replace(substr({letters}, 2), '[HW]', '', 'g')")
    codes = (f"translate({body}, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', "
             f"'01230120022455012623010202')")
    for d in "123456":
        codes = f"regexp_replace({codes}, '{d}+', '{d}', 'g')"
    return (f"CASE WHEN length({letters}) = 0 THEN {var} ELSE "
            f"substr({letters}, 1, 1) || "
            f"substr(replace(substr({codes}, 2), '0', '') || '000', 1, 3) "
            f"END")


def _prelude(tok_expr: str | None = None, src: str = "documents",
             lut_max: int = 255) -> str:
    tok_expr = tok_expr or "regexp_extract_all(lower(text), '[0-9a-z]+')"
    return f"""
WITH tok AS (
  SELECT doc_id, {tok_expr} AS toks
  FROM {src}
),
dl AS (SELECT doc_id, len(toks) AS dl FROM tok),
lut(l, ql) AS (VALUES {_norm_lut_sql(lut_max)}),
qdl AS (SELECT d.doc_id, lut.ql::DOUBLE AS ql FROM dl d JOIN lut ON d.dl = lut.l),
st AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE AS sttf FROM dl),
pos AS (SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos FROM tok),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM pos GROUP BY doc_id, term),
tdict AS (SELECT term, count(*)::DOUBLE AS df, sum(tf) AS ttf FROM tf GROUP BY term),
idf AS (SELECT term, ln(1 + ((SELECT n FROM st) - df + 0.5) / (df + 0.5)) AS idf FROM tdict)
"""


def _score(tf: str, ql: str = "q.ql", idf: str = "i.idf") -> str:
    return (f"{idf} * {tf} / ({tf} + 1.2 * (0.25 + 0.75 * {ql} / {_AVGDL}))")


def _phrase_cte(t1: str, t2: str) -> str:
    return (f", ph AS (SELECT p1.doc_id, count(*) AS freq FROM pos p1 "
            f"JOIN pos p2 ON p1.doc_id = p2.doc_id AND p2.pos = p1.pos + 1 "
            f"WHERE p1.term = '{t1}' AND p2.term = '{t2}' GROUP BY p1.doc_id)")


_SHINGLE_CTES = """
, sh AS (
  SELECT doc_id, list(DISTINCT array_to_string(toks[i:i+2], ' ')) AS shs
  FROM tok, unnest(range(1, len(toks) - 1)) r(i)
  WHERE len(toks) >= 3
  GROUP BY doc_id
)
"""


def oracle_sql() -> dict[str, str]:
    P = _prelude()
    o: dict[str, str] = {}

    o["ft_term_topk"] = P + f"""
, m AS (SELECT f.doc_id, {_score('f.tf')} AS s
        FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
        WHERE f.term = 'vector')
SELECT doc_id, round(s, 3) AS score_r FROM m ORDER BY s DESC, doc_id LIMIT 10
"""

    o["ft_and_topk"] = P + f"""
, m AS (SELECT f.doc_id, sum({_score('f.tf')}) AS s, count(*) AS nt
        FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
        WHERE f.term IN ('slow', 'fast')
        GROUP BY f.doc_id HAVING count(*) = 2)
SELECT doc_id, round(s, 3) AS score_r FROM m ORDER BY s DESC, doc_id LIMIT 10
"""

    o["ft_or_topk"] = P + f"""
, m AS (SELECT f.doc_id, sum({_score('f.tf')}) AS s
        FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
        WHERE f.term IN ('scan', 'sort', 'merge')
        GROUP BY f.doc_id)
SELECT doc_id, round(s, 3) AS score_r FROM m ORDER BY s DESC, doc_id LIMIT 10
"""

    o["ft_phrase_topk"] = P + _phrase_cte("slow", "fast") + f"""
, w AS (SELECT sum(idf) AS widf FROM idf WHERE term IN ('slow', 'fast'))
, m AS (SELECT p.doc_id,
        {_score('p.freq', idf='(SELECT widf FROM w)')} AS s
        FROM ph p JOIN qdl q USING (doc_id))
, mph AS (SELECT p1.doc_id, count(*) AS freq FROM pos p1
          JOIN pos p2 ON p1.doc_id = p2.doc_id AND p2.pos = p1.pos + 1
          WHERE p1.term = 'slow' AND p2.term IN ('fast', 'scan')
          GROUP BY p1.doc_id)
, w2 AS (SELECT sum(idf) AS widf FROM idf
         WHERE term IN ('slow', 'fast', 'scan'))
, m2 AS (SELECT p.doc_id,
         {_score('p.freq', idf='(SELECT widf FROM w2)')} AS s
         FROM mph p JOIN qdl q USING (doc_id))
SELECT 'exact' AS op, doc_id, round(s, 3) AS score_r FROM (
  SELECT doc_id, s FROM m ORDER BY s DESC, doc_id LIMIT 10)
UNION ALL
SELECT 'multi', doc_id, round(s, 3) FROM (
  SELECT doc_id, s FROM m2 ORDER BY s DESC, doc_id LIMIT 10)
"""

    o["ft_bool_must_not"] = P + f"""
, m AS (SELECT f.doc_id, {_score('f.tf')} AS s
        FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
        WHERE f.term = 'slow'
          AND NOT EXISTS (SELECT 1 FROM tf x
                          WHERE x.doc_id = f.doc_id AND x.term = 'fast'))
SELECT doc_id, round(s, 3) AS score_r FROM m ORDER BY s DESC, doc_id LIMIT 100000
"""

    o["ft_bool_filter_msm"] = P + f"""
, shd AS (SELECT f.doc_id, sum({_score('f.tf')}) AS s_sh
          FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
          WHERE f.term IN ('sort', 'merge') GROUP BY f.doc_id)
, m AS (SELECT f.doc_id, ({_score('f.tf')} + shd.s_sh) AS s
        FROM tf f
        JOIN qdl q USING (doc_id)
        JOIN idf i ON i.term = f.term
        JOIN shd ON shd.doc_id = f.doc_id
        WHERE f.term = 'scan'
          AND EXISTS (SELECT 1 FROM tf x
                      WHERE x.doc_id = f.doc_id AND x.term = 'batch'))
SELECT doc_id, round(s, 3) AS score_r FROM m ORDER BY s DESC, doc_id LIMIT 10
"""

    o["ft_synonym_topk"] = P + _phrase_cte("merge", "join") + f"""
, bl AS (SELECT max(df) AS mdf FROM tdict WHERE term IN ('slow', 'fast'))
, sidf AS (SELECT ln(1 + ((SELECT n FROM st) - mdf + 0.5) / (mdf + 0.5)) AS idf FROM bl)
, syn AS (SELECT doc_id, sum(tf) AS tf FROM tf
          WHERE term IN ('slow', 'fast') GROUP BY doc_id)
, synm AS (SELECT y.doc_id,
        {_score('y.tf', idf='(SELECT idf FROM sidf)')} AS s
        FROM syn y JOIN qdl q USING (doc_id))
, wj AS (SELECT sum(idf) AS widf FROM idf WHERE term IN ('merge', 'join'))
, jm AS (SELECT f.doc_id, {_score('f.tf')} AS s
         FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
         WHERE f.term = 'join')
, phm AS (SELECT p.doc_id,
          {_score('p.freq', idf='(SELECT widf FROM wj)')} AS s
          FROM ph p JOIN qdl q USING (doc_id))
, inn AS (SELECT doc_id, coalesce(j.s, 0) + coalesce(p.s, 0) AS s
          FROM jm j FULL JOIN phm p USING (doc_id))
, gm AS (SELECT doc_id, coalesce(y.s, 0) + coalesce(n.s, 0) AS s
         FROM synm y FULL JOIN inn n USING (doc_id))
SELECT 'blend' AS op, doc_id, round(s, 3) AS score_r
FROM (SELECT * FROM synm ORDER BY s DESC, doc_id LIMIT 10)
UNION ALL
SELECT 'graph', doc_id, round(s, 3)
FROM (SELECT * FROM gm ORDER BY s DESC, doc_id LIMIT 10)
"""

    # SimpleQueryParser surfaces: 'complex' = merge AND (scan|sort);
    # 'not' = vector minus batch + the MatchAll arm's constant 1.0;
    # 'pure_not' = every doc without 'dup' at score 1.0; 'ph_pre' =
    # exact phrase OR the 'mer' prefix expansion (own idf per term)
    o["ft_simple_query"] = P + _phrase_cte("slow", "fast") + f"""
, orc AS (SELECT f.doc_id, sum({_score('f.tf')}) AS s
          FROM tf f JOIN qdl q USING (doc_id)
          JOIN idf i ON i.term = f.term
          WHERE f.term IN ('scan', 'sort') GROUP BY f.doc_id)
, cpx AS (SELECT f.doc_id, {_score('f.tf')} + o2.s AS s
          FROM tf f JOIN qdl q USING (doc_id)
          JOIN idf i ON i.term = f.term
          JOIN orc o2 ON o2.doc_id = f.doc_id
          WHERE f.term = 'merge')
, ntm AS (SELECT f.doc_id, {_score('f.tf')} + 1.0 AS s
          FROM tf f JOIN qdl q USING (doc_id)
          JOIN idf i ON i.term = f.term
          WHERE f.term = 'vector'
            AND NOT EXISTS (SELECT 1 FROM tf x
                            WHERE x.doc_id = f.doc_id
                              AND x.term = 'batch'))
, pnm AS (SELECT d.doc_id, 1.0 AS s FROM documents d
          WHERE NOT EXISTS (SELECT 1 FROM tf x
                            WHERE x.doc_id = d.doc_id
                              AND x.term = 'dup'))
, wph AS (SELECT sum(idf) AS widf FROM idf WHERE term IN ('slow', 'fast'))
, phs AS (SELECT p.doc_id,
                 {_score('p.freq', idf='(SELECT widf FROM wph)')} AS s
          FROM ph p JOIN qdl q USING (doc_id))
, prs AS (SELECT f.doc_id, sum({_score('f.tf')}) AS s
          FROM tf f JOIN qdl q USING (doc_id)
          JOIN idf i ON i.term = f.term
          WHERE f.term LIKE 'mer%' GROUP BY f.doc_id)
, ppm AS (SELECT doc_id, coalesce(p.s, 0) + coalesce(r.s, 0) AS s
          FROM phs p FULL JOIN prs r USING (doc_id))
SELECT 'complex' AS op, doc_id, round(s, 3) AS score_r
FROM (SELECT * FROM cpx ORDER BY s DESC, doc_id LIMIT 10)
UNION ALL
SELECT 'not', doc_id, round(s, 3)
FROM (SELECT * FROM ntm ORDER BY s DESC, doc_id LIMIT 10)
UNION ALL
SELECT 'pure_not', doc_id, round(s, 3)
FROM (SELECT * FROM pnm ORDER BY s DESC, doc_id LIMIT 100000)
UNION ALL
SELECT 'ph_pre', doc_id, round(s, 3)
FROM (SELECT * FROM ppm ORDER BY s DESC, doc_id LIMIT 10)
"""

    # CommonTermsQuery: the df classification itself runs IN SQL (hi
    # iff df > ceil(0.4 * maxDoc)), so the oracle verifies the
    # search-time split, not just the final boolean; BlendedTermQuery:
    # every leaf scores with the artificial df = max over the group
    o["ft_common_blended"] = P + f"""
, cls AS (SELECT v.term,
                 CASE WHEN d.df > ceil(0.4 * (SELECT n FROM st))
                      THEN 1 ELSE 0 END AS hi
          FROM (VALUES ('dup'), ('scan'), ('merge')) v(term)
          LEFT JOIN tdict d ON d.term = v.term)
, closc AS (SELECT f.doc_id, sum({_score('f.tf')}) AS s
            FROM tf f JOIN qdl q USING (doc_id)
            JOIN idf i ON i.term = f.term
            WHERE f.term IN (SELECT term FROM cls WHERE hi = 0)
            GROUP BY f.doc_id)
, chisc AS (SELECT f.doc_id, sum({_score('f.tf')}) AS s
            FROM tf f JOIN qdl q USING (doc_id)
            JOIN idf i ON i.term = f.term
            WHERE f.term IN (SELECT term FROM cls WHERE hi = 1)
            GROUP BY f.doc_id)
, cm AS (SELECT l.doc_id, l.s + coalesce(h.s, 0) AS s
         FROM closc l LEFT JOIN chisc h USING (doc_id))
, chq AS (SELECT f.doc_id, sum({_score('f.tf')}) AS s
          FROM tf f JOIN qdl q USING (doc_id)
          JOIN idf i ON i.term = f.term
          WHERE f.term IN ('scan', 'merge')
          GROUP BY f.doc_id HAVING count(*) = 2)
, bdf AS (SELECT max(df) AS df FROM tdict WHERE term IN ('dup', 'merge'))
, bidf AS (SELECT ln(1 + ((SELECT n FROM st) - df + 0.5) / (df + 0.5))
           AS idf FROM bdf)
, blt AS (SELECT f.doc_id,
                 max({_score('f.tf', idf='(SELECT idf FROM bidf)')}) AS mx,
                 sum({_score('f.tf', idf='(SELECT idf FROM bidf)')}) AS tot,
                 sum((CASE WHEN f.term = 'dup' THEN 2.0 ELSE 1.0 END)
                     * {_score('f.tf', idf='(SELECT idf FROM bidf)')}) AS bsum
          FROM tf f JOIN qdl q USING (doc_id)
          WHERE f.term IN ('dup', 'merge') GROUP BY f.doc_id)
, bm AS (SELECT doc_id, mx + 0.01 * (tot - mx) AS s FROM blt)
, bbm AS (SELECT doc_id, bsum AS s FROM blt)
, xdf AS (SELECT greatest(
            coalesce((SELECT df FROM tdict WHERE term = 'vector'), 0),
            (SELECT count(*) FROM documents WHERE lang = 'en')) AS df)
, xidf AS (SELECT ln(1 + ((SELECT n FROM st) - df + 0.5) / (df + 0.5))
           AS idf FROM xdf)
, xl AS (SELECT d.doc_id,
           coalesce({_score('tv.tf', idf='(SELECT idf FROM xidf)')}, 0)
             AS s_text,
           CASE WHEN d.lang = 'en'
                THEN (SELECT idf FROM xidf) / 2.2 ELSE 0 END AS s_role
         FROM documents d
         LEFT JOIN tf tv ON tv.doc_id = d.doc_id AND tv.term = 'vector'
         LEFT JOIN qdl q ON q.doc_id = d.doc_id)
, xm AS (SELECT doc_id,
           greatest(s_text, s_role)
           + 0.01 * (s_text + s_role - greatest(s_text, s_role)) AS s
         FROM xl WHERE s_text > 0 OR s_role > 0)
SELECT 'common' AS op, doc_id, round(s, 3) AS score_r
FROM (SELECT * FROM cm ORDER BY s DESC, doc_id LIMIT 100000)
UNION ALL
SELECT 'common_hi', doc_id, round(s, 3)
FROM (SELECT * FROM chq ORDER BY s DESC, doc_id LIMIT 10)
UNION ALL
SELECT 'blend', doc_id, round(s, 3)
FROM (SELECT * FROM bm ORDER BY s DESC, doc_id LIMIT 10)
UNION ALL
SELECT 'blend_bool', doc_id, round(s, 3)
FROM (SELECT * FROM bbm ORDER BY s DESC, doc_id LIMIT 10)
UNION ALL
SELECT 'xfield', doc_id, round(s, 3)
FROM (SELECT * FROM xm ORDER BY s DESC, doc_id LIMIT 10)
"""

    o["ft_dismax_topk"] = P + f"""
, m AS (SELECT f.doc_id, max({_score('f.tf')}) AS s
        FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
        WHERE f.term IN ('scan', 'merge')
        GROUP BY f.doc_id)
SELECT doc_id, round(s, 3) AS score_r FROM m ORDER BY s DESC, doc_id LIMIT 10
"""

    o["ft_matches"] = P + _phrase_cte("slow", "fast") + """
SELECT 'term' AS op, doc_id, tf::INT AS v FROM tf WHERE term = 'dup'
UNION ALL
SELECT 'phrase', doc_id, freq::INT FROM ph
"""

    o["ft_counts"] = P + """
SELECT 'term_batch' AS qkind, count(*)::BIGINT AS cnt
FROM tf WHERE term = 'batch'
UNION ALL
SELECT 'bool_slow_not_fast', count(*)::BIGINT FROM tf f
WHERE f.term = 'slow'
  AND NOT EXISTS (SELECT 1 FROM tf x
                  WHERE x.doc_id = f.doc_id AND x.term = 'fast')
"""

    o["ft_term_dict"] = P + """
SELECT term, df::BIGINT AS df, ttf::BIGINT AS ttf FROM tdict
"""

    o["ft_term_dict_scan"] = P + """
SELECT 'prefix' AS op, term, df::BIGINT AS v FROM tdict WHERE term LIKE 'c%'
UNION ALL
SELECT 'range', term, df::BIGINT FROM tdict
WHERE term >= 'query' AND term < 'sort'
UNION ALL
SELECT 'suggest', term, ttf::BIGINT FROM (
  SELECT term, ttf FROM tdict WHERE term LIKE 's%'
  ORDER BY ttf DESC, term LIMIT 5)
UNION ALL
SELECT 'infix', term, ttf::BIGINT FROM (
  SELECT term, ttf FROM tdict WHERE term LIKE '%or%'
  ORDER BY ttf DESC, term LIMIT 5)
UNION ALL
SELECT 'fuzzy', term, ttf::BIGINT FROM (
  SELECT term, ttf FROM tdict
  WHERE length(term) BETWEEN 2 AND 6
    AND """ + _osa_sql("term", "jion") + """ <= 2
  ORDER BY ttf DESC, term LIMIT 5)
UNION ALL
SELECT 'ctx', term, w::BIGINT FROM (
  SELECT p.term, count(*) AS w
  FROM pos p JOIN documents d USING (doc_id)
  WHERE d.lang = 'en' AND p.term LIKE 's%'
  GROUP BY p.term
  ORDER BY w DESC, p.term LIMIT 5)
"""

    o["ft_range_filter"] = P + """
SELECT 'range' AS op, f.doc_id, f.tf::INT AS tf, d.n_chars
FROM tf f JOIN documents d USING (doc_id)
WHERE f.term = 'hash' AND d.n_chars BETWEEN 200 AND 400
UNION ALL
SELECT 'multi', f.doc_id, f.tf::INT, d.n_chars
FROM tf f JOIN documents d USING (doc_id)
WHERE f.term = 'hash'
  AND (d.n_chars BETWEEN 150 AND 320 OR d.n_chars BETWEEN 500 AND 600)
"""

    o["ft_facet_lang"] = P + """
, m AS (SELECT DISTINCT f.doc_id FROM tf f WHERE f.term = 'batch')
, tot AS (SELECT count(*) AS n FROM m)
, thr AS (SELECT printf('%08x',
            floor(64.0 / (SELECT n FROM tot) * 4294967296)::BIGINT) AS h)
, cap AS (SELECT lang, count(*) AS c FROM documents GROUP BY lang)
, samp AS (SELECT d.lang, count(*) AS ns
           FROM m JOIN documents d USING (doc_id)
           WHERE substr(md5('3:' || m.doc_id::VARCHAR), 1, 8)
                 < (SELECT h FROM thr)
           GROUP BY d.lang)
SELECT 'sampled' AS op, s.lang, s.ns::BIGINT AS n_docs,
       least(s.ns * (SELECT n FROM tot) // 64, c.c)::BIGINT AS n_amortized
FROM samp s JOIN cap c USING (lang)
UNION ALL
SELECT 'exact', lang, n_docs, n_docs FROM (
SELECT d.lang, count(*)::BIGINT AS n_docs
FROM tf f JOIN documents d USING (doc_id)
WHERE f.term = 'batch' GROUP BY d.lang)
"""

    o["ft_group_top_source"] = P + """
SELECT d.source, count(*)::BIGINT AS n_docs, sum(f.tf)::BIGINT AS sum_tf
FROM tf f JOIN documents d USING (doc_id)
WHERE f.term = 'join' GROUP BY d.source
"""

    o["ft_highlight"] = P + _phrase_cte("slow", "fast") + """
SELECT p.doc_id, strpos(lower(d.text), 'slow fast')::INT AS off
FROM ph p JOIN documents d USING (doc_id)
"""

    o["ft_wildcard_or"] = P + f"""
, m AS (SELECT f.doc_id, sum({_score('f.tf')}) AS s
        FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
        WHERE f.term LIKE 's%'
        GROUP BY f.doc_id)
SELECT doc_id, round(s, 3) AS score_r FROM m ORDER BY s DESC, doc_id LIMIT 10
"""

    # OSA == duckdb's damerau_levenshtein on this vocabulary (they can
    # differ only when a transposed pair is edited again — impossible
    # at maxEdits=1)
    o["ft_fuzzy"] = P + f"""
, msub AS (SELECT f.doc_id, sum({_score('f.tf')}) AS s
        FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
        WHERE damerau_levenshtein(f.term, 'joim') <= 1
        GROUP BY f.doc_id)
, mosa AS (SELECT f.doc_id, sum({_score('f.tf')}) AS s
        FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
        WHERE damerau_levenshtein(f.term, 'abtch') <= 1
        GROUP BY f.doc_id)
SELECT 'sub' AS op, doc_id, round(s, 3) AS score_r
FROM (SELECT * FROM msub ORDER BY s DESC, doc_id LIMIT 10)
UNION ALL
SELECT 'osa', doc_id, round(s, 3)
FROM (SELECT * FROM mosa ORDER BY s DESC, doc_id LIMIT 10)
"""

    # FuzzyLikeThisQuery: variant score = boost^2 x Classic idf where
    # boost = 1 - ed/min(len) (1.0 on an exact dictionary hit), idf
    # uses the SOURCE term's df or the integer-average of variant dfs
    # when the source is corpus-absent; leaves score BM25 with
    # ARTIFICIAL df = 1 (or constant vscore when ignoreTF)
    o["ft_fuzzy_like_this"] = P + f"""
, qt(src) AS (VALUES ('port'), ('batch'), ('vectr'))
, cand AS (SELECT q.src, d.term, d.df,
        CASE WHEN d.term = q.src THEN 1.0
             ELSE 1.0 - damerau_levenshtein(d.term, q.src)::DOUBLE
                        / least(length(q.src), length(d.term)) END AS boost
    FROM qt q JOIN tdict d ON damerau_levenshtein(d.term, q.src) <= 1)
, grp AS (SELECT src,
        coalesce(max(CASE WHEN term = src THEN df END), 0) AS df_src,
        floor(sum(df) / count(*)) AS avg_df
    FROM cand GROUP BY src)
, vs AS (SELECT c.src, c.term, c.boost * c.boost *
        (ln(((SELECT n FROM st) + 1)
            / ((CASE WHEN g.df_src > 0 THEN g.df_src
                     ELSE g.avg_df END) + 1)) + 1.0) AS vscore
    FROM (SELECT * FROM cand
          QUALIFY row_number() OVER (PARTITION BY src
                                     ORDER BY boost DESC, term) <= 50) c
    JOIN grp g USING (src))
, sel AS (SELECT * FROM vs ORDER BY vscore DESC, src, term LIMIT 50)
, sel3 AS (SELECT * FROM vs ORDER BY vscore DESC, src, term LIMIT 3)
, i1 AS (SELECT ln(1 + ((SELECT n FROM st) - 1 + 0.5) / 1.5) AS idf)
, mflt AS (SELECT f.doc_id,
        sum(v.vscore * {_score('f.tf', idf='(SELECT idf FROM i1)')}) AS s
        FROM tf f JOIN qdl q USING (doc_id) JOIN sel v ON v.term = f.term
        GROUP BY f.doc_id)
, mcut AS (SELECT f.doc_id,
        sum(v.vscore * {_score('f.tf', idf='(SELECT idf FROM i1)')}) AS s
        FROM tf f JOIN qdl q USING (doc_id)
        JOIN sel3 v ON v.term = f.term
        GROUP BY f.doc_id)
, mitf AS (SELECT f.doc_id, sum(v.vscore) AS s
        FROM tf f JOIN sel v ON v.term = f.term GROUP BY f.doc_id)
SELECT 'flt' AS op, doc_id, round(s, 3) AS score_r
FROM (SELECT * FROM mflt ORDER BY s DESC, doc_id LIMIT 10)
UNION ALL
SELECT 'cut', doc_id, round(s, 3)
FROM (SELECT * FROM mcut ORDER BY s DESC, doc_id LIMIT 10)
UNION ALL
SELECT 'itf', doc_id, round(s, 3)
FROM (SELECT * FROM mitf ORDER BY s DESC, doc_id LIMIT 10)
"""

    o["ft_regexp"] = P + f"""
, mc AS (SELECT f.doc_id, sum({_score('f.tf')}) AS s
        FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
        WHERE regexp_full_match(f.term, 's(low|ort)')
        GROUP BY f.doc_id)
, mi AS (SELECT f.doc_id, sum({_score('f.tf')}) AS s
        FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
        WHERE regexp_full_match(f.term, 's.*')
          AND regexp_full_match(f.term, '.*t')
        GROUP BY f.doc_id)
, mn AS (SELECT f.doc_id, sum({_score('f.tf')}) AS s
        FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
        WHERE regexp_full_match(f.term, 's.*')
          AND NOT regexp_full_match(f.term, 'scan')
        GROUP BY f.doc_id)
, ma AS (SELECT f.doc_id, sum({_score('f.tf')}) AS s
        FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
        WHERE regexp_full_match(f.term, 's.*an')
        GROUP BY f.doc_id)
SELECT 'core' AS op, doc_id, round(s, 3) AS score_r
FROM (SELECT * FROM mc ORDER BY s DESC, doc_id LIMIT 10)
UNION ALL
SELECT 'inter', doc_id, round(s, 3)
FROM (SELECT * FROM mi ORDER BY s DESC, doc_id LIMIT 10)
UNION ALL
SELECT 'comp', doc_id, round(s, 3)
FROM (SELECT * FROM mn ORDER BY s DESC, doc_id LIMIT 10)
UNION ALL
SELECT 'auto', doc_id, round(s, 3)
FROM (SELECT * FROM ma ORDER BY s DESC, doc_id LIMIT 10)
"""

    o["ft_constant_set"] = P + """
SELECT DISTINCT doc_id, 1.0 AS score_r FROM tf
WHERE term IN ('vector', 'stream', 'window')
"""

    # paging cursor == OFFSET because (n_chars desc, doc_id asc) is a
    # total order over the match set
    # paging cursors == OFFSET because each sort key + doc_id is a
    # total order over the match set
    o["ft_sort_by_field"] = P + """
, m AS (SELECT f.doc_id, d.lang, d.n_chars
        FROM tf f JOIN documents d USING (doc_id)
        WHERE f.term = 'vector')
SELECT 1 AS page, doc_id, n_chars FROM (
  SELECT doc_id, n_chars FROM m ORDER BY n_chars DESC, doc_id LIMIT 10)
UNION ALL
SELECT 2, doc_id, n_chars FROM (
  SELECT doc_id, n_chars FROM m
  ORDER BY n_chars DESC, doc_id LIMIT 10 OFFSET 10)
UNION ALL
SELECT 3, doc_id, n_chars FROM (
  SELECT doc_id, n_chars FROM m
  ORDER BY lang ASC, n_chars DESC, doc_id LIMIT 10)
UNION ALL
SELECT 4, doc_id, n_chars FROM (
  SELECT doc_id, n_chars FROM m
  ORDER BY lang ASC, n_chars DESC, doc_id LIMIT 10 OFFSET 10)
"""

    o["ft_proximity_matches"] = P + """
, ordm AS (
  SELECT p1.doc_id, count(*)::INT AS ord_freq
  FROM pos p1
  WHERE p1.term = 'slow' AND EXISTS (
    SELECT 1 FROM pos p2
    WHERE p2.doc_id = p1.doc_id AND p2.term = 'fast'
      AND p2.pos > p1.pos AND p2.pos - p1.pos - 1 <= 2)
  GROUP BY p1.doc_id)
, unord AS (
  SELECT p1.doc_id, (min(abs(p1.pos - p2.pos)) - 1)::INT AS unord_span
  FROM pos p1 JOIN pos p2
    ON p1.doc_id = p2.doc_id AND p1.term = 'slow' AND p2.term = 'fast'
  GROUP BY p1.doc_id
  HAVING min(abs(p1.pos - p2.pos)) - 1 <= 2)
SELECT coalesce(o.doc_id, u.doc_id) AS doc_id,
       coalesce(o.ord_freq, -1) AS ord_freq,
       coalesce(u.unord_span, -1) AS unord_span
FROM ordm o FULL OUTER JOIN unord u ON o.doc_id = u.doc_id
"""

    o["ft_filtered_topk"] = P + f"""
, m AS (SELECT f.doc_id, {_score('f.tf')} AS s
        FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
        JOIN documents d ON d.doc_id = f.doc_id
        WHERE f.term = 'vector' AND d.lang = 'en')
SELECT doc_id, round(s, 3) AS score_r FROM m ORDER BY s DESC, doc_id LIMIT 10
"""

    # TRUE sloppy phrase: the sweep's visited pointer-states are exactly
    # the merge-path pairs {{(i,j): A[i-1] <= B[j] AND B[j-1] < A[i]}}
    # over offset-adjusted positions (A = pos(slow), B = pos(fast)-1);
    # each pair with |A_i - B_j| <= slop contributes 1/(1+d) to freq
    o["ft_sloppy_topk"] = P + f"""
, pa AS (SELECT doc_id, pos AS p,
         lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
         FROM pos WHERE term = 'slow')
, pb AS (SELECT doc_id, pos - 1 AS p,
         lag(pos - 1) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
         FROM pos WHERE term = 'fast')
, pairs AS (SELECT a.doc_id, abs(a.p - b.p) AS d
            FROM pa a JOIN pb b ON a.doc_id = b.doc_id
            WHERE (a.prev IS NULL OR a.prev <= b.p)
              AND (b.prev IS NULL OR b.prev < a.p))
, sl AS (SELECT doc_id, sum(1.0 / (1 + d)) AS freq FROM pairs
         WHERE d <= 2 GROUP BY doc_id)
, w AS (SELECT sum(idf) AS widf FROM idf WHERE term IN ('slow', 'fast'))
, m AS (SELECT p.doc_id,
        {_score('p.freq', idf='(SELECT widf FROM w)')} AS s
        FROM sl p JOIN qdl q USING (doc_id))
SELECT doc_id, round(s, 3) AS score_r FROM m ORDER BY s DESC, doc_id LIMIT 10
"""

    o["ft_nested_bool"] = P + _phrase_cte("slow", "fast") + f"""
, w AS (SELECT sum(idf) AS widf FROM idf WHERE term IN ('slow', 'fast'))
, shd AS (SELECT f.doc_id, sum({_score('f.tf')}) AS s_sh
          FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
          WHERE f.term LIKE 'qu%' GROUP BY f.doc_id)
, m AS (SELECT p.doc_id,
        ({_score('p.freq', idf='(SELECT widf FROM w)')}
         + coalesce(shd.s_sh, 0)) AS s
        FROM ph p JOIN qdl q USING (doc_id)
        LEFT JOIN shd ON shd.doc_id = p.doc_id)
SELECT doc_id, round(s, 3) AS score_r FROM m ORDER BY s DESC, doc_id LIMIT 10
"""

    o["ft_bool_of_bool"] = P + f"""
, g1 AS (SELECT f.doc_id, sum({_score('f.tf')}) AS s
         FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
         WHERE f.term IN ('scan', 'sort') GROUP BY f.doc_id)
, g2 AS (SELECT f.doc_id, sum({_score('f.tf')}) AS s
         FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
         WHERE f.term IN ('merge', 'join') GROUP BY f.doc_id)
, m AS (SELECT g1.doc_id, g1.s + g2.s AS s FROM g1 JOIN g2 USING (doc_id))
SELECT doc_id, round(s, 3) AS score_r FROM m ORDER BY s DESC, doc_id LIMIT 10
"""

    o["ft_parsed_query"] = P + _phrase_cte("slow", "fast") + f"""
, w AS (SELECT sum(idf) AS widf FROM idf WHERE term IN ('slow', 'fast'))
, shd AS (SELECT f.doc_id, {_score('f.tf')} AS s_sh
          FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
          WHERE f.term = 'batch')
, m AS (SELECT p.doc_id,
        ({_score('p.freq', idf='(SELECT widf FROM w)')}
         + coalesce(shd.s_sh, 0)) AS s
        FROM ph p JOIN qdl q USING (doc_id)
        LEFT JOIN shd ON shd.doc_id = p.doc_id
        WHERE NOT EXISTS (SELECT 1 FROM tf x
                          WHERE x.doc_id = p.doc_id AND x.term = 'dup'))
SELECT doc_id, round(s, 3) AS score_r FROM m ORDER BY s DESC, doc_id LIMIT 10
"""

    # stemmed indexes: on this corpus every vocabulary token stems to a
    # UNIQUE stem (verified: no two corpus tokens share a Porter stem),
    # so both chains' stats are a 1:1 term rename and the oracle scores
    # the inflection-class members that DO occur in the corpus —
    # merging->merg<-{merge}, queries->queri<-{query}, tables->tabl<-
    # {table}. The english chain ALSO removes the 33 stop words, so its
    # half recomputes dl/avgdl/df over the stop-filtered stream.
    _STOPS = ("'a','an','and','are','as','at','be','but','by','for','if',"
              "'in','into','is','it','no','not','of','on','or','such',"
              "'that','the','their','then','there','these','they','this',"
              "'to','was','will','with'")
    o["ft_stemmed_topk"] = P + f"""
, m AS (SELECT f.doc_id, sum({_score('f.tf')}) AS s
        FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
        WHERE f.term IN ('merge', 'query', 'table')
        GROUP BY f.doc_id)
, toke AS (SELECT doc_id,
           list_filter(toks, x -> x NOT IN ({_STOPS})) AS etoks FROM tok)
, dle AS (SELECT doc_id, len(etoks) AS dl FROM toke)
, qdle AS (SELECT d.doc_id, lut.ql::DOUBLE AS ql
           FROM dle d JOIN lut ON d.dl = lut.l)
, ste AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE AS sttf FROM dle)
, tfe AS (SELECT doc_id, unnest(etoks) AS term, 1 AS one FROM toke)
, tfe2 AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tfe
           GROUP BY doc_id, term)
, idfe AS (SELECT term, ln(1 + ((SELECT n FROM ste) - count(*) + 0.5)
                          / (count(*) + 0.5)) AS idf
           FROM tfe2 GROUP BY term)
, me AS (SELECT f.doc_id,
         sum(i.idf * f.tf / (f.tf + 1.2 * (0.25 + 0.75 * q.ql
             / ((SELECT sttf FROM ste) / (SELECT n FROM ste))))) AS s
         FROM tfe2 f JOIN qdle q USING (doc_id)
         JOIN idfe i ON i.term = f.term
         WHERE f.term IN ('merge', 'query', 'table')
         GROUP BY f.doc_id)
SELECT 'porter' AS op, doc_id, round(s, 3) AS score_r FROM (
  SELECT doc_id, s FROM m ORDER BY s DESC, doc_id LIMIT 10)
UNION ALL
SELECT 'english', doc_id, round(s, 3) FROM (
  SELECT doc_id, s FROM me ORDER BY s DESC, doc_id LIMIT 10)
"""

    # gram chains: the oracle recomputes the ENTIRE BM25 prelude over
    # each chain's token stream (bigram shingles / edge prefixes built
    # in SQL from the standard stream — parity with kernels/shingle.py
    # is golden-tested in tests/test_shingle_edge.py). Edge dl can
    # exceed 255, so its norm LUT is extended to 1024.
    _GRAM_SRC = ("(SELECT doc_id, regexp_extract_all(lower(text), "
                 "'[0-9a-z]+') AS t FROM documents)")
    _P_SH = _prelude(
        "list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])",
        src=_GRAM_SRC)
    _P_ED = _prelude(
        "flatten(list_transform(t, w -> list_concat("
        "list_transform(range(1, least(length(w), 8) + 1), i -> w[1:i]), "
        "CASE WHEN length(w) > 8 THEN [w] ELSE [] END)))",
        src=_GRAM_SRC, lut_max=1024)
    o["ft_shingle_edge"] = f"""
SELECT 'shingle' AS op, doc_id, score_r FROM (
{_P_SH}
, m AS (SELECT f.doc_id, {_score('f.tf')} AS s
        FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
        WHERE f.term = 'table hash')
SELECT doc_id, round(s, 3) AS score_r FROM m ORDER BY s DESC, doc_id LIMIT 10)
UNION ALL
SELECT 'edge', doc_id, score_r FROM (
{_P_ED}
, m AS (SELECT f.doc_id, {_score('f.tf')} AS s
        FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
        WHERE f.term = 'vect')
SELECT doc_id, round(s, 3) AS score_r FROM m ORDER BY s DESC, doc_id LIMIT 10)
"""

    # keyword-marker/override spec chain: every chain term is a 1:1
    # rename on this corpus (see the entry comment), so the oracle
    # scores the UNDERLYING surface terms with the standard prelude;
    # 'prot_miss' proves the protected class split — the corpus has no
    # literal 'queries' token and nothing else stems to 'queri', so
    # the engine's 'queries' query (analyzed to 'queri') returns zero
    # rows, while ft_stemmed_topk's plain porter index matches
    o["ft_stem_override"] = P + f"""
, m1 AS (SELECT f.doc_id, {_score('f.tf')} AS s
         FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
         WHERE f.term = 'merge')
, m2 AS (SELECT f.doc_id, {_score('f.tf')} AS s
         FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
         WHERE f.term = 'query')
SELECT op, doc_id, score_r FROM (
  SELECT 'override' AS op, doc_id, round(s, 3) AS score_r FROM (
    SELECT doc_id, s FROM m1 ORDER BY s DESC, doc_id LIMIT 10)
  UNION ALL
  SELECT 'protected', doc_id, round(s, 3) FROM (
    SELECT doc_id, s FROM m2 ORDER BY s DESC, doc_id LIMIT 10)
  UNION ALL
  SELECT 'prot_miss', doc_id, 0.0 FROM tok
  WHERE len(list_filter(toks, x -> x = 'queries')) > 0
) ORDER BY op, score_r DESC, doc_id
"""

    # compound decompounding: the oracle rebuilds the ENTIRE BM25
    # prelude over the AUGMENTED stream — each token followed by its
    # dictionary subword emissions, one emission per occurrence
    # position (multiset-equal to the engine's (start, length) order,
    # so tf/dl/df agree exactly)
    _COMP_TOKS = (
        "flatten(list_transform(regexp_extract_all(lower(text), "
        "'[0-9a-z]+'), w -> list_concat([w], "
        "CASE WHEN length(w) >= 5 THEN "
        "flatten(list_transform(['cust', 'omer', 'me'], d -> "
        "list_transform(range(1, len(list_filter("
        "range(1, length(w) - length(d) + 2), "
        "i -> w[i:i+length(d)-1] = d)) + 1), x -> d))) "
        "ELSE [] END)))")
    _P_COMP = _prelude(_COMP_TOKS)
    o["ft_compound"] = f"""
SELECT 'sub' AS op, doc_id, score_r FROM (
{_P_COMP}
, m AS (SELECT f.doc_id, {_score('f.tf')} AS s
        FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
        WHERE f.term = 'cust')
SELECT doc_id, round(s, 3) AS score_r FROM m
ORDER BY s DESC, doc_id LIMIT 10)
UNION ALL
SELECT 'multi', doc_id, score_r FROM (
{_P_COMP}
, m AS (SELECT f.doc_id, {_score('f.tf')} AS s
        FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
        WHERE f.term = 'me')
SELECT doc_id, round(s, 3) AS score_r FROM m
ORDER BY s DESC, doc_id LIMIT 10)
ORDER BY op, score_r DESC, doc_id
"""

    # substring grep: ground truth is the tokenizer-level containment
    # predicate itself — docs where ANY token of the standard stream
    # contains the pattern (the trigram index/phrase/verify machinery
    # must reproduce it exactly, including zero rows for 'neg')
    o["ft_substring"] = P + """
SELECT op, doc_id FROM (
  SELECT 'long' AS op, doc_id FROM tok
  WHERE len(list_filter(toks, x -> contains(x, 'ustome'))) > 0
  UNION ALL
  SELECT 'short', doc_id FROM tok
  WHERE len(list_filter(toks, x -> contains(x, 'qu'))) > 0
  UNION ALL
  SELECT 'tri', doc_id FROM tok
  WHERE len(list_filter(toks, x -> contains(x, 'que'))) > 0
  UNION ALL
  SELECT 'neg', doc_id FROM tok
  WHERE len(list_filter(toks, x -> contains(x, 'zzqxv'))) > 0
) ORDER BY op, doc_id
"""

    # HighFreqTerms: df/ttf recomputed from the raw token stream
    o["ft_high_freq"] = P + """
SELECT op, term, v FROM (
  SELECT 'df' AS op, term, df::BIGINT AS v,
         row_number() OVER (ORDER BY df DESC, term) AS rn FROM tdict
  UNION ALL
  SELECT 'ttf', term, ttf::BIGINT,
         row_number() OVER (ORDER BY ttf DESC, term) FROM tdict
) WHERE rn <= 15 ORDER BY op, v DESC, term
"""

    o["ft_search_after"] = P + f"""
, m AS (SELECT f.doc_id, {_score('f.tf')} AS s
        FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
        WHERE f.term = 'vector')
SELECT doc_id, round(s, 3) AS score_r FROM m
ORDER BY s DESC, doc_id LIMIT 10 OFFSET 10
"""

    o["ft_mlt"] = P + f"""
, dterm AS (SELECT term, tf FROM tf WHERE doc_id = 7)
, cand AS (SELECT d.term, d.tf, t.df FROM dterm d
           JOIN tdict t USING (term) WHERE t.df >= 2)
, ranked AS (SELECT term FROM cand
             ORDER BY tf * ln(1 + ((SELECT n FROM st) - df + 0.5)
                              / (df + 0.5)) DESC, term ASC
             LIMIT 5)
, m AS (SELECT f.doc_id, sum({_score('f.tf')}) AS s
        FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
        WHERE f.term IN (SELECT term FROM ranked)
        GROUP BY f.doc_id)
SELECT doc_id, round(s, 3) AS score_r FROM m ORDER BY s DESC, doc_id LIMIT 10
"""

    o["ft_rescore"] = P + f"""
, m AS (SELECT f.doc_id, {_score('f.tf')} AS s
        FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
        WHERE f.term = 'vector')
, top50 AS (SELECT doc_id, s FROM m ORDER BY s DESC, doc_id LIMIT 50)
SELECT t.doc_id, round(t.s + 1.0 / (1 + d.dl), 3) AS ns_r
FROM top50 t JOIN dl d USING (doc_id)
"""

    o["ft_grouped_topk"] = P + f"""
, m AS (SELECT f.doc_id, {_score('f.tf')} AS s
        FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
        WHERE f.term = 'vector')
, j AS (SELECT m.doc_id, m.s, d.lang AS grp
        FROM m JOIN documents d USING (doc_id))
, r AS (SELECT grp, doc_id, s,
        row_number() OVER (PARTITION BY grp ORDER BY s DESC, doc_id)
          AS grp_rank,
        max(s) OVER (PARTITION BY grp) AS gs
        FROM j)
, heads AS (SELECT grp FROM (SELECT grp, max(s) AS gs FROM j GROUP BY grp)
            ORDER BY gs DESC, grp LIMIT 3)
SELECT r.grp, round(r.gs, 3) AS gs_r, r.doc_id,
       round(r.s, 3) AS score_r, r.grp_rank
FROM r JOIN heads USING (grp) WHERE grp_rank <= 2
"""

    # XML query syntax: each op mirrors its element's engine semantics
    o["ft_xml_query"] = P + f"""
, shd AS (SELECT f.doc_id, sum({_score('f.tf')}) AS s_sh
          FROM tf f JOIN qdl q USING (doc_id)
          JOIN idf i ON i.term = f.term
          WHERE f.term IN ('sort', 'merge') GROUP BY f.doc_id)
, mb AS (SELECT f.doc_id, ({_score('f.tf')} + shd.s_sh) AS s
        FROM tf f JOIN qdl q USING (doc_id)
        JOIN idf i ON i.term = f.term
        JOIN shd ON shd.doc_id = f.doc_id
        WHERE f.term = 'scan'
          AND NOT EXISTS (SELECT 1 FROM tf x
                          WHERE x.doc_id = f.doc_id AND x.term = 'dup'))
, mt AS (SELECT f.doc_id, sum({_score('f.tf')}) AS s
        FROM tf f JOIN qdl q USING (doc_id)
        JOIN idf i ON i.term = f.term
        WHERE f.term IN ('scan', 'sort', 'merge')
        GROUP BY f.doc_id HAVING count(*) >= 2)
, dv AS (SELECT f.doc_id, {_score('f.tf')} AS s
        FROM tf f JOIN qdl q USING (doc_id)
        JOIN idf i ON i.term = f.term WHERE f.term = 'vector')
, db AS (SELECT f.doc_id, {_score('f.tf')} AS s
        FROM tf f JOIN qdl q USING (doc_id)
        JOIN idf i ON i.term = f.term WHERE f.term = 'batch')
, dm AS (SELECT doc_id,
        greatest(coalesce(v.s, 0), coalesce(b.s, 0))
        + 0.3 * (coalesce(v.s, 0) + coalesce(b.s, 0)
                 - greatest(coalesce(v.s, 0), coalesce(b.s, 0))) AS s
        FROM dv v FULL JOIN db b USING (doc_id))
, mr AS (SELECT f.doc_id, {_score('f.tf')} AS s
        FROM tf f JOIN qdl q USING (doc_id)
        JOIN idf i ON i.term = f.term
        JOIN dl d ON d.doc_id = f.doc_id
        WHERE f.term = 'vector' AND d.dl BETWEEN 30 AND 70)
, orc AS (SELECT f.doc_id, sum({_score('f.tf')}) AS s
          FROM tf f JOIN qdl q USING (doc_id)
          JOIN idf i ON i.term = f.term
          WHERE f.term IN ('scan', 'sort') GROUP BY f.doc_id)
, mu AS (SELECT f.doc_id, {_score('f.tf')} + o2.s AS s
          FROM tf f JOIN qdl q USING (doc_id)
          JOIN idf i ON i.term = f.term
          JOIN orc o2 ON o2.doc_id = f.doc_id
          WHERE f.term = 'merge')
SELECT 'bool' AS op, doc_id, round(s, 3) AS score_r
FROM (SELECT * FROM mb ORDER BY s DESC, doc_id LIMIT 10)
UNION ALL
SELECT 'terms', doc_id, round(s, 3)
FROM (SELECT * FROM mt ORDER BY s DESC, doc_id LIMIT 10)
UNION ALL
SELECT 'dismax', doc_id, round(s, 3)
FROM (SELECT * FROM dm ORDER BY s DESC, doc_id LIMIT 10)
UNION ALL
SELECT 'range', doc_id, round(s, 3)
FROM (SELECT * FROM mr ORDER BY s DESC, doc_id LIMIT 10)
UNION ALL
SELECT 'user', doc_id, round(s, 3)
FROM (SELECT * FROM mu ORDER BY s DESC, doc_id LIMIT 10)
"""

    # grouping collectors: all groups / group heads / distinct values
    # (top-3 first-pass groups) / grouped facet counts
    o["ft_group_collectors"] = P + f"""
, m AS (SELECT f.doc_id, {_score('f.tf')} AS s
        FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
        WHERE f.term = 'vector')
, g AS (SELECT m.doc_id, m.s, d.source AS grp, d.lang AS fv
        FROM m JOIN documents d USING (doc_id))
, ag AS (SELECT grp, count(*) AS v FROM g GROUP BY grp)
, hd AS (SELECT grp, doc_id FROM (
          SELECT grp, doc_id,
                 row_number() OVER (PARTITION BY grp
                                    ORDER BY s DESC, doc_id) AS rn
          FROM g) WHERE rn = 1)
, top3 AS (SELECT grp FROM (SELECT grp, max(s) AS gs FROM g GROUP BY grp)
           ORDER BY gs DESC, grp LIMIT 3)
, dv AS (SELECT grp, count(DISTINCT fv) AS v FROM g
         WHERE grp IN (SELECT grp FROM top3) GROUP BY grp)
, gf AS (SELECT fv, count(*) AS v
         FROM (SELECT DISTINCT grp, fv FROM g) GROUP BY fv
         ORDER BY v DESC, fv LIMIT 5)
SELECT 'all' AS op, grp AS k, v FROM ag
UNION ALL SELECT 'heads', grp, doc_id FROM hd
UNION ALL SELECT 'distinct', grp, v FROM dv
UNION ALL SELECT 'gfacet', fv, v FROM gf
"""

    # DocValuesStatsCollector: count/missing/min/max/sum/mean +
    # POPULATION variance (DocValuesStats.variance divides by count)
    o["ft_dv_stats"] = P + """
, m AS (SELECT DISTINCT doc_id FROM tf WHERE term = 'vector')
, j AS (SELECT m.doc_id,
        CASE WHEN d.doc_id % 7 <> 0 THEN d.n_chars END AS v
        FROM m JOIN documents d USING (doc_id))
SELECT count(v)::BIGINT AS "count",
       (count(*) - count(v))::BIGINT AS missing,
       min(v)::BIGINT AS vmin, max(v)::BIGINT AS vmax,
       sum(v)::BIGINT AS vsum,
       round(avg(v), 6) AS mean_r,
       round(var_pop(v), 3) AS var_r,
       round(sqrt(var_pop(v)), 3) AS stdev_r
FROM j
"""

    o["ft_feature_boost"] = P + f"""
, m AS (SELECT f.doc_id, {_score('f.tf')} AS s
        FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
        WHERE f.term = 'vector')
SELECT m.doc_id,
       round(m.s + 2.0 * d.dl / (d.dl + 40.0), 3) AS score_r
FROM m JOIN dl d USING (doc_id)
ORDER BY m.s + 2.0 * d.dl / (d.dl + 40.0) DESC, m.doc_id LIMIT 10
"""

    # DistanceFeatureQuery: BM25 for 'vector' + the reference's
    # weight * pivot / (pivot + |dl - origin|) distance score
    o["ft_distance_feature"] = P + f"""
, m AS (SELECT f.doc_id, {_score('f.tf')} AS s
        FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
        WHERE f.term = 'vector')
SELECT m.doc_id,
       round(m.s + 2.0 * 10.0 / (10.0 + abs(d.dl - 50)), 3) AS score_r
FROM m JOIN dl d USING (doc_id)
ORDER BY m.s + 2.0 * 10.0 / (10.0 + abs(d.dl - 50)) DESC, m.doc_id LIMIT 10
"""

    # PayloadScoreQuery: BM25 over the delimited-payload chain's terms
    # (whitespace tokens, lowercased, cut at the first '|', empty term
    # parts dropped) x Max/Sum/Average payload functions; payload-free
    # occurrences decode to factor 1
    _PAYINJ = ("text || ' relevance|' || (doc_id % 20)::VARCHAR || "
               "CASE WHEN doc_id % 3 = 0 THEN ' relevance' ELSE '' END")
    PPAY = _prelude(
        "list_filter(list_transform(regexp_split_to_array(lower("
        + _PAYINJ + "), '\\s+'), x -> str_split(x, '|')[1]), "
        "x -> x <> '')", lut_max=300)
    o["ft_payload_score"] = PPAY + f"""
, m AS (SELECT f.doc_id, {_score('f.tf')} AS s
        FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
        WHERE f.term = 'relevance')
, pay AS (
  SELECT doc_id, count(*) AS n,
         max(CASE WHEN len(parts) > 1 THEN parts[2]::DOUBLE
             ELSE 1.0 END) AS pmax,
         sum(CASE WHEN len(parts) > 1 THEN parts[2]::DOUBLE
             ELSE 1.0 END) AS psum
  FROM (SELECT doc_id, str_split(tok, '|') AS parts
        FROM (SELECT doc_id,
                     unnest(regexp_split_to_array(lower({_PAYINJ}),
                                                  '\\s+')) AS tok
              FROM documents))
  WHERE parts[1] = 'relevance'
  GROUP BY doc_id)
, scored AS (
  SELECT m.doc_id,
         m.s * pay.pmax AS s_max,
         m.s * pay.psum AS s_sum,
         m.s * (pay.psum / pay.n) AS s_avg
  FROM m JOIN pay USING (doc_id))
SELECT 'max' AS op, doc_id, round(s_max, 3) AS score_r FROM (
  SELECT doc_id, s_max FROM scored ORDER BY s_max DESC, doc_id LIMIT 10)
UNION ALL
SELECT 'sum', doc_id, round(s_sum, 3) FROM (
  SELECT doc_id, s_sum FROM scored ORDER BY s_sum DESC, doc_id LIMIT 10)
UNION ALL
SELECT 'avg', doc_id, round(s_avg, 3) FROM (
  SELECT doc_id, s_avg FROM scored ORDER BY s_avg DESC, doc_id LIMIT 10)
"""

    # HTMLStrip chain: the oracle is the GOLDEN stripped token stream
    # — the injected markup reduces to 'doc heading' + text + 'footer
    # link tail' (script bodies, comments, tags, attributes all gone)
    PH = _prelude(
        "regexp_extract_all(lower('doc heading ' || text || "
        "' footer link tail'), '[0-9a-z]+')", lut_max=300)
    o["ft_html_search"] = PH + f"""
, m AS (SELECT f.doc_id, {_score('f.tf')} AS s
        FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
        WHERE f.term = 'vector')
, cnts AS (
  SELECT p.term AS k, coalesce(t.n, 0)::DOUBLE AS v
  FROM (VALUES ('doc'), ('heading'), ('footer'), ('tail'), ('var'),
               ('ignored'), ('hidden'), ('href'), ('script'), ('div'))
       p(term)
  LEFT JOIN (SELECT term, count(*) AS n FROM tf GROUP BY term) t
       USING (term))
SELECT 'top' AS op, doc_id::VARCHAR AS k, round(s, 3) AS v FROM (
  SELECT doc_id, s FROM m ORDER BY s DESC, doc_id LIMIT 10)
UNION ALL
SELECT 'count', k, v FROM cnts
"""

    # phonetic chain: the injected surname variant (by doc_id % 4) is
    # prepended, then EVERY token goes through the independent SQL
    # soundex; queries hit the encoded terms (smyth -> S530 unifies
    # smith/smyth/smithe AND corpus words like 'sent'/'smd'; merge ->
    # M620 also absorbs 'mark' etc.)
    PPH = _prelude(
        "list_transform(list_concat("
        "[(['smith', 'smyth', 'smithe', 'jones'])[(doc_id % 4 + 1)]], "
        "regexp_extract_all(lower(text), '[0-9a-z]+')), "
        f"t -> {_soundex_sql('t')})")
    o["ft_phonetic"] = PPH + f"""
, m AS (SELECT f.doc_id, {_score('f.tf')} AS s
        FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
        WHERE f.term = 'S530')
, m2 AS (SELECT f.doc_id, {_score('f.tf')} AS s
         FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
         WHERE f.term = 'M620')
SELECT 'name' AS op, doc_id, round(s, 3) AS score_r FROM (
  SELECT doc_id, s FROM m ORDER BY s DESC, doc_id LIMIT 10)
UNION ALL
SELECT 'word', doc_id, round(s, 3) FROM (
  SELECT doc_id, s FROM m2 ORDER BY s DESC, doc_id LIMIT 10)
UNION ALL
SELECT 'decoy', -1::BIGINT,
       (SELECT count(*)::DOUBLE FROM tf WHERE term = 'J520')
"""

    # Expressions: the compiled formula recomputed in SQL over the
    # same top-50 cut (dl == token_count: the standard chain drops
    # nothing on this corpus)
    o["ft_expression"] = P + f"""
, m AS (SELECT f.doc_id, {_score('f.tf')} AS s
        FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
        WHERE f.term = 'vector')
, top AS (SELECT doc_id, s FROM m ORDER BY s DESC, doc_id LIMIT 50)
, r AS (SELECT t.doc_id,
        sqrt(t.s) + (CASE WHEN d.dl > 40 THEN 0.25 ELSE 0.0 END)
        + ln(1 + d.dl) / 10 + least(t.s, 2.0) AS ns
        FROM top t JOIN dl d USING (doc_id))
SELECT doc_id, round(ns, 3) AS score_r FROM r
ORDER BY ns DESC, doc_id LIMIT 10
"""

    # SpanPayloadCheckQuery: per-token payload matcher over the same
    # injected corpus — EQ/GTE on the decoded float, None = absent
    o["ft_payload_check"] = f"""
WITH ptok AS (
  SELECT doc_id, str_split(tok, '|') AS parts
  FROM (SELECT doc_id,
               unnest(regexp_split_to_array(lower({_PAYINJ}),
                                            '\\s+')) AS tok
        FROM documents)
),
t AS (SELECT doc_id, parts[1] AS term,
             len(parts) > 1 AS haspay,
             CASE WHEN len(parts) > 1
                  THEN TRY_CAST(parts[2] AS DOUBLE) END AS pv
      FROM ptok WHERE parts[1] = 'relevance')
SELECT 'eq7' AS op, doc_id, count(*)::BIGINT AS n_spans
FROM t WHERE haspay AND pv = 7.0 GROUP BY doc_id
UNION ALL
SELECT 'gte10', doc_id, count(*)::BIGINT
FROM t WHERE haspay AND pv >= 10.0 GROUP BY doc_id
UNION ALL
SELECT 'nul', doc_id, count(*)::BIGINT
FROM t WHERE NOT haspay GROUP BY doc_id
"""

    o["ft_term_vector"] = P + """
SELECT doc_id, term, count(*)::INT AS freq, (min(pos) - 1)::INT AS fp
FROM pos WHERE doc_id IN (7, 11) GROUP BY doc_id, term
"""

    o["ft_match_all"] = """
SELECT doc_id, 1.0 AS score_r FROM documents ORDER BY doc_id LIMIT 100000
"""

    # minimal ordered intervals slow..fast = dominant pairs: q is the
    # NEAREST fast after p AND p is the NEAREST slow before q (any other
    # candidate pair contains one of these)
    _MI_PAIRS = """
, c1 AS (SELECT f.doc_id, f.pos AS q, max(s.pos) AS p
         FROM pos f JOIN pos s ON s.doc_id = f.doc_id
              AND s.term = 'slow' AND s.pos < f.pos
         WHERE f.term = 'fast' GROUP BY f.doc_id, f.pos)
, c2 AS (SELECT s.doc_id, s.pos AS p, min(f.pos) AS q
         FROM pos s JOIN pos f ON f.doc_id = s.doc_id
              AND f.term = 'fast' AND f.pos > s.pos
         WHERE s.term = 'slow' GROUP BY s.doc_id, s.pos)
, mi AS (SELECT c1.doc_id, c1.p, c1.q FROM c1 JOIN c2 USING (doc_id, p, q))
"""

    # one statement, three interval shapes (CTE names disjoint):
    # ordered/contained share mi; or_phrase rebuilds its pairs over
    # (scan|sort) .. "slow fast" — the chain picks the FIRST phrase
    # start q strictly after each or-position a; minimality keeps the
    # dominant pairs. width = (q+1) - a + 1; leaves = 1 + 2
    o["ft_intervals"] = P + _MI_PAIRS + """
, flt AS (SELECT doc_id, p, q FROM mi WHERE (q - p + 1) - 2 <= 3)
, big AS (SELECT doc_id, p, q FROM mi WHERE q - p + 1 <= 8)
, hits AS (SELECT DISTINCT d.doc_id, d.pos
           FROM pos d JOIN big b ON b.doc_id = d.doc_id
                AND d.pos BETWEEN b.p AND b.q
           WHERE d.term = 'data')
, ab AS (SELECT doc_id, pos FROM pos WHERE term IN ('scan', 'sort'))
, ph2 AS (SELECT p1.doc_id, p1.pos AS p FROM pos p1
          JOIN pos p2 ON p1.doc_id = p2.doc_id AND p2.pos = p1.pos + 1
          WHERE p1.term = 'slow' AND p2.term = 'fast')
, d1 AS (SELECT f.doc_id, f.p AS q, max(s.pos) AS a
         FROM ph2 f JOIN ab s ON s.doc_id = f.doc_id AND s.pos < f.p
         GROUP BY f.doc_id, f.p)
, d2 AS (SELECT s.doc_id, s.pos AS a, min(f.p) AS q
         FROM ab s JOIN ph2 f ON f.doc_id = s.doc_id AND f.p > s.pos
         GROUP BY s.doc_id, s.pos)
, mo AS (SELECT d1.doc_id, d1.a, d1.q FROM d1 JOIN d2 USING (doc_id, a, q))
, flt2 AS (SELECT doc_id, a, q FROM mo WHERE (q - a + 2) - 3 <= 6)
SELECT 'ordered' AS op, doc_id, count(*)::INT AS n_intervals,
       min(q - p + 1)::INT AS min_width
FROM flt GROUP BY doc_id
UNION ALL
SELECT 'contained', doc_id, count(*)::INT, -1 FROM hits GROUP BY doc_id
UNION ALL
SELECT 'or_phrase', doc_id, count(*)::INT, min(q - a + 2)::INT
FROM flt2 GROUP BY doc_id
"""

    # surround W/N = exists a position pair within the distance (ordered:
    # 1 <= p2-p1 <= d; unordered: 1 <= |p2-p1| <= d); boolean level =
    # doc-set algebra; truncation = prefix on the term dictionary
    o["ft_surround"] = P + """
, w3 AS (SELECT DISTINCT p1.doc_id FROM pos p1
         WHERE p1.term = 'slow' AND EXISTS (
           SELECT 1 FROM pos p2 WHERE p2.doc_id = p1.doc_id
             AND p2.term = 'fast' AND p2.pos - p1.pos BETWEEN 1 AND 3))
, n2 AS (SELECT DISTINCT p1.doc_id FROM pos p1
         WHERE p1.term = 'slow' AND EXISTS (
           SELECT 1 FROM pos p2 WHERE p2.doc_id = p1.doc_id
             AND p2.term = 'fast' AND abs(p2.pos - p1.pos) BETWEEN 1 AND 2))
, bl AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ('slow', 'fast')
         EXCEPT SELECT doc_id FROM tf WHERE term = 'data')
, tr AS (SELECT DISTINCT doc_id FROM tf WHERE term LIKE 'sca%')
, ne AS (SELECT DISTINCT p1.doc_id FROM pos p1
         WHERE p1.term IN ('scan', 'sort') AND EXISTS (
           SELECT 1 FROM pos p2 WHERE p2.doc_id = p1.doc_id
             AND p2.term = 'data' AND p2.pos - p1.pos BETWEEN 1 AND 2))
SELECT 'w3' AS op, doc_id FROM w3
UNION ALL SELECT 'n2', doc_id FROM n2
UNION ALL SELECT 'bool', doc_id FROM bl
UNION ALL SELECT 'trunc', doc_id FROM tr
UNION ALL SELECT 'nested', doc_id FROM ne
"""

    # keyword field: tf=1, omitted norms => length 1, per-field stats
    # (docCount = docs with the field = all docs here, avgdl = 1), so
    # score = idf / (1 + k1*( (1-b) + b*1/1 )) = idf / 2.2
    o["ft_field_term"] = """
WITH st AS (SELECT count(*)::DOUBLE AS n FROM documents),
dfq AS (SELECT count(*)::DOUBLE AS d FROM documents WHERE lang = 'en'),
i AS (SELECT ln(1 + ((SELECT n FROM st) - d + 0.5) / (d + 0.5)) AS idf FROM dfq)
SELECT doc_id, round((SELECT idf FROM i) * 1.0 / (1.0 + 1.2 * (0.25 + 0.75)), 3)
       AS score_r
FROM documents WHERE lang = 'en' ORDER BY doc_id LIMIT 100000
"""

    o["ft_facet_hier"] = P + """
, mt AS (SELECT DISTINCT f.doc_id FROM tf f WHERE f.term = 'batch')
, md AS (SELECT d.doc_id, d.source, d.lang,
                d.source || '/' || d.lang AS path
         FROM mt JOIN documents d USING (doc_id))
SELECT 'count' AS op, 1 AS level, source AS path,
       count(*)::BIGINT AS n_docs FROM md GROUP BY source
UNION ALL
SELECT 'count', 2, path, count(*)::BIGINT FROM md GROUP BY path
UNION ALL
SELECT 'drill', 2, path, count(*)::BIGINT FROM md
WHERE source = 'src3' GROUP BY path
UNION ALL
SELECT 'sideways', -1, 'source/' || source, count(*)::BIGINT FROM md
WHERE lang = 'en' GROUP BY source
UNION ALL
SELECT 'sideways', -1, 'lang/' || lang, count(*)::BIGINT FROM md
WHERE source = 'src3' GROUP BY lang
UNION ALL
SELECT 'range', 0, label, n FROM (
  SELECT 'short' AS label,
         sum(CASE WHEN d.n_chars < 200 THEN 1 ELSE 0 END)::BIGINT AS n
  FROM mt JOIN documents d USING (doc_id)
  UNION ALL
  SELECT 'mid', sum(CASE WHEN d.n_chars >= 200 AND d.n_chars < 400
                    THEN 1 ELSE 0 END)::BIGINT
  FROM mt JOIN documents d USING (doc_id)
  UNION ALL
  SELECT 'long', sum(CASE WHEN d.n_chars >= 400 THEN 1 ELSE 0 END)::BIGINT
  FROM mt JOIN documents d USING (doc_id)
  UNION ALL
  SELECT 'over300', sum(CASE WHEN d.n_chars >= 300 THEN 1 ELSE 0 END)::BIGINT
  FROM mt JOIN documents d USING (doc_id))
"""

    # combined field: pseudo-stats per CombinedFieldQuery.java:274-316 —
    # df = max over (term, field) document freqs; docCount = max (= n,
    # both fields cover every doc); sumTotalTermFreq = sttf_text + 2n
    # (role contributes one token per doc at weight 2); per-doc freq =
    # tf_text(vector) + tf_text(en) + 2*[lang='vector'] + 2*[lang='en'];
    # norms from text alone at weight 1 -> the existing quantized ql
    o["ft_combined_field"] = P + """
, st2 AS (SELECT (SELECT sttf FROM st) + 2 * (SELECT n FROM st) AS sttf2,
                 (SELECT n FROM st) AS n2)
, dfx AS (SELECT greatest(
            coalesce((SELECT df FROM tdict WHERE term = 'vector'), 0),
            coalesce((SELECT df FROM tdict WHERE term = 'en'), 0),
            (SELECT count(*) FROM documents WHERE lang = 'vector'),
            (SELECT count(*) FROM documents WHERE lang = 'en')) AS df)
, idf2 AS (SELECT ln(1 + ((SELECT n2 FROM st2) - df + 0.5) / (df + 0.5))
           AS idf FROM dfx)
, fr AS (SELECT d.doc_id,
           coalesce(tv.tf, 0) + coalesce(te.tf, 0)
           + (CASE WHEN d.lang = 'vector' THEN 2 ELSE 0 END)
           + (CASE WHEN d.lang = 'en' THEN 2 ELSE 0 END) AS freq
         FROM documents d
         LEFT JOIN tf tv ON tv.doc_id = d.doc_id AND tv.term = 'vector'
         LEFT JOIN tf te ON te.doc_id = d.doc_id AND te.term = 'en')
, m AS (SELECT f.doc_id,
          (SELECT idf FROM idf2) * f.freq
          / (f.freq + 1.2 * (0.25 + 0.75 * q.ql
             / ((SELECT sttf2 FROM st2) / (SELECT n2 FROM st2)))) AS s
        FROM fr f JOIN qdl q USING (doc_id) WHERE f.freq > 0)
SELECT doc_id, round(s, 3) AS score_r FROM m ORDER BY s DESC, doc_id LIMIT 10
"""

    # block join: child scores = OR-sum BM25 per doc; parent = doc//5;
    # ScoreMode.Max = max child score; ties by conv_id asc
    o["ft_block_join_topk"] = P + f"""
, m AS (SELECT f.doc_id, sum({_score('f.tf')}) AS s
        FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
        WHERE f.term IN ('scan', 'merge')
        GROUP BY f.doc_id)
, par AS (SELECT 'c' || lpad((doc_id // 5)::VARCHAR, 9, '0') AS conv_id,
          max(s) AS sc, count(*)::INT AS n_children
          FROM m GROUP BY doc_id // 5)
, jm AS (SELECT f.doc_id, {_score('f.tf')} AS s
         FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
         WHERE f.term = 'vector')
, jv AS (SELECT d.lang AS v, max(jm.s) AS sc
         FROM jm JOIN documents d USING (doc_id) GROUP BY d.lang)
, tj AS (SELECT d.doc_id, jv.sc FROM documents d JOIN jv ON d.lang = jv.v)
SELECT 'block' AS op, conv_id AS key, n_children, round(sc, 3) AS score_r
FROM (SELECT * FROM par ORDER BY sc DESC, conv_id LIMIT 10)
UNION ALL
SELECT 'term_join', doc_id::VARCHAR, -1, round(sc, 3)
FROM (SELECT * FROM tj ORDER BY sc DESC, doc_id LIMIT 10)
UNION ALL
SELECT 'to_child', doc_id::VARCHAR, -1, round(sc, 3)
FROM (SELECT d.doc_id, p.sc FROM documents d
      JOIN (SELECT doc_id // 5 AS cid, max(s) AS sc
            FROM m GROUP BY doc_id // 5) p ON d.doc_id // 5 = p.cid
      ORDER BY p.sc DESC, d.doc_id LIMIT 10)
"""

    # TermAutomatonQuery: freq = path-occurrence sum over the three
    # enumerated paths (exact positional joins; the ANY slot is an
    # unconstrained gap), idf summed over the four involved terms
    o["ft_term_automaton"] = P + f"""
, p1 AS (SELECT a.doc_id, count(*) AS c FROM pos a
         JOIN pos b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
         JOIN pos c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
         WHERE a.term = 'slow' AND b.term = 'merge' AND c.term = 'join'
         GROUP BY a.doc_id)
, p2 AS (SELECT a.doc_id, count(*) AS c FROM pos a
         JOIN pos b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
         WHERE a.term = 'slow' AND b.term = 'join' GROUP BY a.doc_id)
, p3 AS (SELECT a.doc_id, count(*) AS c FROM pos a
         JOIN pos b ON b.doc_id = a.doc_id AND b.pos = a.pos + 2
         WHERE a.term = 'slow' AND b.term = 'fast' GROUP BY a.doc_id)
, fr AS (SELECT doc_id, sum(c) AS freq FROM
         (SELECT * FROM p1 UNION ALL SELECT * FROM p2
          UNION ALL SELECT * FROM p3) GROUP BY doc_id)
, w AS (SELECT sum(idf) AS widf FROM idf
        WHERE term IN ('slow', 'merge', 'join', 'fast'))
, m AS (SELECT f.doc_id,
        {_score('f.freq', idf='(SELECT widf FROM w)')} AS s
        FROM fr f JOIN qdl q USING (doc_id))
SELECT doc_id, round(s, 3) AS score_r FROM m ORDER BY s DESC, doc_id LIMIT 10
"""

    # WordBreakSpellChecker: bisects of the literal compound with both
    # halves in the dictionary; combinations from the enumerated runs
    o["ft_word_break"] = P + """
, sp AS (SELECT i, substr('vectorbatch', 1, i) AS l,
                substr('vectorbatch', i + 1) AS r
         FROM range(1, 11) t(i))
, br AS (SELECT s.l || ' ' || s.r AS suggestion, 1 AS n_changes,
                greatest(dl.df, dr.df)::BIGINT AS freq
         FROM sp s JOIN tdict dl ON dl.term = s.l
                   JOIN tdict dr ON dr.term = s.r)
SELECT 'break' AS op, suggestion, n_changes, freq
FROM (SELECT * FROM br ORDER BY n_changes, freq DESC, suggestion LIMIT 5)
UNION ALL
SELECT 'combine', suggestion, n_changes, freq FROM (
  SELECT c.s AS suggestion, c.ch AS n_changes, d.df::BIGINT AS freq
  FROM (VALUES ('vector', 1), ('torbatch', 1), ('vectorbatch', 2))
       c(s, ch)
  JOIN tdict d ON d.term = c.s
  ORDER BY n_changes, freq DESC, suggestion LIMIT 5)
"""

    # CoveringQuery: count + score-sum per doc over the three terms,
    # kept where the count reaches the per-doc minimum 1 + doc_id % 3
    o["ft_covering"] = P + f"""
, m AS (SELECT f.doc_id, count(*) AS nm, sum({_score('f.tf')}) AS s
        FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
        WHERE f.term IN ('scan', 'merge', 'sort')
        GROUP BY f.doc_id)
SELECT doc_id, nm::INT AS n_matches, round(s, 3) AS score_r
FROM m WHERE nm >= greatest(1 + doc_id % 3, 1)
ORDER BY s DESC, doc_id LIMIT 15
"""

    o["pc_percolate"] = P + _phrase_cte("slow", "fast") + """
SELECT 'q0' AS query_id, doc_id FROM tf WHERE term = 'dup'
UNION ALL
SELECT 'q1', doc_id FROM tf WHERE term IN ('slow', 'fast')
GROUP BY doc_id HAVING count(*) = 2
UNION ALL
SELECT 'q2', doc_id FROM (SELECT DISTINCT doc_id FROM tf
                          WHERE term IN ('vector', 'stream'))
UNION ALL
SELECT 'q3', doc_id FROM tf WHERE term IN ('scan', 'sort', 'merge')
GROUP BY doc_id HAVING count(*) = 3
UNION ALL
SELECT 'q4', doc_id FROM (SELECT DISTINCT doc_id FROM ph)
UNION ALL
SELECT 'q5', f.doc_id FROM tf f
WHERE f.term = 'slow'
  AND EXISTS (SELECT 1 FROM tf x WHERE x.doc_id = f.doc_id
              AND x.term IN ('vector', 'stream'))
  AND NOT EXISTS (SELECT 1 FROM tf x WHERE x.doc_id = f.doc_id
                  AND x.term = 'dup')
UNION ALL
SELECT 'q6', doc_id FROM (SELECT DISTINCT doc_id FROM tf
                          WHERE term LIKE 'qu%')
UNION ALL
SELECT 'q7', p.doc_id FROM (SELECT DISTINCT doc_id FROM ph) p
WHERE EXISTS (SELECT 1 FROM tf x WHERE x.doc_id = p.doc_id
              AND x.term = 'batch')
"""

    o["ev_window_agg"] = """
SELECT strftime(time_bucket(INTERVAL '5 minutes', ts), '%Y-%m-%d %H:%M:%S') AS w_start,
       event_type, count(*)::BIGINT AS n, round(sum(value), 2) AS sum_v
FROM events GROUP BY 1, 2
"""

    o["ev_sessionize"] = """
WITH g AS (
  SELECT user_id,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
              OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id)) > 1800
              THEN 1 ELSE 0 END AS new_s
  FROM events)
SELECT user_id, sum(new_s)::BIGINT AS n_sessions, count(*)::BIGINT AS n_events
FROM g GROUP BY user_id
"""

    o["dedup_exact"] = P + """
SELECT md5(array_to_string(toks, ' ')) AS text_hash,
       count(*)::BIGINT AS n_docs, min(doc_id) AS min_doc_id
FROM tok GROUP BY 1 HAVING count(*) > 1
"""

    # line dedup: same injection, keep-first by (doc_id, line_no) per
    # normalized line hash, blank lines pass through
    o["dedup_lines"] = """
WITH inj AS (
  SELECT doc_id,
         text || chr(10) || 'please visit our website today' ||
         chr(10) || 'section ' || (doc_id % 7)::VARCHAR AS text
  FROM documents),
l AS (SELECT doc_id, generate_subscripts(parts, 1) AS ln,
             unnest(parts) AS line
      FROM (SELECT doc_id, str_split(text, chr(10)) AS parts FROM inj)),
k AS (SELECT doc_id, ln, line,
             row_number() OVER (PARTITION BY md5(trim(lower(line)))
                                ORDER BY doc_id, ln) AS rk,
             trim(line) = '' AS blank
      FROM l),
kept AS (SELECT doc_id, ln, line FROM k WHERE blank OR rk = 1),
agg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY ln) AS t
        FROM kept GROUP BY doc_id)
SELECT d.doc_id, length(coalesce(a.t, ''))::INT AS n_chars,
       md5(coalesce(a.t, '')) AS fp
FROM (SELECT DISTINCT doc_id FROM documents) d
LEFT JOIN agg a USING (doc_id)
"""

    # substring dedup: same injection, same 5-token windows, same
    # gap>window span merge — window functions mirror the Spark path
    o["dedup_substring"] = f"""
WITH tok AS (
  SELECT doc_id,
         regexp_extract_all(lower(CASE WHEN doc_id % 10 = 0
             THEN text || ' {_BOILERPLATE}' ELSE text END),
             '[0-9a-z]+') AS toks
  FROM documents
),
win AS (
  SELECT doc_id, i AS pos, md5(array_to_string(toks[i:i+4], ' ')) AS wh
  FROM tok, unnest(range(1, len(toks) - 3)) r(i)
  WHERE len(toks) >= 5
),
dup AS (
  SELECT doc_id, pos FROM win
  WHERE wh IN (SELECT wh FROM win GROUP BY wh HAVING count(*) >= 2)
),
mk AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER w IS NULL OR pos - lag(pos) OVER w > 5
              THEN 1 ELSE 0 END AS nw
  FROM dup WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
sp AS (
  SELECT doc_id, pos,
         sum(nw) OVER (PARTITION BY doc_id ORDER BY pos) AS sid
  FROM mk
)
SELECT doc_id, min(pos)::INT AS start_tok, (max(pos) + 4)::INT AS end_tok,
       count(*)::BIGINT AS n_windows
FROM sp GROUP BY doc_id, sid
"""

    o["dedup_minhash_pairs"] = P + _SHINGLE_CTES + f"""
, shh AS (SELECT doc_id,
          ('0x' || substr(md5(g), 1, 15))::BIGINT % {D.MINHASH_P} AS h
          FROM sh, unnest(shs) u(g))
, sig AS (SELECT doc_id, s, min((h * (s + 2) + s) % {D.MINHASH_P}) AS mh
          FROM shh, unnest(range(0, 8)) rs(s)
          GROUP BY doc_id, s)
, bandkey AS (SELECT doc_id, s // 2 AS band,
              string_agg(mh::VARCHAR, ',' ORDER BY s) AS key
              FROM sig GROUP BY doc_id, s // 2)
SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
FROM bandkey x JOIN bandkey y
  ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
"""

    o["dedup_jaccard"] = P + _SHINGLE_CTES + f"""
, ex AS (SELECT doc_id, unnest(shs) AS g FROM sh)
, cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
           FROM ex x JOIN ex y ON x.g = y.g AND x.doc_id < y.doc_id)
, jac AS (SELECT c.a, c.b,
          len(list_intersect(sa.shs, sb.shs))::DOUBLE
            / len(list_distinct(sa.shs || sb.shs)) AS j
          FROM cand c JOIN sh sa ON sa.doc_id = c.a
                      JOIN sh sb ON sb.doc_id = c.b)
, shh AS (SELECT doc_id,
          ('0x' || substr(md5(g), 1, 15))::BIGINT % {D.MINHASH_P} AS h
          FROM sh, unnest(shs) u(g))
, sig AS (SELECT doc_id, s, min((h * (s + 2) + s) % {D.MINHASH_P}) AS mh
          FROM shh, unnest(range(0, 8)) rs(s)
          GROUP BY doc_id, s)
, bandkey AS (SELECT doc_id, s // 2 AS band,
              string_agg(mh::VARCHAR, ',' ORDER BY s) AS key
              FROM sig GROUP BY doc_id, s // 2)
, lcand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
            FROM bandkey x JOIN bandkey y
              ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id)
, ljac AS (SELECT c.a, c.b,
           len(list_intersect(sa.shs, sb.shs))::DOUBLE
             / len(list_distinct(sa.shs || sb.shs)) AS j
           FROM lcand c JOIN sh sa ON sa.doc_id = c.a
                        JOIN sh sb ON sb.doc_id = c.b)
SELECT 'exact' AS path, a, b, round(j, 4) AS jaccard_r FROM jac WHERE j >= 0.8
UNION ALL
SELECT 'lsh', a, b, round(j, 4) FROM ljac WHERE j >= 0.5
"""

    o["dedup_clusters"] = (
        P.replace("WITH tok", "WITH RECURSIVE tok", 1)
        + _SHINGLE_CTES + """
, ex AS (SELECT doc_id, unnest(shs) AS g FROM sh)
, cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
           FROM ex x JOIN ex y ON x.g = y.g AND x.doc_id < y.doc_id)
, jp AS (SELECT c.a, c.b
         FROM cand c JOIN sh sa ON sa.doc_id = c.a
                     JOIN sh sb ON sb.doc_id = c.b
         WHERE len(list_intersect(sa.shs, sb.shs))::DOUBLE
               / len(list_distinct(sa.shs || sb.shs)) >= 0.8)
, edges AS (SELECT a AS u, b AS v FROM jp UNION SELECT b, a FROM jp)
, reach(n, r) AS (
    SELECT u, u FROM edges
    UNION
    SELECT re.n, ed.v FROM reach re JOIN edges ed ON ed.u = re.r)
SELECT n AS doc_id, min(r) AS cluster FROM reach GROUP BY n
""")

    o["dedup_simhash"] = P + """
, tfh AS (SELECT doc_id, count(*)::BIGINT AS tf,
          ('0x' || substr(md5(term), 1, 15))::BIGINT AS h
          FROM pos GROUP BY doc_id, term)
, bits AS (SELECT doc_id, j, sum(tf * (((h >> j) & 1) * 2 - 1)) AS sgn
           FROM tfh, unnest(range(0, 32)) rj(j) GROUP BY doc_id, j)
SELECT doc_id, sum(CASE WHEN sgn > 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS simhash
FROM bits GROUP BY doc_id
"""

    o["dedup_cosine_pairs"] = """
WITH c AS (
  SELECT x.vec_id AS a, y.vec_id AS b,
    list_sum(list_transform(range(1, 65), i -> x.embedding[i]::DOUBLE * y.embedding[i]::DOUBLE))
    / (sqrt(list_sum(list_transform(range(1, 65), i -> x.embedding[i]::DOUBLE * x.embedding[i]::DOUBLE)))
       * sqrt(list_sum(list_transform(range(1, 65), i -> y.embedding[i]::DOUBLE * y.embedding[i]::DOUBLE)))) AS cos
  FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id)
SELECT a, b, round(cos, 4) AS cos_r FROM c WHERE cos >= 0.4
"""

    # both ops gate against the exact brute top-5: the quantized path
    # (int8 codes + top-20 candidates + exact re-rank) must RECOVER it
    o["ann_cosine_topk"] = """
WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
c AS (SELECT q.q_id, e.vec_id,
      list_sum(list_transform(range(1, 65), i -> qv[i]::DOUBLE * e.embedding[i]::DOUBLE))
      / (sqrt(list_sum(list_transform(range(1, 65), i -> qv[i]::DOUBLE * qv[i]::DOUBLE)))
         * sqrt(list_sum(list_transform(range(1, 65), i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)))) AS cos
      FROM embeddings e, q WHERE e.vec_id != q.q_id),
top5 AS (SELECT q_id, vec_id, round(cos, 4) AS cos_r
         FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rk FROM c)
         WHERE rk <= 5)
SELECT 'exact' AS op, q_id, vec_id, cos_r FROM top5
UNION ALL
SELECT 'quant', q_id, vec_id, cos_r FROM top5
UNION ALL
SELECT 'binary', q_id, vec_id, cos_r FROM top5
UNION ALL
SELECT 'pq', q_id, vec_id, cos_r FROM top5
"""

    o["ann_lsh_recall"] = """
WITH planes AS (
  SELECT p, i,
         (('0x' || substr(md5(p::VARCHAR || ':' || i::VARCHAR), 1, 12))::BIGINT::DOUBLE
          / 140737488355328.0 - 1.0) AS c
  FROM range(0, 16) rp(p), range(0, 64) ri(i)),
dots AS (SELECT e.vec_id, pl.p,
                sum(e.embedding[pl.i + 1]::DOUBLE * pl.c) AS d
         FROM embeddings e, planes pl GROUP BY e.vec_id, pl.p),
bits AS (SELECT vec_id,
                sum(CASE WHEN d > 0 THEN (1::BIGINT << p) ELSE 0 END) AS sk
         FROM dots GROUP BY vec_id),
bands AS (SELECT vec_id, b, (sk >> (b * 2)) % 4 AS key
          FROM bits, range(0, 8) rb(b)),
cand AS (SELECT DISTINCT qb.vec_id AS q_id, vb.vec_id
         FROM bands qb JOIN bands vb ON qb.b = vb.b AND qb.key = vb.key
         WHERE qb.vec_id < 5 AND vb.vec_id != qb.vec_id),
cosx AS (SELECT c.q_id, c.vec_id,
         list_sum(list_transform(range(1, 65),
                  i -> x.embedding[i]::DOUBLE * y.embedding[i]::DOUBLE))
         / (sqrt(list_sum(list_transform(range(1, 65),
                   i -> x.embedding[i]::DOUBLE * x.embedding[i]::DOUBLE)))
            * sqrt(list_sum(list_transform(range(1, 65),
                   i -> y.embedding[i]::DOUBLE * y.embedding[i]::DOUBLE)))) AS cos
         FROM cand c JOIN embeddings x ON x.vec_id = c.q_id
                     JOIN embeddings y ON y.vec_id = c.vec_id),
lshtop AS (SELECT q_id, vec_id FROM (
             SELECT *, row_number() OVER (PARTITION BY q_id
                      ORDER BY cos DESC, vec_id) AS rk FROM cosx)
           WHERE rk <= 5),
bcos AS (SELECT q.vec_id AS q_id, e.vec_id,
         list_sum(list_transform(range(1, 65),
                  i -> q.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))
         / (sqrt(list_sum(list_transform(range(1, 65),
                   i -> q.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE)))
            * sqrt(list_sum(list_transform(range(1, 65),
                   i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)))) AS cos
         FROM embeddings q, embeddings e
         WHERE q.vec_id < 5 AND e.vec_id != q.vec_id),
brutetop AS (SELECT q_id, vec_id FROM (
               SELECT *, row_number() OVER (PARTITION BY q_id
                        ORDER BY cos DESC, vec_id) AS rk FROM bcos)
             WHERE rk <= 5),
inter AS (SELECT l.q_id, count(*) AS ni
          FROM lshtop l JOIN brutetop b USING (q_id, vec_id)
          GROUP BY l.q_id)
SELECT b.q_id, round(coalesce(i.ni, 0)::DOUBLE / count(*), 4) AS recall_r
FROM brutetop b LEFT JOIN inter i ON i.q_id = b.q_id
GROUP BY b.q_id, i.ni
"""

    # filtered ANN: 'selective' replays the exact-fallback brute force
    # over the filtered corpus; 'broad' replays the full filtered-LSH
    # pipeline (md5 hyperplanes, 16 planes / 8 bands, band join against
    # the FILTERED corpus, exact re-rank) and emits recall@5 vs the
    # exact filtered top-5 — candidate membership itself is therefore
    # value-gated, not just the recall number
    o["ann_filtered"] = """
WITH planes AS (
  SELECT p, i,
         (('0x' || substr(md5(p::VARCHAR || ':' || i::VARCHAR), 1, 12))::BIGINT::DOUBLE
          / 140737488355328.0 - 1.0) AS c
  FROM range(0, 16) rp(p), range(0, 64) ri(i)),
dots AS (SELECT e.vec_id, pl.p,
                sum(e.embedding[pl.i + 1]::DOUBLE * pl.c) AS d
         FROM embeddings e, planes pl GROUP BY e.vec_id, pl.p),
bits AS (SELECT vec_id,
                sum(CASE WHEN d > 0 THEN (1::BIGINT << p) ELSE 0 END) AS sk
         FROM dots GROUP BY vec_id),
bandv AS (SELECT b.vec_id, rb.b, (b.sk >> (rb.b * 2)) % 4 AS key
          FROM bits b JOIN embeddings e USING (vec_id),
               range(0, 8) rb(b)
          WHERE e.label % 2 = 0),
bandq AS (SELECT vec_id, rb.b, (sk >> (rb.b * 2)) % 4 AS key
          FROM bits, range(0, 8) rb(b) WHERE vec_id < 4),
cand AS (SELECT DISTINCT q.vec_id AS q_id, v.vec_id
         FROM bandq q JOIN bandv v ON q.b = v.b AND q.key = v.key
         WHERE v.vec_id != q.vec_id),
cosx AS (SELECT c.q_id, c.vec_id,
         list_sum(list_transform(range(1, 65),
                  i -> x.embedding[i]::DOUBLE * y.embedding[i]::DOUBLE))
         / (sqrt(list_sum(list_transform(range(1, 65),
                   i -> x.embedding[i]::DOUBLE * x.embedding[i]::DOUBLE)))
            * sqrt(list_sum(list_transform(range(1, 65),
                   i -> y.embedding[i]::DOUBLE * y.embedding[i]::DOUBLE)))) AS cos
         FROM cand c JOIN embeddings x ON x.vec_id = c.q_id
                     JOIN embeddings y ON y.vec_id = c.vec_id),
lshtop AS (SELECT q_id, vec_id FROM (
             SELECT *, row_number() OVER (PARTITION BY q_id
                      ORDER BY cos DESC, vec_id) AS rk FROM cosx)
           WHERE rk <= 5),
bcos AS (SELECT q.vec_id AS q_id, e.vec_id,
         list_sum(list_transform(range(1, 65),
                  i -> q.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))
         / (sqrt(list_sum(list_transform(range(1, 65),
                   i -> q.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE)))
            * sqrt(list_sum(list_transform(range(1, 65),
                   i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)))) AS cos
         FROM embeddings q, embeddings e
         WHERE q.vec_id < 4 AND e.label % 2 = 0 AND e.vec_id != q.vec_id),
brutetop AS (SELECT q_id, vec_id FROM (
               SELECT *, row_number() OVER (PARTITION BY q_id
                        ORDER BY cos DESC, vec_id) AS rk FROM bcos)
             WHERE rk <= 5),
inter AS (SELECT l.q_id, count(*) AS ni
          FROM lshtop l JOIN brutetop b USING (q_id, vec_id)
          GROUP BY l.q_id),
scos AS (SELECT q.vec_id AS q_id, e.vec_id,
         list_sum(list_transform(range(1, 65),
                  i -> q.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))
         / (sqrt(list_sum(list_transform(range(1, 65),
                   i -> q.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE)))
            * sqrt(list_sum(list_transform(range(1, 65),
                   i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)))) AS cos
         FROM embeddings q, embeddings e
         WHERE q.vec_id < 4 AND e.label = 5 AND e.vec_id < 250
           AND e.vec_id != q.vec_id),
seltop AS (SELECT q_id, vec_id, cos FROM (
             SELECT *, row_number() OVER (PARTITION BY q_id
                      ORDER BY cos DESC, vec_id) AS rk FROM scos)
           WHERE rk <= 5)
SELECT 'selective' AS op, q_id, vec_id, round(cos, 4) AS v FROM seltop
UNION ALL
SELECT 'broad', b.q_id, -1::BIGINT,
       round(coalesce(i.ni, 0)::DOUBLE / count(*), 4)
FROM brutetop b LEFT JOIN inter i ON i.q_id = b.q_id
GROUP BY b.q_id, i.ni
"""

    stop = "['the', 'a', 'of', 'and', 'to', 'in', 'is', 'it']"
    o["text_analysis"] = P + rf"""
SELECT d.doc_id, len(t.toks)::INT AS n_tokens,
       len(regexp_split_to_array(trim(d.text), '\s+'))::INT AS n_ws_tokens,
       length(d.text)::INT AS n_chars,
       length(regexp_replace(d.text, '[^A-Za-z]', '', 'g'))::INT AS n_alpha,
       length(regexp_replace(d.text, '[^0-9]', '', 'g'))::INT AS n_digit,
       round(length(regexp_replace(d.text, '[^A-Za-z]', '', 'g'))::DOUBLE
             / greatest(length(d.text), 1), 4) AS alpha_ratio,
       round(len(list_filter(t.toks, x -> list_contains({stop}, x)))::DOUBLE
             / greatest(len(t.toks), 1), 4) AS stopword_ratio,
       round(list_sum(list_transform(t.toks, x -> length(x)))::DOUBLE
             / greatest(len(t.toks), 1), 4) AS mean_token_len,
       {_lang_pred_sql()} AS lang_pred,
       md5(array_to_string(t.toks, ' ')) AS fp
FROM documents d JOIN tok t USING (doc_id)
"""

    # repetition signals: grams rebuilt in SQL from the same token
    # stream; mass-of-heaviest-2gram and duplicated-5gram-mass over
    # total gram mass, word-dup frac from distinct counts
    o["text_repetition"] = P + """
, base AS (SELECT doc_id, len(toks) AS n_tokens,
           round(1.0 - len(list_distinct(toks))::DOUBLE
                 / greatest(len(toks), 1), 4) AS dtf FROM tok)
, g2 AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
         i -> array_to_string(toks[i:i+1], ' '))) AS g FROM tok)
, c2 AS (SELECT doc_id, g, count(*)::DOUBLE AS c FROM g2 GROUP BY 1, 2)
, f2 AS (SELECT doc_id, round(max(c * length(g)) / sum(c * length(g)), 4)
         AS v FROM c2 GROUP BY doc_id)
, g5 AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) - 3),
         i -> array_to_string(toks[i:i+4], ' '))) AS g FROM tok
         WHERE len(toks) >= 5)
, c5 AS (SELECT doc_id, g, count(*)::DOUBLE AS c FROM g5 GROUP BY 1, 2)
, f5 AS (SELECT doc_id, round(sum(CASE WHEN c > 1 THEN c * length(g)
         ELSE 0 END) / sum(c * length(g)), 4) AS v FROM c5
         GROUP BY doc_id)
SELECT b.doc_id, b.n_tokens::INT AS n_tokens, b.dtf AS dup_token_frac,
       coalesce(f2.v, 0.0) AS top_2gram_frac,
       coalesce(f5.v, 0.0) AS dup_5gram_frac
FROM base b LEFT JOIN f2 USING (doc_id) LEFT JOIN f5 USING (doc_id)
"""

    o["dedup_decontaminate"] = P + """
, g AS (SELECT doc_id, unnest(list_distinct(list_transform(
        range(1, len(toks) - 1),
        i -> array_to_string(toks[i:i+2], ' ')))) AS g FROM tok)
, bench AS (SELECT DISTINCT g FROM g WHERE doc_id % 25 = 0)
, tot AS (SELECT doc_id, count(*)::INT AS n_grams FROM g
          WHERE doc_id % 25 <> 0 GROUP BY doc_id)
, hit AS (SELECT g.doc_id, count(*)::INT AS c FROM g
          JOIN bench USING (g) WHERE g.doc_id % 25 <> 0
          GROUP BY g.doc_id)
SELECT t.doc_id, t.n_grams, h.c AS n_contaminated,
       round(h.c::DOUBLE / greatest(t.n_grams, 1), 4)
       AS contamination_frac
FROM tot t JOIN hit h USING (doc_id)
"""

    # redaction: same RE2 patterns, same application order, counts on
    # the progressively redacted text (ops/redact.PII_PATTERNS)
    from lucene_spark.ops.redact import PII_PATTERNS as _PII
    _cur = ("CASE WHEN doc_id % 10 = 0 THEN text || ' contact user' || "
            "doc_id::VARCHAR || '@example.com at 10.0.0.' || "
            "(doc_id % 256)::VARCHAR || ' ssn 123-45-6789' "
            "ELSE text END")
    _sels = []
    for _kind, _pat, _token in _PII:
        _p = _pat.replace("'", "''")
        _sels.append(f"len(regexp_extract_all({_cur}, '{_p}'))::INT "
                     f"AS n_{_kind}")
        _cur = f"regexp_replace({_cur}, '{_p}', '{_token}', 'g')"
    o["text_redact"] = (
        f"SELECT doc_id, {', '.join(_sels)}, md5({_cur}) AS fp "
        f"FROM documents")

    # CCNet perplexity: trigram stupid backoff, trained on even docs.
    # The backoff constants are written as the repr of the SAME Python
    # doubles the Spark side multiplies, so both engines evaluate
    # bit-identical IEEE literals.
    _A = 0.4
    o["text_perplexity"] = f"""
WITH tok AS (SELECT doc_id,
             regexp_extract_all(lower(text), '[0-9a-z]+') AS toks
             FROM documents),
pos AS (
  SELECT doc_id, i - 1 AS pos, toks[i] AS w,
         CASE WHEN i >= 2 THEN toks[i-1] END AS ctx1,
         CASE WHEN i >= 3 THEN toks[i-2] || ' ' || toks[i-1] END AS ctx2
  FROM tok, unnest(range(1, len(toks) + 1)) r(i)
),
tpos AS (SELECT * FROM pos WHERE doc_id % 2 = 0),
uni AS (SELECT w, count(*)::DOUBLE AS c1 FROM tpos GROUP BY w),
bi  AS (SELECT ctx1, w, count(*)::DOUBLE AS c2 FROM tpos
        WHERE ctx1 IS NOT NULL GROUP BY ctx1, w),
tri AS (SELECT ctx2, w, count(*)::DOUBLE AS c3 FROM tpos
        WHERE ctx2 IS NOT NULL GROUP BY ctx2, w),
tot AS (SELECT count(*)::DOUBLE AS t FROM tpos),
sc AS (
  SELECT p.doc_id, p.pos, u.c1, b.c2, t.c3,
         lag(b.c2) OVER win AS c2ctx,
         lag(u.c1) OVER win AS c1ctx
  FROM pos p
  LEFT JOIN uni u ON u.w = p.w
  LEFT JOIN bi b ON b.ctx1 = p.ctx1 AND b.w = p.w
  LEFT JOIN tri t ON t.ctx2 = p.ctx2 AND t.w = p.w
  WINDOW win AS (PARTITION BY p.doc_id ORDER BY p.pos)
),
lp AS (
  SELECT doc_id, ln(CASE
    WHEN pos >= 2 AND c3 IS NOT NULL THEN c3 / c2ctx
    WHEN pos >= 2 AND c2 IS NOT NULL THEN {_A!r} * (c2 / c1ctx)
    WHEN pos >= 2 THEN {_A * _A!r} *
         (CASE WHEN c1 IS NOT NULL THEN c1 / (SELECT t FROM tot)
               ELSE 1.0 / (SELECT t FROM tot) END)
    WHEN pos = 1 AND c2 IS NOT NULL THEN c2 / c1ctx
    WHEN pos = 1 THEN {_A!r} *
         (CASE WHEN c1 IS NOT NULL THEN c1 / (SELECT t FROM tot)
               ELSE 1.0 / (SELECT t FROM tot) END)
    ELSE (CASE WHEN c1 IS NOT NULL THEN c1 / (SELECT t FROM tot)
               ELSE 1.0 / (SELECT t FROM tot) END)
  END) AS l
  FROM sc
),
agg AS (SELECT doc_id, count(*)::INT AS n_toks, exp(-avg(l)) AS ppl
        FROM lp GROUP BY doc_id),
alldocs AS (SELECT DISTINCT doc_id FROM documents),
f AS (SELECT d.doc_id, coalesce(a.n_toks, 0) AS n_toks,
             round(a.ppl, 3) AS ppl_r
      FROM alldocs d LEFT JOIN agg a USING (doc_id))
SELECT doc_id, n_toks, ppl_r,
       ntile(3) OVER (ORDER BY ppl_r ASC NULLS LAST, doc_id ASC) AS bucket
FROM f
"""

    o["text_bpe_budget"] = r"""
WITH p AS (SELECT doc_id, text, regexp_extract_all(text,
  '''s|''t|''re|''ve|''m|''ll|''d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+')
  AS ps FROM documents)
SELECT doc_id, len(ps)::INT AS n_pieces, length(text)::INT AS n_chars,
       round(length(text)::DOUBLE / greatest(len(ps), 1), 4)
       AS chars_per_piece
FROM p
"""

    # document chunking: identical windowing rule (interior starts at
    # stride while start + window < n, plus the end-aligned final
    # start) over the identical token model
    # UniMax waterfill as a linear recursion over strata ascending by
    # availability, carrying the remaining budget
    o["text_sample_unimax"] = """
WITH RECURSIVE
tok AS (SELECT len(regexp_extract_all(lower(text), '[0-9a-z]+'))::DOUBLE
               AS w, lang
        FROM documents),
cnt AS (SELECT lang AS stratum, sum(w) AS available
        FROM tok GROUP BY lang),
ord AS (SELECT stratum, available,
               row_number() OVER (ORDER BY available, stratum) AS rn,
               count(*) OVER () AS k
        FROM cnt),
wf AS (
  SELECT 0::BIGINT AS rn, 15000.0::DOUBLE AS remaining,
         CAST(NULL AS VARCHAR) AS stratum, 0.0::DOUBLE AS available,
         0.0::DOUBLE AS allocated
  UNION ALL
  SELECT o.rn,
         w.remaining - least(2.0 * o.available,
                             w.remaining / (o.k - o.rn + 1)),
         o.stratum, o.available,
         least(2.0 * o.available, w.remaining / (o.k - o.rn + 1))
  FROM wf w JOIN ord o ON o.rn = w.rn + 1
)
SELECT stratum, available, round(allocated, 4) AS alloc_r,
       round(allocated / available, 6) AS epochs_r,
       round(least(1.0, allocated / available), 6) AS rate_r
FROM wf WHERE rn > 0
"""

    # temperature sampling: 'a05' is the closed-form share; 'a02c'
    # replays the one-pass capped walk (ascending by cap/q =
    # 2*available^0.8, ties stratum) as a recursive CTE, mirroring
    # temperature_allocation's redistribution exactly
    o["text_sample_temperature"] = """
WITH RECURSIVE
tok AS (SELECT len(regexp_extract_all(lower(text), '[0-9a-z]+'))::DOUBLE
               AS w, lang
        FROM documents),
cnt AS (SELECT lang AS stratum, sum(w) AS available
        FROM tok GROUP BY lang),
q5 AS (SELECT stratum, available, pow(available, 0.5) AS qq FROM cnt),
t5 AS (SELECT sum(qq) AS tq FROM q5),
a05 AS (SELECT stratum, available,
               15000.0 * qq / (SELECT tq FROM t5) AS allocated
        FROM q5),
ord AS (SELECT stratum, available, pow(available, 0.2) AS qq,
               row_number() OVER (ORDER BY 2.0 * pow(available, 0.8),
                                  stratum) AS rn
        FROM cnt),
wf AS (
  SELECT 0::BIGINT AS rn, 15000.0::DOUBLE AS remaining,
         (SELECT sum(qq) FROM ord) AS qleft,
         CAST(NULL AS VARCHAR) AS stratum, 0.0::DOUBLE AS available,
         0.0::DOUBLE AS allocated
  UNION ALL
  SELECT o.rn,
         w.remaining - least(2.0 * o.available,
                             o.qq * w.remaining / w.qleft),
         w.qleft - o.qq, o.stratum, o.available,
         least(2.0 * o.available, o.qq * w.remaining / w.qleft)
  FROM wf w JOIN ord o ON o.rn = w.rn + 1
)
SELECT op, stratum, available, alloc_r, epochs_r, rate_r FROM (
  SELECT 'a05' AS op, stratum, available,
         round(allocated, 4) AS alloc_r,
         round(allocated / available, 6) AS epochs_r,
         round(least(1.0, allocated / available), 6) AS rate_r
  FROM a05
  UNION ALL
  SELECT 'a02c', stratum, available, round(allocated, 4),
         round(allocated / available, 6),
         round(least(1.0, allocated / available), 6)
  FROM wf WHERE rn > 0
) ORDER BY op, stratum
"""

    # C4 cleaning: same deterministic synthesis, line filter via
    # list_filter lambda, page verdicts, md5 of the re-joined lines
    o["text_c4_filter"] = r"""
WITH synth AS (SELECT doc_id,
    replace(text, ' the ', '.' || chr(10))
    || CASE WHEN doc_id % 7 = 0 THEN '.' ELSE '' END
    || CASE WHEN doc_id % 53 = 0
            THEN chr(10) || 'this javascript line ends badly.'
            ELSE '' END
    || CASE WHEN doc_id % 31 = 0
            THEN chr(10) || 'lorem ipsum dolor.' ELSE '' END
    || CASE WHEN doc_id % 43 = 0
            THEN chr(10) || 'var x = { a };' ELSE '' END AS text
  FROM documents),
l AS (SELECT doc_id, text, string_split(text, chr(10)) AS lines
      FROM synth),
k AS (SELECT doc_id, text, lines,
        list_filter(lines,
          x -> regexp_matches(x, '[.!?]["'']?\s*$')
               AND len(regexp_split_to_array(trim(x), '\s+')) >= 3
               AND NOT contains(lower(x), 'javascript')) AS kept
      FROM l)
SELECT doc_id, len(lines) AS n_lines, len(kept) AS n_kept,
       contains(lower(text), 'lorem ipsum') AS has_lorem,
       contains(text, '{') AS has_brace,
       (len(kept) >= 2 AND NOT contains(lower(text), 'lorem ipsum')
        AND NOT contains(text, '{')) AS keep,
       md5(coalesce(array_to_string(kept, chr(10)), '')) AS clean_md5
FROM k
"""

    # sequence packing: shard cumsum offsets -> sample span explode ->
    # closed-form slice arithmetic (budget 200, 4 shards)
    o["text_pack"] = """
WITH t AS (SELECT doc_id,
                  len(regexp_extract_all(lower(text), '[0-9a-z]+')) AS n
           FROM documents),
d AS (SELECT doc_id, doc_id % 4 AS shard, n FROM t WHERE n > 0),
c AS (SELECT *, sum(n) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING)::BIGINT AS e
      FROM d),
s AS (SELECT *, e - n AS st FROM c),
x AS (SELECT shard, doc_id, st, e,
             unnest(generate_series(st // 200, (e - 1) // 200))
               AS sample_id
      FROM s)
SELECT shard, sample_id, doc_id,
       greatest(sample_id * 200, st) - st AS doc_tok_start,
       least((sample_id + 1) * 200, e) - st AS doc_tok_end,
       greatest(sample_id * 200, st) - sample_id * 200 AS sample_off,
       least((sample_id + 1) * 200, e)
         - greatest(sample_id * 200, st) AS n_toks
FROM x
"""

    o["text_chunks"] = """
WITH t AS (SELECT doc_id,
                  regexp_extract_all(lower(text), '[0-9a-z]+') AS toks
           FROM documents),
s AS (SELECT doc_id, toks, len(toks) AS n FROM t),
st AS (SELECT doc_id, toks, n,
       CASE WHEN n = 0 THEN [] WHEN n <= 40 THEN [0]
            ELSE list_append(range(0, n - 40, 30), n - 40) END AS starts
       FROM s)
SELECT doc_id, (list_position(starts, u.st) - 1)::INT AS chunk_idx,
       u.st::INT AS start_tok,
       least(40, n - u.st)::INT AS n_chunk_tokens,
       array_to_string(toks[u.st + 1 : u.st + least(40, n - u.st)], ' ')
       AS chunk_text
FROM st, unnest(st.starts) AS u(st)
"""

    _G_RULES = r"""
  len(toks) BETWEEN 30 AND 100000 AS ok_len,
  (list_sum(list_transform(toks, x -> length(x)))::DOUBLE
   / greatest(len(toks), 1)) BETWEEN 3.0 AND 10.0 AS ok_mean_len,
  (((length(text) - length(replace(text, '#', '')))
    + (length(text) - length(replace(text, '...', ''))) / 3.0)
   / greatest(len(toks), 1)) <= 0.1 AS ok_symbols,
  (len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                   w -> regexp_matches(w, '[A-Za-z]')))::DOUBLE
   / greatest(len(regexp_split_to_array(trim(text), '\s+')), 1)) >= 0.8
  AS ok_alpha,
  len(list_filter(toks, x -> x IN ('the','be','to','of','and','that',
                                   'have','with'))) >= 2 AS ok_stopwords
"""
    o["text_gopher_filter"] = P + rf"""
, g2 AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
         i -> array_to_string(toks[i:i+1], ' '))) AS g FROM tok)
, c2 AS (SELECT doc_id, g, count(*)::DOUBLE AS c FROM g2 GROUP BY 1, 2)
, f2 AS (SELECT doc_id, round(max(c * length(g)) / sum(c * length(g)), 4)
         AS v FROM c2 GROUP BY doc_id)
, g5 AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) - 3),
         i -> array_to_string(toks[i:i+4], ' '))) AS g FROM tok
         WHERE len(toks) >= 5)
, c5 AS (SELECT doc_id, g, count(*)::DOUBLE AS c FROM g5 GROUP BY 1, 2)
, f5 AS (SELECT doc_id, round(sum(CASE WHEN c > 1 THEN c * length(g)
         ELSE 0 END) / sum(c * length(g)), 4) AS v FROM c5
         GROUP BY doc_id)
, rep AS (SELECT t.doc_id, coalesce(f2.v, 0) AS t2, coalesce(f5.v, 0)
          AS d5 FROM tok t LEFT JOIN f2 USING (doc_id)
          LEFT JOIN f5 USING (doc_id))
, sig AS (SELECT t.doc_id, len(toks)::INT AS n_tokens, {_G_RULES},
          rep.t2 <= 0.20 AS ok_top2, rep.d5 <= 0.15 AS ok_dup5
          FROM tok t JOIN documents d USING (doc_id)
          JOIN rep USING (doc_id))
SELECT doc_id, n_tokens, ok_len, ok_mean_len, ok_symbols, ok_alpha,
       ok_stopwords, ok_top2, ok_dup5,
       (ok_len AND ok_mean_len AND ok_symbols AND ok_alpha
        AND ok_stopwords AND ok_top2 AND ok_dup5) AS keep
FROM sig
"""

    o["ft_facet_dynamic"] = P + """
, m AS (SELECT DISTINCT doc_id FROM tf WHERE term = 'batch')
, v AS (SELECT d.n_chars AS val FROM documents d JOIN m USING (doc_id)
        WHERE d.n_chars IS NOT NULL)
, pv AS (SELECT val, count(*)::BIGINT AS w FROM v GROUP BY val)
, tot AS (SELECT sum(w)::DOUBLE AS t FROM pv)
, b AS (SELECT val, w,
        least(floor(coalesce(sum(w) OVER (ORDER BY val
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              * 4 / (SELECT t FROM tot)), 3)::INT AS range_idx FROM pv)
SELECT range_idx, min(val) AS lo, max(val) AS hi,
       sum(w)::BIGINT AS n_docs
FROM b GROUP BY range_idx
"""

    o["text_sample_stratified"] = """
SELECT doc_id, lang FROM documents
WHERE substr(md5('7:' || doc_id::VARCHAR), 1, 8) <
  CASE lang WHEN 'en' THEN '80000000' WHEN 'de' THEN 'g'
            WHEN 'fr' THEN '40000000' WHEN 'zh' THEN '00000000'
            ELSE '19999999' END
"""

    o["mm_features"] = """
SELECT doc_id AS id, octet_length(text::BLOB)::INT AS n_bytes,
       sha256(text) AS sha
FROM documents
"""

    # dist is the engine's OSA via _osa_sql — duckdb's unrestricted
    # damerau_levenshtein would over-admit split-transposition terms at
    # maxEdits=2 (see _osa_sql docstring); the not-in-index gate mirrors
    # DirectSpellChecker's suggestMode default
    def _spell_sql(pat: str) -> str:
        L = len(pat)
        return f"""
SELECT '{pat}' AS op, term, df, dist, round(score, 3) AS score_r FROM (
  SELECT term, df, dist,
         1.0 - dist::DOUBLE / least({L}, length(term)) AS score
  FROM (
    SELECT term, df::BIGINT AS df, ({_osa_sql('term', pat)})::INT AS dist
    FROM tdict
    WHERE term <> '{pat}' AND term LIKE '{pat[0]}%'
      AND length(term) BETWEEN {L - 2} AND {L + 2}
      AND NOT EXISTS (SELECT 1 FROM tdict WHERE term = '{pat}'))
  WHERE dist <= 2
  ORDER BY score DESC, df DESC, term ASC LIMIT 5)"""

    o["ft_spell"] = (P + _spell_sql("vectr")
                     + "\nUNION ALL" + _spell_sql("sark"))

    o["ft_facet_assoc"] = P + """
, m AS (SELECT doc_id FROM tf WHERE term = 'batch')
, j AS (SELECT d.source, d.lang, d.n_chars
        FROM documents d JOIN m USING (doc_id))
SELECT 1::INT AS level, source AS path, count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS sum_assoc
FROM j GROUP BY source
UNION ALL
SELECT 2::INT, source || '/' || lang, count(*)::BIGINT,
       sum(n_chars)::BIGINT
FROM j GROUP BY source, lang
"""

    o["ft_geo_point"] = P + """
, g AS (SELECT doc_id,
               (doc_id * 7919 % 18001) / 100.0 - 90.0 AS lat,
               (doc_id * 104729 % 36001) / 100.0 - 180.0 AS lon
        FROM documents)
SELECT 'box' AS op, doc_id, lat, lon FROM g
WHERE lat BETWEEN 10.0 AND 60.0 AND (lon >= 170.0 OR lon <= -170.0)
UNION ALL
SELECT 'dist', doc_id, lat, lon FROM g
WHERE 2.0 * 6371008.7714 * asin(least(1.0, sqrt(
        pow(sin(radians(lat - 40.0) / 2), 2) +
        cos(radians(lat)) * cos(radians(40.0)) *
        pow(sin(radians(lon - (-74.0)) / 2), 2)))) <= 3000000.0
UNION ALL
SELECT 'poly', doc_id, lat, lon FROM g
WHERE ((-60.004 - (-120.008)) * (lat - (-30.007))
       - (20.003 - (-30.007)) * (lon - (-120.008))) > 0
  AND ((-90.006 - (-60.004)) * (lat - (20.003))
       - (70.001 - (20.003)) * (lon - (-60.004))) > 0
  AND ((-150.002 - (-90.006)) * (lat - (70.001))
       - (30.005 - (70.001)) * (lon - (-90.006))) > 0
  AND ((-120.008 - (-150.002)) * (lat - (30.005))
       - (-30.007 - (30.005)) * (lon - (-150.002))) > 0
"""

    o["ft_quality"] = P + f"""
, qs(qid, term) AS (VALUES ('t_vector', 'vector'), ('or_ssm', 'scan'),
    ('or_ssm', 'sort'), ('or_ssm', 'merge'), ('t_slow', 'slow'),
    ('t_zero', 'merge'))
, m AS (SELECT qs.qid, f.doc_id, sum({_score('f.tf')}) AS s
        FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
        JOIN qs ON qs.term = f.term
        GROUP BY qs.qid, f.doc_id)
, res AS (SELECT qid, doc_id, row_number() OVER
            (PARTITION BY qid ORDER BY s DESC, doc_id) AS rank
          FROM m QUALIFY rank <= 20)
, need(qid, term) AS (VALUES ('t_vector', 'vector'), ('t_vector', 'index'),
    ('or_ssm', 'scan'), ('or_ssm', 'sort'), ('t_slow', 'slow'),
    ('t_slow', 'fast'), ('t_zero', 'merge'), ('t_zero', 'zzqxunseen'))
, nn AS (SELECT qid, count(*) AS c FROM need GROUP BY qid)
, qrel AS (SELECT n.qid, f.doc_id
           FROM tf f JOIN need n ON f.term = n.term
           GROUP BY n.qid, f.doc_id
           HAVING count(DISTINCT f.term) =
                  (SELECT c FROM nn WHERE nn.qid = n.qid))
, mg AS (SELECT qid, count(*) AS max_good FROM qrel GROUP BY qid)
, rc AS (SELECT r.qid, r.rank,
                CASE WHEN qr.doc_id IS NULL THEN 0 ELSE 1 END AS rel,
                sum(CASE WHEN qr.doc_id IS NULL THEN 0 ELSE 1 END)
                  OVER (PARTITION BY r.qid ORDER BY r.rank) * 1.0
                  / r.rank AS p
         FROM res r LEFT JOIN qrel qr
           ON qr.qid = r.qid AND qr.doc_id = r.doc_id)
, ag AS (SELECT qid, max(rank) AS np, sum(rel) AS ng,
                sum(CASE WHEN rel = 1 THEN p END) AS prelsum,
                min(CASE WHEN rel = 1 THEN rank END) AS first_rel,
                max(CASE WHEN rank = 5 THEN p END) AS p5,
                max(CASE WHEN rank = 10 THEN p END) AS p10,
                max(CASE WHEN rank = 20 THEN p END) AS p20
         FROM rc GROUP BY qid)
, qids AS (SELECT qid FROM ag UNION SELECT qid FROM mg)
, base AS (SELECT qi.qid, coalesce(a.np, 0) AS np, coalesce(a.ng, 0) AS ng,
                  coalesce(m2.max_good, 0) AS mgd,
                  a.prelsum, a.first_rel, a.p5, a.p10, a.p20
           FROM qids qi LEFT JOIN ag a USING (qid)
                        LEFT JOIN mg m2 USING (qid))
, stats AS (SELECT qid, np::DOUBLE AS num_points, ng::DOUBLE AS num_good,
    mgd::DOUBLE AS max_good,
    round(CASE WHEN np >= 5 THEN p5 ELSE ng / 5.0 END, 6) AS p_at_5,
    round(CASE WHEN np >= 10 THEN p10 ELSE ng / 10.0 END, 6) AS p_at_10,
    round(CASE WHEN np >= 20 THEN p20 ELSE ng / 20.0 END, 6) AS p_at_20,
    round(CASE WHEN first_rel <= 5 THEN 1.0 / first_rel
          ELSE 0.0 END, 6) AS mrr,
    round(CASE WHEN mgd > 0 THEN coalesce(prelsum, 0) / mgd
          ELSE 0.0 END, 6) AS avp,
    round(CASE WHEN mgd > 0 THEN ng * 1.0 / mgd
               WHEN np > 0 THEN ng * 1.0 / np ELSE 0.0 END, 6) AS recall
    FROM base)
SELECT * FROM stats
UNION ALL
SELECT '__avg__', round(avg(num_points), 6), round(avg(num_good), 6),
       round(avg(max_good), 6), round(avg(p_at_5), 6),
       round(avg(p_at_10), 6), round(avg(p_at_20), 6),
       round(avg(mrr), 6), round(avg(avp), 6), round(avg(recall), 6)
FROM stats WHERE max_good > 0
"""

    # SimpleNaiveBayesClassifier: full NB recompute over the corpus —
    # P(c) and the add-one-smoothed P(w|c) with den = avgUniqueTerms *
    # docCount(c) + docsWithClass (SimpleNaiveBayesClassifier.java:
    # 209-283); unseen (w, c) pairs contribute ln(1/den), so the score
    # is prior - n*ln(den) + sum over SEEN pairs of cnt*ln(hits+1).
    o["cls_naive_bayes"] = P + """
, cls AS (SELECT lang AS c, count(*)::DOUBLE AS cd FROM documents
          GROUP BY lang)
, nwc AS (SELECT sum(cd) AS n FROM cls)
, avgu AS (SELECT (SELECT count(*) FROM tf)::DOUBLE
                  / (SELECT count(DISTINCT doc_id) FROM tf) AS a)
, qtok AS (SELECT doc_id AS qid, term, tf AS cnt FROM tf
           WHERE doc_id IN (3, 7, 11, 19, 23, 31))
, qtot AS (SELECT qid, sum(cnt) AS tot FROM qtok GROUP BY qid)
, hits AS (SELECT f.term, d.lang AS c, count(*)::DOUBLE AS h
           FROM tf f JOIN documents d USING (doc_id)
           WHERE f.term IN (SELECT DISTINCT term FROM qtok)
           GROUP BY f.term, d.lang)
, sl AS (SELECT q.qid, h.c, sum(q.cnt * ln(h.h + 1)) AS s
         FROM qtok q JOIN hits h ON h.term = q.term GROUP BY q.qid, h.c)
, den AS (SELECT c, cd,
          (SELECT a FROM avgu) * cd + (SELECT n FROM nwc) AS dn FROM cls)
, sc AS (SELECT t.qid, d.c,
         ln(d.cd) - ln((SELECT n FROM nwc)) - t.tot * ln(d.dn)
           + coalesce(sl.s, 0) AS score
         FROM qtot t CROSS JOIN den d
         LEFT JOIN sl ON sl.qid = t.qid AND sl.c = d.c)
SELECT 'all' AS op, qid AS doc_id, c AS cls, round(score, 3) AS score_r
FROM sc
UNION ALL
SELECT 'best', qid, c, round(score, 3) FROM (
  SELECT *, row_number() OVER (PARTITION BY qid
                               ORDER BY score DESC, c ASC) AS rn FROM sc)
WHERE rn = 1
"""

    # KNearestNeighborClassifier: the ft_mlt term selection (doc 7,
    # max_terms=5, min_df=2), BM25 top-10, then the count*normBoost/k
    # vote with the sumdoc < k correction
    # (KNearestNeighborClassifier.java:191-240).
    o["cls_knn"] = P + f"""
, dterm AS (SELECT term, tf FROM tf WHERE doc_id = 7)
, cand AS (SELECT d.term, d.tf, t.df FROM dterm d
           JOIN tdict t USING (term) WHERE t.df >= 2)
, ranked AS (SELECT term FROM cand
             ORDER BY tf * ln(1 + ((SELECT n FROM st) - df + 0.5)
                              / (df + 0.5)) DESC, term ASC LIMIT 5)
, m AS (SELECT f.doc_id, sum({_score('f.tf')}) AS s
        FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
        WHERE f.term IN (SELECT term FROM ranked)
        GROUP BY f.doc_id)
, topk AS (SELECT doc_id, s FROM m ORDER BY s DESC, doc_id LIMIT 10)
, mx AS (SELECT max(s) AS mx FROM topk)
, votes AS (SELECT d.lang AS cls,
            sum(t.s / (SELECT mx FROM mx)) AS sboost, count(*) AS cnt
            FROM topk t JOIN documents d USING (doc_id) GROUP BY d.lang)
, tot AS (SELECT sum(cnt) AS sumdoc FROM votes)
SELECT cls, round(sboost / (CASE WHEN (SELECT sumdoc FROM tot) >= 10
                            THEN 10.0
                            ELSE (SELECT sumdoc FROM tot) END), 3)
       AS score_r
FROM votes
"""

    # KNearestFuzzyClassifier: NearestFuzzyQuery variant selection
    # (prefix-1 filter, per-term cap 50, NO global cut) -> artificial
    # df=1 BM25 leaves -> top-10 -> the shared rank-weighted vote
    o["cls_knn_fuzzy"] = P + f"""
, qt(src) AS (VALUES ('port'), ('batch'), ('vectr'))
, cand AS (SELECT q.src, d.term, d.df,
        CASE WHEN d.term = q.src THEN 1.0
             ELSE 1.0 - damerau_levenshtein(d.term, q.src)::DOUBLE
                        / least(length(q.src), length(d.term)) END AS boost
    FROM qt q JOIN tdict d
      ON damerau_levenshtein(d.term, q.src) <= 1
     AND substr(d.term, 1, 1) = substr(q.src, 1, 1))
, grp AS (SELECT src,
        coalesce(max(CASE WHEN term = src THEN df END), 0) AS df_src,
        floor(sum(df) / count(*)) AS avg_df
    FROM cand GROUP BY src)
, vs AS (SELECT c.src, c.term, c.boost * c.boost *
        (ln(((SELECT n FROM st) + 1)
            / ((CASE WHEN g.df_src > 0 THEN g.df_src
                     ELSE g.avg_df END) + 1)) + 1.0) AS vscore
    FROM (SELECT * FROM cand
          QUALIFY row_number() OVER (PARTITION BY src
                                     ORDER BY boost DESC, term) <= 50) c
    JOIN grp g USING (src))
, i1 AS (SELECT ln(1 + ((SELECT n FROM st) - 1 + 0.5) / 1.5) AS idf)
, m AS (SELECT f.doc_id,
        sum(v.vscore * {_score('f.tf', idf='(SELECT idf FROM i1)')}) AS s
        FROM tf f JOIN qdl q USING (doc_id) JOIN vs v ON v.term = f.term
        GROUP BY f.doc_id)
, topk AS (SELECT doc_id, s FROM m ORDER BY s DESC, doc_id LIMIT 10)
, mx AS (SELECT max(s) AS mx FROM topk)
, votes AS (SELECT d.lang AS cls,
            sum(t.s / (SELECT mx FROM mx)) AS sboost, count(*) AS cnt
            FROM topk t JOIN documents d USING (doc_id) GROUP BY d.lang)
, tot AS (SELECT sum(cnt) AS sumdoc FROM votes)
SELECT cls, round(sboost / (CASE WHEN (SELECT sumdoc FROM tot) >= 10
                            THEN 10.0
                            ELSE (SELECT sumdoc FROM tot) END), 3)
       AS score_r
FROM votes
"""

    # BM25NBClassifier: keyword class field scores a class CONSTANT
    # idf/2.2 (tf=1, norm code 1, avgdl(role)=1), so the reference's
    # per-(class, word) top-1 search decomposes into
    # s_c + max in-class word BM25; softmax over class log scores
    o["cls_bm25_nb"] = P + f"""
, cls AS (SELECT lang AS c, count(*)::DOUBLE AS dfc FROM documents
          WHERE lang IS NOT NULL GROUP BY lang)
, scf AS (SELECT c, ln(1 + ((SELECT n FROM st) - dfc + 0.5)
                       / (dfc + 0.5)) / 2.2 AS sc FROM cls)
, w(word) AS (VALUES ('vector'), ('batch'), ('window'), ('slow'))
, ms AS (SELECT d.lang AS c, f.term AS word, max({_score('f.tf')}) AS mw
         FROM tf f JOIN qdl q USING (doc_id)
         JOIN idf i ON i.term = f.term
         JOIN documents d ON d.doc_id = f.doc_id
         WHERE f.term IN ('vector', 'batch', 'window', 'slow')
         GROUP BY d.lang, f.term)
, lik AS (SELECT s.c, ln(s.sc) + sum(ln(s.sc + coalesce(m.mw, 0))) AS lg
          FROM scf s CROSS JOIN w
          LEFT JOIN ms m ON m.c = s.c AND m.word = w.word
          GROUP BY s.c, s.sc)
, mxa AS (SELECT max(lg) AS a FROM lik)
, z AS (SELECT (SELECT a FROM mxa)
              + ln(sum(exp(lg - (SELECT a FROM mxa)))) AS loga FROM lik)
SELECT c AS cls, round(exp(lg - (SELECT loga FROM z)), 5) AS score_r
FROM lik
"""

    # BooleanPerceptronClassifier: the sequential training loop as a
    # RECURSIVE CTE carrying the integer weight vector — one step per
    # doc in doc order; mistake -> +-tf per term, clamped at 0
    o["cls_perceptron"] = """
WITH RECURSIVE
tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[0-9a-z]+') AS toks
        FROM documents),
pos AS (SELECT doc_id, unnest(toks) AS term FROM tok),
tfr AS (SELECT doc_id, term, count(*)::BIGINT AS tf
        FROM pos GROUP BY doc_id, term),
vocab AS (SELECT term, sum(tf)::BIGINT AS ttf,
                 row_number() OVER (ORDER BY term) AS vi
          FROM tfr GROUP BY term),
nv AS (SELECT count(*)::INT AS n FROM vocab),
sparse AS (SELECT f.doc_id, list(v.vi ORDER BY v.vi) AS vis,
                  list(f.tf ORDER BY v.vi) AS tfs
           FROM tfr f JOIN vocab v USING (term) GROUP BY f.doc_id),
docs AS (
  SELECT s.doc_id, row_number() OVER (ORDER BY s.doc_id) AS rn,
         (d.lang = 'en') AS correct,
         list_transform(range(1, nv.n + 1),
           i -> coalesce(s.tfs[list_position(s.vis, i)], 0)) AS tfv
  FROM sparse s JOIN documents d USING (doc_id) CROSS JOIN nv
),
stats AS (SELECT (SELECT sum(ttf) FROM vocab)::DOUBLE
               / (SELECT count(*) FROM docs) AS bias),
steps AS (
  SELECT 0::BIGINT AS i, (SELECT list(ttf ORDER BY vi) FROM vocab) AS w
  UNION ALL
  SELECT s.i + 1,
    CASE WHEN (d.correct AND q.dot <  (SELECT bias FROM stats))
           OR (NOT d.correct AND q.dot >= (SELECT bias FROM stats))
    THEN list_transform(range(1, len(s.w) + 1),
           j -> greatest(0, s.w[j]
                + (CASE WHEN d.correct THEN 1 ELSE -1 END) * d.tfv[j]))
    ELSE s.w END
  FROM steps s
  JOIN docs d ON d.rn = s.i + 1
  CROSS JOIN LATERAL (
    SELECT list_dot_product(s.w::DOUBLE[], d.tfv::DOUBLE[]) AS dot) q
),
final AS (SELECT w FROM steps WHERE i = (SELECT count(*) FROM docs))
SELECT v.term, f.w[v.vi]::BIGINT AS weight
FROM vocab v, final f ORDER BY v.term
"""

    # FreeTextSuggester: bigram stupid backoff (ALPHA=0.4). Per model
    # order, top-num by (count desc, word asc) — the FST TopNSearcher's
    # weight-then-byte order — with higher-order words excluded from
    # lower orders (the `seen` set); final sort score desc, suggestion
    # asc (FreeTextSuggester.java:440-720).
    o["ft_free_text"] = P + """
, ucnt AS (SELECT term AS w, sum(tf)::DOUBLE AS c FROM tf GROUP BY term)
, tot AS (SELECT sum(c) AS t FROM ucnt)
, bcnt AS (SELECT p1.term AS w1, p2.term AS w2, count(*)::DOUBLE AS c
           FROM pos p1 JOIN pos p2
             ON p1.doc_id = p2.doc_id AND p2.pos = p1.pos + 1
           GROUP BY p1.term, p2.term)
, b1 AS (SELECT 'slow ' || w2 AS s, w2,
                c / (SELECT c FROM ucnt WHERE w = 'slow') AS sc
         FROM bcnt WHERE w1 = 'slow' AND w2 LIKE 'f%'
         ORDER BY c DESC, w2 LIMIT 10)
, u1 AS (SELECT w AS s, w AS w2, 0.4 * c / (SELECT t FROM tot) AS sc
         FROM ucnt WHERE w LIKE 'f%' AND w NOT IN (SELECT w2 FROM b1)
         ORDER BY c DESC, w LIMIT 10)
, r1 AS (SELECT s, sc FROM (SELECT s, sc FROM b1
                            UNION ALL SELECT s, sc FROM u1)
         ORDER BY sc DESC, s LIMIT 10)
, b2 AS (SELECT 'slow ' || w2 AS s,
                c / (SELECT c FROM ucnt WHERE w = 'slow') AS sc
         FROM bcnt WHERE w1 = 'slow' ORDER BY c DESC, w2 LIMIT 10)
, r2 AS (SELECT s, sc FROM b2 ORDER BY sc DESC, s LIMIT 10)
, u3 AS (SELECT w AS s, c / (SELECT t FROM tot) AS sc FROM ucnt
         WHERE w LIKE 'vec%' ORDER BY c DESC, w LIMIT 5)
, r3 AS (SELECT s, sc FROM u3 ORDER BY sc DESC, s LIMIT 5)
SELECT 'pfx' AS op, s AS suggestion, round(sc, 6) AS score_r FROM r1
UNION ALL SELECT 'ctx', s, round(sc, 6) FROM r2
UNION ALL SELECT 'uni', s, round(sc, 6) FROM r3
"""

    # wdgf chain: the corpus text is pure lowercase alnum + spaces, so
    # the chain's effect reduces EXACTLY to the derived prefix's parts
    # — "PowerShot{n}" -> power, shot, n (case + letter/digit splits)
    # and "O'Neil's" -> o, neil (delimiter split + possessive drop);
    # the oracle recomputes the full BM25 prelude over that stream.
    PW = _prelude(
        "list_concat(['power', 'shot', (doc_id % 97)::VARCHAR, "
        "'o', 'neil'], regexp_extract_all(lower(text), '[0-9a-z]+'))")
    o["ft_wdgf_topk"] = PW + f"""
, m AS (SELECT f.doc_id, sum({_score('f.tf')}) AS s
        FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
        WHERE f.term IN ('power', 'shot')
        GROUP BY f.doc_id)
, m2 AS (SELECT f.doc_id, {_score('f.tf')} AS s
         FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
         WHERE f.term = '42')
SELECT 'or' AS op, doc_id, round(s, 3) AS score_r FROM (
  SELECT doc_id, s FROM m ORDER BY s DESC, doc_id LIMIT 10)
UNION ALL
SELECT 'num', doc_id, round(s, 3) FROM (
  SELECT doc_id, s FROM m2 ORDER BY s DESC, doc_id LIMIT 10)
"""

    # DiversifiedTopDocsCollector: per-key quota (row_number within
    # lang by score desc, doc_id asc) then the global top-10.
    o["ft_diversified"] = P + f"""
, m AS (SELECT f.doc_id, sum({_score('f.tf')}) AS s
        FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
        WHERE f.term IN ('scan', 'sort', 'merge')
        GROUP BY f.doc_id)
, keyed AS (SELECT m.doc_id, d.lang AS cls, m.s,
            row_number() OVER (PARTITION BY d.lang
                               ORDER BY m.s DESC, m.doc_id ASC) AS rk
            FROM m JOIN documents d USING (doc_id))
SELECT doc_id, cls, round(s, 3) AS score_r FROM keyed
WHERE rk <= 2 ORDER BY s DESC, doc_id LIMIT 10
"""

    # PhraseWildcardQuery: "slow f*" — adjacency against ANY dictionary
    # term starting with f; weight idf sums over 'slow' plus every
    # expanded term (MultiPhraseWeight's termStatistics loop).
    o["ft_phrase_wildcard"] = P + f"""
, mph AS (SELECT p1.doc_id, count(*) AS freq FROM pos p1
          JOIN pos p2 ON p1.doc_id = p2.doc_id AND p2.pos = p1.pos + 1
          WHERE p1.term = 'slow' AND p2.term LIKE 'f%'
          GROUP BY p1.doc_id)
, w AS (SELECT sum(idf) AS widf FROM idf
        WHERE term = 'slow' OR term LIKE 'f%')
, m AS (SELECT p.doc_id,
        {_score('p.freq', idf='(SELECT widf FROM w)')} AS s
        FROM mph p JOIN qdl q USING (doc_id))
, top AS (SELECT doc_id, round(s, 3) AS score_r FROM m
          ORDER BY s DESC, doc_id LIMIT 10)
SELECT 'api' AS op, doc_id, score_r FROM top
UNION ALL
SELECT 'parsed', doc_id, score_r FROM top
"""

    # FunctionScoreQuery: BM25 for 'vector', score replaced by
    # s * (1 + 1/(1+dl)) over the full match stream.
    o["ft_function_score"] = P + f"""
, m AS (SELECT f.doc_id, {_score('f.tf')} AS s
        FROM tf f JOIN qdl q USING (doc_id) JOIN idf i ON i.term = f.term
        WHERE f.term = 'vector')
SELECT m.doc_id,
       round(m.s * (1.0 + 1.0 / (1 + d.dl)), 3) AS score_r
FROM m JOIN dl d USING (doc_id)
ORDER BY m.s * (1.0 + 1.0 / (1 + d.dl)) DESC, m.doc_id LIMIT 10
"""

    return o
