"""Distributed IndexSearcher over the index tables.

Query lifecycle (SURVEY.md §3.1 mapping):

1. *rewrite/weight*: term stats are fetched with a pushed-down filter on
   the ``termstats`` parquet (the term-dictionary seek — files are sorted
   by term, so parquet min/max stats prune row groups the way the
   BlockTree trie prunes term blocks), and BM25 weights are bound
   (TermWeight binding stats, core:search/TermQuery.java:64-82).
2. *leaf execution*: posting chunks for the query terms are scanned with
   a pushed-down ``term IN (...)`` predicate, cogrouped with the norms
   table by ``bucket_id`` (bucket ≙ LeafReaderContext), and scored by the
   numpy kernels with block-max pruning; each bucket emits only its local
   top-k (per-slice TopScoreDocCollector).
3. *reduce*: Spark's native ``ORDER BY score DESC, doc_id ASC LIMIT k``
   merges bucket results (TopDocs.merge, core:search/TopDocs.java:203).

Everything driver-side is metadata-sized (term stats for the query's
terms); postings never leave executors.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index.catalog import IndexCatalog, check_format, read_table
from ..kernels.bm25 import BM25Scorer, sum_idf
from .kernels import (DocSetChunk, MaskedChunk, TermChunk, boolean_topk,
                      constant_or_topk, dismax_topk, eval_tree,
                      eval_tree_topk, node_has_matchall, node_has_termauto,
                      pack_docset, phrase_freqs, score_bucket, topk_select)
from .query import (AndQuery, BlendedTermQuery, BooleanQuery,
                    CombinedFieldQuery, CommonTermsQuery,
                    ComplexPhraseQuery, ConstantScoreQuery, DisMaxQuery,
                    FieldExistsQuery, MatchAllQuery, MultiPhraseQuery,
                    MultiTermQuery, OrQuery, PhraseQuery, PreAnalyzed,
                    StatsTermQuery, SynonymQuery, TermAutomatonQuery,
                    TermQuery, rewrite)

RESULT_SCHEMA = "doc_id bigint, score float"
POSTING_SCHEMA = "doc_id bigint, tf int"
PHRASE_SCHEMA = "doc_id bigint, freq int"
TERM_VECTOR_SCHEMA = ("doc_id bigint, term string, freq int, "
                      "positions array<int>")


def _needs_tree(query) -> bool:
    """Shapes that require the recursive tree evaluator: boolean with
    sub-query clauses, constant-score wrappers, dismax over queries."""
    if isinstance(query, (ConstantScoreQuery, CombinedFieldQuery,
                          MultiPhraseQuery, CommonTermsQuery,
                          BlendedTermQuery, ComplexPhraseQuery,
                          TermAutomatonQuery, StatsTermQuery)):
        return True
    if isinstance(query, BooleanQuery):
        return query.nested
    if isinstance(query, DisMaxQuery):
        return any(not isinstance(c, str) for c in query.terms_)
    return False


def _qtype(query) -> str:
    if isinstance(query, TermQuery):
        return "term"
    if isinstance(query, AndQuery):
        return "and"
    if isinstance(query, OrQuery):
        return "or"
    if isinstance(query, PhraseQuery):
        return "phrase"
    if isinstance(query, SynonymQuery):
        return "synonym"
    if isinstance(query, DisMaxQuery):
        return "dismax"
    if isinstance(query, BooleanQuery):
        return "boolean"
    raise TypeError(type(query))


class _PhraseScorer(BM25Scorer):
    """BM25 scorer whose weight is the float32 double-sum of term idfs
    (BM25Similarity.idfExplain for TermStatistics[], :161-170)."""

    def __init__(self, term_idfs, doc_count, sum_ttf, boost=1.0):
        super().__init__(1, doc_count, sum_ttf)  # df unused; weight overridden
        self.idf = sum_idf(term_idfs)
        self.weight = np.float32(np.float32(boost) * self.idf)


class IndexSearcher:
    def __init__(self, spark: SparkSession, index_dir: str,
                 similarity=BM25Scorer, generation: int | None = None):
        """similarity: a scorer factory (df, doc_count, sum_ttf, boost=…)
        with .score(freqs, norm_codes) / .max_score_for_impacts — the
        Similarity extension point (core:search/similarities/
        Similarity.java:93). Non-default similarities trigger query-time
        bound recomputation from impacts (baked floats are BM25).

        A DICT maps field -> factory (PerFieldSimilarityWrapper,
        core:search/similarities/PerFieldSimilarityWrapper.java): the
        "*" entry (default BM25Scorer) covers unlisted fields;
        CombinedFieldQuery always uses the default (the reference's
        CombinedFieldQuery is BM25-defined, sandbox/CombinedFieldQuery
        .java:86)."""
        self.spark = spark
        if isinstance(similarity, dict):
            self._sim_map = dict(similarity)
            self.similarity = self._sim_map.pop("*", BM25Scorer)
        else:
            self._sim_map = None
            self.similarity = similarity
        self.catalog = IndexCatalog(index_dir)
        # generation=N opens a PAST commit point — DirectoryReader.open
        # (IndexCommit) (core:index/DirectoryReader.java:89): old data
        # dirs stay on disk until vacuumed, so any retained segments_N
        # is a fully readable snapshot
        c = (self.catalog.latest_commit() if generation is None
             else self.catalog.commit_at(generation))
        if not c or "postings" not in c["tables"]:
            raise ValueError(f"no committed index at {index_dir}"
                             + (f" gen {generation}"
                                if generation is not None else ""))
        check_format(c, f"IndexSearcher({index_dir})")
        self.generation = c["gen"]
        # multi-dir tables (base + NRT-appended generations — the
        # segments_N list model); single-dir aliases point at the base
        self.postings_paths = self.catalog.table_locations("postings", c)
        self.norms_paths = self.catalog.table_locations("norms", c)
        self.docstore_paths = self.catalog.table_locations("docstore", c)
        self.postings_path = self.postings_paths[0]
        # termstats may be multi-generation after NRT appends (per-batch
        # delta rows); _termstats_df() aggregates at read
        self.termstats_paths = self.catalog.table_locations("termstats", c)
        self.termstats_path = self.termstats_paths[0]
        self.norms_path = self.norms_paths[0]
        self.docstore_path = self.docstore_paths[0]
        # per-field collection stats (CollectionStatistics rows) — one
        # per indexed field; keyword fields have avgdl 1 / omitted norms
        self.field_stats = {r["field"]: (int(r["doc_count"]), int(r["sum_ttf"]))
                            for r in spark.read.parquet(
                                self.catalog.table_path("stats", c)).collect()}
        extra0 = c.get("extra") or {}
        self.field = extra0.get("field") or next(iter(self.field_stats))
        self.keyword_fields = set(extra0.get("keyword_fields") or ())
        # per-field analyzer chains (PerFieldAnalyzerWrapper): query
        # terms of analyzed fields go through the same chain the build
        # used (QueryBuilder analysis parity); empty for legacy indexes
        self.analyzers = dict(extra0.get("analyzers") or {})
        self._needs_analysis = any(v != "standard"
                                   for v in self.analyzers.values())
        self.doc_count, self.sum_ttf = self.field_stats[self.field]
        # reader.maxDoc() analog (every stored doc counts once; a doc
        # missing some field still exists) — the max per-field docCount
        # is exact whenever at least one field is total, and is the
        # tightest stats-only lower bound otherwise
        self.max_doc = max(dc for dc, _ in self.field_stats.values())
        # NRT appends leave baked block-max floats stale (global df and
        # avgdl moved); when dirty, bounds are re-derived from the stored
        # (freq, norm) impacts per query — Lucene's MaxScoreCache design
        # (core:search/MaxScoreCache.java:19-159). compact() clears it.
        self.nrt_dirty = bool((c.get("extra") or {})
                              .get("nrt_dirty", False))
        # live-docs bitmaps (deletes); scorers skip dead docs, stats keep
        # counting them until compaction — Lucene's delete semantics
        self.livedocs_path = self.catalog.table_path("livedocs", c)
        # filter cache (LRUQueryCache analog, core:search/
        # LRUQueryCache.java:86): Lucene caches per-segment DocIdSets of
        # filter-context queries; here the cached unit is the per-bucket
        # doc-bitmap frame of a doc_filter predicate, persisted so
        # repeated filters skip the docstore scan. Point-in-time safe:
        # the searcher is a snapshot (paths resolved at init), so no
        # invalidation is needed — a new searcher starts a fresh cache.
        from collections import OrderedDict
        self._filter_cache: OrderedDict = OrderedDict()
        # base-DataFrame cache: spark.read.parquet re-runs schema
        # inference + partition discovery on EVERY call (~0.2 s per
        # table on a partitioned postings dir — pure driver latency).
        # The searcher is a point-in-time snapshot (paths resolved at
        # init), so the base relation per table is immutable and safe
        # to build once; filters on the cached DataFrame still push
        # down (each .filter makes a fresh plan over the shared scan).
        # This is Lucene's one-open-SegmentReader-per-searcher shape.
        self._base_dfs: dict = {}

    def _read_cached(self, locations) -> DataFrame:
        key = ((locations,) if isinstance(locations, str)
               else tuple(locations))
        df = self._base_dfs.get(key)
        if df is None:
            df = self._base_dfs[key] = read_table(self.spark, list(key))
        return df

    def _memo_df(self, key, build) -> DataFrame:
        """Memoize a constant DataFrame (immutable logical plan) under a
        value key — empty results and fixed projections are rebuilt on
        every query otherwise, and each createDataFrame/select is a py4j
        round-trip (~0.1 s for createDataFrame) that dominates warm
        single-query latency."""
        df = self._base_dfs.get(key)
        if df is None:
            df = self._base_dfs[key] = build()
        return df

    def _empty_result(self) -> DataFrame:
        return self._memo_df(
            "_empty_result",
            lambda: self.spark.createDataFrame([], RESULT_SCHEMA))

    def _norms_proj(self, *cols) -> DataFrame:
        """The norms-table projection used by every scored query."""
        return self._memo_df(
            ("_norms", cols),
            lambda: self._read_cached(self.norms_paths).select(*cols))

    def _live_proj(self, *cols) -> DataFrame:
        return self._memo_df(
            ("_live", cols),
            lambda: self._read_cached(self.livedocs_path).select(*cols))

    @staticmethod
    def _term_hs(terms) -> list:
        """Partition keys for the hash-partitioned term dictionary
        ('h' + md5 prefix, mirrors the build's term_h column; the 'h'
        prefix keeps Spark's partition-column type inference from
        reading all-numeric hex values like '07' back as ints, which
        would make the string isin() silently match nothing)."""
        import hashlib
        return sorted({"h" + hashlib.md5(t.encode()).hexdigest()[:2]
                       for t in terms})

    def _postings_for(self, terms, field: str) -> DataFrame:
        """Postings scan with directory-level pruning (term_h partition
        equality) + row-group pruning (sorted term column min/max) —
        the term-dictionary seek."""
        return (self._read_cached(self.postings_paths)
                .filter(F.col("term_h").isin(self._term_hs(terms)) &
                        (F.col("field") == field) &
                        F.col("term").isin(list(terms))))

    def _postings_for_pairs(self, pairs) -> DataFrame:
        """Postings scan for (field, term) pairs spanning multiple
        fields. The pushed-down predicate is the rectangular superset
        (field IN fields AND term IN terms) — same pruning as
        _postings_for; kernels key chunks by the exact (field, term)."""
        fields = sorted({f for f, _ in pairs})
        terms = sorted({t for _, t in pairs})
        return (self._read_cached(self.postings_paths)
                .filter(F.col("term_h").isin(self._term_hs(terms)) &
                        F.col("field").isin(fields) &
                        F.col("term").isin(terms)))

    # term dictionaries up to this many entries are cached driver-side:
    # term_stats becomes a dict lookup and a search is ONE Spark job.
    # Bigger dictionaries (web-scale corpora) keep the pushed-down scan.
    TERMSTATS_CACHE_MAX = 1_000_000

    # ---- stats / weights -------------------------------------------------
    def _termstats_df(self, pushed_filter=None) -> DataFrame:
        """The term dictionary as a DataFrame. Single generation: the
        raw (pushed-down-scannable) table. Multi-generation (NRT delta
        rows): per-generation pushed-down scans unioned, then one
        aggregate sums df/ttf and maxes max_score per (field, term) —
        the filter still reaches each parquet scan BEFORE the shuffle,
        so a seek for q query terms stays O(matching rows), not
        O(vocabulary)."""
        ts = self._read_cached(self.termstats_paths)
        if pushed_filter is not None:
            ts = ts.filter(pushed_filter)
        if len(self.termstats_paths) > 1:
            ts = (ts.groupBy("field", "term")
                  .agg(F.sum("df").alias("df"), F.sum("ttf").alias("ttf"),
                       F.max("max_score").alias("max_score")))
        return ts

    def _termstats_cache(self):
        if not hasattr(self, "_ts_cache"):
            ts = self._termstats_df()
            if ts.count() <= self.TERMSTATS_CACHE_MAX:
                self._ts_cache = {
                    (r["field"], r["term"]): (int(r["df"]), int(r["ttf"]),
                                              float(r["max_score"]))
                    for r in ts.collect()}
            else:
                self._ts_cache = None
        return self._ts_cache

    def term_stats(self, terms: list, field: str | None = None) -> dict:
        """TermStatistics for the given terms in one field -> {term:
        (df, ttf, max_score)} (the term-dictionary seek)."""
        field = field or self.field
        cache = self._termstats_cache()
        if cache is not None:
            return {t: cache[(field, t)] for t in set(terms)
                    if (field, t) in cache}
        rows = self._termstats_df(
            (F.col("field") == field)
            & F.col("term").isin(list(set(terms)))).collect()
        return {r["term"]: (int(r["df"]), int(r["ttf"]), float(r["max_score"]))
                for r in rows}

    def _field_stats(self, field: str):
        try:
            return self.field_stats[field]
        except KeyError:
            raise ValueError(f"field {field!r} is not indexed "
                             f"(indexed: {sorted(self.field_stats)})")

    def _sim_for(self, field: str):
        """PerFieldSimilarityWrapper.get(field) — the field's factory,
        or the searcher default when no per-field map / no entry."""
        if self._sim_map is not None:
            return self._sim_map.get(field, self.similarity)
        return self.similarity

    def _scorers(self, query, tstats):
        terms = query.terms
        doc_count, sum_ttf = self._field_stats(query.field)
        sim = self._sim_for(query.field)
        if isinstance(query, PhraseQuery):
            idfs = [BM25Scorer(tstats[t][0], doc_count, sum_ttf).idf
                    for t in terms]
            return [_PhraseScorer(idfs, doc_count, sum_ttf, query.boost)]
        if isinstance(query, SynonymQuery):
            # blended pseudo-term stats: df = max member df, ttf = sum
            # (SynonymQuery.java builds one TermStatistics with max docFreq)
            df = max(tstats[t][0] for t in terms if t in tstats)
            sttf_syn = sum(tstats[t][1] for t in terms if t in tstats)
            return [sim(df, doc_count, sum_ttf,
                        boost=query.boost, ttf=sttf_syn)]
        return [sim(tstats[t][0], doc_count, sum_ttf,
                    boost=query.boost, ttf=tstats[t][1])
                if t in tstats else None for t in terms]

    # ---- multi-term expansion (the AutomatonTermsEnum analog) ------------
    def _sorted_terms_for(self, field: str) -> list:
        """Sorted term array of one field from the driver cache, built
        ONCE per searcher (the in-memory term index) — not per query."""
        st = getattr(self, "_sorted_terms", None)
        if st is None:
            st = self._sorted_terms = {}
        if field not in st:
            cache = self._termstats_cache()
            st[field] = sorted(t for f, t in cache if f == field)
        return st[field]

    def expand_terms(self, query: MultiTermQuery) -> list:
        """Expand a MultiTermQuery against the term dictionary.
        Expansion order: term asc, capped at max_expansions
        (BooleanQuery clause-cap analog).

        Dictionary-SEEK kinds (prefix / range / set) use the driver
        term cache when warm: a bisect on the sorted term array — the
        BlockTree/FST seek, O(log |dict| + matches), never a full scan.

        Dictionary-SCAN kinds (fuzzy / wildcard / regexp) ALWAYS run as
        a pushed-down predicate over the termstats parquet on
        EXECUTORS (F.levenshtein / rlike) — a Python loop over the
        dictionary on the driver would serialize seconds of CPU per
        query at 10^6+ terms, and the executor scan parallelizes with
        the dictionary's partition count (the automaton-intersection
        role of AutomatonTermsEnum, core:index/AutomatonTermsEnum.java,
        executed as a Catalyst filter instead)."""
        import bisect
        kind, pat = query.kind, query.pattern
        if kind in ("prefix", "range", "set"):
            cache = self._termstats_cache()
            if cache is not None:
                if kind == "set":
                    sel = [t for t in sorted(set(pat))
                           if (query.field, t) in cache]
                else:
                    terms = self._sorted_terms_for(query.field)
                    if kind == "prefix":
                        # exclusive upper bound above every code point
                        # that can follow the prefix — U+10FFFF, not
                        # U+FFFF: supplementary-plane letters (emitted
                        # by the \w tokenizer) sort above '￿'
                        # (advisor r03 finding #3)
                        lo, hi = pat, pat + chr(0x10FFFF)
                    else:
                        lo, hi = pat
                    i0 = (bisect.bisect_left(terms, lo)
                          if lo is not None else 0)
                    i1 = (bisect.bisect_left(terms, hi)
                          if hi is not None else len(terms))
                    sel = terms[i0:i1]
                return sel[:query.max_expansions]
        ts = (self._read_cached(self.termstats_paths)
              .filter(F.col("field") == query.field)
              .select("term"))
        if kind == "prefix":
            ts = ts.filter(F.col("term").startswith(pat))
        elif kind == "wildcard":
            rx = "^" + re.escape(pat).replace(r"\*", ".*").replace(r"\?", ".") + "$"
            ts = ts.filter(F.col("term").rlike(rx))
        elif kind == "regexp":
            # RegexpQuery patterns use Lucene's RegExp syntax, not Java
            # regex (complement/intersection/numeric intervals) —
            # translate before the pushed-down rlike (kernels/regexp.py).
            # Patterns the Java-regex encoding can't express (non-tail
            # or repeated ~/&) compile to a true code-point DFA and run
            # as a vectorized Arrow-batch filter on the same scan
            # (kernels/automaton.py — AutomatonTermsEnum's role)
            from ..kernels.regexp import (LuceneRegexpError,
                                          translate as _lucene_rx)
            try:
                ts = ts.filter(F.col("term").rlike(
                    "^(?:" + _lucene_rx(pat) + ")$"))
            except LuceneRegexpError:
                from ..kernels.automaton import accepts_udf, compile_pattern
                ts = ts.filter(accepts_udf(compile_pattern(pat))(
                    F.col("term")))
        elif kind == "fuzzy":
            # banded acceptance like the Levenshtein automaton's length
            # bound: |len(t) - len(pat)| <= k is NECESSARY for distance
            # <= k (every primitive edit incl. transposition moves the
            # length by <= 1), pushes to the parquet scan, and cuts the
            # rows that reach the distance kernel
            k = query.max_edits
            L = len(pat)
            ts = ts.filter(F.length("term").between(L - k, L + k))
            if getattr(query, "transpositions", True):
                # FuzzyQuery default: OSA distance (adjacent swap = one
                # edit, FuzzyQuery.java:79-84) — Arrow-batched kernel
                # over the banded survivors (osa.osa_leq vectorizes the
                # DP across the whole batch; no per-term Python)
                from ..kernels.osa import osa_leq_udf
                ts = ts.filter(osa_leq_udf(pat, k)(F.col("term")))
            else:
                ts = ts.filter(
                    F.levenshtein(F.col("term"), F.lit(pat), k) >= 0)
        elif kind == "range":
            lo, hi = pat
            if lo is not None:
                ts = ts.filter(F.col("term") >= lo)
            if hi is not None:
                ts = ts.filter(F.col("term") < hi)
        elif kind == "set":
            ts = ts.filter(F.col("term").isin(list(pat)))
        else:
            raise ValueError(f"unknown multi-term kind {kind}")
        if len(self.termstats_paths) > 1:
            ts = ts.distinct()  # NRT delta generations repeat terms
        rows = ts.orderBy("term").limit(query.max_expansions).collect()
        return [r["term"] for r in rows]

    def _attach_live(self, df: DataFrame):
        """Left-join the live-doc bitmaps (with their own base/size) to a
        per-bucket chunk frame; returns (df, has_live)."""
        if self.livedocs_path is None:
            return df, False
        live_df = self._memo_df(
            ("_live", "aliased"),
            lambda: self._read_cached(self.livedocs_path)
            .select("bucket_id",
                    F.col("base_doc").alias("_lv_base"),
                    F.col("num_docs").alias("_lv_n"), "live"))
        return df.join(live_df, "bucket_id", "left"), True

    @staticmethod
    def _live_docset(pdf: pd.DataFrame):
        lb = pdf["live"].iloc[0]
        if lb is None:
            return None
        return DocSetChunk(bytes(lb), int(pdf["_lv_base"].iloc[0]),
                           int(pdf["_lv_n"].iloc[0]))

    FILTER_CACHE_MAX = 8

    def _doc_filter_bitmaps(self, doc_filter: str) -> DataFrame:
        """Pushed-down metadata predicate -> per-bucket doc bitmaps.

        The filter runs on the docstore's NATIVE columns (role, tool,
        ts, token_count, ...) so Catalyst pushes it to the parquet scan
        (the doc-values execution of IndexOrDocValuesQuery); the result
        is compacted to one bitmap per bucket (num_docs/8 bytes) and
        LRU-cached (persist) so repeated filters reuse it."""
        cached = self._filter_cache.get(doc_filter)
        if cached is not None:
            self._filter_cache.move_to_end(doc_filter)
            return cached
        nm = self._norms_proj("bucket_id", "base_doc", "num_docs")
        filtered = (self._read_cached(self.docstore_paths)
                    .filter(doc_filter)
                    .select("bucket_id", "doc_id")
                    .join(F.broadcast(nm), "bucket_id"))

        def pack(pdf: pd.DataFrame) -> pd.DataFrame:
            base = int(pdf["base_doc"].iloc[0])
            nd = int(pdf["num_docs"].iloc[0])
            bm = pack_docset(np.sort(pdf["doc_id"].to_numpy(np.int64)), base, nd)
            return pd.DataFrame({"bucket_id": [int(pdf["bucket_id"].iloc[0])],
                                 "doc_bitmap": [bm]})

        out = (filtered.groupBy("bucket_id")
               .applyInPandas(pack, "bucket_id int, doc_bitmap binary")
               .persist())
        self._filter_cache[doc_filter] = out
        if len(self._filter_cache) > self.FILTER_CACHE_MAX:
            _, evicted = self._filter_cache.popitem(last=False)
            evicted.unpersist()
        return out

    # ---- MatchAll / FieldExists ------------------------------------------
    def _match_all_df(self, boost: float, k: int,
                      doc_filter: str | None = None,
                      after: tuple | None = None) -> DataFrame:
        """MatchAllDocsQuery: every live doc scores ``boost``. Built
        from the norms table's bucket ranges — NO postings scan; deletes
        and doc_filter compose as per-bucket bitmaps like everywhere
        else. FieldExistsQuery is sugar: MatchAll with an IS NOT NULL
        doc_filter pushed to the docstore scan."""
        spark = self.spark
        nm = self._norms_proj("bucket_id", "base_doc", "num_docs")
        has_filter = doc_filter is not None
        if has_filter:
            nm = nm.join(self._doc_filter_bitmaps(doc_filter), "bucket_id")
        has_live = self.livedocs_path is not None
        if has_live:
            live_df = self._live_proj("bucket_id", "live")
            nm = nm.join(live_df, "bucket_id", "left")
        b = np.float32(boost)

        def run(pdf: pd.DataFrame) -> pd.DataFrame:
            base = int(pdf["base_doc"].iloc[0])
            nd = int(pdf["num_docs"].iloc[0])
            keep = np.ones(nd, dtype=bool)
            if has_filter:
                keep &= np.unpackbits(np.frombuffer(
                    bytes(pdf["doc_bitmap"].iloc[0]), np.uint8),
                    count=nd).astype(bool)
            if has_live and pdf["live"].iloc[0] is not None:
                keep &= np.unpackbits(np.frombuffer(
                    bytes(pdf["live"].iloc[0]), np.uint8),
                    count=nd).astype(bool)
            docs = base + np.flatnonzero(keep)
            if after is not None:
                # constant score: the cursor reduces to a doc_id bound
                s_a, d_a = np.float32(after[0]), np.int64(after[1])
                if b > s_a:
                    docs = docs[:0]
                elif b == s_a:
                    docs = docs[docs > d_a]
            docs = docs[:k]
            return pd.DataFrame({"doc_id": docs.astype(np.int64),
                                 "score": np.full(docs.size, b,
                                                  dtype=np.float32)})

        per_bucket = (nm.groupBy("bucket_id")
                      .applyInPandas(run, schema=RESULT_SCHEMA))
        return (per_bucket
                .orderBy(F.col("score").desc(), F.col("doc_id").asc())
                .limit(k))

    # ---- nested-query compilation (BooleanQuery.Builder.add(Query, Occur)
    # surface, core:search/BooleanQuery.java:125-147) ----------------------
    def _analyze_query(self, q):
        """Rewrite leaf terms of analyzed fields through the field's
        analyzer chain (the QueryBuilder/QueryParser analysis step,
        core:util/QueryBuilder.java) so "merging" finds docs indexed as
        "merg" on a porter-analyzed field. No-op for standard-analyzer
        indexes. MultiTermQuery patterns are NOT analyzed (Lucene MTQs
        match the dictionary as stored); keyword fields are never
        analyzed; PreAnalyzed unwraps without rewriting (stems are not
        idempotent, so double analysis would corrupt them)."""
        if isinstance(q, PreAnalyzed):
            return self._strip_pre(q.query)
        if not self._needs_analysis:
            return self._strip_pre(q)
        return self._an_node(q, self.field)

    def _strip_pre(self, q):
        """Remove NESTED PreAnalyzed markers (their subtrees are
        already index terms; the marker itself is not a scorable node).
        Rebuilds only along paths that actually contain one."""
        import dataclasses
        if isinstance(q, PreAnalyzed):
            return self._strip_pre(q.query)
        if isinstance(q, BooleanQuery):
            fx = lambda cs: tuple(self._strip_pre(c) if not
                                  isinstance(c, str) else c for c in cs)
            new = (fx(q.must), fx(q.should), fx(q.must_not),
                   fx(q.filter_))
            if new != (q.must, q.should, q.must_not, q.filter_):
                return dataclasses.replace(
                    q, must=new[0], should=new[1], must_not=new[2],
                    filter_=new[3])
            return q
        if isinstance(q, DisMaxQuery):
            new = tuple(self._strip_pre(c) if not isinstance(c, str)
                        else c for c in q.terms_)
            if new != q.terms_:
                return dataclasses.replace(q, terms_=new)
            return q
        if isinstance(q, ConstantScoreQuery):
            inner = self._strip_pre(q.query)
            if inner is not q.query:
                return dataclasses.replace(q, query=inner)
            return q
        return q

    def _field_chain(self, field: str) -> str:
        """Analyzer chain name of one field (keyword fields are never
        analyzed beyond the standard chain)."""
        if field in self.keyword_fields:
            return "standard"
        return self.analyzers.get(field, "standard")

    def _analyze_terms(self, terms: list, field: str) -> list:
        """Raw query terms -> index terms through the field's analyzer
        chain — the same per-slot analysis search_df applies, routed
        into the match-stream APIs (term_postings / phrase_matches /
        interval_*) so a stemmed index finds "merging" as "merg" there
        too (advisor r04 #5). A stop word analyzes to itself and is
        simply absent from an 'english' index (matches nothing)."""
        an = self._field_chain(field)
        if an == "standard":
            return list(terms)
        from ..kernels.tokenizer import analyze_term
        return [analyze_term(t, an) for t in terms]

    def _an_node(self, q, parent_field: str):
        import dataclasses
        from ..kernels.tokenizer import analyze_term

        if isinstance(q, PreAnalyzed):
            # node-level opt-out: the subtree already holds index terms
            return self._strip_pre(q.query)

        def chain(fld):
            if fld in self.keyword_fields:
                return "standard"
            return self.analyzers.get(fld, "standard")

        if isinstance(q, str):
            return analyze_term(q, chain(parent_field))
        if isinstance(q, TermQuery):
            an = chain(q.field)
            if an == "standard":
                return q
            return dataclasses.replace(q, term=analyze_term(q.term, an))
        if isinstance(q, (AndQuery, OrQuery, PhraseQuery, SynonymQuery,
                          CommonTermsQuery)):
            an = chain(q.field)
            if an == "standard":
                return q
            return dataclasses.replace(
                q, terms_=tuple(analyze_term(t, an) for t in q.terms_))
        if isinstance(q, BlendedTermQuery):
            return dataclasses.replace(
                q, pairs_=tuple((f, analyze_term(t, chain(f)), b)
                                for f, t, b in q.pairs))
        if isinstance(q, TermAutomatonQuery):
            an = chain(q.field)
            if an == "standard":
                return q
            return dataclasses.replace(
                q, paths=tuple(tuple(None if t is None
                                     else analyze_term(t, an)
                                     for t in p) for p in q.paths))
        if isinstance(q, MultiPhraseQuery):
            an = chain(q.field)
            if an == "standard":
                return q
            # dedupe after analysis: two alternatives can stem to the
            # SAME index term ("run", "running" -> "run"), and a
            # duplicated member would double the slot's tf and break
            # the unique-positions contract of the phrase kernel
            return dataclasses.replace(
                q, slots_=tuple(tuple(dict.fromkeys(
                    analyze_term(t, an) for t in s)) for s in q.slots))
        if isinstance(q, DisMaxQuery):
            return dataclasses.replace(
                q, terms_=tuple(self._an_node(c, q.field)
                                for c in q.terms_))
        if isinstance(q, BooleanQuery):
            fx = lambda cs: tuple(self._an_node(c, q.field) for c in cs)
            return dataclasses.replace(
                q, must=fx(q.must), should=fx(q.should),
                must_not=fx(q.must_not), filter_=fx(q.filter_))
        if isinstance(q, ConstantScoreQuery):
            return dataclasses.replace(
                q, query=self._an_node(q.query, q.field))
        return q  # MTQ / MatchAll / FieldExists: not analyzed

    def _expand_mtq_tree(self, q):
        """Replace MultiTermQuery nodes with their term-dictionary
        expansion (OrQuery for scoring_boolean, ConstantScoreQuery(Or)
        for constant_score) — the rewrite that needs the term dict."""
        if isinstance(q, MultiTermQuery):
            expanded = tuple(self.expand_terms(q))
            inner = OrQuery(expanded, q.field, boost=q.boost)
            if q.rewrite == "scoring_boolean":
                return inner
            return ConstantScoreQuery(OrQuery(expanded, q.field),
                                      q.field, q.boost)
        if isinstance(q, ComplexPhraseQuery):
            # ComplexPhraseQueryParser's ComplexPhraseQuery rewrites
            # against the reader at this exact point in the reference
            # too (ComplexPhraseQueryParser.java ComplexPhraseQuery
            # .rewrite): MTQ slots expand via the term dictionary and
            # the result is an ordinary MultiPhraseQuery
            import dataclasses as _dc
            rw = self.phrase_wildcard(list(q.slots_), q.field, q.slop)
            if isinstance(rw, PreAnalyzed):
                rw = rw.query
            if q.boost != 1.0:
                rw = _dc.replace(rw, boost=q.boost)
            return rewrite(rw)
        if isinstance(q, BooleanQuery):
            fx = (lambda c: c if isinstance(c, str)
                  else self._expand_mtq_tree(c))
            return BooleanQuery(tuple(fx(c) for c in q.must),
                                tuple(fx(c) for c in q.should),
                                tuple(fx(c) for c in q.must_not),
                                tuple(fx(c) for c in q.filter_),
                                q.field, q.min_should_match, q.boost)
        if isinstance(q, ConstantScoreQuery):
            return ConstantScoreQuery(self._expand_mtq_tree(q.query),
                                      q.field, q.boost)
        if isinstance(q, DisMaxQuery):
            return DisMaxQuery(tuple(c if isinstance(c, str)
                                     else self._expand_mtq_tree(c)
                                     for c in q.terms_),
                               q.field, q.tie_breaker, q.boost)
        return q

    @staticmethod
    def _collect_pairs(q, out: set, parent_field: str = "text"):
        """All leaf (field, term) pairs of a (MTQ-expanded) query tree."""
        if isinstance(q, str):
            out.add((parent_field, q))
        elif isinstance(q, TermQuery):
            out.add((q.field, q.term))
        elif isinstance(q, (AndQuery, OrQuery, PhraseQuery, SynonymQuery,
                            MultiPhraseQuery, CommonTermsQuery)):
            out.update((q.field, t) for t in q.terms)
        elif isinstance(q, BlendedTermQuery):
            out.update((f, t) for f, t, _b in q.pairs)
        elif isinstance(q, TermAutomatonQuery):
            out.update((q.field, t) for p in q.paths for t in p
                       if t is not None)
        elif isinstance(q, StatsTermQuery):
            out.add((q.field, q.term))
        elif isinstance(q, DisMaxQuery):
            for c in q.terms_:
                IndexSearcher._collect_pairs(c, out, q.field)
        elif isinstance(q, BooleanQuery):
            for c in q.must + q.should + q.must_not + q.filter_:
                IndexSearcher._collect_pairs(c, out, q.field)
        elif isinstance(q, ConstantScoreQuery):
            IndexSearcher._collect_pairs(q.query, out, q.field)
        elif isinstance(q, CombinedFieldQuery):
            out.update((f, t) for f, _w in q.fields for t in q.terms)
        elif isinstance(q, MatchAllQuery):
            pass  # no postings leaves
        else:
            raise TypeError(f"cannot collect terms of {type(q)}")

    def _compile_node(self, q, stats: dict, boost_mult: float = 1.0,
                      parent_field: str = "text"):
        """Query tree -> picklable plan node with bound scorers (the
        Weight tree, core:search/Weight.java). Returns None when the
        node provably cannot match (required term absent from the
        corpus). boost_mult is the product of enclosing boosts — boosts
        multiply into leaf weights exactly like Lucene's
        Weight(boost) propagation."""
        C = self._compile_node
        if isinstance(q, str):
            q = TermQuery(q, parent_field)
        if isinstance(q, TermQuery):
            ts = stats.get(q.field, {})
            if q.term not in ts:
                return None
            dc, sttf = self._field_stats(q.field)
            sc = self._sim_for(q.field)(ts[q.term][0], dc, sttf,
                                        boost=boost_mult * q.boost,
                                        ttf=ts[q.term][1])
            return ("term", q.field, q.term, sc)
        if isinstance(q, StatsTermQuery):
            # overridden term stats (FuzzyLikeThisQuery.newTermQuery's
            # artificial TermStates): similarity sees q.df/q.ttf, the
            # postings are the dictionary's
            ts = stats.get(q.field, {})
            if q.term not in ts:
                return None
            dc, sttf = self._field_stats(q.field)
            sc = self._sim_for(q.field)(q.df, dc, sttf,
                                        boost=boost_mult * q.boost,
                                        ttf=q.ttf)
            return ("term", q.field, q.term, sc)
        if isinstance(q, PhraseQuery):
            ts = stats.get(q.field, {})
            if any(t not in ts for t in q.terms):
                return None
            dc, sttf = self._field_stats(q.field)
            idfs = [BM25Scorer(ts[t][0], dc, sttf).idf for t in q.terms]
            sc = _PhraseScorer(idfs, dc, sttf, boost_mult * q.boost)
            return ("phrase", q.field, list(q.terms), sc, q.slop)
        if isinstance(q, MultiPhraseQuery):
            # same plan-node kind as phrase, with tuple slots where a
            # position has alternatives. Weight stats: EVERY present
            # term's statistics feed the similarity — idf is summed
            # over all terms in all slots (MultiPhraseQuery.java
            # MultiPhraseWeight ctor gathers allTermStats). A slot
            # whose every alternative is corpus-absent can never match.
            ts = stats.get(q.field, {})
            slots = []
            for s in q.slots:
                # dict.fromkeys: literal duplicates in a user-built
                # slot would double tf / duplicate kernel positions
                present = tuple(dict.fromkeys(t for t in s if t in ts))
                if not present:
                    return None
                slots.append(present[0] if len(present) == 1 else present)
            dc, sttf = self._field_stats(q.field)
            idfs = [BM25Scorer(ts[t][0], dc, sttf).idf
                    for s in slots
                    for t in ((s,) if isinstance(s, str) else s)]
            sc = _PhraseScorer(idfs, dc, sttf, boost_mult * q.boost)
            return ("phrase", q.field, slots, sc, q.slop)
        if isinstance(q, SynonymQuery):
            ts = stats.get(q.field, {})
            present = [t for t in q.terms if t in ts]
            if not present:
                return None
            dc, sttf = self._field_stats(q.field)
            sc = self._sim_for(q.field)(
                max(ts[t][0] for t in present), dc, sttf,
                boost=boost_mult * q.boost,
                ttf=sum(ts[t][1] for t in present))
            return ("synonym", q.field, present, sc)
        if isinstance(q, TermAutomatonQuery):
            # TermAutomatonWeight gathers TermStatistics for every
            # distinct automaton term with df > 0 and builds ONE
            # summed-idf scorer (TermAutomatonQuery.java
            # TermAutomatonWeight ctor); paths whose term is corpus-
            # absent can never match and are dropped driver-side (the
            # reference's per-segment null enums do this lazily)
            ts = stats.get(q.field, {})
            terms = sorted({t for p in q.paths for t in p
                            if t is not None})
            present = [t for t in terms if t in ts]
            if not present:
                return None
            paths = [list(p) for p in q.paths
                     if all(t is None or t in ts for t in p)]
            if not paths:
                return None
            dc, sttf = self._field_stats(q.field)
            idfs = [BM25Scorer(ts[t][0], dc, sttf).idf for t in present]
            sc = _PhraseScorer(idfs, dc, sttf, boost_mult * q.boost)
            return ("termauto", q.field, paths, sc, present)
        if isinstance(q, AndQuery):
            kids = [C(TermQuery(t, q.field), stats, boost_mult * q.boost)
                    for t in q.terms]
            if any(c is None for c in kids):
                return None
            return ("and", kids)
        if isinstance(q, OrQuery):
            kids = [c for c in
                    (C(TermQuery(t, q.field), stats, boost_mult * q.boost)
                     for t in q.terms) if c is not None]
            if not kids:
                return None
            return ("or", kids)
        if isinstance(q, DisMaxQuery):
            kids = [c for c in
                    (C(cl, stats, boost_mult * q.boost, q.field)
                     for cl in q.terms_) if c is not None]
            if not kids:
                return None
            return ("dismax", kids, q.tie_breaker)
        if isinstance(q, ConstantScoreQuery):
            child = C(q.query, stats, 1.0, q.field)
            if child is None:
                return None
            return ("const", child, boost_mult * q.boost)
        if isinstance(q, CombinedFieldQuery):
            # pseudo term + collection stats blended across fields
            # (core:search/CombinedFieldQuery.java:274-316): df = max
            # over (field, term), ttf / sumTotalTermFreq = weighted sums
            # with Java long truncation per += step, docCount = max
            pairs = []
            df = 0
            ttf = 0
            for f, w in q.fields:
                ts = stats.get(f, {})
                for t in q.terms:
                    if t in ts:
                        pairs.append((f, t, float(w)))
                        df = max(df, ts[t][0])
                        ttf = int(ttf + float(w) * ts[t][1])
            if not pairs:
                return None
            dc = 0
            sttf = 0
            for f, w in q.fields:
                fdc, fsttf = self._field_stats(f)
                dc = max(dc, fdc)
                sttf = int(sttf + float(w) * fsttf)
            sc = self.similarity(df, dc, sttf,
                                 boost=boost_mult * q.boost,
                                 ttf=max(1, ttf))
            norm_fields = tuple((f, float(w)) for f, w in q.fields
                                if f not in self.keyword_fields)
            return ("combined", pairs, sc, norm_fields)
        if isinstance(q, MatchAllQuery):
            # nested MatchAllDocsQuery clause (core:search/
            # MatchAllDocsQuery.java): constant boost for every live doc
            # — evaluated per bucket from the norms row alone
            return ("matchall", boost_mult * q.boost,
                    q.field or parent_field)
        if isinstance(q, CommonTermsQuery):
            # stats-time rewrite (queries/.../CommonTermsQuery.java
            # buildQuery:145-205): classify each term by its actual df
            # against ceil(max_term_frequency * maxDoc) (fractional) or
            # the absolute threshold (>= 1 form); absent terms are
            # low-frequency (termStates == null, :152). Low-freq terms
            # become a required sub-boolean, high-freq an optional one;
            # all-high degrades to a conjunction (:174-182); a single
            # term short-circuits to TermQuery (rewrite, :109-112).
            if not q.terms_:
                return None
            if len(q.terms_) == 1:
                return C(TermQuery(q.terms_[0], q.field, q.boost),
                         stats, boost_mult)
            ts = stats.get(q.field, {})
            max_doc = self.max_doc
            hi, lo = [], []
            for t in q.terms_:
                st = ts.get(t)
                if st is not None and (
                        (q.max_term_frequency >= 1.0
                         and st[0] > q.max_term_frequency)
                        or st[0] > int(math.ceil(
                            q.max_term_frequency * float(max_doc)))):
                    hi.append(t)
                else:
                    lo.append(t)

            def min_nr(f: float, n_opt: int) -> int:
                if f >= 1.0 or f == 0.0:
                    return int(f)
                return int(math.floor(f * n_opt + 0.5))  # Math.round

            low_msm = (min_nr(q.low_freq_msm, len(lo))
                       if q.low_freq_occur == "should" and lo else 0)
            high_msm = (min_nr(q.high_freq_msm, len(hi))
                        if q.high_freq_occur == "should" and hi else 0)
            hi_occur = q.high_freq_occur
            if not lo and high_msm == 0 and hi_occur != "must":
                hi_occur = "must"

            def sub(terms, occur, msm, b):
                tq = tuple(terms)
                return BooleanQuery(
                    must=tq if occur == "must" else (),
                    should=tq if occur == "should" else (),
                    field=q.field, min_should_match=msm, boost=b)

            outer = BooleanQuery(
                must=(sub(lo, q.low_freq_occur, low_msm,
                          q.low_freq_boost),) if lo else (),
                should=(sub(hi, hi_occur, high_msm,
                            q.high_freq_boost),) if hi else (),
                field=q.field, boost=q.boost)
            return C(rewrite(outer), stats, boost_mult)
        if isinstance(q, BlendedTermQuery):
            # artificial blended stats — df = max over all terms' doc
            # freqs, ttf = sum of total term freqs
            # (core:search/BlendedTermQuery.java:271-301 rewrite +
            # adjustFrequencies) — bound into each leaf's similarity,
            # then combined per the rewrite method (:138-190)
            df = 0
            ttf = 0
            present = []
            for f, t, b in q.pairs:
                st = stats.get(f, {}).get(t)
                if st is None:
                    continue  # absent term: matches nothing, blends 0
                df = max(df, st[0])
                ttf += st[1]
                present.append((f, t, b))
            if not present:
                return None
            kids = []
            for f, t, b in present:
                dc, sttf = self._field_stats(f)
                sc = self._sim_for(f)(df, dc, sttf,
                                      boost=boost_mult * q.boost * b,
                                      ttf=max(1, ttf))
                kids.append(("term", f, t, sc))
            if q.rewrite == "boolean":
                return ("bool", [], kids, [], [], 0)
            return ("dismax", kids, q.tie_breaker)
        if isinstance(q, BooleanQuery):
            bm = boost_mult * q.boost
            musts = [C(c, stats, bm, q.field) for c in q.must]
            if any(c is None for c in musts):
                return None
            filters = [C(c, stats, 1.0, q.field) for c in q.filter_]
            if any(c is None for c in filters):
                return None
            shoulds = [c for c in (C(c, stats, bm, q.field)
                                   for c in q.should) if c is not None]
            must_nots = [c for c in (C(c, stats, 1.0, q.field)
                                     for c in q.must_not) if c is not None]
            if not musts and not shoulds:
                return None
            if q.min_should_match > len(shoulds) and (q.should or not musts):
                return None  # msm can never be satisfied
            return ("bool", musts, shoulds, must_nots, filters,
                    q.min_should_match)
        raise TypeError(f"cannot compile {type(q)}")

    def _search_tree(self, query, k: int, pruned: bool = True,
                     doc_filter: str | None = None,
                     mode: str = "topk",
                     after: tuple | None = None) -> DataFrame:
        """Nested-query execution: compile the (rewritten, MTQ-expanded)
        tree driver-side, evaluate it per bucket with the BLOCK-MAX
        PRUNED tree kernel (per-window upper bounds composed bottom-up
        through the tree from the stored impacts — kernels.
        eval_tree_topk; pass pruned=False for the exhaustive oracle
        path), bucket-local top-k, Spark TakeOrderedAndProject merge.

        mode="count": each bucket emits ONE integer (its match count)
        and the plan reduces with a sum — no pandas materialization of
        matches into the result, no global sort (the
        TotalHitCountCollector path, Weight#count fallback).

        mode="matches": every matching (doc_id, score) leaves the
        bucket kernel, unsorted (the exhaustive Scorer iteration that
        consumers like ToParentBlockJoinQuery aggregate further).
        """
        spark = self.spark
        if mode == "count":
            empty = self._memo_df(
                "_count_zero",
                lambda: spark.createDataFrame([(0,)], "n bigint"))
        else:
            empty = self._empty_result()
        q = self._expand_mtq_tree(rewrite(query))
        q = rewrite(q)  # expansion may enable further elision
        pairs: set = set()
        self._collect_pairs(q, pairs, getattr(q, "field", self.field))
        by_field: dict[str, set] = {}
        for f, t in pairs:
            by_field.setdefault(f, set()).add(t)
        stats = {f: self.term_stats(sorted(ts), f)
                 for f, ts in by_field.items()}
        node = self._compile_node(q, stats, 1.0,
                                  getattr(q, "field", self.field))
        if node is None:
            return empty
        present = [(f, t) for f, ts in by_field.items()
                   for t in ts if t in stats[f]]
        # a "matchall" leaf matches docs in buckets holding NO postings
        # for any query term, so the bucket fan-out must be driven by
        # the norms table (every bucket), not the postings join; the
        # block-max pruned path has no windows for a postings-free
        # leaf, so those trees run exhaustively
        has_matchall = node_has_matchall(node)
        if has_matchall:
            pruned = False
        if node_has_termauto(node):
            # the reference's TermAutomatonScorer opts out of dynamic
            # pruning (getMaxScore = Float.MAX_VALUE) — so do we
            pruned = False
        if not present:
            if not has_matchall:
                return empty
            # probe pair no term can hash to: empty frame, right schema,
            # pushed-down partition pruning keeps the scan O(footer)
            present = [("\x00none", "\x00none")]
        chunks_df = (self._postings_for_pairs(present)
                     .select("field", "term", "bucket_id", "blocks"))
        norms_df = self._norms_proj("bucket_id", "base_doc", "norms")
        if has_matchall:
            joined = norms_df.join(chunks_df, "bucket_id", "left")
        else:
            joined = chunks_df.join(norms_df, "bucket_id")
        has_filter = doc_filter is not None
        if has_filter:
            joined = joined.join(self._doc_filter_bitmaps(doc_filter),
                                 "bucket_id")
        joined, has_live = self._attach_live(joined)
        live_docset = IndexSearcher._live_docset
        kw_fields = set(self.keyword_fields)

        def run(chunk_pdf: pd.DataFrame) -> pd.DataFrame:
            res_empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                      "score": pd.Series(dtype="float32")})
            if not len(chunk_pdf):
                return res_empty
            norms_arr = np.frombuffer(bytes(chunk_pdf["norms"].iloc[0]),
                                      dtype=np.uint8)
            base = int(chunk_pdf["base_doc"].iloc[0])
            docset = None
            if has_filter:
                docset = DocSetChunk(bytes(chunk_pdf["doc_bitmap"].iloc[0]),
                                     base, norms_arr.size)
                if docset.n_blocks() == 0:
                    return res_empty
            live_ds = live_docset(chunk_pdf) if has_live else None
            if live_ds is not None and live_ds.n_blocks() == 0:
                return res_empty
            raw = {(f, t): TermChunk(b, [0.0] * len(b))
                   for f, t, b in zip(chunk_pdf["field"], chunk_pdf["term"],
                                      chunk_pdf["blocks"])
                   if f is not None}  # left-join null: chunkless bucket
            universe = None
            if has_matchall and (docset is not None or live_ds is not None):
                # absolute doc ids a matchall leaf may emit in this
                # bucket: the filter bitmap ∩ live docs
                if docset is not None and live_ds is not None:
                    universe = np.intersect1d(docset._docs, live_ds._docs)
                else:
                    universe = (docset if docset is not None
                                else live_ds)._docs
            cache: dict = {}

            def get_chunk(f, t):
                got = cache.get((f, t))
                if got is None:
                    ch = raw.get((f, t))
                    if ch is None:
                        return None
                    if docset is not None:
                        ch = MaskedChunk(ch, docset)
                    if live_ds is not None:
                        ch = MaskedChunk(ch, live_ds)
                    got = cache[(f, t)] = ch
                return got

            ones = np.ones(norms_arr.size, dtype=np.uint8)

            def norms_for(f):
                return ones if f in kw_fields else norms_arr

            if mode == "count":
                # counting must see every match — exhaustive by design
                docs, _ = eval_tree(node, get_chunk, norms_for, base,
                                    universe)
                return pd.DataFrame({"doc_id": np.array([docs.size], np.int64),
                                     "score": np.zeros(1, np.float32)})
            if mode == "matches":
                docs, scores = eval_tree(node, get_chunk, norms_for, base,
                                         universe)
                return pd.DataFrame({"doc_id": docs.astype(np.int64),
                                     "score": scores.astype(np.float32)})
            if pruned:
                docs, scores = eval_tree_topk(node, get_chunk, norms_for,
                                              base, k, after=after)
            else:
                docs, scores = eval_tree(node, get_chunk, norms_for, base,
                                         universe)
                if after is not None:
                    s_a, d_a = np.float32(after[0]), np.int64(after[1])
                    keep = (scores < s_a) | ((scores == s_a) & (docs > d_a))
                    docs, scores = docs[keep], scores[keep]
                docs, scores = topk_select(docs, scores, k)
            return pd.DataFrame({"doc_id": docs.astype(np.int64),
                                 "score": scores.astype(np.float32)})

        per_bucket = (joined.groupBy("bucket_id")
                      .applyInPandas(run, schema=RESULT_SCHEMA))
        if mode == "count":
            # one int per bucket -> global sum; no Sort in this plan
            return per_bucket.agg(
                F.coalesce(F.sum("doc_id"), F.lit(0)).alias("n"))
        if mode == "matches":
            return per_bucket  # unsorted exhaustive match stream
        return (per_bucket
                .orderBy(F.col("score").desc(), F.col("doc_id").asc())
                .limit(k))

    # ---- search ----------------------------------------------------------
    def search_df(self, query, k: int = 10, pruned: bool = True,
                  doc_filter: str | None = None,
                  two_pass: bool = False) -> DataFrame:
        """Public search entry: analyzes query terms once (per-field
        analyzer chains), then runs the plan. See _search_df_impl."""
        return self._search_df_impl(self._analyze_query(query), k, pruned,
                                    doc_filter, two_pass)

    def _search_df_impl(self, query, k: int = 10, pruned: bool = True,
                        doc_filter: str | None = None,
                        two_pass: bool = False) -> DataFrame:
        """Returns the top-k DataFrame (doc_id, score), globally ordered.

        doc_filter: optional SQL predicate over docstore metadata
        columns (BooleanQuery FILTER ≙ semi-join; scores unchanged for
        surviving docs).

        two_pass: cross-partition minCompetitiveScore (the distributed
        MaxScoreAccumulator, core:search/MaxScoreAccumulator.java): a
        cheap first pass scores only the most-promising bucket; its
        k-th score — a true lower bound on the global k-th — is
        broadcast as θ₀ so every other bucket can skip blocks bounded
        below it even before k local hits. Provably rank-safe;
        term/or shapes only."""
        spark = self.spark
        if isinstance(query, MatchAllQuery):
            return self._match_all_df(query.boost, k, doc_filter)
        if isinstance(query, FieldExistsQuery):
            cond = f"({query.field}) IS NOT NULL"
            if doc_filter:
                cond = f"({doc_filter}) AND {cond}"
            return self._match_all_df(query.boost, k, cond)
        if _needs_tree(query):
            rq = rewrite(query)
            if _needs_tree(rq):
                return self._search_tree(rq, k, pruned, doc_filter)
            return self._search_df_impl(rq, k, pruned, doc_filter,
                                        two_pass)
        if isinstance(query, MultiTermQuery):
            expanded = self.expand_terms(query)
            if not expanded:
                return self._empty_result()
            if query.rewrite == "scoring_boolean":
                return self._search_df_impl(
                    OrQuery(tuple(expanded), field=query.field,
                            boost=query.boost), k, pruned, doc_filter)
            return self._constant_score_df(expanded, query, k, doc_filter)
        terms = query.terms
        qtype = _qtype(query)
        tstats = self.term_stats(terms, query.field)
        empty = self._empty_result()
        if qtype in ("and", "phrase") and any(t not in tstats for t in terms):
            return empty  # a required term is absent from the corpus
        if qtype == "boolean" and any(
                t not in tstats for t in list(query.must) + list(query.filter_)):
            return empty
        present = [t for t in terms if t in tstats]
        if not present:
            return empty
        if qtype == "boolean" and not (query.must or
                                       any(t in tstats for t in query.should)):
            return empty
        scorers = self._scorers(query, tstats)
        slop = getattr(query, "slop", 0)
        groups = ((len(query.must), len(query.should), len(query.must_not))
                  if qtype == "boolean" else None)
        msm = query.min_should_match if qtype == "boolean" else 0
        tie = query.tie_breaker if qtype == "dismax" else 0.0

        chunks_df = (self._postings_for(present, query.field)
                     .select("term", "bucket_id", "max_score",
                             "block_max_scores", "blocks"))
        norms_df = self._norms_proj("bucket_id", "base_doc", "norms")
        # Attach the bucket's packed norms to each chunk row: an equi-join
        # on bucket_id (norms rows are small; only buckets that actually
        # contain a query term produce kernel tasks).
        joined = chunks_df.join(norms_df, "bucket_id")
        has_filter = doc_filter is not None
        if has_filter:
            # inner join: buckets with zero allowed docs drop out before
            # any kernel runs (pushed-down metadata pruning)
            joined = joined.join(self._doc_filter_bitmaps(doc_filter),
                                 "bucket_id")
        has_live = self.livedocs_path is not None
        if has_live:
            live_df = self._live_proj("bucket_id", "live")
            joined = joined.join(live_df, "bucket_id", "left")

        term_order = list(terms)
        # per-term scorers for query-time bound recomputation (only the
        # term/or kernels consume block maxima); needed when NRT appends
        # moved the stats, a non-BM25 similarity is plugged in, OR the
        # query carries a boost (baked floats are boost-1.0 BM25 — a
        # boosted score can exceed them, breaking prune rank-safety)
        recompute = (self.nrt_dirty or self.similarity is not BM25Scorer
                     or self._sim_map is not None
                     or float(getattr(query, "boost", 1.0)) != 1.0)
        dirty_scorers = (dict(zip(term_order, scorers))
                         if recompute and qtype in ("term", "or") else None)

        # keyword fields omit norms (Lucene StringField omitNorms):
        # every doc scores at length 1 => norm code 1
        const_norm = query.field in self.keyword_fields

        def make_run(theta0: float):
          def run(chunk_pdf: pd.DataFrame) -> pd.DataFrame:
            if not len(chunk_pdf):
                return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                     "score": pd.Series(dtype="float32")})
            norms_arr = np.frombuffer(bytes(chunk_pdf["norms"].iloc[0]), dtype=np.uint8)
            if const_norm:
                norms_arr = np.ones(norms_arr.size, dtype=np.uint8)
            base = int(chunk_pdf["base_doc"].iloc[0])
            docset = None
            if has_filter:
                docset = DocSetChunk(bytes(chunk_pdf["doc_bitmap"].iloc[0]),
                                     base, norms_arr.size)
                if docset.n_blocks() == 0:
                    return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                         "score": pd.Series(dtype="float32")})
            live_ds = None
            if has_live:
                lb = chunk_pdf["live"].iloc[0]
                if lb is not None:
                    live_ds = DocSetChunk(bytes(lb), base, norms_arr.size)
                    if live_ds.n_blocks() == 0:
                        return pd.DataFrame(
                            {"doc_id": pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="float32")})
            by_term = {}
            for t, bms, blocks in zip(chunk_pdf["term"], chunk_pdf["block_max_scores"],
                                      chunk_pdf["blocks"]):
                if dirty_scorers is not None and dirty_scorers.get(t) is not None:
                    sc = dirty_scorers[t]
                    bms = [float(sc.max_score_for_impacts(
                        np.asarray(b["imp_freqs"]), np.asarray(b["imp_norms"])))
                        for b in blocks]
                ch = TermChunk(blocks, bms)
                if docset is not None:
                    ch = MaskedChunk(ch, docset)
                if live_ds is not None:
                    ch = MaskedChunk(ch, live_ds)
                by_term[t] = ch
            chunks = [by_term.get(t) for t in term_order]
            if qtype == "boolean":
                n_m, n_s, n_n = groups
                docs, scores = boolean_topk(
                    chunks[:n_m], chunks[n_m:n_m + n_s],
                    chunks[n_m + n_s:n_m + n_s + n_n],
                    chunks[n_m + n_s + n_n:],
                    scorers[:n_m], scorers[n_m:n_m + n_s],
                    norms_arr, base, k, min_should_match=msm, pruned=pruned)
            elif qtype == "dismax":
                docs, scores = dismax_topk(chunks, scorers, norms_arr, base,
                                           k, tie_breaker=tie, pruned=pruned)
            else:
                sc = scorers if qtype not in ("phrase", "synonym") else [scorers[0]]
                docs, scores = score_bucket(qtype, chunks, sc, norms_arr, base,
                                            k, pruned=pruned, slop=slop,
                                            theta0=theta0)
            return pd.DataFrame({"doc_id": docs.astype(np.int64),
                                 "score": scores.astype(np.float32)})
          return run

        theta0 = float("-inf")
        if two_pass and pruned and qtype in ("term", "or"):
            # pass A: score only the most-promising bucket (highest sum
            # of chunk maxima); its k-th score lower-bounds the global
            # k-th, so it is a safe cross-partition θ₀
            best = (chunks_df.groupBy("bucket_id")
                    .agg(F.sum("max_score").alias("s"))
                    .orderBy(F.col("s").desc()).limit(1).collect())
            if best:
                b0 = int(best[0]["bucket_id"])
                rows = (joined.filter(F.col("bucket_id") == b0)
                        .groupBy("bucket_id")
                        .applyInPandas(make_run(float("-inf")), RESULT_SCHEMA)
                        .orderBy(F.col("score").desc(), F.col("doc_id"))
                        .limit(k).collect())
                if len(rows) >= k:
                    theta0 = float(rows[-1]["score"])

        per_bucket = (joined.groupBy("bucket_id")
                      .applyInPandas(make_run(theta0), schema=RESULT_SCHEMA))
        return (per_bucket
                .orderBy(F.col("score").desc(), F.col("doc_id").asc())
                .limit(k))

    def _constant_score_df(self, expanded: list, query: MultiTermQuery,
                           k: int, doc_filter: str | None = None) -> DataFrame:
        """CONSTANT_SCORE rewrite: union of expanded postings, fixed
        score, ties by doc_id (no norms/stats needed). doc_filter
        composes exactly like the scored path: per-bucket bitmaps,
        MaskedChunk semi-join."""
        spark = self.spark
        boost = float(query.boost)
        chunks_df = (self._postings_for(expanded, query.field)
                     .select("term", "bucket_id", "block_max_scores", "blocks"))
        norms_df = self._norms_proj("bucket_id", "base_doc",
                                    "num_docs", "norms")
        joined = chunks_df.join(norms_df, "bucket_id")
        has_filter = doc_filter is not None
        if has_filter:
            joined = joined.join(self._doc_filter_bitmaps(doc_filter),
                                 "bucket_id")
        joined, has_live = self._attach_live(joined)
        live_docset = IndexSearcher._live_docset  # avoid capturing self

        def run(chunk_pdf: pd.DataFrame) -> pd.DataFrame:
            if not len(chunk_pdf):
                return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                     "score": pd.Series(dtype="float32")})
            base = int(chunk_pdf["base_doc"].iloc[0])
            live_ds = live_docset(chunk_pdf) if has_live else None
            chunks = [TermChunk(b, bm) for b, bm in
                      zip(chunk_pdf["blocks"], chunk_pdf["block_max_scores"])]
            if has_filter:
                fds = DocSetChunk(bytes(chunk_pdf["doc_bitmap"].iloc[0]),
                                  base, int(chunk_pdf["num_docs"].iloc[0]))
                chunks = [MaskedChunk(c, fds) for c in chunks]
            if live_ds is not None:
                chunks = [MaskedChunk(c, live_ds) for c in chunks]
            docs, scores = constant_or_topk(chunks, boost, None, base, k)
            return pd.DataFrame({"doc_id": docs.astype(np.int64),
                                 "score": scores.astype(np.float32)})

        per_bucket = (joined.groupBy("bucket_id")
                      .applyInPandas(run, schema=RESULT_SCHEMA))
        return (per_bucket
                .orderBy(F.col("score").desc(), F.col("doc_id").asc())
                .limit(k))

    BATCH_SCHEMA = "query_id string, doc_id bigint, score float"

    def search_batch(self, queries: dict, k: int = 10,
                     pruned: bool = True) -> DataFrame:
        """Run MANY queries in ONE Spark job -> (query_id, doc_id, score).

        Amortizes job-scheduling and scan cost across the batch: one
        postings scan over the union of all query terms, one kernel pass
        per bucket evaluating every query against its chunk dict, one
        windowed top-k per query. This is the query-throughput mode —
        per-query latency collapses to scan_time/|batch| (Lucene's
        analog is concurrent searchers over a shared reader).

        queries: {query_id: Query} — every shape, including nested
        BooleanQuery / ConstantScoreQuery / dismax-over-queries (those
        compile to plan trees evaluated by the recursive kernel inside
        the same shared bucket pass).
        """
        from pyspark.sql.window import Window
        spark = self.spark
        # per-field term stats (queries may mix the analyzed text field
        # and keyword fields); nested queries rewrite + expand first so
        # their leaf (field, term) pairs join the shared scan
        flat: dict = {}
        tree: dict = {}
        for qid, q in queries.items():
            q = self._analyze_query(q)
            if _needs_tree(q):
                rq = rewrite(q)
                if _needs_tree(rq):
                    tree[qid] = self._expand_mtq_tree(rq)
                else:
                    flat[qid] = rq
            else:
                flat[qid] = q
        terms_by_field: dict[str, set] = {}
        for q in flat.values():
            f = getattr(q, "field", self.field)
            self._field_stats(f)  # raises on unindexed fields
            terms_by_field.setdefault(f, set()).update(q.terms)
        tree_pairs: set = set()
        for q in tree.values():
            self._collect_pairs(q, tree_pairs,
                                getattr(q, "field", self.field))
        for f, t in tree_pairs:
            self._field_stats(f)
            terms_by_field.setdefault(f, set()).add(t)
        tstats_by_field = {f: self.term_stats(sorted(ts), f)
                           for f, ts in terms_by_field.items()}
        plans = {}
        for qid, q in tree.items():
            node = self._compile_node(q, tstats_by_field, 1.0,
                                      getattr(q, "field", self.field))
            if node is not None:
                if node_has_matchall(node):
                    # the batch fan-out is postings-driven; a matchall
                    # leaf needs every bucket (norms-driven) — only
                    # search_df runs that shape
                    raise ValueError(
                        f"query {qid!r}: matchall clauses are not "
                        "supported in search_batch; use search_df")
                plans[qid] = ("tree", node)
        for qid, q in flat.items():
            qt = _qtype(q)
            fld = getattr(q, "field", self.field)
            tstats = tstats_by_field[fld]
            if qt in ("and", "phrase") and any(t not in tstats for t in q.terms):
                continue
            if qt == "boolean" and any(
                    t not in tstats for t in list(q.must) + list(q.filter_)):
                continue
            if not any(t in tstats for t in q.terms):
                continue
            # term/or pruning consumes block maxima: recompute them from
            # impacts when the baked boost-1.0 BM25 floats are stale
            # (NRT append moved df/avgdl) or don't bound this query's
            # scorer (non-BM25 similarity, boost != 1) — same rank-safety
            # rule as search_df
            rebind = (qt in ("term", "or")
                      and (self.nrt_dirty
                           or self.similarity is not BM25Scorer
                           or self._sim_map is not None
                           or float(getattr(q, "boost", 1.0)) != 1.0))
            plans[qid] = (qt, fld, list(q.terms), self._scorers(q, tstats),
                          getattr(q, "slop", 0),
                          ((len(q.must), len(q.should), len(q.must_not))
                           if qt == "boolean" else None),
                          q.min_should_match if qt == "boolean" else 0,
                          q.tie_breaker if qt == "dismax" else 0.0,
                          rebind,
                          fld in self.keyword_fields)
        if not plans:
            return spark.createDataFrame([], self.BATCH_SCHEMA)
        need = sorted({(p[1], t) for p in plans.values() if p[0] != "tree"
                       for t in p[2] if t in tstats_by_field[p[1]]}
                      | {(f, t) for (f, t) in tree_pairs
                         if t in tstats_by_field[f]})
        chunks_df = (self._postings_for_pairs(need)
                     .select("field", "term", "bucket_id",
                             "block_max_scores", "blocks"))
        norms_df = self._norms_proj("bucket_id", "base_doc", "norms")
        joined = chunks_df.join(norms_df, "bucket_id")
        joined, has_live = self._attach_live(joined)
        live_docset = IndexSearcher._live_docset
        keyword_set = set(self.keyword_fields)

        def run(chunk_pdf: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame({"query_id": pd.Series(dtype="object"),
                                  "doc_id": pd.Series(dtype="int64"),
                                  "score": pd.Series(dtype="float32")})
            if not len(chunk_pdf):
                return empty
            norms_arr = np.frombuffer(bytes(chunk_pdf["norms"].iloc[0]),
                                      dtype=np.uint8)
            ones_arr = None
            base = int(chunk_pdf["base_doc"].iloc[0])
            live_ds = live_docset(chunk_pdf) if has_live else None
            by_term_raw = {(f, t): TermChunk(b, bms)
                           for f, t, bms, b in zip(chunk_pdf["field"],
                                                   chunk_pdf["term"],
                                                   chunk_pdf["block_max_scores"],
                                                   chunk_pdf["blocks"])}

            masked_cache = {}

            def chunk_for(fld, t, scorer=None):
                ch = by_term_raw.get((fld, t))
                if ch is None:
                    return None
                if scorer is not None:
                    ch = ch.rebound(ch.recompute_bounds(scorer))
                    return (MaskedChunk(ch, live_ds)
                            if live_ds is not None else ch)
                got = masked_cache.get((fld, t))
                if got is None:
                    got = masked_cache[(fld, t)] = (
                        MaskedChunk(ch, live_ds)
                        if live_ds is not None else ch)
                return got

            kw_set = keyword_set

            def norms_for(f):
                nonlocal ones_arr
                if f in kw_set:
                    if ones_arr is None:
                        ones_arr = np.ones(norms_arr.size, dtype=np.uint8)
                    return ones_arr
                return norms_arr

            out = []
            for qid, plan in plans.items():
                if plan[0] == "tree":
                    # nested query: block-max pruned tree evaluation
                    # over the shared (field, term) chunk dict (bounds
                    # recomputed from impacts — safe under NRT-dirty /
                    # boosts / any similarity), bucket-local topk
                    if pruned:
                        docs, scores = eval_tree_topk(plan[1], chunk_for,
                                                      norms_for, base, k)
                    else:
                        docs, scores = eval_tree(plan[1], chunk_for,
                                                 norms_for, base)
                        docs, scores = topk_select(docs, scores, k)
                    if docs.size:
                        out.append(pd.DataFrame({
                            "query_id": qid,
                            "doc_id": docs.astype(np.int64),
                            "score": scores.astype(np.float32)}))
                    continue
                (qt, fld, terms, scorers, slop, groups, msm, tie,
                 rebind, const_norm) = plan
                if rebind:
                    chunks = [chunk_for(fld, t, sc)
                              for t, sc in zip(terms, scorers)]
                else:
                    chunks = [chunk_for(fld, t) for t in terms]
                if const_norm:  # keyword field: omitted norms => length 1
                    if ones_arr is None:
                        ones_arr = np.ones(norms_arr.size, dtype=np.uint8)
                    narr = ones_arr
                else:
                    narr = norms_arr
                if qt == "boolean":
                    n_m, n_s, n_n = groups
                    docs, scores = boolean_topk(
                        chunks[:n_m], chunks[n_m:n_m + n_s],
                        chunks[n_m + n_s:n_m + n_s + n_n],
                        chunks[n_m + n_s + n_n:],
                        scorers[:n_m], scorers[n_m:n_m + n_s],
                        narr, base, k, min_should_match=msm,
                        pruned=pruned)
                elif qt == "dismax":
                    docs, scores = dismax_topk(chunks, scorers, narr,
                                               base, k, tie_breaker=tie,
                                               pruned=pruned)
                else:
                    if qt in ("and", "phrase") and any(c is None for c in chunks):
                        continue
                    sc = scorers if qt not in ("phrase", "synonym") else [scorers[0]]
                    docs, scores = score_bucket(qt, chunks, sc, narr,
                                                base, k, pruned=pruned,
                                                slop=slop)
                if docs.size:
                    out.append(pd.DataFrame({
                        "query_id": qid,
                        "doc_id": docs.astype(np.int64),
                        "score": scores.astype(np.float32)}))
            return pd.concat(out) if out else empty

        per_bucket = (joined.groupBy("bucket_id")
                      .applyInPandas(run, schema=self.BATCH_SCHEMA))
        w = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("doc_id").asc())
        return (per_bucket.withColumn("_rk", F.row_number().over(w))
                .filter(F.col("_rk") <= k).drop("_rk"))

    def search(self, query, k: int = 10, pruned: bool = True,
               doc_filter: str | None = None, two_pass: bool = False) -> list:
        """Returns [(doc_id, float32 score)] — the TopDocs."""
        return [(int(r["doc_id"]), np.float32(r["score"]))
                for r in self.search_df(query, k, pruned, doc_filter,
                                        two_pass).collect()]

    def search_after_df(self, query, after: tuple, k: int = 10,
                        doc_filter: str | None = None) -> DataFrame:
        """Deep paging (IndexSearcher.searchAfter,
        core:search/IndexSearcher.java): the top-k hits strictly AFTER
        the cursor in (score desc, doc asc) order. ``after`` is a hit
        as returned by search(): (doc_id, score) — pass the last hit of
        the previous page. MatchAll/FieldExists page through the
        norms-table path (the cursor reduces to a doc_id bound under a
        constant score); every other shape runs through the tree
        evaluator (the cursor filter applies before the bucket-local
        top-k, so no page can lose hits to a bucket whose pre-cursor
        hits crowd out its local heap)."""
        doc_id, score = int(after[0]), float(after[1])
        if isinstance(query, (MatchAllQuery, FieldExistsQuery)):
            cond = doc_filter
            if isinstance(query, FieldExistsQuery):
                cond = f"({query.field}) IS NOT NULL"
                if doc_filter:
                    cond = f"({doc_filter}) AND {cond}"
            return self._match_all_df(query.boost, k, cond,
                                      after=(score, doc_id))
        return self._search_tree(rewrite(self._analyze_query(query)), k,
                                 doc_filter=doc_filter,
                                 after=(score, doc_id))

    def search_after(self, query, after: tuple, k: int = 10,
                     doc_filter: str | None = None) -> list:
        return [(int(r["doc_id"]), np.float32(r["score"]))
                for r in self.search_after_df(query, after, k,
                                              doc_filter).collect()]

    def suggest(self, pattern: str, kind: str = "prefix", n: int = 5,
                field: str | None = None, max_edits: int = 1,
                transpositions: bool = True) -> DataFrame:
        """Suggest-module analogs over the term dictionary, weighted by
        total term frequency: 'prefix' (the WFST completion shape,
        suggest/.../analyzing/AnalyzingSuggester.java), 'infix'
        (AnalyzingInfixSuggester.java:97 — contains matching, pushed
        down into the termstats parquet scan), 'fuzzy'
        (FuzzySuggester.java — the same banded-length pushdown +
        levenshtein threshold FuzzyQuery expansion uses). Returns
        (term, weight) top-n by (weight desc, term asc); the top-n is a
        TakeOrderedAndProject over the pushed-down scan — the term
        dictionary never materializes driver-side."""
        f = field or self.field
        ts = self._termstats_df(F.col("field") == f)
        if kind == "prefix":
            cond = F.col("term").startswith(pattern)
        elif kind == "infix":
            cond = F.col("term").contains(pattern)
        elif kind == "fuzzy":
            cond = F.length("term").between(len(pattern) - max_edits,
                                            len(pattern) + max_edits)
            if transpositions:
                # FuzzySuggester parity: the suggester's automaton is
                # built with transpositions=true by default
                # (FuzzySuggester.java DEFAULT_TRANSPOSITIONS)
                from ..kernels.osa import osa_leq_udf
                cond = cond & osa_leq_udf(pattern,
                                          max_edits)(F.col("term"))
            else:
                cond = cond & (F.levenshtein(F.col("term"),
                                             F.lit(pattern)) <= max_edits)
        else:
            raise ValueError(f"unknown suggest kind {kind!r}")
        return (ts.filter(cond)
                .select("term", F.col("ttf").alias("weight"))
                .orderBy(F.col("weight").desc(), F.col("term").asc())
                .limit(n))

    def fuzzy_like_this(self, query_text: str, field: str | None = None,
                        max_edits: int = 1, prefix_length: int = 0,
                        max_num_terms: int = 50,
                        max_variants_per_term: int = 50,
                        ignore_tf: bool = False):
        """FuzzyLikeThisQuery (sandbox/src/java/org/apache/lucene/
        sandbox/queries/FuzzyLikeThisQuery.java): fuzz each analyzed
        query term against the dictionary and rank docs by the best
        variants. Reference semantics, step for step (addTerms:
        variant boost = 1 for an exact match else 1 - ed/min codepoint
        length, the FuzzyTermsEnum boost; variant score = boost² ×
        ClassicSimilarity.idf(df, numDocs) with df = the SOURCE term's
        df, or the INTEGER average of variant dfs when the source is
        corpus-absent; per-term top max_variants_per_term, global top
        max_num_terms; rewrite: SHOULD-groups per source term whose
        leaves are TermQuerys with ARTIFICIAL df = ttf = 1 boosted by
        the variant score — :261-277 — or constant-score when
        ignoreTF).

        The variant expansion is ONE pushed-down OSA dictionary scan
        per distinct query term (expand_terms' fuzzy path — the
        length-banded executor scan standing in for FuzzyTermsEnum's
        automaton walk); prefix_length filters like the enum's prefix.
        Returns a PreAnalyzed query for search_df/count/matches_df."""
        import math

        from ..kernels.osa import osa_distance
        from ..kernels.tokenizer import analyze_one

        f = field or self.field
        toks = analyze_one(query_text, self._field_chain(f))
        dc, _ = self._field_stats(f)
        scored: list = []
        for qt in dict.fromkeys(toks):
            cands = self.expand_terms(MultiTermQuery(
                "fuzzy", qt, f, max_edits=max_edits, transpositions=True))
            if prefix_length:
                cands = [c for c in cands
                         if c.startswith(qt[:prefix_length])]
            if not cands:
                continue
            st = self.term_stats(sorted(set(cands) | {qt}), f)
            df_src = st.get(qt, (0,))[0]
            rows = []
            tot_vdf = 0
            for v in cands:
                ed = osa_distance(qt, v)
                boost = (1.0 if ed == 0
                         else 1.0 - ed / min(len(qt), len(v)))
                rows.append((v, boost))
                tot_vdf += st.get(v, (0,))[0]
            df_used = df_src if df_src > 0 else tot_vdf // len(rows)
            idf = math.log((dc + 1) / (df_used + 1)) + 1.0
            rows.sort(key=lambda r: (-r[1], r[0]))
            for v, boost in rows[:max_variants_per_term]:
                scored.append((boost * boost * idf, qt, v))
        scored.sort(key=lambda r: (-r[0], r[1], r[2]))
        by_src: dict = {}
        for sc_, qt, v in scored[:max_num_terms]:
            by_src.setdefault(qt, []).append((v, sc_))

        def leaf(v, sc_):
            if ignore_tf:
                return ConstantScoreQuery(TermQuery(v, f), f, boost=sc_)
            return StatsTermQuery(v, f, df=1, ttf=1, boost=sc_)

        clauses = []
        for qt in dict.fromkeys(toks):
            vs = by_src.get(qt)
            if not vs:
                continue
            if len(vs) == 1:
                clauses.append(leaf(*vs[0]))
            else:
                clauses.append(BooleanQuery(
                    should=tuple(leaf(v, s) for v, s in vs), field=f))
        return PreAnalyzed(BooleanQuery(should=tuple(clauses), field=f))

    WORD_BREAK_SCHEMA = "suggestion string, n_changes int, freq bigint"

    def word_break_suggest(self, word: str, n: int = 5,
                           max_changes: int = 1,
                           min_break_length: int = 1, min_freq: int = 1,
                           field: str | None = None,
                           mode: str = "not_in_index") -> DataFrame:
        """WordBreakSpellChecker.suggestWordBreaks (suggest/src/java/
        org/apache/lucene/search/spell/WordBreakSpellChecker.java:74,
        250-330): break one (likely misspelled-compound) word into
        dictionary words. Every candidate substring — O(len²), a few
        hundred strings — is fetched in ONE batched term-dictionary
        lookup (the Spark-shaped replacement for the reference's
        per-substring TermsEnum seeks), then the reference's
        breadth-first bisect recursion runs driver-side over the freq
        map: phase 1 records bisects whose halves both reach the
        frequency floor; phase 2 recurses on the right side of valid
        left splits while the break budget (maxChanges) lasts.

        mode: 'not_in_index' (suggest only when the word has df 0, the
        reference default) | 'more_popular' (parts must reach the
        word's own df) | 'always'. Returns top-``n``
        (suggestion = space-joined parts, n_changes, freq = max part
        df) by (n_changes asc, freq desc, suggestion asc) — the
        NUM_CHANGES_THEN_MAX_FREQUENCY sort."""
        f = field or self.field
        empty = self.spark.createDataFrame([], self.WORD_BREAK_SCHEMA)
        orig = self.term_stats([word], f).get(word, (0,))[0]
        if mode == "not_in_index" and orig > 0:
            return empty
        floor = max(orig, 1) if mode == "more_popular" else min_freq
        mbl = max(min_break_length, 1)
        L = len(word)
        if L < 2 * mbl:
            return empty
        subs = sorted({word[i:j] for i in range(L)
                       for j in range(i + 1, L + 1)
                       if j - i >= mbl and j - i < L})
        stats = self.term_stats(subs, f)
        df_of = {t: stats.get(t, (0,))[0] for t in subs}
        results: list = []

        def rec(rest: str, parts: list, breaks: int):
            if len(rest) < 2 * mbl:
                return
            valid_left = []
            for i in range(mbl, len(rest) - mbl + 1):
                left, right = rest[:i], rest[i:]
                if df_of.get(left, 0) >= floor:
                    valid_left.append(i)
                    if df_of.get(right, 0) >= floor:
                        results.append(parts + [left, right])
            if breaks + 1 > max_changes:
                return
            for i in valid_left:
                rec(rest[i:], parts + [rest[:i]], breaks + 1)

        rec(word, [], 1)
        rows = [(" ".join(p), len(p) - 1,
                 max(df_of.get(x, 0) for x in p)) for p in results]
        rows.sort(key=lambda r: (r[1], -r[2], r[0]))
        return self.spark.createDataFrame(rows[:n],
                                          self.WORD_BREAK_SCHEMA)

    def word_combine_suggest(self, terms: list, n: int = 5,
                             max_changes: int = 1, min_freq: int = 1,
                             field: str | None = None,
                             mode: str = "not_in_index") -> DataFrame:
        """WordBreakSpellChecker.suggestWordCombinations (:148-238):
        combine runs of adjacent query terms into one dictionary word
        ("vec tor" -> "vector"). Runs span at most max_changes + 1
        terms; all run concatenations AND the original terms resolve
        through one batched dictionary lookup. mode gates per the
        reference: 'not_in_index' needs at least one run member with
        df 0; 'more_popular' needs the combination's df to reach the
        run's max member df; combined df must reach min_freq. Returns
        top-``n`` (suggestion, n_changes = run length - 1, freq =
        combined df) by (n_changes asc, freq desc, suggestion asc)."""
        f = field or self.field
        runs = []
        for i in range(len(terms) - 1):
            for j in range(i + 1, min(len(terms), i + 1 + max_changes)):
                runs.append((i, j, "".join(terms[i:j + 1])))
        lookup = sorted({w for _i, _j, w in runs} | set(terms))
        stats = self.term_stats(lookup, f)
        df_of = {t: stats.get(t, (0,))[0] for t in lookup}
        rows = []
        for i, j, w in runs:
            member = [df_of[t] for t in terms[i:j + 1]]
            cdf = df_of[w]
            if mode == "not_in_index" and min(member) > 0:
                continue
            if mode == "more_popular" and cdf < max(member):
                continue
            if cdf >= min_freq:
                rows.append((w, j - i, cdf))
        rows.sort(key=lambda r: (r[1], -r[2], r[0]))
        return self.spark.createDataFrame(rows[:n],
                                          self.WORD_BREAK_SCHEMA)

    def spell_suggest(self, term: str, n: int = 5, max_edits: int = 2,
                      field: str | None = None, min_prefix: int = 1,
                      min_query_length: int = 4,
                      max_query_frequency: float = 0.01,
                      threshold_frequency: int = 0,
                      mode: str = "not_in_index") -> DataFrame:
        """DirectSpellChecker analog ("did you mean", suggest/src/java/
        org/apache/lucene/search/spell/DirectSpellChecker.java):
        dictionary terms within ``max_edits`` OSA distance of the query
        term (the class's LuceneLevenshteinDistance counts a
        transposition as one edit), sharing the first ``min_prefix``
        chars, ranked by (similarity desc, df desc, term asc) where
        similarity = 1 - dist / min(|term|, |candidate|) — the
        SuggestWordQueue default comparator with the default distance.

        Gates, mirroring suggestSimilar: a query shorter than
        ``min_query_length`` gets no suggestions; a query whose df
        exceeds ceil(max_query_frequency * docCount) is considered
        correctly spelled; ``mode`` = 'not_in_index' (default — suggest
        only when the term has df 0), 'more_popular' (candidates must
        have df > the query's df), or 'always'. ``threshold_frequency``
        drops rare candidates.

        The candidate scan is the same pushed-down termstats path the
        fuzzy suggester uses: length band + prefix predicates reach the
        parquet scan; OSA distances run batch-vectorized on executors;
        the top-n is a TakeOrderedAndProject."""
        import math
        f = field or self.field
        if len(term) < min_query_length:
            return self.spark.createDataFrame(
                [], "term string, df bigint, dist int, score double")
        ts_q = self.term_stats([term], f)
        qdf = ts_q.get(term, (0,))[0]
        dc, _ = self._field_stats(f)
        if qdf > math.ceil(max_query_frequency * dc):
            return self.spark.createDataFrame(
                [], "term string, df bigint, dist int, score double")
        if mode == "not_in_index" and qdf > 0:
            return self.spark.createDataFrame(
                [], "term string, df bigint, dist int, score double")
        from ..kernels.osa import osa_dist_udf
        k_ = int(max_edits)
        _osa_d = osa_dist_udf(term)

        ts = self._termstats_df(F.col("field") == f)
        cond = (F.length("term").between(len(term) - k_,
                                         len(term) + k_)
                & (F.col("term") != term))
        if min_prefix > 0:
            cond = cond & F.col("term").startswith(term[:min_prefix])
        if threshold_frequency > 0:
            cond = cond & (F.col("df") >= threshold_frequency)
        if mode == "more_popular":
            cond = cond & (F.col("df") > qdf)
        out = (ts.filter(cond)
               .withColumn("dist", _osa_d(F.col("term")))
               .filter(F.col("dist") <= k_)
               .withColumn("score",
                           1.0 - F.col("dist")
                           / F.least(F.lit(len(term)), F.length("term"))
                           .cast("double"))
               .select("term", "df", "dist", "score")
               .orderBy(F.col("score").desc(), F.col("df").desc(),
                        F.col("term").asc())
               .limit(n))
        return out

    def sort_search_df(self, query, by, k: int = 10,
                       desc: bool = True, after: tuple | None = None,
                       doc_filter: str | None = None,
                       metadata: DataFrame | None = None) -> DataFrame:
        """TopFieldCollector analog with MULTI-field sort, missing-value
        substitution, and field-sort searchAfter paging
        (core:search/TopFieldCollector.java create(sort, n, after, ...);
        Sort.java multi-SortField; SortField.setMissingValue).

        ``by``: a column name (direction from ``desc``), or a list of
        sort specs — each a column name (descending), or a tuple
        (col, 'asc'|'desc') or (col, 'asc'|'desc', missing_value).
        ``missing_value`` substitutes for NULL before comparison (the
        setMissingValue contract); without it, NULLs sort LAST in
        either direction (documented deviation: the reference defaults
        missing to the type's 0/MIN). Ties always break doc_id asc.

        ``after`` = (v1, ..., vn, doc_id) — one value per sort spec,
        the last hit of the previous page; the cursor is the strict
        lexicographic after-predicate, applied BEFORE the top-k so no
        page can lose hits to another bucket's heap. NULL key values
        page consistently with the nulls-last order: they count as
        after every non-null cursor value, and a NULL cursor value
        (the previous page ended inside the NULL tail) continues
        through the remaining NULL rows.

        Plan shape: exhaustive match stream -> equi-join with the
        (doc_id, cols...) projection of the docstore (or a caller-
        provided ``metadata`` doc-values table) -> cursor predicate ->
        global orderBy(...).limit(k), planned by Catalyst as
        TakeOrderedAndProject (per-partition partial top-k before the
        single-reduce merge — the TopFieldCollector merge)."""
        specs = self._sort_specs(by, desc)
        m = self.matches_df(query, doc_filter).select("doc_id")
        ds = (metadata if metadata is not None
              else self._read_cached(self.docstore_paths))
        cols = [c for c, _, _ in specs]
        j = m.join(ds.select("doc_id", *cols), "doc_id")
        keys = []
        order = []
        for c, is_desc, miss in specs:
            e = (F.coalesce(F.col(c), F.lit(miss)) if miss is not None
                 else F.col(c))
            keys.append((e, is_desc, miss))
            order.append(e.desc_nulls_last() if is_desc
                         else e.asc_nulls_last())
        order.append(F.col("doc_id").asc())
        if after is not None:
            vals = list(after[:-1])
            if len(vals) != len(specs):
                raise ValueError(
                    f"cursor has {len(vals)} values for {len(specs)} "
                    "sort fields (pass (v1, ..., vn, doc_id))")
            pred = F.col("doc_id") > F.lit(int(after[-1]))
            for (e, is_desc, miss), v in reversed(list(zip(keys, vals))):
                if v is None:
                    if miss is not None:
                        v = miss
                    else:
                        # cursor sits inside this key's NULL tail
                        # (NULLs sort last): nothing is strictly after
                        # by this key; the page continues through the
                        # other NULL rows ordered by the lower keys
                        pred = e.isNull() & pred
                        continue
                strict = (e < F.lit(v)) if is_desc else (e > F.lit(v))
                if miss is None:
                    # no missing-value substitute -> NULLs sort last in
                    # BOTH directions, i.e. strictly after every
                    # non-null cursor value; without this the NULL-key
                    # tail would vanish from every page after the first
                    strict = strict | e.isNull()
                pred = strict | (e.eqNullSafe(F.lit(v)) & pred)
            j = j.filter(pred)
        return j.orderBy(*order).limit(k)

    @staticmethod
    def _sort_specs(by, desc: bool) -> list:
        """Normalize the ``by`` surface to [(col, desc_bool, missing)]."""
        if isinstance(by, str):
            return [(by, bool(desc), None)]
        specs = []
        for s in by:
            if isinstance(s, str):
                specs.append((s, True, None))
            else:
                col = s[0]
                d = s[1] if len(s) > 1 else "desc"
                if d not in ("asc", "desc"):
                    raise ValueError(f"direction must be asc|desc: {d!r}")
                miss = s[2] if len(s) > 2 else None
                specs.append((col, d == "desc", miss))
        return specs

    def explain(self, query, doc_id: int) -> dict:
        """Score explanation for one (query, doc) — the Weight.explain
        analog (core:search/TermQuery.java explain path): per-term tf,
        norm code, decoded length, idf, weight and sub-score, plus the
        combined score. Debug API (several tiny jobs; not a hot path)."""
        analyzed = self._analyze_query(query)
        out = self._explain_flat(analyzed, doc_id)
        if "reason" in out:
            return out
        # the TOTAL always comes from the engine's own match stream —
        # Explanation.getValue() == scorer.score() for every shape.
        # For term/and/or sums the flat decomposition below equals it;
        # for phrase/synonym freq scoring, msm/must_not booleans, and
        # tree shapes (nested booleans, boosted or artificial-stats
        # leaves, const/dismax/combined wrappers) it does not, so those
        # keep the per-term table as isolated contributions and carry a
        # method marker.
        m = (self.matches_df(query)
             .filter(F.col("doc_id") == doc_id).collect())
        flat_total = out["score"]
        out["matches"] = bool(m)
        out["score"] = float(m[0]["score"]) if m else 0.0
        if abs(out["score"] - flat_total) > 1e-3 * max(
                1.0, abs(out["score"])):
            out["method"] = ("engine: score from the match kernels; "
                             "per-term entries are isolated "
                             "flat-term contributions")
        return out

    def _explain_flat(self, query, doc_id: int) -> dict:
        terms = query.terms
        field = getattr(query, "field", self.field)
        tstats = self.term_stats(terms, field)
        doc_count, sum_ttf = self._field_stats(field)
        row = (self._read_cached(self.docstore_paths)
               .filter(F.col("doc_id") == doc_id)
               .select("norm", "token_count").collect())
        if not row:
            return {"doc_id": doc_id, "matches": False, "reason": "no such doc"}
        norm = 1 if field in self.keyword_fields else int(row[0]["norm"])
        out = {"doc_id": doc_id, "matches": False, "norm": norm,
               "token_count": int(row[0]["token_count"]),
               "doc_count": doc_count, "avgdl": float(
                   np.float64(sum_ttf) / doc_count), "terms": {}}
        total = np.float64(0.0)
        for t in terms:
            if t not in tstats:
                out["terms"][t] = {"df": 0, "tf": 0, "score": 0.0}
                continue
            tf_rows = (self.term_postings(t, field)
                       .filter(F.col("doc_id") == doc_id).collect())
            tf = int(tf_rows[0]["tf"]) if tf_rows else 0
            # the searcher's pluggable similarity, not hardcoded BM25 —
            # explanations must agree with actual scores (per-field map
            # included)
            sc = self._sim_for(field)(tstats[t][0], doc_count, sum_ttf,
                                      boost=query.boost, ttf=tstats[t][1])
            s = float(sc.score(np.array([tf]), np.array([norm]))[0]) if tf else 0.0
            out["terms"][t] = {"df": tstats[t][0], "tf": tf,
                               "idf": float(sc.idf), "weight": float(sc.weight),
                               "score": s}
            if tf:
                total += np.float64(np.float32(s))
        out["matches"] = any(v["tf"] > 0 for v in out["terms"].values())
        out["score"] = float(np.float32(total))
        return out

    def count_df(self, query, doc_filter: str | None = None) -> DataFrame:
        """Per-bucket match counts summed into one row (n bigint) —
        the general count plan: no top-k heap, no global sort, one int
        leaves each bucket kernel. MatchAll/FieldExists count from the
        docstore/bitmaps (no postings, no term collection)."""
        if isinstance(query, (MatchAllQuery, FieldExistsQuery)):
            cond = (None if isinstance(query, MatchAllQuery)
                    else f"({query.field}) IS NOT NULL")
            if doc_filter:
                cond = f"({doc_filter}) AND ({cond})" if cond else doc_filter
            if self.livedocs_path is not None:
                n = self._bitmap_count(cond)
            elif cond is None:
                n = self.doc_count
            else:
                n = self._read_cached(self.docstore_paths) \
                    .filter(cond).count()
            return self.spark.createDataFrame([(n,)], "n bigint")
        return self._search_tree(self._analyze_query(query), k=0,
                                 doc_filter=doc_filter, mode="count")

    def count(self, query) -> int:
        """TotalHitCountCollector analog. Single term uses the df shortcut
        (Weight#count, core:search/TermQuery.java:260) — no postings read.
        The shortcut is disabled when deletes exist, exactly like the
        reference (count() falls back when liveDocs != null). Every
        other shape runs the per-bucket count kernel + sum (count_df) —
        previously this sorted the entire match set just to count it."""
        query = self._analyze_query(query)
        if isinstance(query, TermQuery):
            if self.livedocs_path is None:
                ts = self.term_stats([query.term], query.field)
                return ts.get(query.term, (0,))[0]
            return self.term_postings(query.term, query.field).count()
        if isinstance(query, (MatchAllQuery, FieldExistsQuery)):
            cond = (None if isinstance(query, MatchAllQuery)
                    else f"({query.field}) IS NOT NULL")
            if self.livedocs_path is None:
                if cond is None:
                    return self.doc_count
                return self._read_cached(self.docstore_paths) \
                    .filter(cond).count()
            return self._bitmap_count(cond)
        row = self.count_df(query).collect()
        return int(row[0]["n"]) if row else 0

    def _bitmap_count(self, doc_filter: str | None) -> int:
        """Popcount of (filter bitmap AND live bitmap) per bucket,
        summed — counting under deletes without materializing docs."""
        spark = self.spark
        nm = self._norms_proj("bucket_id", "num_docs")
        if doc_filter is not None:
            nm = nm.join(self._doc_filter_bitmaps(doc_filter), "bucket_id")
        live_df = self._live_proj("bucket_id", "live")
        nm = nm.join(live_df, "bucket_id", "left")
        has_filter = doc_filter is not None

        # byte-popcount LUT; bitmaps are packbits output, so bits past
        # num_docs are zero-padded and whole-buffer popcount is exact
        popc = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                             axis=1).sum(axis=1).astype(np.int64)

        def cnt(batches):
            for pdf in batches:
                nd = pdf["num_docs"].to_numpy(np.int64)
                live = pdf["live"]
                filt = pdf["doc_bitmap"] if has_filter else None
                plain = 0
                parts = []  # O(1) buffer handles per row; popcount is
                # ONE LUT pass over the batch-stacked bytes
                for i in range(len(pdf)):
                    f = filt.iloc[i] if has_filter else None
                    lv = live.iloc[i]
                    if f is None and lv is None:
                        plain += int(nd[i])
                    elif f is not None and lv is not None:
                        parts.append(np.frombuffer(bytes(f), np.uint8)
                                     & np.frombuffer(bytes(lv), np.uint8))
                    else:
                        parts.append(np.frombuffer(
                            bytes(f if f is not None else lv), np.uint8))
                bits = (int(popc[np.concatenate(parts)].sum())
                        if parts else 0)
                yield pd.DataFrame({"n": [plain + bits]})

        row = nm.mapInPandas(cnt, "n bigint").agg(
            F.coalesce(F.sum("n"), F.lit(0))).collect()[0]
        return int(row[0])

    def term_postings(self, term: str, field: str = "text") -> DataFrame:
        """Decode the full posting list of one term -> (doc_id, tf).

        The postings scan is pushed down on (field, term) — parquet
        min/max stats prune chunks the way the term dictionary seeks
        (core:search/TermQuery.java:120-164's postings() iteration)."""
        term = self._analyze_terms([term], field)[0]
        chunks_df = (self._postings_for([term], field)
                     .select("bucket_id", "blocks"))
        has_live = self.livedocs_path is not None
        if has_live:
            live_df = self._live_proj("bucket_id", "base_doc",
                                      "num_docs", "live")
            chunks_df = chunks_df.join(live_df, "bucket_id", "left")

        def run(batches):
            # one output frame per Arrow batch (not per bucket row):
            # the per-row work is the vectorized block decode itself
            for pdf in batches:
                ds, fs = [], []
                for row in pdf.itertuples(index=False):
                    ch = TermChunk(row.blocks, [0.0] * len(row.blocks))
                    if has_live and getattr(row, "live", None) is not None:
                        ch = MaskedChunk(ch, DocSetChunk(
                            bytes(row.live), int(row.base_doc),
                            int(row.num_docs)))
                    docs, tfs = ch.decode_all()
                    ds.append(docs)
                    fs.append(tfs)
                if ds:
                    yield pd.DataFrame(
                        {"doc_id": np.concatenate(ds).astype(np.int64),
                         "tf": np.concatenate(fs).astype(np.int32)})

        return chunks_df.mapInPandas(run, schema=POSTING_SCHEMA)

    def terms_postings(self, terms: list,
                       field: str = "text") -> DataFrame:
        """Batched multi-term decode -> (term, doc_id, tf): ONE
        pushed-down chunk scan + Arrow block decode for the whole term
        set, live docs masked — term_postings generalized so callers
        (classifiers, the SimpleText export) never loop jobs per term.
        ``terms`` are INDEX terms (a dictionary-level API, like the
        MTQ pattern convention — no analysis applied)."""
        chunks_df = (self._postings_for(list(terms), field)
                     .select("term", "bucket_id", "blocks"))
        has_live = self.livedocs_path is not None
        if has_live:
            live_df = self._live_proj("bucket_id", "base_doc",
                                      "num_docs", "live")
            chunks_df = chunks_df.join(live_df, "bucket_id", "left")

        def run(batches):
            for pdf in batches:
                ts, ds, fs = [], [], []
                for row in pdf.itertuples(index=False):
                    ch = TermChunk(row.blocks, [0.0] * len(row.blocks))
                    if has_live and getattr(row, "live", None) is not None:
                        ch = MaskedChunk(ch, DocSetChunk(
                            bytes(row.live), int(row.base_doc),
                            int(row.num_docs)))
                    docs, tfs = ch.decode_all()
                    ts.append(np.full(docs.size, row.term, dtype=object))
                    ds.append(docs)
                    fs.append(tfs)
                if ds:
                    yield pd.DataFrame(
                        {"term": np.concatenate(ts),
                         "doc_id": np.concatenate(ds).astype(np.int64),
                         "tf": np.concatenate(fs).astype(np.int64)})

        return chunks_df.mapInPandas(
            run, schema="term string, doc_id bigint, tf bigint")

    def term_vectors(self, doc_ids, field: str = "text") -> DataFrame:
        """Per-document term vectors -> (doc_id, term, freq, positions):
        the per-doc mini inverted index of IndexReader.getTermVector
        (core:index/TermVectors.java, codecs/lucene90/
        Lucene90CompressingTermVectorsReader.java).

        The reference persists a second copy of every document's terms
        at index time; at 100 TB that doubles the hot store. Here the
        docstore already keeps the stored field and the analyzer chain
        is persisted in the commit manifest, so the vector is
        reconstructed by a PUSHED-DOWN point scan + the SAME analyzer —
        identical output (the chain is deterministic), no second copy.
        Positions are post-chain token indices, consistent with the
        indexed positions the phrase kernels consume. Keyword fields
        are untokenized single terms (FieldType stored-only semantics).
        Batched: one analyze_series pass per Arrow batch."""
        ids = [int(d) for d in doc_ids]
        # any stored non-text column is an untokenized single term
        # (keyword semantics) whether or not it was indexed as one
        is_kw = field in self.keyword_fields or field != self.field
        col = field if is_kw else "text"
        an = "standard" if is_kw else self.analyzers.get(field, "standard")
        ds = (self._read_cached(self.docstore_paths)
              .filter(F.col("doc_id").isin(ids))
              .select("doc_id", F.col(col).alias("text")))

        def run(batches):
            from ..kernels.tokenizer import analyze_series
            for pdf in batches:
                if is_kw:
                    keep = pdf["text"].notna()
                    yield pd.DataFrame({
                        "doc_id": pdf["doc_id"][keep].astype("int64"),
                        "term": pdf["text"][keep].astype(str),
                        "freq": np.int32(1),
                        "positions": [[0]] * int(keep.sum())})
                    continue
                toks = analyze_series(pdf["text"], an)
                d_out, t_out, f_out, p_out = [], [], [], []
                for d, ts in zip(pdf["doc_id"], toks):
                    inv: dict = {}
                    for i, t in enumerate(ts):
                        inv.setdefault(t, []).append(i)
                    for t in sorted(inv):
                        d_out.append(d)
                        t_out.append(t)
                        f_out.append(len(inv[t]))
                        p_out.append(inv[t])
                yield pd.DataFrame({
                    "doc_id": pd.Series(d_out, dtype="int64"),
                    "term": pd.Series(t_out, dtype=object),
                    "freq": pd.Series(f_out, dtype="int32"),
                    "positions": pd.Series(p_out, dtype=object)})

        return ds.mapInPandas(run, schema=TERM_VECTOR_SCHEMA)

    def phrase_matches(self, terms: list, field: str = "text",
                       slop: int = 0) -> DataFrame:
        """All docs containing the phrase -> (doc_id, freq); slop=0 is
        exact (ExactPhraseMatcher semantics), slop>0 is ordered-sloppy
        (see kernels.phrase_freqs)."""
        spark = self.spark
        terms = self._analyze_terms(list(terms), field)
        tstats = self.term_stats(terms, field)
        if any(t not in tstats for t in terms):
            return spark.createDataFrame([], PHRASE_SCHEMA)
        chunks_df = (self._postings_for(list(terms), field)
                     .select("term", "bucket_id", "blocks"))
        chunks_df, has_live = self._attach_live(chunks_df)
        term_order = list(terms)
        live_docset = IndexSearcher._live_docset

        def run(pdf: pd.DataFrame) -> pd.DataFrame:
            by_term = {t: TermChunk(b, [0.0] * len(b))
                       for t, b in zip(pdf["term"], pdf["blocks"])}
            chunks = [by_term.get(t) for t in term_order]
            if any(c is None for c in chunks):
                return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                     "freq": pd.Series(dtype="int32")})
            live_ds = live_docset(pdf) if has_live else None
            if live_ds is not None:
                chunks = [MaskedChunk(c, live_ds) for c in chunks]
            docs, freqs = phrase_freqs(chunks, pruned=True, slop=slop)
            return pd.DataFrame({"doc_id": docs.astype(np.int64),
                                 "freq": freqs.astype(np.int32)})

        return (chunks_df.groupBy("bucket_id")
                .applyInPandas(run, schema=PHRASE_SCHEMA))

    def interval_matches(self, terms: list, max_gaps: int,
                         field: str = "text") -> DataFrame:
        """Unordered interval query (queries/intervals Intervals.unordered
        + maxgaps analog): docs where one occurrence of EVERY term fits
        in a window with at most max_gaps intervening positions.
        Returns (doc_id, span) with span = minimal window gap count."""
        spark = self.spark
        terms = self._analyze_terms(list(terms), field)
        tstats = self.term_stats(terms, field)
        if any(t not in tstats for t in terms):
            return spark.createDataFrame([], "doc_id bigint, span int")
        chunks_df = (self._postings_for(list(terms), field)
                     .select("term", "bucket_id", "blocks"))
        chunks_df, has_live = self._attach_live(chunks_df)
        term_order = list(terms)
        live_docset = IndexSearcher._live_docset

        def run(pdf: pd.DataFrame) -> pd.DataFrame:
            from .kernels import min_span_freqs
            by_term = {t: TermChunk(b, [0.0] * len(b))
                       for t, b in zip(pdf["term"], pdf["blocks"])}
            chunks = [by_term.get(t) for t in term_order]
            if any(c is None for c in chunks):
                return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                     "span": pd.Series(dtype="int32")})
            live_ds = live_docset(pdf) if has_live else None
            if live_ds is not None:
                chunks = [MaskedChunk(c, live_ds) for c in chunks]
            docs, spans = min_span_freqs(chunks, pruned=True)
            keep = spans <= max_gaps
            return pd.DataFrame({"doc_id": docs[keep].astype(np.int64),
                                 "span": spans[keep].astype(np.int32)})

        return (chunks_df.groupBy("bucket_id")
                .applyInPandas(run, "doc_id bigint, span int"))

    INTERVAL_SCHEMA = "doc_id bigint, n_intervals int, min_width int"

    def interval_search(self, source, field: str = "text") -> DataFrame:
        """Interval algebra query (queries/intervals Intervals.java):
        evaluate a composable IntervalsSource (Ordered / Unordered /
        MaxGaps / MaxWidth / Containing / NotContaining / ContainedBy /
        NotContainedBy over Term / Or / Phrase / Prefix leaves) -> one
        row per matching doc with the interval count and minimal width.

        Prefix leaves are resolved against the term dictionary first
        (Intervals.prefix rewrite). Candidate docs are the conjunction
        of the source's REQUIRED terms (pushed-down postings scan), or
        the union of leaf docs when no term is required (top-level Or);
        interval evaluation is the vectorized minimal-interval kernel
        (no per-doc loops)."""
        from .intervals import (candidate_docs, leaf_terms, map_terms,
                                match_bucket, required_terms,
                                resolve_prefixes)
        spark = self.spark
        an = self._field_chain(field)
        if an != "standard":
            from ..kernels.tokenizer import analyze_term
            source = map_terms(source, lambda t: analyze_term(t, an))
        source = resolve_prefixes(
            source, lambda p, mx: self.expand_terms(
                MultiTermQuery("prefix", p, field, max_expansions=mx)))
        req = sorted(required_terms(source))
        leaves = sorted(leaf_terms(source))
        tstats = self.term_stats(leaves, field)
        if any(t not in tstats for t in req) or not leaves:
            return spark.createDataFrame([], self.INTERVAL_SCHEMA)
        present = [t for t in leaves if t in tstats]
        if not present:
            return spark.createDataFrame([], self.INTERVAL_SCHEMA)
        chunks_df = (self._postings_for(present, field)
                     .select("term", "bucket_id", "blocks"))
        chunks_df, has_live = self._attach_live(chunks_df)
        live_docset = IndexSearcher._live_docset
        src = source

        def run(pdf: pd.DataFrame) -> pd.DataFrame:
            by_term = {t: TermChunk(b, [0.0] * len(b))
                       for t, b in zip(pdf["term"], pdf["blocks"])}
            live_ds = live_docset(pdf) if has_live else None
            if live_ds is not None:
                by_term = {t: MaskedChunk(c, live_ds)
                           for t, c in by_term.items()}
            cand = candidate_docs(src, by_term)
            docs, n, w = match_bucket(src, by_term, cand)
            return pd.DataFrame({"doc_id": docs.astype(np.int64),
                                 "n_intervals": n.astype(np.int32),
                                 "min_width": w.astype(np.int32)})

        return (chunks_df.groupBy("bucket_id")
                .applyInPandas(run, schema=self.INTERVAL_SCHEMA))

    def matches_df(self, query, doc_filter: str | None = None) -> DataFrame:
        """ALL matching (doc_id, score) of any query shape, unsorted —
        the exhaustive Scorer stream consumed by aggregating operators
        (block join, percolation joins). One kernel pass per bucket,
        no top-k heap, no global sort."""
        return self._search_tree(rewrite(self._analyze_query(query)), k=0,
                                 doc_filter=doc_filter, mode="matches")

    BLOCK_JOIN_SCHEMA = "conv_id string, score float, n_children int"

    def block_join_search(self, child_query, k: int = 10,
                          score_mode: str = "max",
                          doc_filter: str | None = None) -> DataFrame:
        """ToParentBlockJoinQuery: score PARENT conversations by their
        matching child turns (join/src/java/org/apache/lucene/search/
        join/ToParentBlockJoinQuery.java:68, BlockJoinScorer score
        modes). Turns of one conversation are a contiguous doc block by
        construction (conv-contiguous buckets ≙ Lucene doc blocks from
        IndexWriter.addDocuments), and the parent key is the stored
        conv_id, so the rollup is a declarative join + aggregate that
        Catalyst executes with map-side partial aggregation:

          score_mode: 'max' | 'total' | 'avg' | 'min'  (child scores
          combined in double, cast to float — BlockJoinScorer's
          double accumulation), or 'none' (parent matches if any child
          does; constant score 0, ordered by conv_id).

        Returns top-k (conv_id, score, n_children) by (score desc,
        conv_id asc)."""
        per = self._parent_rollup(child_query, score_mode, doc_filter)
        if score_mode == "none":
            return per.orderBy(F.col("conv_id").asc()).limit(k)
        return (per.orderBy(F.col("score").desc(), F.col("conv_id").asc())
                .limit(k))

    def _parent_rollup(self, child_query, score_mode: str,
                       doc_filter: str | None) -> DataFrame:
        """Per-conversation (conv_id, score, n_children) rollup of a
        child query's exhaustive match stream — the BlockJoinScorer
        child-score combination shared by both join directions. ONE
        map-side-combined aggregate keyed on conv_id."""
        m = self.matches_df(child_query, doc_filter)
        ds = self._read_cached(self.docstore_paths) \
            .select("doc_id", "conv_id")
        joined = m.join(ds, "doc_id")
        if score_mode == "none":
            return (joined.groupBy("conv_id")
                    .agg(F.count("*").alias("n_children"))
                    .select("conv_id",
                            F.lit(0.0).cast("float").alias("score"),
                            F.col("n_children").cast("int")))
        agg = {"max": F.max, "total": F.sum, "avg": F.avg,
               "min": F.min}[score_mode]
        return (joined.groupBy("conv_id")
                .agg(agg(F.col("score").cast("double")).alias("_s"),
                     F.count("*").alias("n_children"))
                .select("conv_id", F.col("_s").cast("float").alias("score"),
                        F.col("n_children").cast("int")))

    TO_CHILD_SCHEMA = "doc_id bigint, conv_id string, score float"

    def to_child_join_search(self, parent_query, k: int = 10,
                             parent_score_mode: str = "max",
                             doc_filter: str | None = None) -> DataFrame:
        """ToChildBlockJoinQuery (join/src/java/org/apache/lucene/
        search/join/ToChildBlockJoinQuery.java:47): joins in REVERSE —
        the parent query's hits hand their score DOWN to every child
        doc of the matching parent (ToChildBlockJoinScorer.score
        returns parentScore; parents themselves are never emitted).

        Parents here are conversations (the doc-block model:
        conv-contiguous buckets ≙ IndexWriter.addDocuments blocks), so
        the parent query is a child-level query rolled up to
        conversation scores with ``parent_score_mode`` (the nested
        ToChild(ToParent(q)) shape the reference tests exercise), and
        the join down is one hash join from the conversation-count-
        sized parent score table to the docstore on conv_id — AQE
        turns it into a broadcast join when few parents match; the
        child corpus never shuffles. ``doc_filter`` restricts the
        PARENT query's evaluation (the reference's filter placement);
        emitted children are every turn of a matching conversation.

        Returns top-k (doc_id, conv_id, score) by (score desc, doc_id
        asc); parent_score_mode='none' gives constant 0 scores ordered
        by doc_id asc like the reference's ScoreMode.None."""
        par = (self._parent_rollup(parent_query, parent_score_mode,
                                   doc_filter)
               .select("conv_id", "score"))
        ds = self._read_cached(self.docstore_paths) \
            .select("doc_id", "conv_id")
        out = ds.join(par, "conv_id").select("doc_id", "conv_id", "score")
        if parent_score_mode == "none":
            return out.orderBy(F.col("doc_id").asc()).limit(k)
        return (out.orderBy(F.col("score").desc(), F.col("doc_id").asc())
                .limit(k))

    def covering_search(self, queries: list, min_match_expr: str,
                        k: int = 10,
                        doc_filter: str | None = None) -> DataFrame:
        """CoveringQuery (sandbox/src/java/org/apache/lucene/sandbox/
        search/CoveringQuery.java): matches documents where at least
        ``minimumNumberMatch(doc)`` of the sub-queries match — the
        per-DOCUMENT minimum-should-match. ``min_match_expr`` is a SQL
        expression over docstore metadata columns (the LongValuesSource
        analog, e.g. a doc-values column name or any Catalyst long
        expression). Reference semantics (CoveringScorer.java:129-140,
        208-216): values below 1 are clamped to 1 (at least one clause
        must match); documents with a NULL value never match; the score
        is the SUM of the matching sub-queries' scores (double
        accumulation, float cast — the SHOULD combination).

        Plan shape: one exhaustive kernel match stream per sub-query,
        unioned, then ONE map-side-combined aggregate keyed on doc_id
        (count + score sum) joined to the docstore's metadata scan for
        the per-doc minimum — no per-row Python, and the corpus scan
        happens once per sub-query exactly like the reference's one
        DISI per clause. Returns top-k (doc_id, n_matches, score) by
        (score desc, doc_id asc)."""
        if not queries:
            raise ValueError("CoveringQuery requires at least one "
                             "sub-query")
        parts = [self.matches_df(q, doc_filter).select("doc_id", "score")
                 for q in queries]
        allm = parts[0]
        for p in parts[1:]:
            allm = allm.unionByName(p)
        per = (allm.groupBy("doc_id")
               .agg(F.count("*").alias("n_matches"),
                    F.sum(F.col("score").cast("double")).alias("_s")))
        mins = (self._read_cached(self.docstore_paths)
                .select("doc_id",
                        F.expr(min_match_expr).cast("long").alias("_mm")))
        out = (per.join(mins, "doc_id")
               .filter(F.col("_mm").isNotNull()
                       & (F.col("n_matches")
                          >= F.greatest(F.col("_mm"), F.lit(1))))
               .select("doc_id", F.col("n_matches").cast("int"),
                       F.col("_s").cast("float").alias("score")))
        return (out.orderBy(F.col("score").desc(), F.col("doc_id").asc())
                .limit(k))

    def join_search(self, from_query, from_field: str, to_field: str,
                    k: int = 10, score_mode: str = "none",
                    to_docs: DataFrame | None = None,
                    doc_filter: str | None = None) -> DataFrame:
        """Query-time cross-index term join (JoinUtil.createJoinQuery,
        join/src/java/org/apache/lucene/join/JoinUtil.java:66): run
        ``from_query`` on THIS index, collect the matching docs'
        ``from_field`` values, and match documents whose ``to_field``
        holds one of those values — in this index's docstore or in a
        caller-provided ``to_docs`` doc-values table (the two-index
        surface). Per-value scores aggregate over the from-side hits by
        ``score_mode``: 'none' (constant 1, the reference default) |
        'max' | 'total' | 'avg' | 'min' (TermsWithScoreCollector's
        modes); to-side docs inherit their value's score.

        Plan shape: from-side exhaustive match stream -> join doc
        values -> ONE map-side-combined aggregate to a per-value score
        table (bounded by the from side's distinct values, metadata-
        sized for categorical fields) -> BROADCAST hash join against
        the to-side scan — the to-side corpus never shuffles. Returns
        top-k (doc_id, score) by (score desc, doc_id asc)."""
        m = self.matches_df(from_query, doc_filter)
        ds = (self._read_cached(self.docstore_paths)
              .select("doc_id", from_field))
        joined = m.join(ds, "doc_id")
        if score_mode == "none":
            vals = (joined.select(from_field).distinct()
                    .select(F.col(from_field).alias("_jv"),
                            F.lit(1.0).cast("float").alias("score")))
        else:
            agg = {"max": F.max, "total": F.sum, "avg": F.avg,
                   "min": F.min}[score_mode]
            vals = (joined.groupBy(from_field)
                    .agg(agg(F.col("score").cast("double")).alias("_s"))
                    .select(F.col(from_field).alias("_jv"),
                            F.col("_s").cast("float").alias("score")))
        to = (to_docs if to_docs is not None
              else self._read_cached(self.docstore_paths))
        out = (to.select("doc_id", F.col(to_field).alias("_jv"))
               .join(F.broadcast(vals), "_jv")
               .select("doc_id", "score"))
        return (out.orderBy(F.col("score").desc(), F.col("doc_id").asc())
                .limit(k))

    def phrase_wildcard(self, slots: list, field: str = "text",
                        slop: int = 0, max_expansions: int = 128):
        """PhraseWildcardQuery (sandbox/src/java/org/apache/lucene/
        sandbox/search/PhraseWildcardQuery.java): a phrase where any
        slot may be a MultiTermQuery ("slow f*"). Each MTQ slot expands
        against the term dictionary (the reference expands segment-by-
        segment with cost-based pruning; here the dictionary seek /
        pushed-down scan of expand_terms is the cost control), then the
        whole phrase runs as MultiPhraseQuery — union positions per
        slot, idf summed over every expanded term, PhraseQuery
        freq/slop semantics. Returns the rewritten query (PreAnalyzed:
        expanded terms already match the dictionary)."""
        import dataclasses
        out = []
        for s in slots:
            if isinstance(s, MultiTermQuery):
                if s.field != field or s.max_expansions != max_expansions:
                    s = dataclasses.replace(
                        s, field=field, max_expansions=max_expansions)
                terms = self.expand_terms(s)
                if not terms:
                    # a slot with no dictionary match kills the phrase
                    # (the reference's segment match comes up empty);
                    # "\x00" can never be a token, so the phrase is a
                    # guaranteed dictionary miss
                    return PreAnalyzed(MultiPhraseQuery(
                        (("\x00",),), field, slop))
                out.append(tuple(terms))
            elif isinstance(s, (tuple, list)):
                out.append(tuple(self._analyze_terms(list(s), field)))
            else:
                out.append(tuple(self._analyze_terms([s], field)))
        q = MultiPhraseQuery(tuple(out), field, slop)
        return PreAnalyzed(q) if self._needs_analysis else q

    def function_score_df(self, query, expr: str, k: int = 10) -> DataFrame:
        """FunctionScoreQuery (queries/src/java/org/apache/lucene/
        queries/function/FunctionScoreQuery.java): match ``query``,
        REPLACE each hit's score with a DoubleValuesSource — here a
        Catalyst expression over ``score`` (the original BM25 value)
        and any docstore column (boostByValue/boostByQuery compose as
        arithmetic inside the expression). Unlike rescore(), which
        re-orders a first-pass top-N, the function ranks the FULL
        match stream: the reference collects by the function value, so
        BM25 block-max pruning cannot apply; the exhaustive match
        stream joins doc values and ONE TakeOrdered returns the top-k
        by the new score. Returns (doc_id, score)."""
        m = self.matches_df(query)
        ds = self._read_cached(self.docstore_paths)
        j = ds.join(m, "doc_id", "inner")
        return (j.withColumn("_fs", F.expr(expr).cast("double"))
                .select("doc_id", F.col("_fs").alias("score"))
                .orderBy(F.col("score").desc(), F.col("doc_id").asc())
                .limit(k))

    def diversified_search(self, query, key_field: str,
                           max_per_key: int, k: int = 10) -> DataFrame:
        """Diversity-controlled top-k (misc/src/java/org/apache/lucene/
        misc/search/DiversifiedTopDocsCollector.java): at most
        ``max_per_key`` hits per ``key_field`` value in the final
        top-k — "no more than 3 results per retailer". The reference's
        one-pass per-key eviction heap selects exactly the greedy
        score-order result, which distributes as: rank hits WITHIN
        each key (score desc, doc_id asc), drop ranks beyond the
        quota, then one global TakeOrdered — the per-key window
        shuffles on the key, the quota cut happens before anything
        global, and only quota survivors reach the final top-k.
        NULL keys are unconstrained (no doc-values entry to dedup on).
        Returns (doc_id, score, key)."""
        from pyspark.sql.window import Window
        m = self.matches_df(query)
        ds = (self._read_cached(self.docstore_paths)
              .select("doc_id", F.col(key_field).alias("key")))
        j = m.join(ds, "doc_id")
        w = (Window.partitionBy("key")
             .orderBy(F.col("score").desc(), F.col("doc_id").asc()))
        capped = (j.withColumn("_rk", F.row_number().over(w))
                  .filter(F.col("key").isNull()
                          | (F.col("_rk") <= max_per_key))
                  .drop("_rk"))
        return (capped.orderBy(F.col("score").desc(),
                               F.col("doc_id").asc()).limit(k))

    def grouped_search(self, query, group_field: str, k_groups: int = 10,
                       docs_per_group: int = 3,
                       doc_filter: str | None = None) -> DataFrame:
        """TopGroups search (grouping/src/java/org/apache/lucene/search/
        grouping/FirstPassGroupingCollector.java + TopGroupsCollector):
        the top ``k_groups`` groups ranked by their best hit's score
        (Sort.RELEVANCE group sort; ties group value asc), each carrying
        its top ``docs_per_group`` hits — the reference's two collector
        passes over one index scan.

        Spark-first single plan: ONE exhaustive match stream joined to
        the group doc-values column, a per-group window rank keeps the
        within-group top docs (the shuffle partitions on the group key,
        so the quota cut is local), the group heads reduce map-side to
        (group, max score), and the k_groups cut is a broadcast
        semi-join — no second scan of the postings. NULL group values
        form their own group (the reference's null group head).
        Returns (grp, group_score, doc_id, score, grp_rank) ordered by
        (group_score desc, grp asc, grp_rank asc)."""
        from pyspark.sql.window import Window
        m = self.matches_df(query, doc_filter)
        ds = (self._read_cached(self.docstore_paths)
              .select("doc_id", F.col(group_field).alias("grp")))
        j = m.join(ds, "doc_id")
        w = (Window.partitionBy("grp")
             .orderBy(F.col("score").desc(), F.col("doc_id").asc()))
        ranked = (j.withColumn("grp_rank", F.row_number().over(w))
                  .withColumn("group_score",
                              F.max("score").over(Window.partitionBy("grp")))
                  .filter(F.col("grp_rank") <= docs_per_group))
        heads = (j.groupBy("grp")
                 .agg(F.max("score").alias("gs"))
                 .orderBy(F.col("gs").desc(), F.col("grp").asc_nulls_last())
                 .limit(k_groups)
                 .select("grp"))
        # null-safe semi-join: the null group head must survive the cut
        # (a plain equi-join on grp drops NULL keys)
        heads = F.broadcast(heads.withColumnRenamed("grp", "_hgrp"))
        return (ranked.join(heads,
                            ranked["grp"].eqNullSafe(heads["_hgrp"]),
                            "inner")
                .select("grp", "group_score", "doc_id", "score", "grp_rank")
                .orderBy(F.col("group_score").desc(),
                         F.col("grp").asc_nulls_last(),
                         F.col("grp_rank").asc()))

    def _grouped_matches(self, query, group_field: str,
                         doc_filter: str | None = None) -> DataFrame:
        """(doc_id, score, grp) — one match stream joined to the
        group's doc-values column (shared by the grouping collectors)."""
        m = self.matches_df(query, doc_filter)
        ds = (self._read_cached(self.docstore_paths)
              .select("doc_id", F.col(group_field).alias("grp")))
        return m.join(ds, "doc_id")

    def all_groups(self, query, group_field: str,
                   doc_filter: str | None = None) -> DataFrame:
        """AllGroupsCollector (grouping/.../AllGroupsCollector.java):
        every distinct group value among the matching docs — the
        reference's getGroups()/getGroupCount() surface, with the doc
        count per group carried alongside (a documented extension: the
        map-side-combined aggregate produces it for free). NULL group
        values form their own group like the reference's null head.
        One scan, one partial-agg shuffle on the group key."""
        return (self._grouped_matches(query, group_field, doc_filter)
                .groupBy("grp").agg(F.count("*").alias("n_docs")))

    def group_heads(self, query, group_field: str,
                    by: str | None = None, desc: bool = True,
                    metadata: DataFrame | None = None,
                    doc_filter: str | None = None) -> DataFrame:
        """AllGroupHeadsCollector (grouping/.../
        AllGroupHeadsCollector.java): the single most-competitive doc
        per group — Sort.RELEVANCE by default (score desc, doc order
        tie like the reference's 'compare, else keep earlier doc'), or
        a doc-values field sort when ``by`` names a metadata column.
        Returns (grp, doc_id, score): the retrieveGroupHeads bitset
        plus each head's score. ONE per-group window cut — the shuffle
        partitions on the group key, no driver-side head map."""
        from pyspark.sql.window import Window
        j = self._grouped_matches(query, group_field, doc_filter)
        if by is not None:
            md = (metadata if metadata is not None
                  else self._read_cached(self.docstore_paths))
            j = j.join(md.select("doc_id", by), "doc_id", "left")
            key = F.col(by).desc() if desc else F.col(by).asc()
        else:
            key = F.col("score").desc()
        w = Window.partitionBy("grp").orderBy(key, F.col("doc_id").asc())
        return (j.withColumn("_r", F.row_number().over(w))
                .filter(F.col("_r") == 1)
                .select("grp", "doc_id", "score"))

    def distinct_values(self, query, group_field: str, count_field: str,
                        k_groups: int = 10,
                        doc_filter: str | None = None) -> DataFrame:
        """DistinctValuesCollector (grouping/.../
        DistinctValuesCollector.java): for the top ``k_groups`` groups
        of the first pass (group sort = relevance of the group head,
        ties group asc — FirstPassGroupingCollector), the DISTINCT
        values of ``count_field`` within each group. Returns
        (grp, values sorted-array, has_null, n_distinct): like the
        reference's TermDistinctValuesCollector, a doc WITHOUT a value
        contributes null to the group's uniqueValues (counted in
        n_distinct, surfaced as has_null; the array itself holds the
        non-null values). The first-pass cut is a broadcast semi-join
        against the same match stream — one postings scan total."""
        j = self._grouped_matches(query, group_field, doc_filter)
        ds = (self._read_cached(self.docstore_paths)
              .select("doc_id", F.col(count_field).alias("cv")))
        j = j.join(ds, "doc_id")
        heads = (j.groupBy("grp").agg(F.max("score").alias("gs"))
                 .orderBy(F.col("gs").desc(), F.col("grp").asc_nulls_last())
                 .limit(k_groups).select(F.col("grp").alias("_hgrp")))
        heads = F.broadcast(heads)
        return (j.join(heads, j["grp"].eqNullSafe(heads["_hgrp"]), "inner")
                .groupBy("grp")
                .agg(F.sort_array(F.collect_set("cv")).alias("values"),
                     F.max(F.col("cv").isNull()).alias("has_null"),
                     (F.count_distinct("cv")
                      + F.max(F.col("cv").isNull().cast("long"))
                      ).alias("n_distinct")))

    def group_facets(self, query, group_field: str, facet_field: str,
                     n: int = 10,
                     doc_filter: str | None = None) -> DataFrame:
        """TermGroupFacetCollector (grouping/.../
        GroupFacetCollector.java): facet counts where each GROUP
        contributes at most once per facet value — the count of
        distinct groups containing the value among matching docs.
        Returns the top ``n`` (facet_value, n_groups) by (count desc,
        value asc). Docs WITHOUT a facet value are excluded from the
        rows like the reference (they feed getTotalMissingCount, not a
        facet entry). Distinct (group, facet) pairs reduce map-side
        before the facet aggregate — two partial-agg exchanges, no
        per-group state on the driver."""
        ds = (self._read_cached(self.docstore_paths)
              .select("doc_id", F.col(facet_field).alias("fv")))
        pairs = (self._grouped_matches(query, group_field, doc_filter)
                 .join(ds, "doc_id")
                 .filter(F.col("fv").isNotNull())
                 .select("grp", "fv").distinct())
        return (pairs.groupBy("fv")
                .agg(F.count("*").alias("n_groups"))
                .orderBy(F.col("n_groups").desc(), F.col("fv").asc())
                .limit(n))

    DV_STATS_SCHEMA = ("count bigint, missing bigint, vmin bigint, "
                       "vmax bigint, vsum bigint, mean double, "
                       "variance double, stdev double")

    def docvalues_stats(self, query, field: str,
                        metadata: DataFrame | None = None) -> DataFrame:
        """DocValuesStatsCollector (misc/.../DocValuesStatsCollector.java
        + DocValuesStats.java): single-pass numeric stats over a
        doc-values field for the matching docs — count (docs WITH a
        value), missing, min, max, sum, mean, POPULATION variance
        (DocValuesStats.variance() divides by count) and stdev.
        min/max/sum/mean are NULL at count 0 (the reference leaves them
        'undefined'). One match stream + one map-side-combined global
        aggregate; Welford's online update commutes with Spark's
        partial aggregation, so var_pop is the same quantity."""
        md = (metadata if metadata is not None
              else self._read_cached(self.docstore_paths))
        j = (self.matches_df(query).select("doc_id")
             .join(md.select("doc_id", F.col(field).alias("v")), "doc_id",
                   "left"))
        return j.agg(
            F.count("v").alias("count"),
            (F.count("*") - F.count("v")).alias("missing"),
            F.min("v").alias("vmin"),
            F.max("v").alias("vmax"),
            F.sum("v").alias("vsum"),
            F.avg("v").alias("mean"),
            F.coalesce(F.var_pop("v"), F.lit(0.0)).alias("variance"),
            F.coalesce(F.sqrt(F.var_pop("v")), F.lit(0.0)).alias("stdev"))

    def more_like_this(self, doc_id: int, max_terms: int = 10,
                       min_tf: int = 1, min_df: int = 2):
        """MoreLikeThis (queries/mlt/.../MoreLikeThis.java:123): build an
        OR query from the document's most interesting terms ranked by
        tf·idf (ties: term asc), excluding ultra-rare terms (min_df)
        like the reference's minDocFreq gate. Returns the OrQuery (run
        it with search_df; the source doc itself will usually rank
        first, exclude it client-side like the reference suggests)."""
        import math
        # per-doc term freqs: re-analyze the stored text (the reference
        # re-tokenizes the document's fields the same way)
        row = (self._read_cached(self.docstore_paths)
               .filter(F.col("doc_id") == doc_id)
               .select("text").collect())
        if not row:
            raise ValueError(f"no such doc {doc_id}")
        from ..kernels.tokenizer import analyze_one
        from collections import Counter
        an = (self.analyzers.get(self.field, "standard")
              if self.field not in self.keyword_fields else "standard")
        tfs = Counter(analyze_one(row[0]["text"] or "", an))
        terms = [t for t, f in tfs.items() if f >= min_tf]
        stats = self.term_stats(terms, self.field)
        dc, _ = self._field_stats(self.field)
        scored = []
        for t in terms:
            if t not in stats or stats[t][0] < min_df:
                continue
            idf = math.log(1.0 + (dc - stats[t][0] + 0.5)
                           / (stats[t][0] + 0.5))
            scored.append((-tfs[t] * idf, t))
        scored.sort()
        sel = tuple(t for _, t in scored[:max_terms])
        if not sel:
            raise ValueError(f"doc {doc_id} has no usable MLT terms")
        q = OrQuery(sel, self.field)
        # terms came from the (analyzed) index vocabulary — protect them
        # from the entry-point analysis pass (stems aren't idempotent)
        return PreAnalyzed(q) if self._needs_analysis else q

    def rescore(self, topk_df: DataFrame, expr: str, k: int = 10,
                score_col: str = "new_score") -> DataFrame:
        """Second-pass re-ranking (QueryRescorer,
        core:search/QueryRescorer.java / Rescorer.java): join the
        first-pass top-N back to the docstore's native columns and
        re-order by a Catalyst expression over ``score`` + any doc
        column (whole-stage codegen; the top-N side is broadcast).
        Returns (doc_id, score, new_score) ordered by the new score."""
        ds = self._read_cached(self.docstore_paths)
        joined = ds.join(F.broadcast(topk_df), "doc_id", "inner")
        return (joined
                .withColumn(score_col, F.expr(expr).cast("double"))
                .select("doc_id", "score", score_col)
                .orderBy(F.col(score_col).desc(), F.col("doc_id").asc())
                .limit(k))

    def retrieve(self, topk_df: DataFrame) -> DataFrame:
        """Stored-fields retrieval: join top-k doc_ids back to the docstore
        (broadcast the tiny top-k side, not the corpus)."""
        ds = self._read_cached(self.docstore_paths)
        return ds.join(F.broadcast(topk_df), "doc_id", "inner")

    def high_freq_terms(self, n: int = 20, field: str | None = None,
                        by: str = "df") -> DataFrame:
        """Top-n terms of one field ordered by document frequency or
        total term frequency — the HighFreqTerms diagnostic tool
        (misc/src/java/org/apache/lucene/misc/HighFreqTerms.java:37-71:
        getHighFreqTerms orders by docFreq, or by totalTermFreq with
        -t, via a TermStatsQueue over every TermsEnum). Here the term
        dictionary IS a table, so the whole tool is one pushed-down
        termstats scan + TakeOrderedAndProject: (term, df, ttf) desc
        by ``by``, ties term asc. Multi-generation NRT dictionaries
        aggregate per (field, term) first like every termstats read."""
        if by not in ("df", "ttf"):
            raise ValueError(f"by must be 'df' or 'ttf', got {by!r}")
        field = field or self.field
        return (self._termstats_df(F.col("field") == field)
                .select("term", F.col("df").cast("long").alias("df"),
                        F.col("ttf").cast("long").alias("ttf"))
                .orderBy(F.col(by).desc(), F.col("term"))
                .limit(n))
