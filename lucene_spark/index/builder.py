"""Index build pipeline: transcripts DataFrame -> inverted-index tables.

Spark-first re-expression of Lucene's write path (SURVEY.md §3.2):

  DWPT / segment      -> one *bucket* = one contiguous global doc_id range
                         = one Spark task's output (DocumentsWriterPerThread
                         .flush, core:index/DocumentsWriterPerThread.java:406)
  IndexingChain.invert-> vectorized tokenize + factorize + lexsort kernel
                         inside applyInPandas (IndexingChain.java:553,1175)
  FreqProx sort+flush -> per-bucket (term, doc) sort + block encode
                         (FreqProxTermsWriter.java:83-135,
                         Lucene104PostingsWriter.java:389-470)
  computeNorm         -> SmallFloat.intToByte4(token_count)
                         (Similarity.java:153-163)
  SegmentMerger.merge -> range-shuffle of (term, bucket) chunks into a
                         globally sorted term dictionary; docID remap is
                         offset-free because doc_ids are global from the
                         start (DocIDMerger.java:32-60 made unnecessary)
  segments_N commit   -> IndexCatalog.commit per stage
  FlushByRam policy   -> num_buckets controls per-kernel working set

Skew (SURVEY.md §4.3): the term dictionary shuffle is *naturally salted*
by bucket_id — a hot Zipf-head term contributes one chunk per bucket, so
``repartitionByRange(term, bucket_id)`` spreads it over many partitions
while keeping the global (term, bucket_id) sort order. No single reducer
ever sees more than one bucket's postings for one term. Aggregations
(termstats) rely on Spark's map-side partial aggregation + AQE.

Checkpoint-resume: buckets are processed in waves; every completed bucket
appends a ``lineage`` row and every completed stage publishes a catalog
commit. A killed build rerun skips committed stages and lineage-complete
buckets; partially written bucket directories are overwritten
idempotently (dynamic partition overwrite).
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..kernels import codec
from ..kernels.bm25 import BM25Scorer
from ..kernels.smallfloat import int_to_byte4
from ..kernels.tokenizer import analyze_series, tokenize_series
from .catalog import IndexCatalog, read_table

DOCSTORE_SCHEMA = ("doc_id bigint, conv_id string, turn_idx int, role string, "
                   "tool string, ts timestamp, text string, token_count int, "
                   "norm int, bucket_id int")

BLOCKS_TYPE = ("array<struct<first_doc:bigint,last_doc:bigint,num_docs:int,"
               "docs_enc:binary,tfs_enc:binary,pos_enc:binary,"
               "imp_freqs:array<int>,imp_norms:array<int>>>")

SEGMENTS_SCHEMA = (f"field string, term string, df bigint, ttf bigint, "
                   f"blocks {BLOCKS_TYPE}, bucket_id int")

POSTINGS_SCHEMA = (f"field string, term string, bucket_id int, df bigint, "
                   f"ttf bigint, max_score float, "
                   f"block_max_scores array<float>, blocks {BLOCKS_TYPE}, "
                   f"term_h string")

LINEAGE_SCHEMA = "stage string, bucket_id int, rows bigint, postings bigint, wall_ms bigint, status string"
NORMS_SCHEMA = ("bucket_id int, base_doc bigint, num_docs int, norms binary, "
                "sum_tc bigint, kw_nn map<string,bigint>")


def write_stats_rows(path: str, rows: list) -> None:
    """Write the (tiny, per-field) stats table driver-side with pyarrow
    — a LocalTableScan write through a Spark job costs seconds of
    serial driver time per build for a handful of rows."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    cols = list(zip(*rows))
    table = pa.table({
        "field": pa.array(cols[0], pa.string()),
        "doc_count": pa.array(cols[1], pa.int64()),
        "sum_ttf": pa.array(cols[2], pa.int64()),
        "avgdl": pa.array(cols[3], pa.float64()),
    })
    os.makedirs(path, exist_ok=True)
    pq.write_table(table, os.path.join(path, "stats.parquet"))


def _write_lineage_rows(lin_path: str, rows: list) -> None:
    """Append lineage rows as one parquet file written driver-side
    (pyarrow) — lineage is driver-sized metadata; a Spark job per wave
    would serialize the build on scheduler round-trips."""
    import os
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq
    cols = list(zip(*rows))
    table = pa.table({
        "stage": pa.array(cols[0], pa.string()),
        "bucket_id": pa.array(cols[1], pa.int32()),
        "rows": pa.array(cols[2], pa.int64()),
        "postings": pa.array(cols[3], pa.int64()),
        "wall_ms": pa.array(cols[4], pa.int64()),
        "status": pa.array(cols[5], pa.string()),
    })
    os.makedirs(lin_path, exist_ok=True)
    pq.write_table(table, os.path.join(lin_path, f"lin-{uuid.uuid4().hex}.parquet"))


def _pack_norms(pdf: pd.DataFrame, keyword_fields: tuple = ()) -> pd.DataFrame:
    """One bucket's docstore rows -> one norms row: packed norm bytes
    plus the bucket's collection-stats partials (sum of token counts,
    per-keyword-field non-null counts) so global stats aggregate from
    per-bucket rows without another corpus scan."""
    pdf = pdf.sort_values("doc_id")
    return pd.DataFrame({
        "bucket_id": [int(pdf["bucket_id"].iloc[0])],
        "base_doc": [int(pdf["doc_id"].iloc[0])],
        "num_docs": [len(pdf)],
        "norms": [pdf["norm"].to_numpy(dtype=np.uint8).tobytes()],
        "sum_tc": [int(pdf["token_count"].sum())],
        "kw_nn": [{kf: int(pdf[kf].notna().sum()) for kf in keyword_fields}],
    })


def _invert_keyword_field(pdf: pd.DataFrame, field: str) -> pd.DataFrame:
    """Keyword-field inversion (StringField/KeywordField analog,
    core:document/KeywordField.java): the raw value is ONE untokenized
    term per doc — DOCS-style postings (tf=1, no positions, norms
    omitted => norm code 1, decoded length 1, like Lucene's omitNorms).
    Nulls are unindexed (the doc simply lacks the field)."""
    empty = pd.DataFrame(columns=["field", "term", "df", "ttf", "blocks", "bucket_id"])
    bucket_id = int(pdf["bucket_id"].iloc[0])
    vals = pdf[field]
    mask = vals.notna()
    if not mask.any():
        return empty
    doc_ids = pdf.loc[mask, "doc_id"].to_numpy(dtype=np.int64)
    codes, uniques = pd.factorize(vals[mask].astype(str), sort=True)
    order = np.lexsort((doc_ids, codes))
    dc, tc = doc_ids[order], codes[order]
    rows = []
    # keyword vocabularies are small (roles/tools/status enums) — the
    # per-term loop is over unique values, not postings
    for j, term in enumerate(uniques):
        docs = dc[tc == j]
        ones = np.ones(docs.size, dtype=np.int64)
        blocks = codec.encode_chunk(docs, ones, ones, positions=None)
        rows.append((field, str(term), int(docs.size), int(docs.size),
                     blocks, bucket_id))
    return pd.DataFrame(rows, columns=["field", "term", "df", "ttf",
                                       "blocks", "bucket_id"])


def _invert_bucket(pdf: pd.DataFrame, field: str = "text",
                   keyword_fields: tuple = (),
                   analyzer: str = "standard") -> pd.DataFrame:
    """The indexing-chain kernel: one bucket's rows -> posting chunk rows.

    Fully vectorized: every quantity (posting boundaries, tf, doc/pos
    deltas, per-block impact skylines) is computed with global numpy
    array passes over the whole token stream; the only Python loops are
    final assembly over blocks and terms (cheap slicing — no per-posting
    or per-token Python). Mirrors IndexingChain.processDocument/invert +
    FreqProx sort + Lucene104 block encode (SURVEY.md §3.2) in one pass.

    keyword_fields are indexed alongside as untokenized single-term
    fields (per-field analyzers, core:index/FieldInfos.java per-field
    options; the multi-field chain of IndexingChain.processField).
    """
    empty = pd.DataFrame(columns=["field", "term", "df", "ttf", "blocks", "bucket_id"])
    kw_parts = [_invert_keyword_field(pdf.sort_values("doc_id"), kf)
                for kf in keyword_fields]
    pdf = pdf.sort_values("doc_id")
    bucket_id = int(pdf["bucket_id"].iloc[0])
    doc_ids = pdf["doc_id"].to_numpy()
    norms = pdf["norm"].to_numpy()
    base = int(doc_ids[0])
    toks = analyze_series(pdf[field], analyzer)
    lens = toks.str.len().to_numpy(dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return (pd.concat([empty] + kw_parts, ignore_index=True)
                if kw_parts else empty)
    flat_terms = np.concatenate([np.asarray(t, dtype=object) if t else np.empty(0, object)
                                 for t in toks])
    flat_docs = np.repeat(doc_ids, lens)
    # position of each token within its doc: arange minus segment starts
    starts = np.repeat(np.cumsum(lens) - lens, lens)
    flat_pos = np.arange(total, dtype=np.int64) - starts

    term_codes, uniques = pd.factorize(flat_terms, sort=True)
    order = np.lexsort((flat_pos, flat_docs, term_codes))
    tc, dc, pc = term_codes[order], flat_docs[order], flat_pos[order]

    # group boundaries at (term, doc) changes -> postings; tf = run length
    tchange = np.empty(total, dtype=bool)
    tchange[0] = True
    np.not_equal(tc[1:], tc[:-1], out=tchange[1:])
    dchange = np.empty(total, dtype=bool)
    dchange[0] = True
    np.not_equal(dc[1:], dc[:-1], out=dchange[1:])
    pchange = tchange | dchange
    pstarts = np.flatnonzero(pchange)          # token index of posting start
    P = pstarts.size
    tfs_all = np.diff(np.append(pstarts, total))
    post_terms = tc[pstarts]
    post_docs = dc[pstarts]

    # position deltas for the ENTIRE token stream in one pass: first
    # position of a posting absolute, the rest delta-encoded (the
    # writeProx delta path, FreqProxTermsWriterPerField.java:85-160)
    pdelta = pc.copy()
    pdelta[1:] -= pc[:-1]
    pdelta[pstarts] = pc[pstarts]

    # term boundaries over postings, then 256-posting block boundaries
    t_first = np.empty(P, dtype=bool)
    t_first[0] = True
    np.not_equal(post_terms[1:], post_terms[:-1], out=t_first[1:])
    tstarts = np.flatnonzero(t_first)
    idx_in_term = np.arange(P, dtype=np.int64) - np.repeat(
        tstarts, np.diff(np.append(tstarts, P)))
    blk = idx_in_term >> 8  # // codec.BLOCK_SIZE (256)
    b_first = t_first.copy()
    b_first[1:] |= blk[1:] != blk[:-1]
    bstarts = np.flatnonzero(b_first)
    bends = np.append(bstarts[1:], P)
    n_blocks = bstarts.size
    bterm = post_terms[bstarts]

    # doc deltas (per-block first element excluded at assembly)
    ddelta = post_docs.copy()
    ddelta[1:] -= post_docs[:-1]

    # norms per posting: doc_ids are contiguous within a bucket
    norm_by_off = np.zeros(int(doc_ids[-1]) - base + 1, dtype=np.uint8)
    norm_by_off[doc_ids - base] = norms
    pnorms = norm_by_off[post_docs - base].astype(np.int64)

    # --- competitive impact skylines, vectorized across ALL blocks ----
    # (CompetitiveImpactAccumulator.java:102-120): per (block, norm) max
    # freq, then keep strictly-increasing freq as norm grows. The
    # exclusive running max uses a block-offset trick so one global
    # np.maximum.accumulate does every block's scan.
    block_of_posting = np.repeat(np.arange(n_blocks, dtype=np.int64),
                                 bends - bstarts)
    so = np.lexsort((-tfs_all, pnorms, block_of_posting))
    b_s, n_s, f_s = block_of_posting[so], pnorms[so], tfs_all[so]
    first_bn = np.empty(P, dtype=bool)
    first_bn[0] = True
    first_bn[1:] = (b_s[1:] != b_s[:-1]) | (n_s[1:] != n_s[:-1])
    bu, nu, fu = b_s[first_bn], n_s[first_bn], f_s[first_bn]
    OFF = np.int64(1) << 32  # freqs < 2^32 by construction
    acc = np.maximum.accumulate(fu + bu * OFF)
    excl = np.empty_like(acc)
    excl[1:] = acc[:-1] - bu[1:] * OFF
    excl[0] = -1
    bstart_mask = np.empty(bu.size, dtype=bool)
    bstart_mask[0] = True
    bstart_mask[1:] = bu[1:] != bu[:-1]
    excl[bstart_mask] = -1
    keep = fu > excl
    kb, kn, kf = bu[keep], nu[keep], fu[keep]
    imp_starts = np.flatnonzero(np.concatenate(([True], kb[1:] != kb[:-1])))
    imp_ends = np.append(imp_starts[1:], kb.size)
    kf_l, kn_l = kf.tolist(), kn.tolist()

    # token-offset range per block (for the positions slice)
    btok_start = pstarts[bstarts]
    btok_end = pstarts[bends - 1] + tfs_all[bends - 1]

    # --- assembly: cheap slicing loops over blocks then terms ----------
    fd = post_docs[bstarts]
    ld = post_docs[bends - 1]
    nd = bends - bstarts
    pack = codec.pack_ints
    blocks_rows = [None] * n_blocks
    for i in range(n_blocks):
        s, e = bstarts[i], bends[i]
        blocks_rows[i] = {
            "first_doc": int(fd[i]),
            "last_doc": int(ld[i]),
            "num_docs": int(nd[i]),
            "docs_enc": pack(ddelta[s + 1:e]),
            "tfs_enc": pack(tfs_all[s:e]),
            "pos_enc": pack(pdelta[btok_start[i]:btok_end[i]]),
            "imp_freqs": kf_l[imp_starts[i]:imp_ends[i]],
            "imp_norms": kn_l[imp_starts[i]:imp_ends[i]],
        }
    # per-term rows: df/ttf by segmented reduction, block-list slices
    tstarts_b = np.flatnonzero(np.concatenate(([True], bterm[1:] != bterm[:-1])))
    tends_b = np.append(tstarts_b[1:], n_blocks)
    df_t = np.diff(np.append(tstarts, P))
    ttf_t = np.add.reduceat(tfs_all, tstarts)
    term_strs = uniques[post_terms[tstarts]]
    n_terms = tstarts.size
    rows = [(field, str(term_strs[j]), int(df_t[j]), int(ttf_t[j]),
             blocks_rows[tstarts_b[j]:tends_b[j]], bucket_id)
            for j in range(n_terms)]
    out = pd.DataFrame(rows, columns=["field", "term", "df", "ttf", "blocks", "bucket_id"])
    return (pd.concat([out] + kw_parts, ignore_index=True)
            if kw_parts else out)


class IndexBuilder:
    def __init__(self, spark: SparkSession, out_dir: str, num_buckets: int = 16,
                 field: str = "text", wave_size: int = 64,
                 merge_partitions: int | None = None,
                 keyword_fields: tuple = (),
                 analyzers: dict | None = None):
        """keyword_fields: docstore columns indexed as untokenized
        keyword fields alongside the analyzed text field (per-field
        index options, core:index/FieldInfos.java).

        analyzers: per-field analyzer chain names, e.g.
        {"text": "porter"} for StandardAnalyzer + PorterStemFilter
        (the PerFieldAnalyzerWrapper capability,
        analysis/common/.../miscellaneous/PerFieldAnalyzerWrapper.java;
        EnglishAnalyzer's stemming slice). Persisted in the commit
        manifest so searchers and NRT writers analyze consistently."""
        self.spark = spark
        self.catalog = IndexCatalog(out_dir)
        self.num_buckets = num_buckets
        self.field = field
        self.wave_size = wave_size
        self.merge_partitions = merge_partitions or num_buckets
        self.keyword_fields = tuple(keyword_fields)
        self.analyzers = dict(analyzers or {})
        self.analyzer = self.analyzers.get(field, "standard")

    # ---- stage 1: docstore (doc_id assignment + norms) -------------------
    def build_docstore(self, transcripts: DataFrame) -> str:
        """Assign global dense doc_ids in (conv_id, turn_idx) order and
        write the docstore, bucketed into contiguous doc-id ranges.

        Scalable doc_id assignment WITHOUT sorting the turns: a
        conversation-level prefix sum. (1) per-conv turn counts (map-side
        combined aggregate — ~|convs| rows, 1-2 orders smaller than
        turns); (2) an ordered distributed cumsum over conv_ids gives
        each conversation its doc_id base and bucket (buckets = equal
        doc-id ranges at conversation granularity, so every bucket is a
        contiguous range — Lucene doc-blocks stay contiguous,
        IndexWriter.addDocuments, core:index/IndexWriter.java:1521);
        (3) one shuffle joins bases back to turns and writes. The full
        corpus is scanned twice but never range-sampled or persisted.
        """
        existing = self.catalog.table_path("docstore")
        if existing:
            return existing
        spark = self.spark
        n = self.num_buckets
        field = self.field
        an = self.analyzer

        counts = (transcripts.groupBy("conv_id")
                  .agg(F.count("*").alias("n_turns"),
                       F.min("turn_idx").alias("_mn"),
                       F.max("turn_idx").alias("_mx"))
                  .persist(StorageLevel.MEMORY_AND_DISK))
        # doc_id = base + turn_idx is only valid when every conversation
        # has DENSE turn_idx 0..n-1; a filtered/split input (gaps) would
        # silently overrun its conversation's [base, base+n) range —
        # postings past the norms array (observed via split_index).
        # Detection is one aggregate over the conversation-sized counts
        # table; the non-dense path assigns a per-conversation rank
        # instead (window partitioned by conv_id — bounded partitions,
        # never a global window).
        dense_row = counts.agg(
            F.max(F.col("_mn") != 0).alias("a"),
            F.max(F.col("_mx") != F.col("n_turns") - 1).alias("b")
        ).collect()[0]
        dense = not (dense_row["a"] or dense_row["b"])
        # ordered prefix-sum over conversations (distributed zipWithIndex
        # on the conv table): range-partition by conv_id, local cumsum,
        # per-partition offsets from a tiny collect
        cparts = max(2, min(n, 200))
        csorted = (counts.repartitionByRange(cparts, "conv_id")
                   .sortWithinPartitions("conv_id")
                   .withColumn("_pid", F.spark_partition_id())
                   .persist(StorageLevel.MEMORY_AND_DISK))
        psums = {r["_pid"]: r["s"] for r in
                 csorted.groupBy("_pid").agg(F.sum("n_turns").alias("s")).collect()}
        offsets, acc = {}, 0
        for pid in sorted(psums):
            offsets[pid] = acc
            acc += psums[pid]
        total_turns = acc
        boff = spark.sparkContext.broadcast(offsets)

        def conv_bases(batches):
            # the cumsum must RUN ACROSS Arrow batches: one partition
            # arrives as multiple batches once it holds more than
            # maxRecordsPerBatch conversations, and restarting at the
            # partition offset per batch would hand later batches the
            # same doc_id ranges as earlier ones (duplicate/overlapping
            # doc_ids — observed at 360k convs x 32 partitions; small
            # corpora fit one batch per partition and never hit it)
            run = None
            for pdf in batches:
                if not len(pdf):
                    continue
                if run is None:
                    run = int(boff.value[int(pdf["_pid"].iloc[0])])
                nt = pdf["n_turns"].to_numpy(dtype=np.int64)
                base = run + np.cumsum(nt) - nt
                run += int(nt.sum())
                yield pd.DataFrame({"conv_id": pdf["conv_id"].to_numpy(),
                                    "base": base})

        bases = csorted.mapInPandas(conv_bases, "conv_id string, base bigint")
        bucket = F.floor(F.col("base") * n / max(total_turns, 1)).cast("int")
        bases = bases.withColumn("bucket_id", bucket)

        def assign(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                # doc_id = conv base + offset; offset is turn_idx when
                # the input is dense per conversation (batch-boundary-
                # safe: purely algebraic, a conversation may straddle
                # Arrow batches), or the precomputed _rank for gapped
                # inputs (split/filtered corpora)
                off_col = "_rank" if "_rank" in pdf.columns else "turn_idx"
                doc_ids = (pdf["base"].to_numpy(dtype=np.int64)
                           + pdf[off_col].to_numpy(dtype=np.int64))
                # computeNorm runs on the POST-FILTER token stream
                # (FieldInvertState.length excludes stopped tokens), so
                # counts go through the field's analyzer chain
                counts_ = (analyze_series(pdf[field], an)
                           .str.len().to_numpy(dtype=np.int64))
                yield pd.DataFrame({
                    "doc_id": doc_ids,
                    "conv_id": pdf["conv_id"].to_numpy(),
                    "turn_idx": pdf["turn_idx"].to_numpy(),
                    "role": pdf["role"].to_numpy(),
                    "tool": pdf["tool"].to_numpy(),
                    "ts": pdf["ts"].to_numpy(),
                    "text": pdf[field].to_numpy(),
                    "token_count": counts_.astype(np.int32),
                    "norm": np.asarray(int_to_byte4(counts_), dtype=np.int32),
                    "bucket_id": pdf["bucket_id"].to_numpy(dtype=np.int32),
                })

        path, rel = self.catalog.new_table_dir("docstore")
        # range-partition by conv_id: buckets ARE conversation ranges, so
        # each task writes 1-2 bucket dirs AND tasks are row-balanced —
        # hashing on bucket_id instead puts 2-3 whole buckets on one
        # task by birthday collision (observed 4x stragglers)
        joined = transcripts.join(bases, "conv_id")
        if not dense:
            from pyspark.sql import Window
            w = Window.partitionBy("conv_id").orderBy("turn_idx")
            joined = joined.withColumn(
                "_rank", (F.row_number().over(w) - 1).cast("long"))
        (joined
         .repartitionByRange(n, "conv_id")
         .mapInPandas(assign, schema=DOCSTORE_SCHEMA)
         .write.mode("overwrite").partitionBy("bucket_id").parquet(path))
        counts.unpersist()
        csorted.unpersist()
        from .catalog import INDEX_FORMAT_VERSION
        self.catalog.commit({"docstore": rel},
                            extra={"num_buckets": self.num_buckets,
                                   "field": self.field,
                                   "keyword_fields": list(self.keyword_fields),
                                   "analyzers": self.analyzers,
                                   "format": INDEX_FORMAT_VERSION})
        return path

    # ---- stage 2: per-bucket segments, wave-checkpointed ------------------
    def _done_buckets(self) -> set:
        import glob
        import os
        lp = self.catalog.table_path("lineage")
        if not lp or not os.path.isdir(lp) or not glob.glob(os.path.join(lp, "*.parquet")):
            return set()
        ln = self.spark.read.parquet(lp)
        return {r["bucket_id"] for r in
                ln.filter((F.col("stage") == "segments") & (F.col("status") == "ok"))
                .select("bucket_id").distinct().collect()}

    def build_segments(self, docstore_path: str) -> str:
        spark = self.spark
        seg_path, seg_rel = None, None
        c = self.catalog.latest_commit()
        if c and "segments" in c["tables"]:
            seg_rel = c["tables"]["segments"]
            seg_path = self.catalog.table_path("segments")
        else:
            seg_path, seg_rel = self.catalog.new_table_dir("segments")
        lin_path, lin_rel = None, None
        c = self.catalog.latest_commit()
        if c and "lineage" in c["tables"]:
            lin_rel = c["tables"]["lineage"]
            lin_path = self.catalog.table_path("lineage")
        else:
            lin_path, lin_rel = self.catalog.new_table_dir("lineage")
        self.catalog.commit({"segments": seg_rel, "lineage": lin_rel})

        done = self._done_buckets()
        todo = [b for b in range(self.num_buckets) if b not in done]
        field = self.field
        kw = self.keyword_fields
        an = self.analyzer
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        for w in range(0, len(todo), self.wave_size):
            wave = todo[w:w + self.wave_size]
            t0 = time.time()
            ds = (spark.read.parquet(docstore_path)
                  .filter(F.col("bucket_id").isin(wave))
                  .select("doc_id", "norm", "bucket_id", field, *kw))
            seg = ds.groupBy("bucket_id").applyInPandas(
                lambda pdf: _invert_bucket(pdf, field, kw, an),
                schema=SEGMENTS_SCHEMA)
            (seg.write.mode("overwrite").partitionBy("bucket_id").parquet(seg_path))
            wall = int((time.time() - t0) * 1000)
            # the write either completed for the WHOLE wave or threw, so
            # every wave bucket is done; lineage rows are written
            # driver-side with pyarrow (no Spark job, no re-scan of the
            # just-written segments — that re-scan was a serial barrier
            # per wave; detailed term/posting counts live in the
            # segments table itself, lineage records completion + wall)
            _write_lineage_rows(
                lin_path,
                [("segments", b, -1, -1, wall, "ok") for b in wave])
            self.catalog.commit({}, extra={"segments_waves_done": w + len(wave)})
        return seg_path

    # ---- stage 3: stats + termstats + merged postings ---------------------
    def build_stats(self, norms_path: str) -> None:
        """Per-field collection stats (CollectionStatistics,
        core:search/CollectionStatistics.java): one row per indexed
        field, aggregated from the NORMS table's per-bucket partials
        (one row per bucket — metadata-sized) instead of re-scanning
        the docstore: build_norms already folded doc counts, token
        sums, and keyword non-null counts into its single pass.
        Keyword fields carry one 1-token 'posting' per non-null doc
        (docCount = docs with the field, avgdl = 1 — omitNorms)."""
        if self.catalog.has_table("stats"):
            return
        spark = self.spark
        aggs = [F.sum("num_docs").alias("_n"), F.sum("sum_tc").alias("_s")]
        for kf in self.keyword_fields:
            aggs.append(F.sum(F.element_at(F.col("kw_nn"), F.lit(kf)))
                        .alias(f"_n_{kf}"))
        row = spark.read.parquet(norms_path).agg(*aggs).collect()[0]
        rows = [(self.field, int(row["_n"]), int(row["_s"]),
                 float(row["_s"]) / max(int(row["_n"]), 1))]
        for kf in self.keyword_fields:
            n = int(row[f"_n_{kf}"] or 0)
            rows.append((kf, n, n, 1.0))
        path, rel = self.catalog.new_table_dir("stats")
        write_stats_rows(path, rows)
        self.catalog.commit({"stats": rel})

    def _merged_df(self, seg: DataFrame, fstats: dict) -> DataFrame:
        """The merge plan: ONE hash shuffle on term_h, then everything
        term-local.

        The global per-term df (needed to bake BM25 block maxima —
        Lucene derives these at query time from impacts,
        MaxScoreCache.java:19-159; with k1/b fixed we bake floats at
        merge time) is computed INSIDE the shuffled partitions: term_h
        is a function of term, so after repartition(term_h) +
        sortWithinPartitions(field, term, bucket_id) every (field, term)
        group is contiguous within one partition, and a carry-over
        buffer handles groups straddling Arrow batches. No join, no
        broadcast — the previous design broadcast the whole term
        dictionary (10^7-10^9 entries at web scale => driver/executor
        OOM); this computes the same g_df with zero extra shuffles."""

        def bake(batches):
            from ..search.kernels import impact_block_bounds
            scorer_cache = {}

            def process(pdf: pd.DataFrame):
                g = pdf.groupby(["field", "term"], sort=False)["df"] \
                    .transform("sum")
                # vectorized impact baking: ONE scorer.score call per
                # (field, g_df) group over the group's concatenated
                # skylines + segmented max — the per-chunk-row Python
                # loop was the merge's CPU floor at 10^9 chunks
                n = len(pdf)
                maxs = np.zeros(n, dtype=np.float32)
                block_maxs: list = [None] * n
                blocks_col = pdf["blocks"].tolist()
                gkeys = pd.DataFrame({"fld": pdf["field"].to_numpy(),
                                      "gdf": g.to_numpy()})
                for (fld, g_df), ridx in gkeys.groupby(
                        ["fld", "gdf"], sort=False).indices.items():
                    key = (fld, int(g_df))
                    sc = scorer_cache.get(key)
                    if sc is None:
                        dc, sttf = fstats[fld]
                        sc = scorer_cache[key] = BM25Scorer(int(g_df), dc,
                                                            sttf)
                    flat = [b for ri in ridx for b in blocks_col[ri]]
                    bb = impact_block_bounds(flat, sc)
                    off = 0
                    for ri in ridx:
                        ln = len(blocks_col[ri])
                        bm = bb[off:off + ln]
                        off += ln
                        block_maxs[ri] = bm.tolist()
                        maxs[ri] = bm.max() if ln else np.float32(0.0)
                out = pdf[["field", "term", "bucket_id", "df", "ttf",
                           "blocks", "term_h"]].copy()
                out["max_score"] = maxs
                out["block_max_scores"] = block_maxs
                return out[["field", "term", "bucket_id", "df", "ttf",
                            "max_score", "block_max_scores", "blocks",
                            "term_h"]]

            buf = None
            for pdf in batches:
                if not len(pdf):
                    continue
                if buf is not None:
                    pdf = pd.concat([buf, pdf], ignore_index=True)
                # hold back the (possibly incomplete) last group; its
                # remaining chunks may arrive in the next Arrow batch
                tail = ((pdf["field"] == pdf["field"].iloc[-1])
                        & (pdf["term"] == pdf["term"].iloc[-1]))
                head = pdf[~tail]
                buf = pdf[tail]
                if len(head):
                    yield process(head)
            if buf is not None and len(buf):
                yield process(buf)

        return (seg
                .withColumn("term_h", F.concat(F.lit("h"),
                                               F.substring(F.md5("term"), 1, 2)))
                .repartition(self.merge_partitions, "term_h")
                .sortWithinPartitions("field", "term", "bucket_id")
                .mapInPandas(bake, schema=POSTINGS_SCHEMA))

    def merge(self, seg_path, force: bool = False) -> str:
        """The shuffle-merge: segments -> term dictionary partitioned by
        a term-hash prefix.

        Layout: postings are hash-shuffled on ``term_h = 'h' + md5(term)[:2]``
        (256 values) and written with ``partitionBy(term_h)``, sorted by
        (field, term, bucket_id) within files. A query term's chunks are
        then found by *directory* pruning (partition-column equality —
        the Catalyst-native analog of the block-tree term-dict seek)
        plus parquet min/max on the sorted term column. One cheap hash
        shuffle — no range-sampling pass over the postings.

        Skew (SURVEY.md §4.3): chunks are (term, bucket) grains — a hot
        Zipf-head term stays split across its per-bucket chunks, and the
        md5 key spreads terms uniformly over reducers, so no reducer
        sees more than ~1/256 of the dictionary. Doc ranges across
        buckets are disjoint and ordered, so 'merging' chunk lists needs
        no block re-encoding (cf. SegmentMerger.java:114-189 which must
        remap docIDs).
        """
        if (not force and self.catalog.has_table("postings")
                and self.catalog.has_table("termstats")):
            return self.catalog.table_path("postings")
        spark = self.spark
        # seg_path may be one dir (base build) or the list of
        # generation dirs (post-NRT compaction)
        seg = read_table(spark, seg_path)
        ts_path, ts_rel = self.catalog.new_table_dir("termstats")

        fstats = {r["field"]: (int(r["doc_count"]), int(r["sum_ttf"]))
                  for r in spark.read.parquet(
                      self.catalog.table_path("stats")).collect()}

        merged = self._merged_df(seg, fstats)
        p_path, p_rel = self.catalog.new_table_dir("postings")
        merged.write.mode("overwrite").partitionBy("field", "term_h").parquet(p_path)

        # term max_score = max over chunks -> stored in termstats for WAND
        # (column-pruned scan of the written postings, no block decode)
        post = spark.read.parquet(p_path)
        ts_final = (post.groupBy("field", "term")
                    .agg(F.sum("df").alias("df"), F.sum("ttf").alias("ttf"),
                         F.max("max_score").alias("max_score")))
        ts_final.write.mode("overwrite").parquet(ts_path)
        self.catalog.commit({"postings": p_rel, "termstats": ts_rel})
        return p_path

    # ---- stage 4: norms table (+ stats partials, one docstore pass) -------
    def build_norms(self, docstore_path: str) -> str:
        """Pack per-bucket norm bytes AND fold the collection-stats
        partials (token sum, keyword non-null counts) into the same
        single docstore pass — build_stats then aggregates the tiny
        per-bucket rows instead of scanning the corpus again (one full
        scan saved per build; the scans were a serial-fraction term in
        the N->4N scaling measurement)."""
        if self.catalog.has_table("norms"):
            return self.catalog.table_path("norms")
        spark = self.spark
        kw = self.keyword_fields
        norms = (spark.read.parquet(docstore_path)
                 .select("doc_id", "norm", "token_count", "bucket_id", *kw)
                 .groupBy("bucket_id")
                 .applyInPandas(lambda pdf: _pack_norms(pdf, kw),
                                schema=NORMS_SCHEMA))
        path, rel = self.catalog.new_table_dir("norms")
        norms.write.mode("overwrite").parquet(path)
        self.catalog.commit({"norms": rel})
        return path

    # ---- orchestrator -------------------------------------------------------
    def build(self, transcripts: DataFrame) -> IndexCatalog:
        t0 = time.time()
        # AQE partition coalescing targets shuffle BYTES; our kernel
        # stages are CPU-bound per bucket, so coalescing below bucket
        # count serializes kernels into straggler tasks (observed: 8
        # buckets coalesced to 5 tasks, one 200 s task). Disable for the
        # build, restore after.
        conf = self.spark.conf
        prev = conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        # groupBy(bucket_id) hash-routes ~num_buckets keys; with exactly
        # num_buckets shuffle partitions, birthday collisions serialize
        # 2-3 kernels on one task. 4x partitions makes collisions rare
        # (empty partitions are ~free with codegen).
        prev_sp = conf.get("spark.sql.shuffle.partitions")
        conf.set("spark.sql.shuffle.partitions",
                 str(max(int(prev_sp), 4 * self.num_buckets)))
        try:
            ds = self.build_docstore(transcripts)
            seg = self.build_segments(ds)
            nm = self.build_norms(ds)
            self.build_stats(nm)
            self.merge(seg)
        finally:
            conf.set("spark.sql.adaptive.coalescePartitions.enabled", prev)
            conf.set("spark.sql.shuffle.partitions", prev_sp)
        self.catalog.commit({}, extra={"build_wall_ms": int((time.time() - t0) * 1000)})
        return self.catalog


TARGET_TURNS_PER_BUCKET = 40_000  # FlushByRamOrCountsPolicy analog:
# bounds one invert kernel's working set (~2-3M tokens), independent of
# cluster size — more data means more buckets, not bigger ones.
# Scale note: this default targets the sandbox (small executors, fast
# feedback). On a 1000-executor cluster at 10^12 turns, raise it to
# ~2-10M turns/bucket (a few GB per kernel) so bucket count stays in
# the 10^5-10^6 task range; the kernel is O(n log n) in bucket tokens
# and fully vectorized, so bigger buckets amortize task overhead.


def suggest_buckets(n_turns: int, min_buckets: int = 16) -> int:
    return max(min_buckets, int(np.ceil(n_turns / TARGET_TURNS_PER_BUCKET)))


def build_index(spark: SparkSession, transcripts: DataFrame, out_dir: str,
                num_buckets: int = 16, **kw) -> IndexCatalog:
    return IndexBuilder(spark, out_dir, num_buckets=num_buckets, **kw).build(transcripts)
