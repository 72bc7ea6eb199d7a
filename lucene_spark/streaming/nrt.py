"""Near-real-time indexing: Structured Streaming appends + compaction.

Lucene's NRT loop (SURVEY.md §2.9) is: the writer keeps ingesting and
flushing small segments; ``SearcherManager.maybeRefresh`` opens cheap
point-in-time readers over them (core:search/SearcherManager.java:45-53,
DirectoryReader.open(IndexWriter), core:index/DirectoryReader.java:90);
background merges compact small segments (ConcurrentMergeScheduler).

Spark mapping — the same log-structured-merge shape:

- each micro-batch (``foreachBatch``) becomes one or more fresh
  *buckets*: contiguous global doc_id ranges appended to the docstore,
  segment postings, norms, and stats tables, published atomically by an
  IndexCatalog commit (≙ flush + segments_N);
- searchers see every commit immediately (≙ maybeRefresh);
- appended chunks carry impacts but the global stats (df, avgdl) have
  moved, so the catalog is marked ``nrt_dirty`` and searchers recompute
  block-max bounds from the stored (freq, norm) impacts at query time —
  exactly Lucene's design, where impacts are stored raw and
  MaxScoreCache derives float bounds per query
  (core:search/MaxScoreCache.java:19-159);
- ``compact()`` re-merges everything into a fresh hash-partitioned term
  dictionary with baked float bounds and clears the flag
  (≙ TieredMergePolicy forceMerge).
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index.builder import (DOCSTORE_SCHEMA, NORMS_SCHEMA, POSTINGS_SCHEMA,
                             SEGMENTS_SCHEMA, IndexBuilder, _invert_bucket,
                             _pack_norms)
from ..index.catalog import IndexCatalog, read_table
from ..kernels.smallfloat import int_to_byte4
from ..kernels.tokenizer import analyze_series


class NRTIndexWriter:
    """Appends transcript micro-batches to an existing index."""

    def __init__(self, spark: SparkSession, index_dir: str,
                 rows_per_bucket: int = 100_000, field: str = "text"):
        self.spark = spark
        self.catalog = IndexCatalog(index_dir)
        self.rows_per_bucket = rows_per_bucket
        self.field = field

    def _state(self):
        c = self.catalog.latest_commit()
        if not c or "postings" not in c["tables"]:
            raise ValueError("NRT append requires an existing committed index")
        from ..index.catalog import check_format
        check_format(c, "NRTIndexWriter")
        fstats = {r["field"]: (int(r["doc_count"]), int(r["sum_ttf"]))
                  for r in self.spark.read.parquet(
                      self.catalog.table_path("stats")).collect()}
        extra = c.get("extra") or {}
        max_bucket = int(extra.get("max_bucket",
                                   int(extra.get("num_buckets", 1)) - 1))
        kw = tuple(extra.get("keyword_fields") or ())
        an = (extra.get("analyzers") or {}).get(self.field, "standard")
        return fstats, max_bucket, kw, an

    def _recover_pending(self, pending: list) -> None:
        """Clean up a mid-append crash: drop the partially written
        buckets' files and rewrite norms/postings without their rows,
        then clear the marker. Rare path — correctness over speed."""
        import glob
        import os
        import shutil
        spark = self.spark
        cat = self.catalog
        for table in ("docstore", "segments"):
            root = cat.table_path(table)
            for b in pending:
                shutil.rmtree(os.path.join(root, f"bucket_id={b}"),
                              ignore_errors=True)
        # norms: rebuild from the (now clean) docstore
        kw = tuple((self.catalog.latest_commit().get("extra") or {})
                   .get("keyword_fields") or ())
        n_path, n_rel = cat.new_table_dir("norms")
        (spark.read.parquet(cat.table_path("docstore"))
         .select("doc_id", "norm", "token_count", "bucket_id", *kw)
         .groupBy("bucket_id")
         .applyInPandas(lambda p: _pack_norms(p, kw), NORMS_SCHEMA)
         .write.mode("overwrite").parquet(n_path))
        # postings: rewrite without the pending buckets' chunks
        p_path, p_rel = cat.new_table_dir("postings")
        (spark.read.parquet(cat.table_path("postings"))
         .filter(~F.col("bucket_id").isin(list(pending)))
         .write.mode("overwrite").partitionBy("field", "term_h").parquet(p_path))
        cat.commit({"norms": n_rel, "postings": p_rel},
                   extra={"pending_buckets": None})

    def append_batch(self, batch: DataFrame, batch_id: int | None = None) -> int:
        """One micro-batch -> new bucket(s) appended + catalog commit.
        Returns the number of rows appended. Batch rows are sorted by
        (conv_id, turn_idx) for doc_id assignment; doc_ids continue
        after the current maxDoc (append-only, like segment docBase).

        Exactly-once: a replayed batch_id (foreachBatch retry after a
        successful commit) is a no-op; a crash mid-append leaves a
        pending-buckets marker that the next append (or the retry)
        cleans up before ingesting."""
        spark = self.spark
        extra = (self.catalog.latest_commit().get("extra") or {})
        # batch_id may legitimately be 0 (Spark numbers the first
        # micro-batch 0) — dedup on `is not None`, not truthiness, or a
        # retry of batch 0 after a successful commit double-ingests
        if (batch_id is not None
                and int(extra.get("last_batch_id", -1)) >= int(batch_id)):
            return 0  # replayed micro-batch, already committed
        pending = extra.get("pending_buckets")
        if pending:
            self._recover_pending(pending)
        fstats, max_bucket, kw, an = self._state()
        doc_count, sum_ttf = fstats[self.field]
        field = self.field

        # micro-batches are bounded (Lucene RAM-buffer analog), so the
        # batch is ordered globally via a single range partitioning
        n_rows = batch.count()
        if n_rows == 0:
            return 0
        n_new = max(1, int(np.ceil(n_rows / self.rows_per_bucket)))
        base0 = doc_count
        b0 = max_bucket + 1
        sorted_b = (batch.repartitionByRange(n_new, "conv_id", "turn_idx")
                    .sortWithinPartitions("conv_id", "turn_idx")
                    .withColumn("_pid", F.spark_partition_id())
                    .persist())
        counts = {r["_pid"]: r["c"] for r in
                  sorted_b.groupBy("_pid").agg(F.count("*").alias("c")).collect()}
        offs, acc = {}, 0
        for pid in range(n_new):
            offs[pid] = acc
            acc += counts.get(pid, 0)
        boff = spark.sparkContext.broadcast(offs)

        def assign(batches):
            local = 0
            for pdf in batches:
                if not len(pdf):
                    continue
                pid = int(pdf["_pid"].iloc[0])
                doc_ids = (base0 + boff.value[pid] + local
                           + np.arange(len(pdf), dtype=np.int64))
                local += len(pdf)
                counts_ = (analyze_series(pdf[field], an)
                           .str.len().to_numpy(np.int64))
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
                    "bucket_id": np.full(len(pdf), b0 + pid, dtype=np.int32),
                })

        # Every table write below goes to a NEW generation directory
        # that is invisible until the single atomic commit at the end —
        # the segments_N model (a crash leaves only unreferenced
        # garbage dirs, no recovery pass needed; the legacy
        # pending_buckets recovery is kept for pre-multi-dir indexes).
        ds_new = sorted_b.mapInPandas(assign, DOCSTORE_SCHEMA)
        ds_path, ds_rel = self.catalog.new_table_dir("docstore")
        ds_new.write.mode("overwrite").partitionBy("bucket_id").parquet(ds_path)
        sorted_b.unpersist()

        new_buckets = list(range(b0, b0 + n_new))
        ds_appended = spark.read.parquet(ds_path)

        # segment postings for the new buckets (same per-field config as
        # the base build — keyword fields stay searchable across appends)
        seg_path, seg_rel = self.catalog.new_table_dir("segments")
        seg_new = (ds_appended.select("doc_id", "norm", "bucket_id", field, *kw)
                   .groupBy("bucket_id")
                   .applyInPandas(lambda p: _invert_bucket(p, field, kw, an),
                                  schema=SEGMENTS_SCHEMA))
        seg_new.write.mode("overwrite").partitionBy("bucket_id").parquet(seg_path)

        # norms for the new buckets
        nm_path, nm_rel = self.catalog.new_table_dir("norms")
        (ds_appended.select("doc_id", "norm", "token_count", "bucket_id", *kw)
         .groupBy("bucket_id")
         .applyInPandas(lambda p: _pack_norms(p, kw), schema=NORMS_SCHEMA)
         .write.mode("overwrite").parquet(nm_path))

        # postings: append the new chunks with block maxima computed
        # under the PRE-APPEND stats. For a pre-append searcher (old
        # scorers bound to the same stats) these are exact upper bounds;
        # a post-append searcher sees nrt_dirty and re-derives bounds
        # from the impacts (see module doc) — both rank-safe.
        def add_max_scores(batches):
            # vectorized like the merge's bake: one score call per
            # (field, df) group over concatenated skylines
            from ..kernels.bm25 import BM25Scorer
            from ..search.kernels import impact_block_bounds
            scorer_cache = {}
            for pdf in batches:
                if not len(pdf):
                    continue
                n = len(pdf)
                maxs = np.zeros(n, dtype=np.float32)
                block_maxs: list = [None] * n
                blocks_col = pdf["blocks"].tolist()
                gkeys = pd.DataFrame({"fld": pdf["field"].to_numpy(),
                                      "gdf": pdf["df"].to_numpy()})
                for (fld, df_), ridx in gkeys.groupby(
                        ["fld", "gdf"], sort=False).indices.items():
                    key = (fld, int(df_))
                    sc = scorer_cache.get(key)
                    if sc is None:
                        dc, sttf = fstats.get(fld, (doc_count, sum_ttf))
                        sc = scorer_cache[key] = BM25Scorer(
                            int(df_), dc, sttf)
                    flat = [b for ri in ridx for b in blocks_col[ri]]
                    bb = impact_block_bounds(flat, sc)
                    off = 0
                    for ri in ridx:
                        ln = len(blocks_col[ri])
                        bm = bb[off:off + ln]
                        off += ln
                        block_maxs[ri] = bm.tolist()
                        maxs[ri] = bm.max() if ln else np.float32(0.0)
                out = pdf.copy()
                out["max_score"] = maxs
                out["block_max_scores"] = block_maxs
                yield out[["field", "term", "bucket_id", "df", "ttf",
                           "max_score", "block_max_scores", "blocks",
                           "term_h"]]

        add = (spark.read.parquet(seg_path)
               .withColumn("term_h", F.concat(F.lit("h"),
                                              F.substring(F.md5("term"), 1, 2)))
               .mapInPandas(add_max_scores, POSTINGS_SCHEMA))
        p_path, p_rel = self.catalog.new_table_dir("postings")
        add.write.mode("overwrite").partitionBy("field", "term_h").parquet(p_path)

        # refresh stats + termstats: O(batch) incremental, not a
        # full-corpus re-aggregation; every indexed field's row advances
        aggs = [F.count("*").alias("n"), F.sum("token_count").alias("s")]
        for kf in kw:
            aggs.append(F.count(F.col(kf)).alias(f"n_{kf}"))
        agg = ds_appended.agg(*aggs).collect()[0]
        new_count = doc_count + int(agg["n"])
        new_sttf = sum_ttf + int(agg["s"])
        st_rows = [(self.field, new_count, new_sttf, new_sttf / new_count)]
        for kf in kw:
            kc, ks = fstats.get(kf, (0, 0))
            kn = kc + int(agg[f"n_{kf}"])
            st_rows.append((kf, kn, kn, 1.0))
        st_path, st_rel = self.catalog.new_table_dir("stats")
        from ..index.builder import write_stats_rows
        write_stats_rows(st_path, st_rows)
        # termstats: write ONLY the batch's delta rows as a new
        # GENERATION of the table (the same segments_N list model as
        # postings/norms); readers sum df/ttf and max max_score across
        # generations, and compact/compact_tiered squash them back to
        # one. The previous design full-outer-joined the delta against
        # the ENTIRE dictionary and rewrote it — an O(|vocabulary|)
        # shuffle + write per micro-batch, fatal at 10^8-10^9 terms.
        ts_delta = (spark.read.parquet(p_path)
                    .groupBy("field", "term")
                    .agg(F.sum("df").alias("df"), F.sum("ttf").alias("ttf"),
                         F.max("max_score").alias("max_score")))
        ts_path, ts_rel = self.catalog.new_table_dir("termstats")
        ts_delta.write.mode("overwrite").parquet(ts_path)
        final_extra = {"max_bucket": b0 + n_new - 1,
                       "nrt_dirty": True,
                       "pending_buckets": None,
                       "appended_at_ms": int(time.time() * 1000)}
        if batch_id is not None:  # manual appends don't regress the marker
            final_extra["last_batch_id"] = int(batch_id)
        cat = self.catalog
        self.catalog.commit(
            {"stats": st_rel,
             "termstats": cat.table_rels("termstats") + [ts_rel],
             "docstore": cat.table_rels("docstore") + [ds_rel],
             "segments": cat.table_rels("segments") + [seg_rel],
             "norms": cat.table_rels("norms") + [nm_rel],
             "postings": cat.table_rels("postings") + [p_rel]},
            extra=final_extra)
        return int(agg["n"])

    def compact(self) -> None:
        """Full re-merge of all segments into a fresh term dictionary
        with baked float bounds; clears nrt_dirty (forceMerge analog)."""
        c = self.catalog.latest_commit()
        nb = int((c.get("extra") or {}).get("max_bucket", 0)) + 1
        b = IndexBuilder(self.spark, self.catalog.root, num_buckets=nb)
        # force=True: the re-merge writes NEW table dirs and publishes
        # them in one commit — readers see either the old or the new
        # fully-built dictionary, never a window without one
        b.merge(self.catalog.table_locations("segments"), force=True)
        self.catalog.commit({}, extra={"nrt_dirty": False})

    def compact_tiered(self, target_docs_per_bucket: int | None = None) -> int:
        """Tiered incremental compaction (TieredMergePolicy analog,
        core:index/TieredMergePolicy.java:85-88): merge ONLY the small
        NRT-appended generations into target-sized buckets, leaving the
        base generation untouched — IO is O(appended data), not
        O(index) like the forceMerge-style compact(). Returns the
        number of buckets merged away (0 if nothing to do).

        Mechanics: appended generations are separate table directories
        (the segments_N list model), so merging = read gens 1..n,
        re-bucket their docs into contiguous target-size ranges, merge
        per-(field, term) chunk rows by concatenating block lists (doc
        ranges are disjoint and ordered — no re-encode, no re-score;
        baked bounds ride along), write ONE new generation per table
        and publish [base, merged] atomically. A crash leaves only
        unreferenced dirs; rerunning is safe. Baked block maxima are
        NOT recomputed (nrt_dirty still governs bound recompute)."""
        import numpy as np
        cat = self.catalog
        spark = self.spark
        c = cat.latest_commit()
        extra = c.get("extra") or {}
        ds_rels = cat.table_rels("docstore")
        if len(ds_rels) < 3:  # base + >=2 appended gens worth merging
            return 0
        seg_locs = cat.table_locations("segments")[1:]
        ds_locs = cat.table_locations("docstore")[1:]
        nm_locs = cat.table_locations("norms")[1:]
        p_locs = cat.table_locations("postings")[1:]
        target = target_docs_per_bucket or 4 * self.rows_per_bucket

        # bucket inventory of the appended gens (metadata-sized)
        app_norms = (read_table(spark, nm_locs)
                     .select("bucket_id", "base_doc", "num_docs")
                     .collect())
        app_norms.sort(key=lambda r: int(r["base_doc"]))
        old_ids = [int(r["bucket_id"]) for r in app_norms]
        if len(old_ids) < 2:
            return 0
        # greedy contiguous grouping to ~target docs (doc ranges of
        # successive appended buckets are contiguous by construction)
        groups, cur, cur_n = [], [], 0
        for r in app_norms:
            cur.append(int(r["bucket_id"]))
            cur_n += int(r["num_docs"])
            if cur_n >= target:
                groups.append(cur)
                cur, cur_n = [], 0
        if cur:
            groups.append(cur)
        if all(len(g) == 1 for g in groups):
            return 0
        mapping = {}
        for g in groups:
            new_id = g[0]
            for b in g:
                mapping[b] = new_id
        merged_away = len(old_ids) - len(groups)
        map_expr = F.create_map([F.lit(x) for kv in mapping.items()
                                 for x in kv])

        # docstore: remap bucket ids (pure projection, one pass)
        ds_path, ds_rel_new = cat.new_table_dir("docstore")
        (read_table(spark, ds_locs)
         .withColumn("bucket_id", map_expr[F.col("bucket_id")]
                     .cast("int"))
         .write.mode("overwrite").partitionBy("bucket_id").parquet(ds_path))

        # segments + postings: remap, then merge rows per (field, term,
        # bucket) — blocks concatenated in doc order
        def merge_seg(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("bucket_id_old")
            blocks = [b for lst in pdf["blocks"] for b in lst]
            return pd.DataFrame({
                "field": [pdf["field"].iloc[0]],
                "term": [pdf["term"].iloc[0]],
                "df": [int(pdf["df"].sum())],
                "ttf": [int(pdf["ttf"].sum())],
                "blocks": [blocks],
                "bucket_id": [int(pdf["bucket_id"].iloc[0])],
            })

        seg_path, seg_rel_new = cat.new_table_dir("segments")
        (read_table(spark, seg_locs)
         .withColumn("bucket_id_old", F.col("bucket_id"))
         .withColumn("bucket_id", map_expr[F.col("bucket_id")].cast("int"))
         .groupBy("field", "term", "bucket_id")
         .applyInPandas(merge_seg, schema=SEGMENTS_SCHEMA)
         .write.mode("overwrite").partitionBy("bucket_id").parquet(seg_path))

        def merge_post(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("bucket_id_old")
            blocks = [b for lst in pdf["blocks"] for b in lst]
            bms = [float(x) for lst in pdf["block_max_scores"] for x in lst]
            return pd.DataFrame({
                "field": [pdf["field"].iloc[0]],
                "term": [pdf["term"].iloc[0]],
                "bucket_id": [int(pdf["bucket_id"].iloc[0])],
                "df": [int(pdf["df"].sum())],
                "ttf": [int(pdf["ttf"].sum())],
                "max_score": [float(pdf["max_score"].max())],
                "block_max_scores": [bms],
                "blocks": [blocks],
                "term_h": [pdf["term_h"].iloc[0]],
            })

        p_path, p_rel_new = cat.new_table_dir("postings")
        (read_table(spark, p_locs)
         .withColumn("bucket_id_old", F.col("bucket_id"))
         .withColumn("bucket_id", map_expr[F.col("bucket_id")].cast("int"))
         .groupBy("field", "term", "bucket_id")
         .applyInPandas(merge_post, schema=POSTINGS_SCHEMA)
         .write.mode("overwrite").partitionBy("field", "term_h").parquet(p_path))

        # norms: concat per group (contiguous doc ranges); kw_nn sums
        def merge_norms(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("base_doc")
            kw_nn: dict = {}
            for d in pdf["kw_nn"]:
                for k, v in (d or {}).items():
                    kw_nn[k] = kw_nn.get(k, 0) + int(v)
            return pd.DataFrame({
                "bucket_id": [int(pdf["bucket_id"].iloc[0])],
                "base_doc": [int(pdf["base_doc"].min())],
                "num_docs": [int(pdf["num_docs"].sum())],
                "norms": [b"".join(bytes(x) for x in pdf["norms"])],
                "sum_tc": [int(pdf["sum_tc"].sum())],
                "kw_nn": [kw_nn],
            })

        nm_path, nm_rel_new = cat.new_table_dir("norms")
        (read_table(spark, nm_locs)
         .withColumn("bucket_id", map_expr[F.col("bucket_id")].cast("int"))
         .groupBy("bucket_id")
         .applyInPandas(merge_norms, schema=NORMS_SCHEMA)
         .write.mode("overwrite").parquet(nm_path))

        tables = {"docstore": [ds_rels[0], ds_rel_new],
                  "segments": [cat.table_rels("segments")[0], seg_rel_new],
                  "norms": [cat.table_rels("norms")[0], nm_rel_new],
                  "postings": [cat.table_rels("postings")[0], p_rel_new]}

        # termstats: squash the per-append delta generations back into
        # ONE aggregated table (readers then skip the read-side merge);
        # amortized here instead of per micro-batch
        ts_locs = cat.table_locations("termstats")
        if len(ts_locs) > 1:
            ts_path_new, ts_rel_new = cat.new_table_dir("termstats")
            (read_table(spark, ts_locs)
             .groupBy("field", "term")
             .agg(F.sum("df").alias("df"), F.sum("ttf").alias("ttf"),
                  F.max("max_score").alias("max_score"))
             .write.mode("overwrite").parquet(ts_path_new))
            tables["termstats"] = ts_rel_new

        # livedocs: merge bitmaps of re-bucketed ids (bit-level concat;
        # a bucket without a bitmap is all-live)
        lv_path_old = cat.table_path("livedocs")
        if lv_path_old is not None:
            rows = {int(r["bucket_id"]):
                    (int(r["base_doc"]), int(r["num_docs"]), bytes(r["live"]))
                    for r in spark.read.parquet(lv_path_old).collect()}
            sizes = {int(r["bucket_id"]): (int(r["base_doc"]),
                                           int(r["num_docs"]))
                     for r in app_norms}
            out_rows = [(b, v[0], v[1], v[2]) for b, v in rows.items()
                        if b not in mapping]
            for g in groups:
                if not any(b in rows for b in g):
                    continue
                bits = []
                for b in g:
                    base_b, nd_b = sizes[b]
                    if b in rows:
                        bits.append(np.unpackbits(
                            np.frombuffer(rows[b][2], np.uint8), count=nd_b))
                    else:
                        bits.append(np.ones(nd_b, dtype=np.uint8))
                merged = np.concatenate(bits)
                out_rows.append((g[0], sizes[g[0]][0], int(merged.size),
                                 np.packbits(merged).tobytes()))
            lv_path, lv_rel = cat.new_table_dir("livedocs")
            spark.createDataFrame(
                out_rows,
                "bucket_id int, base_doc bigint, num_docs int, live binary"
            ).write.mode("overwrite").parquet(lv_path)
            tables["livedocs"] = lv_rel

        cat.commit(tables, extra={"tiered_compactions":
                                  int(extra.get("tiered_compactions", 0)) + 1})
        return merged_away


def index_stream(stream_df: DataFrame, index_dir: str, checkpoint: str,
                 rows_per_bucket: int = 100_000, trigger: dict | None = None):
    """Wire a streaming transcripts DataFrame into NRT appends.

    Returns the StreamingQuery. Each micro-batch is one atomic index
    commit; the checkpoint gives exactly-once batch replay (combined
    with the catalog's idempotent bucket allocation per batch_id).
    """
    spark = stream_df.sparkSession

    def sink(bdf: DataFrame, batch_id: int):
        NRTIndexWriter(spark, index_dir,
                       rows_per_bucket=rows_per_bucket).append_batch(bdf, batch_id)

    writer = (stream_df.writeStream
              .foreachBatch(sink)
              .option("checkpointLocation", checkpoint))
    if trigger:
        writer = writer.trigger(**trigger)
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()
