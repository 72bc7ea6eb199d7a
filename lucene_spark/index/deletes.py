"""Document deletes: per-bucket live-doc bitmaps applied at search time.

Lucene's model (core:codecs/lucene90/Lucene90LiveDocsFormat.java,
IndexWriter.deleteDocuments core:index/IndexWriter.java:1797): deletes
never rewrite postings — a per-segment bitset marks dead docs and every
scorer skips them; collection stats keep counting deleted docs until a
merge rewrites the segment. We mirror that exactly:

- ``delete_docs(predicate)`` evaluates a metadata predicate on the
  docstore (pushed-down scan) and publishes a ``livedocs`` table of
  per-bucket packed bitmaps via an atomic catalog commit;
- searchers intersect every posting chunk with the bucket's live bitmap
  (the same MaskedChunk path as metadata filters) — scores of surviving
  docs are unchanged, exactly Lucene's behavior (stats include deleted
  docs until compaction);
- repeated deletes AND into the existing bitmaps (cumulative).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..search.kernels import pack_docset
from .catalog import IndexCatalog, read_table

LIVEDOCS_SCHEMA = "bucket_id int, base_doc bigint, num_docs int, live binary"


def delete_docs(spark: SparkSession, index_dir: str, predicate: str) -> int:
    """Mark docs matching the SQL predicate as deleted. Returns the
    number of NEWLY deleted docs (docs already dead are not recounted).
    Publishes a new commit point."""
    cat = IndexCatalog(index_dir)
    nm = (read_table(spark, cat.table_locations("norms"))
          .select("bucket_id", "base_doc", "num_docs"))
    dead = (read_table(spark, cat.table_locations("docstore"))
            .filter(predicate)
            .select("bucket_id", "doc_id")
            .join(F.broadcast(nm), "bucket_id")
            .persist())

    prev_path = cat.table_path("livedocs")
    prev = {}
    if prev_path:
        for r in spark.read.parquet(prev_path).collect():
            prev[int(r["bucket_id"])] = (int(r["base_doc"]),
                                         int(r["num_docs"]),
                                         bytes(r["live"]))

    MARK_SCHEMA = LIVEDOCS_SCHEMA + ", n_new_dead bigint"

    def mark(pdf: pd.DataFrame) -> pd.DataFrame:
        b = int(pdf["bucket_id"].iloc[0])
        base = int(pdf["base_doc"].iloc[0])
        nd = int(pdf["num_docs"].iloc[0])
        dead_bm = np.unpackbits(np.frombuffer(
            pack_docset(np.sort(pdf["doc_id"].to_numpy(np.int64)), base, nd),
            dtype=np.uint8), count=nd)
        if b in prev:
            live = np.unpackbits(np.frombuffer(prev[b][2], np.uint8), count=nd)
        else:
            live = np.ones(nd, dtype=np.uint8)
        newly = int((live & dead_bm).sum())
        live = live & (1 - dead_bm)
        return pd.DataFrame({"bucket_id": [b], "base_doc": [base],
                             "num_docs": [nd],
                             "live": [np.packbits(live).tobytes()],
                             "n_new_dead": [newly]})

    updated = (dead.groupBy("bucket_id")
               .applyInPandas(mark, MARK_SCHEMA)
               .persist())
    n_deleted = int(updated.agg(F.sum("n_new_dead")).collect()[0][0] or 0)
    # carry forward untouched buckets' previous bitmaps
    touched = {r["bucket_id"] for r in
               updated.select("bucket_id").distinct().collect()}
    rows = [(b, base, nd, live) for b, (base, nd, live) in prev.items()
            if b not in touched]
    carry = spark.createDataFrame(rows, LIVEDOCS_SCHEMA) if rows else None
    out = updated.drop("n_new_dead")
    if carry is not None:
        out = out.unionByName(carry)
    path, rel = cat.new_table_dir("livedocs")
    out.write.mode("overwrite").parquet(path)
    updated.unpersist()
    dead.unpersist()

    cat.commit({"livedocs": rel}, extra={"has_deletes": True})
    return n_deleted


def live_count(spark: SparkSession, index_dir: str) -> int:
    """Number of live (non-deleted) docs."""
    cat = IndexCatalog(index_dir)
    lp = cat.table_path("livedocs")
    total = int(spark.read.parquet(cat.table_path("stats"))
                .collect()[0]["doc_count"])
    if not lp:
        return total

    def cnt(batches):
        for pdf in batches:
            dead = 0
            for nd, live in zip(pdf["num_docs"], pdf["live"]):
                bits = np.unpackbits(np.frombuffer(bytes(live), np.uint8),
                                     count=int(nd))
                dead += int(nd) - int(bits.sum())
            yield pd.DataFrame({"dead": [dead]})

    dead = (spark.read.parquet(lp).mapInPandas(cnt, "dead long")
            .agg(F.sum("dead")).collect()[0][0] or 0)
    return total - int(dead)
