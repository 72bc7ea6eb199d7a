"""addIndexes: fold committed indexes into another index.

Reference surface: IndexWriter.addIndexes(Directory...) /
addIndexes(CodecReader...) (core:index/IndexWriter.java:3076,3168).
The reference either copies segment files re-basing docBase, or
re-writes through the codec applying deletes. Spark-first: each
source's docstore IS its corpus (stored fields + build metadata), so
folding a source in is one NRT-style append — doc_ids continue after
the destination's maxDoc (the docBase shift), postings/termstats/norms
publish as new generations, and ONE atomic catalog commit per source
makes the fold visible. Deleted source docs are dropped on the way in
(the addIndexes(CodecReader...) semantics — deletes are applied, not
carried), and the destination's analyzer chain re-tokenizes the stored
text, which the reference documents as the caller's responsibility to
keep consistent ("the analyzer used may differ").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import IndexCatalog, check_format, read_table

__all__ = ["add_indexes"]

_TRANSCRIPT_COLS = ("conv_id", "turn_idx", "role", "tool", "ts", "text")


def _live_docstore(spark: SparkSession, cat: IndexCatalog) -> DataFrame:
    """A source index's docstore with deleted docs dropped."""
    ds = read_table(spark, cat.table_locations("docstore"))
    lp = cat.table_path("livedocs")
    if lp is None:
        return ds

    def dead_ids(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                live = np.unpackbits(
                    np.frombuffer(bytes(r.live), np.uint8),
                    count=int(r.num_docs))
                out.append(int(r.base_doc)
                           + np.flatnonzero(live == 0).astype(np.int64))
            yield pd.DataFrame({"doc_id": np.concatenate(out)
                                if out else np.zeros(0, np.int64)})

    dead = spark.read.parquet(lp).mapInPandas(dead_ids, "doc_id bigint")
    return ds.join(F.broadcast(dead), "doc_id", "left_anti")


def add_indexes(spark: SparkSession, dst_dir: str, src_dirs,
                rows_per_bucket: int = 100_000) -> int:
    """Fold the committed indexes at ``src_dirs`` into ``dst_dir``.
    Returns the number of live rows added. The destination must be a
    committed index; each source is appended as its own atomic commit
    (a crash between sources leaves the destination at the last
    complete fold, never half a source)."""
    from ..streaming.nrt import NRTIndexWriter

    dst = IndexCatalog(dst_dir)
    c = dst.latest_commit()
    if not c or "postings" not in c["tables"]:
        raise ValueError(f"no committed index at {dst_dir}")
    check_format(c, f"add_indexes({dst_dir})")

    w = NRTIndexWriter(spark, dst_dir, rows_per_bucket=rows_per_bucket)
    total = 0
    for src_dir in ([src_dirs] if isinstance(src_dirs, str) else src_dirs):
        src = IndexCatalog(src_dir)
        sc = src.latest_commit()
        if not sc or "docstore" not in sc["tables"]:
            raise ValueError(f"no committed index at {src_dir}")
        check_format(sc, f"add_indexes source {src_dir}")
        batch = _live_docstore(spark, src).select(*_TRANSCRIPT_COLS)
        total += w.append_batch(batch)
    return total
