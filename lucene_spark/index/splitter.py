"""PKIndexSplitter: split one committed index into two by a query.

Reference surface: misc/src/java/org/apache/lucene/misc/index/
PKIndexSplitter.java — docs matching the delimiting query go to one
directory, the rest to the other; the reference implements it as two
addIndexes(FilterCodecReader) passes where the non-matching side is
masked as deletes and dropped on the way through the codec.

Spark-first: the docstore IS the corpus (stored fields + build
metadata), so each side is one predicate-filtered scan of the live
docstore feeding a fresh build — the same "re-write through the codec
applying the mask" semantics without materializing fake delete bitmaps
first. Deleted source docs belong to NEITHER side (FilterCodecReader
composes the split mask with liveDocs). The source's per-field
analyzer chains carry over so both halves tokenize identically.

Per-side statistics (df, avgdl, sumttf) are recomputed over that
side's corpus — exactly what the reference's re-write does: a split
index scores with its own stats, not the parent's.

Scale shape: two predicate-pushed scans of the docstore (column-pruned
to the transcript columns) + two standard builds; nothing touches the
source postings, and the predicate reaches the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .add_indexes import _TRANSCRIPT_COLS, _live_docstore
from .builder import build_index
from .catalog import IndexCatalog, check_format

__all__ = ["split_index"]


def split_index(spark: SparkSession, src_dir: str, dst_match: str,
                dst_rest: str, predicate: str,
                num_buckets: int | None = None) -> tuple:
    """Split ``src_dir`` by the SQL ``predicate`` over docstore columns
    (the delimiting query): matching docs build ``dst_match``, the rest
    (including predicate-NULL docs, like the reference's
    "docsInFirstIndex" complement) build ``dst_rest``. Returns
    (n_match, n_rest) live row counts."""
    src = IndexCatalog(src_dir)
    c = src.latest_commit()
    if not c or "docstore" not in c["tables"]:
        raise ValueError(f"no committed index at {src_dir}")
    check_format(c, f"split_index({src_dir})")
    analyzers = (c.get("extra") or {}).get("analyzers") or {}
    kw = tuple((c.get("extra") or {}).get("keyword_fields") or ())

    live = _live_docstore(spark, src)
    pred = F.expr(predicate)
    sides = []
    cols = list(_TRANSCRIPT_COLS) + [k for k in kw
                                     if k not in _TRANSCRIPT_COLS]
    for dst, cond in ((dst_match, pred),
                      (dst_rest, ~F.coalesce(pred, F.lit(False)))):
        part = live.filter(cond).select(*cols)
        n = part.count()
        kwargs = {"analyzers": analyzers} if analyzers else {}
        if kw:
            kwargs["keyword_fields"] = kw
        build_index(spark, part, dst,
                    num_buckets=num_buckets or 2, **kwargs)
        sides.append(n)
    return tuple(sides)
