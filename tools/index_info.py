"""Luke-style index inspector: print a committed index's anatomy.

The reference ships Luke (lucene/luke) for exactly this: open a
directory, see commits, segments, field config, term statistics.
This is the table-format equivalent — commit history, per-table
generations and on-disk bytes, collection stats, analyzer config,
deletes, and the heaviest terms.

Usage: python tools/index_info.py <index_dir> [--terms 15]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _dir_stats(root: str) -> tuple:
    n, b = 0, 0
    for dp, _, fs in os.walk(root):
        for f in fs:
            n += 1
            b += os.path.getsize(os.path.join(dp, f))
    return n, b


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("index_dir")
    ap.add_argument("--terms", type=int, default=15)
    args = ap.parse_args()

    from lucene_spark.index.catalog import IndexCatalog
    cat = IndexCatalog(args.index_dir)
    c = cat.latest_commit()
    if not c:
        print("no committed index at", args.index_dir)
        sys.exit(1)

    print(f"== commit points: {cat.list_commits()}  "
          f"(latest gen {c['gen']}, snapshots {cat.snapshots()})")
    extra = c.get("extra") or {}
    print(f"== format v{extra.get('format')}  buckets "
          f"{extra.get('num_buckets')}  field {extra.get('field')!r}  "
          f"analyzers {extra.get('analyzers') or {}}  "
          f"keyword_fields {extra.get('keyword_fields') or []}")

    print("== tables (generations, files, bytes)")
    for name in sorted(c["tables"]):
        locs = cat.table_locations(name)
        files = bytes_ = 0
        for p in locs:
            f, b = _dir_stats(p)
            files += f
            bytes_ += b
        print(f"  {name:<12} gens={len(locs):<3} files={files:<5} "
              f"bytes={bytes_:,}")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    spark = (SparkSession.builder.master("local[4]")
             .appName("index_info")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    try:
        st = spark.read.parquet(cat.table_path("stats")).collect()
        print("== collection stats")
        for r in st:
            print(f"  field={r['field']!r} docs={int(r['doc_count']):,} "
                  f"sum_ttf={int(r['sum_ttf']):,} "
                  f"avgdl={r['sum_ttf'] / max(r['doc_count'], 1):.2f}")
        from lucene_spark.index.catalog import read_table
        ts = read_table(spark, cat.table_locations("termstats"))
        n_terms = ts.select("field", "term").distinct().count()
        print(f"== term dictionary: {n_terms:,} distinct (field, term)")
        top = (ts.groupBy("field", "term")
               .agg(F.sum("ttf").alias("ttf"), F.sum("df").alias("df"))
               .orderBy(F.desc("ttf")).limit(args.terms).collect())
        print(f"== top {args.terms} terms by ttf")
        for r in top:
            print(f"  {r['field']}:{r['term']:<24} df={int(r['df']):<8} "
                  f"ttf={int(r['ttf'])}")
        lp = cat.table_path("livedocs")
        if lp:
            from lucene_spark.index.deletes import live_count
            print(f"== live docs: {live_count(spark, args.index_dir):,}")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
