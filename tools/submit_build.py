"""Cluster entry point: build the inverted index over a transcripts
table with spark-submit.

    spark-submit --py-files dist/lucene_spark.zip tools/submit_build.py \
        --input <parquet-or-iceberg-table-path> \
        --output <index-dir> \
        [--buckets N] [--keyword-fields role,tool]

The session is created WITHOUT a master so the cluster manager's
configuration applies (YARN/K8s/standalone); buckets default to the
data-defined suggest_buckets sizing. The build is checkpoint-resumable:
rerunning with the same --output skips committed stages and completed
buckets (per-partition lineage).
"""

from __future__ import annotations

import argparse


def main(spark=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--buckets", type=int, default=0)
    ap.add_argument("--keyword-fields", default="",
                    help="comma-separated docstore columns to index as "
                         "untokenized keyword fields")
    ap.add_argument("--wave-size", type=int, default=64)
    args = ap.parse_args()

    own_session = spark is None
    if own_session:
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder
                 .appName("lucene_spark-build")
                 .config("spark.sql.adaptive.enabled", "true")
                 .getOrCreate())

    from lucene_spark.index.builder import IndexBuilder, suggest_buckets
    tr = spark.read.parquet(args.input)
    n = args.buckets or suggest_buckets(tr.count())
    kw = tuple(f for f in args.keyword_fields.split(",") if f)
    cat = IndexBuilder(spark, args.output, num_buckets=n,
                       wave_size=args.wave_size,
                       keyword_fields=kw).build(tr)
    print(f"committed gen {cat.latest_commit()['gen']} at {args.output}")
    if own_session:
        spark.stop()


if __name__ == "__main__":
    main()
