"""End-to-end demo CLI — the reference's demo module
(demo/src/java/org/apache/lucene/demo/IndexFiles.java +
SearchFiles.java): index a directory of text files, then search it
from the command line.

    python tools/demo.py index  <src_dir> <index_dir>
    python tools/demo.py search <index_dir> "query" [-k 10] [--explain]
    python tools/demo.py parquet <parquet_file> <index_dir> [--text-col text]
    python tools/demo.py grep   <ngram_index_dir> <pattern> [-n 20]

`index` walks <src_dir> recursively; every *.txt/*.md/*.py/... file
becomes one document (conv_id = relative path, text = contents) —
IndexFiles' one-Document-per-file model. `parquet` indexes an existing
parquet table with a text column (the 100 TB entry point: point it at
a table, not a directory). `search` runs the classic query-parser
syntax through the full engine (BM25, pruned WAND) and prints doc,
score, source path and a snippet — SearchFiles' paging loop, one page.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXTS = {".txt", ".md", ".py", ".java", ".rst", ".html", ".json",
        ".csv", ".log"}


def _spark():
    from pyspark.sql import SparkSession
    return (SparkSession.builder.master(
        os.environ.get("SPARK_MASTER", "local[*]"))
        .appName("lucene_spark-demo")
        .config("spark.sql.shuffle.partitions",
                os.environ.get("SPARK_GRAFT_CPUS", "8"))
        .config("spark.ui.enabled", "false").getOrCreate())


def cmd_index(args) -> None:
    import pyspark.sql.functions as F
    spark = _spark()
    rows = []
    for dp, _, fs in os.walk(args.src_dir):
        for f in sorted(fs):
            if os.path.splitext(f)[1].lower() not in EXTS:
                continue
            p = os.path.join(dp, f)
            try:
                with open(p, errors="replace") as fh:
                    rows.append((os.path.relpath(p, args.src_dir),
                                 fh.read()))
            except OSError:
                continue
    if not rows:
        sys.exit(f"no indexable files under {args.src_dir}")
    df = (spark.createDataFrame(rows, "conv_id string, text string")
          .select("conv_id", F.lit(0).alias("turn_idx"),
                  F.lit("doc").alias("role"), "text",
                  F.lit(None).cast("string").alias("tool"),
                  F.current_timestamp().alias("ts")))
    from lucene_spark.index import build_index
    build_index(spark, df, args.index_dir,
                num_buckets=max(1, min(16, len(rows) // 500 + 1)))
    print(f"indexed {len(rows)} files -> {args.index_dir}")


def cmd_parquet(args) -> None:
    import pyspark.sql.functions as F
    spark = _spark()
    src = spark.read.parquet(args.src)
    df = src.select(
        F.monotonically_increasing_id().cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"), F.lit("doc").alias("role"),
        F.col(args.text_col).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.current_timestamp().alias("ts"))
    from lucene_spark.index import build_index
    build_index(spark, df, args.index_dir, num_buckets=args.buckets,
                analyzers={"text": args.analyzer})
    print(f"indexed {src.count()} rows -> {args.index_dir} "
          f"(analyzer {args.analyzer})")


def cmd_search(args) -> None:
    spark = _spark()
    from lucene_spark.search import IndexSearcher
    from lucene_spark.search.query import parse_query
    s = IndexSearcher(spark, args.index_dir)
    q = parse_query(args.query)
    top = s.search_df(q, k=args.k)
    hits = s.retrieve(top).collect()
    if not hits:
        print("no hits")
        return
    for i, r in enumerate(sorted(hits, key=lambda r: -float(r["score"]))):
        snippet = " ".join((r["text"] or "").split())[:120] \
            if "text" in r.asDict() else ""
        src = r["conv_id"] if "conv_id" in r.asDict() else r["doc_id"]
        print(f"{i + 1:2d}. doc={r['doc_id']} score={r['score']:.4f} "
              f"{src}\n     {snippet}")
    if args.explain:
        best = sorted(hits, key=lambda r: -float(r["score"]))[0]
        print("\nexplain(top hit):")
        print(s.explain(q, int(best["doc_id"])))


def cmd_grep(args) -> None:
    """Index-accelerated substring grep (search/substring.py) over an
    index whose text field uses the 'ngram' chain — build one with
    `parquet ... --analyzer ngram` or analyzers={"text": "ngram"}."""
    spark = _spark()
    from lucene_spark.search import IndexSearcher
    from lucene_spark.search.substring import substring_search
    s = IndexSearcher(spark, args.index_dir)
    hits = (s.retrieve(substring_search(s, args.pattern))
            .orderBy("doc_id").limit(args.n).collect())
    if not hits:
        print("no hits")
        return
    pat = args.pattern.lower()
    for r in hits:
        text = " ".join((r["text"] or "").split())
        i = text.lower().find(pat)
        lo = max(0, i - 50)
        print(f"doc={r['doc_id']} {r['conv_id']}: "
              f"...{text[lo:lo + 120]}...")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    p1 = sub.add_parser("index")
    p1.add_argument("src_dir")
    p1.add_argument("index_dir")
    p1.set_defaults(fn=cmd_index)
    p2 = sub.add_parser("search")
    p2.add_argument("index_dir")
    p2.add_argument("query")
    p2.add_argument("-k", type=int, default=10)
    p2.add_argument("--explain", action="store_true")
    p2.set_defaults(fn=cmd_search)
    p3 = sub.add_parser("parquet")
    p3.add_argument("src")
    p3.add_argument("index_dir")
    p3.add_argument("--text-col", default="text")
    p3.add_argument("--buckets", type=int, default=8)
    p3.add_argument("--analyzer", default="standard")
    p3.set_defaults(fn=cmd_parquet)
    p4 = sub.add_parser("grep")
    p4.add_argument("index_dir")
    p4.add_argument("pattern")
    p4.add_argument("-n", type=int, default=20)
    p4.set_defaults(fn=cmd_grep)
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
