"""Query-path scaling evidence (round-4 verdict item #10): the build
artifact shows >=0.8 build efficiency from N to 4N cores; this tool
measures the SEARCH path the same way — the reference 40-query mixed
set (term/and/or/phrase across the df spectrum), batched into one
Spark job over ONE shared on-disk index, at local[N] vs local[4N].

The index is built once (untimed, its own subprocess) with enough
buckets that both levels have full task parallelism; each level then
runs the batch three times in a fresh JVM and reports the min of the
two steady-state repetitions (rep 1 warms codegen + page cache).

Usage: python tools/query_scaling_bench.py [--convs 360000] [--n 2]
       [--write]
--write APPENDS a query_scaling entry to BENCH_SCALING.json (never
clobbers the build runs).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PREP = r"""
import os, sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
convs = int(sys.argv[1]); buckets = int(sys.argv[2])
src, idx = sys.argv[3], sys.argv[4]
spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", str(buckets))
         .config("spark.driver.memory", "48g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from lucene_spark.fixtures.transcripts import transcripts_df
from lucene_spark.index import build_index
if not os.path.exists(src):
    (transcripts_df(spark, n_convs=convs, seed=42, partitions=32)
     .write.mode("overwrite").parquet(src))
tr = spark.read.parquet(src)
n = tr.count()
from lucene_spark.index.catalog import IndexCatalog
if not IndexCatalog(idx).has_table("postings"):
    build_index(spark, tr, idx, num_buckets=buckets)
print("RESULT " + str(n))
spark.stop()
"""

_LEVEL = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
cpus = int(sys.argv[1]); idx = sys.argv[2]
spark = (SparkSession.builder.master(f"local[{{cpus}}]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "48g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from lucene_spark.fixtures.queryset import generate_queries
from lucene_spark.search import IndexSearcher
from lucene_spark.search.query import from_dict
s = IndexSearcher(spark, idx)
qs = {{q["qid"]: from_dict(q) for q in generate_queries(n_queries=40,
                                                        seed=4242)}}
walls = []
for rep in range(3):
    t0 = time.time()
    s.search_batch(qs, k=10).count()
    walls.append(round(time.time() - t0, 3))
wall = min(walls[1:])  # steady state after the cold rep
print("RESULT " + json.dumps({{"cpus": cpus, "walls": walls,
                               "sec": wall,
                               "qps": round(40.0 / wall, 2)}}))
spark.stop()
"""


def _run(script, args, timeout=7200):
    out = subprocess.run([sys.executable, "-c", script, *map(str, args)],
                         capture_output=True, text=True, timeout=timeout)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return line[len("RESULT "):]
    raise RuntimeError(f"no RESULT:\n{out.stdout[-2000:]}"
                       f"\n{out.stderr[-2000:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=360000)
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--write", action="store_true")
    args = ap.parse_args()
    src = os.path.join(tempfile.gettempdir(),
                       f"scaling_src_{args.convs}.parquet")
    idx = os.path.join(tempfile.gettempdir(),
                       f"scaling_idx_{args.convs}")
    turns = int(_run(_PREP.format(repo=REPO),
                     [args.convs, 32, src, idx]))
    print(f"index ready: {turns} turns", file=sys.stderr)
    low = json.loads(_run(_LEVEL.format(repo=REPO), [args.n, idx]))
    print(f"local[{args.n}]: {low}", file=sys.stderr)
    high = json.loads(_run(_LEVEL.format(repo=REPO), [4 * args.n, idx]))
    print(f"local[{4 * args.n}]: {high}", file=sys.stderr)
    eff = (high["qps"] / low["qps"]) / 4.0
    entry = {
        "job": "ref_set_40 batched top-10 search (one Spark job, "
               "shared on-disk index)",
        "input_turns": turns,
        "levels": {"low": f"local[{args.n}]",
                   "high": f"local[{4 * args.n}]", "core_ratio": 4.0},
        "low": low, "high": high,
        "throughput_ratio": round(high["qps"] / low["qps"], 3),
        "efficiency": round(eff, 3),
    }
    print(json.dumps(entry))
    if args.write:
        path = os.path.join(REPO, "BENCH_SCALING.json")
        with open(path) as fh:
            doc = json.load(fh)
        doc.setdefault("query_scaling", []).append(entry)
        with open(path, "w") as fh:
            json.dump(doc, fh, indent=1)


if __name__ == "__main__":
    main()
