"""Pipeline-op scaling evidence: the build and query paths both have
N->4N core-scaling artifacts (BENCH_SCALING.json runs + query_scaling);
this tool measures a SHUFFLE-HEAVY training-data operator the same way
— exact substring dedup (duplicate_substring_spans: tokenize+explode ->
count shuffle -> hash join back -> per-doc window merge) over a
generated transcript corpus, at local[N] vs local[4N], fresh JVM per
level, min of the steady repetitions (rep 1 warms codegen + page
cache).

Usage: python tools/op_scaling_bench.py [--convs 45000] [--n 2]
       [--write]
--write APPENDS an op_scaling entry to BENCH_SCALING.json (never
clobbers existing sections).
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
convs = int(sys.argv[1]); src = sys.argv[2]
spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "48g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from pyspark.sql import functions as F
from lucene_spark.fixtures.transcripts import transcripts_df
if not os.path.exists(src):
    (transcripts_df(spark, n_convs=convs, seed=42, partitions=32)
     .select(F.monotonically_increasing_id().alias("doc_id"), "text")
     .write.mode("overwrite").parquet(src))
d = spark.read.parquet(src)
import json as _j
print("RESULT " + _j.dumps({{"docs": d.count(),
    "tokens": d.select(F.sum(F.size(F.split("text", " ")))).first()[0]}}))
spark.stop()
"""

_LEVEL = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
cpus = int(sys.argv[1]); src = sys.argv[2]
spark = (SparkSession.builder.master(f"local[{{cpus}}]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "48g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from lucene_spark.ops.dedup import duplicate_substring_spans
d = spark.read.parquet(src)
walls, n = [], -1
for _ in range(3):
    t0 = time.time()
    n = duplicate_substring_spans(d, window=8, min_count=2).count()
    walls.append(round(time.time() - t0, 3))
    spark.catalog.clearCache()
print("RESULT " + json.dumps({{"cpus": cpus, "walls": walls,
                               "sec": min(walls[1:]), "spans": n}}))
spark.stop()
"""



_LEVEL_PACK = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
cpus = int(sys.argv[1]); src = sys.argv[2]
spark = (SparkSession.builder.master(f"local[{{cpus}}]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "48g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from lucene_spark.ops.packing import pack_sequences
d = spark.read.parquet(src)
walls, n = [], -1
for _ in range(3):
    t0 = time.time()
    n = pack_sequences(d, budget=256, n_shards=64).count()
    walls.append(round(time.time() - t0, 3))
    spark.catalog.clearCache()
print("RESULT " + json.dumps({{"cpus": cpus, "walls": walls,
                               "sec": min(walls[1:]), "spans": n}}))
spark.stop()
"""

def _run(code: str, *args) -> dict | int | str:
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(code.format(repo=REPO))
        path = f.name
    try:
        out = subprocess.run([sys.executable, path, *map(str, args)],
                             capture_output=True, text=True, check=True)
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                return json.loads(line[len("RESULT "):])
        raise RuntimeError(f"no RESULT line:\n{out.stdout}\n{out.stderr}")
    finally:
        os.unlink(path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=45000)
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--write", action="store_true")
    ap.add_argument("--op", choices=["substring", "pack"],
                    default="substring")
    a = ap.parse_args()
    work = os.path.join(REPO, ".idxcache", f"opscale_{a.convs}")
    src = os.path.join(work, "docs.parquet")
    os.makedirs(work, exist_ok=True)
    meta = _run(_PREP, a.convs, src)
    lvl = _LEVEL_PACK if a.op == "pack" else _LEVEL
    low = _run(lvl, a.n, src)
    high = _run(lvl, a.n * 4, src)
    assert low["spans"] == high["spans"], "parallelism changed the result"
    ratio = round(low["sec"] / high["sec"], 3)
    eff = round(ratio / 4.0, 3)
    jobs = {
        "substring": ("exact substring dedup (duplicate_substring_spans "
                      "window=8): tokenize+explode -> count shuffle -> "
                      "hash join -> per-doc window merge"),
        "pack": ("sequence packing (pack_sequences budget=256, 64 "
                 "shards): per-shard window cumsum -> span explode -> "
                 "slice arithmetic"),
    }
    entry = {
        "job": jobs[a.op],
        "input": meta,
        "levels": {"low": f"local[{a.n}]", "high": f"local[{a.n * 4}]",
                   "core_ratio": 4.0},
        "low": low, "high": high,
        "throughput_ratio": ratio, "efficiency": eff,
    }
    print(json.dumps(entry, indent=1))
    if a.write:
        p = os.path.join(REPO, "BENCH_SCALING.json")
        d = json.load(open(p))
        d.setdefault("op_scaling", []).append(entry)
        json.dump(d, open(p, "w"), indent=1)
        print(f"appended op_scaling entry to {p}")


if __name__ == "__main__":
    main()
