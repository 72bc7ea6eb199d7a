"""Scaling evidence for the north rule: the same index-build job at two
parallelism levels (local[N] vs local[4N]) on identical input, as the
sandbox proxy for N vs 4N executors.

Each level runs in its own subprocess (a JVM's master is fixed at
session creation). Work is held identical: same corpus, same
num_buckets (= 4N so both levels have full task parallelism available),
same shuffle partitions. Prints a JSON report and (with --write)
appends/updates the scaling section in BENCH_SCALING.json.

Usage: python tools/scaling_bench.py [--convs 30000] [--n 8] [--write]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
cpus = int(sys.argv[1]); convs = int(sys.argv[2]); buckets = int(sys.argv[3])
src = sys.argv[4]
spark = (SparkSession.builder.master(f"local[{{cpus}}]")
         .appName(f"scaling-{{cpus}}")
         .config("spark.sql.shuffle.partitions", str(buckets))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", "48g")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from lucene_spark.fixtures.transcripts import transcripts_df
from lucene_spark.index import build_index
# Input is a stored table (the north-rule input is an Iceberg table of
# transcripts) — materialize the deterministic fixture once, untimed;
# the timed build reads it like production.
if not os.path.exists(src):
    (transcripts_df(spark, n_convs=convs, seed=42, partitions=max(buckets, 32))
     .write.mode("overwrite").parquet(src))
tr = spark.read.parquet(src)
n_turns = tr.count()
from lucene_spark.index.builder import suggest_buckets
buckets = max(buckets, suggest_buckets(n_turns))
spark.conf.set("spark.sql.shuffle.partitions", str(buckets))
trials = int(sys.argv[5]) if len(sys.argv) > 5 else 1
walls = []
for t in range(trials):
    tmp = tempfile.mkdtemp(prefix=f"scale_{{cpus}}_")
    t0 = time.time()
    build_index(spark, tr, tmp, num_buckets=buckets)
    walls.append(time.time() - t0)
    shutil.rmtree(tmp, ignore_errors=True)
wall = min(walls)  # steady-state: JIT + page cache warm after trial 1
print("RESULT " + json.dumps({{"cpus": cpus, "turns": n_turns,
                               "sec": round(wall, 2),
                               "walls": [round(w, 2) for w in walls],
                               "turns_per_sec": round(n_turns / wall, 1)}}))
spark.stop()
"""


def run_level(cpus: int, convs: int, buckets: int, src: str,
              trials: int = 1) -> dict:
    script = _CHILD.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cpus), str(convs), str(buckets),
         src, str(trials)],
        capture_output=True, text=True, timeout=7200)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from local[{cpus}]:\n{out.stdout[-2000:]}"
                       f"\n{out.stderr[-2000:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=30000)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--trials", type=int, default=1,
                    help="builds per level; min wall is reported "
                         "(steady-state: warm JIT/page cache)")
    ap.add_argument("--write", action="store_true")
    args = ap.parse_args()
    buckets = 4 * args.n
    import tempfile
    src = os.path.join(tempfile.gettempdir(),
                       f"scaling_src_{args.convs}.parquet")
    low = run_level(args.n, args.convs, buckets, src, args.trials)
    print(f"local[{args.n}]: {low}", file=sys.stderr)
    high = run_level(4 * args.n, args.convs, buckets, src, args.trials)
    print(f"local[{4 * args.n}]: {high}", file=sys.stderr)
    eff = (high["turns_per_sec"] / low["turns_per_sec"]) / 4.0
    report = {
        "job": "transcript index build (docstore+segments+stats+norms+merge)",
        "input": {"n_convs": args.convs, "turns": low["turns"], "seed": 42},
        "low": low, "high": high,
        "core_ratio": 4.0,
        "throughput_ratio": round(high["turns_per_sec"] / low["turns_per_sec"], 3),
        "scaling_efficiency": round(eff, 3),
        "meets_0_8": eff >= 0.8,
    }
    print(json.dumps(report))
    if args.write:
        with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as fh:
            json.dump(report, fh, indent=1)


if __name__ == "__main__":
    main()
