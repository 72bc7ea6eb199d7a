"""Driver-sim: run every __spark_entry__ query on Spark AND its DuckDB
oracle at sf0.01, compare row count / column names / order-insensitive
value hash — a local replica of the CORRECTNESS_r{N}.json gate.

Usage: python tools/check_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon(df) -> tuple[int, list, str]:
    """(row_count, sorted columns, value hash) with columns sorted by
    name and rows sorted; floats canonicalized via repr of float."""
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for t in df.itertuples(index=False):
        rows.append(tuple(_c(v) for v in t))
    rows.sort(key=repr)
    h = hashlib.sha256(repr(rows).encode()).hexdigest()[:16]
    return len(rows), cols, h


def _c(v):
    import numpy as np
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating, float)):
        return round(float(v), 9)
    if isinstance(v, bytes):
        return v.hex()
    return v


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from pyspark.sql import SparkSession
    # CHECK_CPUS lets robustness sweeps re-run the gate at different
    # parallelism: results must be partition-count independent (the
    # r05 binary-ANN candidate-cut incident)
    cpus = int(os.environ.get("CHECK_CPUS", "8"))
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("check_entry")
             .config("spark.sql.shuffle.partitions", str(cpus))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "8g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = E.queries()
    os_ = E.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            n_fail += 1
            continue
        if name not in os_:
            print(f"SKIP {name}: no oracle (rows={len(sdf)},"
                  f" {time.time() - t0:.1f}s)")
            continue
        try:
            odf = con.sql(os_[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: oracle error: {str(ex)[:200]}")
            n_fail += 1
            continue
        sn, sc, sh = canon(sdf)
        on, oc, oh = canon(odf)
        ok = (sn == on) and (sc == oc) and (sh == oh)
        status = "PASS" if ok else "FAIL"
        if ok:
            n_pass += 1
        else:
            n_fail += 1
        print(f"{status} {name}: spark({sn} rows, {sc}, {sh}) vs "
              f"oracle({on} rows, {oc}, {oh})  [{time.time() - t0:.1f}s]")
        if not ok and sn == on and sc == oc:
            # show first differing rows for debugging
            srows = set(map(repr, sdf[sorted(sdf.columns)].itertuples(index=False)))
            orows = set(map(repr, odf[sorted(odf.columns)].itertuples(index=False)))
            for r in list(srows - orows)[:3]:
                print(f"   spark-only: {r}")
            for r in list(orows - srows)[:3]:
                print(f"   oracle-only: {r}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
