#!/usr/bin/env python
"""Data-skipping scale probe: on a many-file range-laid-out table, time
the full-scan filter+aggregate against the stats-index pruned scan, and
report how many files the manifest ruled out.

At fixture scale wall-clock is scheduling-dominated; the numbers that
project to 100 TB are (files pruned / files total) — task count and
footer reads scale with files — and the flat cost of the index build
(one footer-only task per file, paid once per ingest batch, amortized
over every subsequent query).

Usage: python tools/skipping_bench.py [n_files] [replicas]
Prints one JSON line; record results in SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from noaa_etl_spark.io import load_table, ntz_lit
from noaa_etl_spark.session import get_spark
from tools.scaling import BASE_SF, build

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def timed(fn, runs=3):
    fn()
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("skipping_bench")
    spark.sparkContext.setLogLevel("ERROR")

    big = build(spark, replicas)
    path = os.path.join(REPO, ".tmp", f"skip_bench_{replicas}x_{n_files}f")
    if not os.path.exists(path):
        li = load_table(spark, big, "lineitem").select(
            "l_shipdate", "l_returnflag", "l_quantity"
        )
        li.repartitionByRange(n_files, "l_shipdate").write.mode(
            "overwrite"
        ).parquet(path)

    from noaa_etl_spark.operators.skipping import build_stats_index, read_pruned

    lo, hi = "1995-01-01", "1996-01-01"

    def agg(df):
        return (
            df.filter(
                (F.col("l_shipdate") >= ntz_lit(lo))
                & (F.col("l_shipdate") < ntz_lit(hi))
            )
            .groupBy("l_returnflag")
            .agg(F.sum("l_quantity").alias("sum_qty"))
            .collect()
        )

    t_full = timed(lambda: agg(spark.read.parquet(path)))

    t0 = time.perf_counter()
    index = build_stats_index(spark, path, ["l_shipdate"]).persist()
    n_total = index.count()
    t_index_build = time.perf_counter() - t0

    # plan once, execute repeatedly: pruning + schema resolution are
    # planning-time (a metastore would cache both); the timed leg is
    # the scan itself, mirroring how the full read reuses Spark's
    # cached FileIndex across runs.
    pruned_df = read_pruned(spark, path, index, {"l_shipdate": (lo, hi)})
    n_kept = len(pruned_df.inputFiles())
    t_pruned = timed(lambda: agg(pruned_df))

    full = {tuple(r) for r in agg(spark.read.parquet(path))}
    pruned = {tuple(r) for r in agg(pruned_df)}
    assert full == pruned, "pruned result diverged from full scan"

    print(
        json.dumps(
            {
                "n_files": n_total,
                "files_kept": n_kept,
                "prune_frac": round(1 - n_kept / n_total, 3),
                "sec_full": round(t_full, 3),
                "sec_pruned": round(t_pruned, 3),
                "sec_index_build_once": round(t_index_build, 3),
                "speedup": round(t_full / t_pruned, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
