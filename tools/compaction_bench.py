#!/usr/bin/env python
"""Small-files tax, measured: the same rows scanned from a fragmented
layout vs the compacted rewrite (operators/compaction.py).

Fragmentation costs a scan three ways: file listing, one footer
read + task per file (task scheduling overhead dominates locally; on
S3 each open is a GET with ~10ms latency), and degenerate row groups
(no intra-file skipping). This bench isolates the effect at two file
counts on identical data, for two query shapes:

    full_agg   groupBy over everything — pays listing + open + tasks
    selective  key-range filter — additionally shows stats recovering
               skipping after a clustered (sort_cols) rewrite

Usage: python tools/compaction_bench.py [n_rows] [n_frag_files]
(defaults 8,000,000 rows, 512 files). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from noaa_etl_spark.operators.compaction import compact, file_stats
from noaa_etl_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, ".tmp", "compaction_bench")


def build(spark, n_rows: int):
    df = spark.range(n_rows)
    return df.select(
        F.col("id").alias("k"),
        F.pmod(F.xxhash64("id"), F.lit(1000)).alias("bucket"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(100_000)) / 100.0).alias("value"),
        F.concat(F.lit("payload-"), F.col("id")).alias("payload"),
    )


def timed(fn, runs: int = 3) -> float:
    fn()  # warm-up
    walls = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        walls.append(time.perf_counter() - t0)
    return round(statistics.median(walls), 4)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    n_frag = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    spark = get_spark("compaction-bench", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(OUT, ignore_errors=True)

    frag = os.path.join(OUT, "fragmented")
    build(spark, n_rows).repartition(n_frag).write.parquet(frag)
    _, total_bytes = file_stats(spark, frag)
    target_mb = max(1, round(total_bytes / 8 / (1 << 20)))

    packed = os.path.join(OUT, "packed")
    plan = compact(spark, frag, packed, target_file_mb=target_mb)
    clustered = os.path.join(OUT, "clustered")
    compact(spark, frag, clustered, target_file_mb=target_mb, sort_cols=["k"])

    lo, hi = n_rows // 2, n_rows // 2 + n_rows // 20  # 5% key slice

    def full_agg(path):
        return lambda: (
            spark.read.parquet(path)
            .groupBy("bucket")
            .agg(F.sum("value"), F.count("*"))
            .collect()
        )

    def selective(path):
        return lambda: (
            spark.read.parquet(path).filter(F.col("k").between(lo, hi)).count()
        )

    result = {
        "n_rows": n_rows,
        "fragmented_files": n_frag,
        "compacted_files": plan["n_files_out"],
        "total_mb": round(total_bytes / (1 << 20), 1),
        "layouts": {},
    }
    for name, path in [("fragmented", frag), ("packed", packed), ("clustered", clustered)]:
        result["layouts"][name] = {
            "full_agg_sec": timed(full_agg(path)),
            "selective_sec": timed(selective(path)),
        }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
