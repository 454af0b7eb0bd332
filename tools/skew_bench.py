#!/usr/bin/env python
"""Skew stress bench: a zipfian fact table (one key owns half the rows)
sort-merge-joined to a dimension, with AQE skew-join splitting on vs
off — quantifies the engine's primary skew defense.

Usage: python tools/skew_bench.py [n_rows]     (default 2,000,000)
Prints one JSON line with both wall-clocks and the observed skew split.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from noaa_etl_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(spark, n_rows: int) -> tuple[str, str]:
    """Fact: 50% of rows on key 0, rest uniform over 100k keys, with a
    ~64-byte payload so the shuffle is byte-heavy. Dim: one row per key."""
    fact_path = os.path.join(REPO, ".tmp", "skew", f"fact_{n_rows}")
    dim_path = os.path.join(REPO, ".tmp", "skew", f"dim_{n_rows}")
    if not os.path.exists(fact_path):
        fact = spark.range(n_rows).select(
            F.when(F.col("id") % 2 == 0, 0)
            .otherwise(F.pmod(F.xxhash64("id"), 100_000))
            .alias("key"),
            (F.col("id") % 1000).cast("double").alias("value"),
            F.repeat(F.concat(F.lit("p"), (F.col("id") % 97).cast("string")), 16).alias("payload"),
        )
        fact.write.mode("overwrite").parquet(fact_path)
        dim = spark.range(100_000).select(
            F.col("id").alias("d_key"),
            F.concat(F.lit("dim_"), F.col("id").cast("string")).alias("d_name"),
        )
        dim.write.mode("overwrite").parquet(dim_path)
    return fact_path, dim_path


def run_join(spark, fact_path: str, dim_path: str, skew_on: bool, runs: int = 3) -> float:
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # Thresholds scaled down so fixture-size partitions qualify as skewed
    # exactly like 100x-larger ones would with the defaults.
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")

    def once() -> float:
        fact = spark.read.parquet(fact_path)
        dim = spark.read.parquet(dim_path)
        t0 = time.perf_counter()
        # Reduce with a key-insensitive hash sum (not a skewed groupBy,
        # which would re-concentrate the hot key downstream and mask the
        # join-stage effect being measured).
        (
            fact.join(dim, fact.key == dim.d_key)
            .select(F.sum(F.pmod(F.xxhash64("payload", "d_name"), F.lit(1_000_000_007))).alias("h"))
            .collect()
        )
        return time.perf_counter() - t0

    once()  # warm-up
    return statistics.median(once() for _ in range(runs))


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark("skew-bench")
    spark.sparkContext.setLogLevel("ERROR")
    fact_path, dim_path = build(spark, n_rows)
    t_off = run_join(spark, fact_path, dim_path, skew_on=False)
    t_on = run_join(spark, fact_path, dim_path, skew_on=True)
    print(
        json.dumps(
            {
                "n_rows": n_rows,
                "hot_key_fraction": 0.5,
                "smj_skew_off_sec": round(t_off, 3),
                "smj_skew_on_sec": round(t_on, 3),
                "speedup": round(t_off / t_on, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
