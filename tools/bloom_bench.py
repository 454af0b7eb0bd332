#!/usr/bin/env python
"""Runtime bloom-filter join bench: selective-dim ⋈ fact with broadcast
disabled (the too-big-to-broadcast regime), bloom row-level runtime
filtering on vs off — wall-clock AND shuffle bytes, since the whole
point of the bloom filter is dropping probe rows BEFORE the shuffle.

The mechanism was plan-verified in round 2 (tests/test_plans.py); this
records the measured effect for SCALING.md. Thresholds are lowered the
same way the skew bench scales AQE thresholds: the defaults target
cluster-size scans (10 GB) and would simply not fire at fixture scale.

Usage: python tools/bloom_bench.py [n_rows]     (default 8,000,000)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from noaa_etl_spark.plans.audit import executed_cost_profile
from noaa_etl_spark.session import get_spark
from tools.skew_bench import build

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_join(spark, fact_path: str, dim_path: str, bloom_on: bool, runs: int = 3):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", str(bloom_on).lower())
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )

    def query():
        fact = spark.read.parquet(fact_path)
        # ~1% of dim rows via an ATTRIBUTE predicate. A key-derivable
        # filter (e.g. d_key % 100 = 37) would be transitively inferred
        # onto the fact scan by Catalyst (InferFiltersFromConstraints) —
        # measured: the fact side arrives pre-pruned and the bloom
        # filter has nothing left to do. Attribute filters are the case
        # runtime filtering exists for. (xxhash of d_name ⇒ opaque to
        # inference; excludes hot key 0 iff its hash does — selectivity
        # ~1% of UNIFORM keys either way.)
        dim = spark.read.parquet(dim_path).filter(
            (F.pmod(F.xxhash64("d_name"), F.lit(100)) == 37)
            & (F.col("d_key") != 0)  # keep the zipf hot key out: with it,
            # "selective" dim would still match 50% of fact
        )
        return (
            fact.join(dim, fact.key == dim.d_key)
            .select(
                F.sum(F.pmod(F.xxhash64("payload", "d_name"), F.lit(1_000_000_007))).alias("h"),
                F.count(F.lit(1)).alias("n"),
            )
        )

    query().collect()  # warm-up
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        query().collect()
        times.append(time.perf_counter() - t0)
    profile = executed_cost_profile(spark, query(), f"bloom_{bloom_on}")
    return statistics.median(times), profile


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    spark = get_spark("bloom-bench", ui=True)
    spark.sparkContext.setLogLevel("ERROR")
    fact_path, dim_path = build(spark, n_rows)
    t_off, p_off = run_join(spark, fact_path, dim_path, bloom_on=False)
    t_on, p_on = run_join(spark, fact_path, dim_path, bloom_on=True)
    print(
        json.dumps(
            {
                "n_rows": n_rows,
                "dim_selectivity": 0.01,
                "bloom_off_sec": round(t_off, 3),
                "bloom_on_sec": round(t_on, 3),
                "speedup": round(t_off / t_on, 2),
                "bloom_off_shuffle_write": p_off["shuffle_write_bytes"],
                "bloom_on_shuffle_write": p_on["shuffle_write_bytes"],
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
