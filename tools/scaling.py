#!/usr/bin/env python
"""Scaling experiment: replicate the sf0.1 fixtures Nx (consistent key
offsets per replica so joins stay valid), then time headline queries at
1x vs Nx and report per-row throughput ratios.

Purpose: fixture-scale latencies are dominated by fixed per-job
overhead (BASELINE.md); this experiment exposes the *marginal* cost per
row, which is what actually extrapolates to the 100 TB design point.
A ratio near N means linear data cost; well under N means overhead
still dominates; superlinear flags an operator that won't survive
scale-up.

Usage: python tools/scaling.py [N]      (default N=10)
Writes the Nx dataset under .tmp/scale{N}/ and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from noaa_etl_spark.io import TABLES, load_table
from noaa_etl_spark.queries import QUERIES
from noaa_etl_spark.session import get_spark

BASE_SF = "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Per-replica id offsets keeping FKs consistent inside each replica.
OFFSETS = {
    "customer": {"c_custkey": 100_000_000},
    "supplier": {"s_suppkey": 100_000_000},
    "part": {"p_partkey": 100_000_000},
    "orders": {"o_orderkey": 1_000_000_000, "o_custkey": 100_000_000},
    "lineitem": {
        "l_orderkey": 1_000_000_000,
        "l_partkey": 100_000_000,
        "l_suppkey": 100_000_000,
    },
    "events": {"event_id": 1_000_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 10_000_000},
    "embeddings": {"vec_id": 1_000_000},
}

HEADLINE = [
    "q_pricing_summary",
    "q_join3_topk",
    "q_join5_region",
    "q_window_rank",
    "q_sessionize",
    "q_dedup_exact",
    "q_wordcount",
    "q_json_extract",
    "q_knn_cosine",
    "q_tfidf",
    "q_pivot_events",
]


def build(spark, n: int) -> str:
    out = os.path.join(REPO, ".tmp", f"scale{n}")
    for name in TABLES:
        dst = os.path.join(out, f"{name}.parquet")
        if os.path.exists(dst):
            continue
        base = load_table(spark, BASE_SF, name)
        if name in ("region", "nation"):
            base.write.mode("overwrite").parquet(dst)
            continue
        parts = []
        for i in range(n):
            df = base
            for col, step in OFFSETS.get(name, {}).items():
                df = df.withColumn(col, F.col(col) + F.lit(i * step))
            parts.append(df)
        merged = parts[0]
        for p in parts[1:]:
            merged = merged.unionByName(p)
        merged.write.mode("overwrite").parquet(dst)
    return out


def timed(fn, spark, sf_dir, runs=3):
    fn(spark, sf_dir).collect()
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("scaling")
    spark.sparkContext.setLogLevel("ERROR")
    big = build(spark, n)

    result = {"n": n, "queries": {}}
    for name in HEADLINE:
        t1 = timed(QUERIES[name], spark, BASE_SF)
        tn = timed(QUERIES[name], spark, big)
        result["queries"][name] = {
            "sec_1x": round(t1, 3),
            f"sec_{n}x": round(tn, 3),
            "ratio": round(tn / t1, 2),
        }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
