#!/usr/bin/env python
"""Benchmark harness: headline graded queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Methodology mirrors BASELINE.md: per query 1 warm-up run then median of
3 timed runs of ``collect()`` latency; session startup excluded. The
headline set maps 1:1 onto the BASELINE.md rows so the driver's
BENCH_r{N}.json is directly comparable.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from noaa_etl_spark.queries import QUERIES  # noqa: E402
from noaa_etl_spark.session import get_spark  # noqa: E402

# Headline queries — same operators as the BASELINE.md table rows.
HEADLINE = [
    "q_pricing_summary",   # BASELINE q_agg_pricing
    "q_join3_topk",
    "q_join5_region",
    "q_window_rank",
    "q_window_rolling_1h", # BASELINE q_window_rolling
    "q_sessionize",
    "q_json_extract",
    "q_dedup_exact",       # BASELINE q_dedup_docs
    "q_knn_cosine",
    "q_wordcount",
]


def time_query(spark, name: str, sf_dir: str, warmups: int = 1, runs: int = 3) -> float:
    fn = QUERIES[name]
    for _ in range(warmups):
        fn(spark, sf_dir).collect()
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        samples.append(time.perf_counter() - t0)
    return statistics.median(samples)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark("noaa-etl-bench")
    spark.sparkContext.setLogLevel("ERROR")

    per_query: dict[str, float] = {}
    for name in HEADLINE:
        per_query[name] = round(time_query(spark, name, sf_dir), 4)

    total = round(sum(per_query.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
