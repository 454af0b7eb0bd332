#!/usr/bin/env python
"""Benchmark harness: headline graded queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Methodology (round 6): one full warm-up pass over the whole headline
set, then ROUNDS=5 *interleaved* passes — each pass times every query
once, in order, inside the same session. Per-query value = median of
the 5 interleaved samples. Interleaving spreads each query's samples
across the session lifetime so JVM/JIT warmth (measured at ±30%
per-session on sub-second queries, BASELINE.md §floor) perturbs all
queries alike instead of whichever ran last; round-over-round deltas
become attributable to plan changes. The extra "dispersion" field
carries each query's relative sample range ((max-min)/median) so a
reader can tell a real regression from warmth noise. Session startup
is excluded; the headline set maps 1:1 onto the BASELINE.md rows so
the driver's BENCH_r{N}.json is directly comparable.
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

ROUNDS = 5


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark("noaa-etl-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up pass: plan compilation, file-listing caches, JIT ramp.
    for name in HEADLINE:
        QUERIES[name](spark, sf_dir).collect()

    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(ROUNDS):
        for name in HEADLINE:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).collect()
            samples[name].append(time.perf_counter() - t0)

    per_query: dict[str, float] = {}
    dispersion: dict[str, float] = {}
    for name in HEADLINE:
        s = samples[name]
        med = statistics.median(s)
        per_query[name] = round(med, 4)
        dispersion[name] = round((max(s) - min(s)) / med, 3) if med > 0 else 0.0

    total = round(sum(per_query.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
                "runs": ROUNDS,
                "dispersion": dispersion,
                # Self-adjudicating load context: three rounds (r6, r8,
                # r10) paid a verdict round-trip proving a bench
                # "regression" was background machine load. 1-minute
                # load average at exit; readings taken above ~2 on this
                # 32-CPU box inflate uniformly (BASELINE.md load table).
                "load_avg_1m": round(os.getloadavg()[0], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()


# -- round-6 methodology note ------------------------------------------------
# Previous rounds timed each query in its own block (warmup + median-of-3
# before moving on). r4->r5 showed +5..+21% "regressions" on sub-second
# queries that were pure session warmth (BASELINE.md A/B/A/B analysis).
# The interleaved design makes every query sample the same warmth
# trajectory; with 5 samples the median sits past the JIT knee for all
# queries simultaneously.
