#!/usr/bin/env python
"""Sessionize skew bench: plain per-user window vs the (user, day)
bucketed form under a zipfian user distribution (one user owns half the
events) — the measurement behind the SCALING.md crossover rule.

Why: q_sessionize is the steepest scaler on file because its per-user
shuffle+sort is O(n log n) in ONE task per user — a celebrity user at
100 TB is a straggler no executor count fixes. sessionize_bucketed
splits the hot user across active days, sorts locally, and stitches on
session SUMMARIES (|sessions| ≪ |events|). This bench quantifies when
that trade (two extra small shuffles vs a bounded straggler) wins.

Usage: python tools/sessionize_bench.py [n_rows ...]  (default 2M 8M)
Prints one JSON line per size with both wall-clocks and the skew shape.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from noaa_etl_spark.operators.sessionize import sessionize, sessionize_bucketed
from noaa_etl_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DAYS = 30
N_COLD_USERS = 50_000


def build(spark, n_rows: int) -> str:
    """Events: 50% of rows on user 0 (spread over DAYS days — the
    celebrity), rest uniform over N_COLD_USERS users; second-granularity
    timestamps so the hot user's intra-day gaps stay under the session
    gap (one long session = worst case for the stitch pass is exercised
    too: it must merge every midnight boundary)."""
    path = os.path.join(REPO, ".tmp", "skew", f"events_{n_rows}")
    if not os.path.exists(path):
        start_us = 1_700_000_000 * 1_000_000  # fixed epoch anchor
        sec_span = DAYS * 86_400
        ev = spark.range(n_rows).select(
            F.when(F.col("id") % 2 == 0, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_COLD_USERS)) + 1)
            .alias("user_id"),
            F.timestamp_micros(
                F.lit(start_us)
                + F.pmod(F.xxhash64("id", F.lit(7)), F.lit(sec_span)) * 1_000_000
            ).alias("ts"),
            F.col("id").alias("event_id"),
        )
        ev.write.mode("overwrite").parquet(path)
    return path


def run_form(spark, path: str, fn, runs: int = 3) -> float:
    def once() -> float:
        ev = spark.read.parquet(path)
        t0 = time.perf_counter()
        out = fn(ev, tiebreak_col="event_id")
        # Reduce to one row but force every session id to be computed.
        out.agg(
            F.sum("session_id").alias("s"), F.count(F.lit(1)).alias("n")
        ).collect()
        return time.perf_counter() - t0

    once()  # warm-up
    return statistics.median(once() for _ in range(runs))


def equivalent(spark, path: str) -> bool:
    """Cheap full-data equivalence: per-user (n_sessions, event count,
    sum of session ids) must agree — tests/test_scale.py asserts the
    byte-identical form at fixture scale."""
    ev = spark.read.parquet(path)

    def profile(fn):
        return {
            (r["user_id"], r["ns"], r["n"], r["ssum"])
            for r in fn(ev, tiebreak_col="event_id")
            .groupBy("user_id")
            .agg(
                F.max("session_id").alias("ns"),
                F.count(F.lit(1)).alias("n"),
                F.sum("session_id").alias("ssum"),
            )
            .collect()
        }

    return profile(sessionize) == profile(sessionize_bucketed)


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [2_000_000, 8_000_000]
    spark = get_spark("sessionize-bench")
    spark.sparkContext.setLogLevel("ERROR")
    for n_rows in sizes:
        path = build(spark, n_rows)
        t_plain = run_form(spark, path, sessionize)
        t_bucketed = run_form(spark, path, sessionize_bucketed)
        print(
            json.dumps(
                {
                    "n_rows": n_rows,
                    "hot_user_fraction": 0.5,
                    "days": DAYS,
                    "plain_sec": round(t_plain, 3),
                    "bucketed_sec": round(t_bucketed, 3),
                    "speedup": round(t_plain / t_bucketed, 2),
                    "equivalent": equivalent(spark, path),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
