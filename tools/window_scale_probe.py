#!/usr/bin/env python
"""count()-timed 100x/1000x probe for q_window_rank and q_tfidf.

The round-10 sessionize probe showed the headline 100x/1000x table's
steep window-family ratios were COLLECT-dominated (driver
serialization of multi-million-row results, not engine work). This
probe re-times the two remaining steep entries the honest way: wrap
the query output in ONE global aggregate that CONSUMES a computed
column (count alone would let Catalyst prune the expensive expression
out of the plan), so the timing includes every shuffle/window/ln but
returns one row.

Usage: python tools/window_scale_probe.py [n ...] [query:col ...]
(default: 100 1000 over the window_rank/tfidf pair; pass explicit
query:consumed-column pairs to probe other row-proportional outputs)
Prints one JSON line; record results in SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from noaa_etl_spark.queries import QUERIES
from noaa_etl_spark.registry import load_all_queries
from noaa_etl_spark.session import get_spark
from tools.scaling import BASE_SF, build

# query -> numeric output column forced into the consuming aggregate
PROBES = {"q_window_rank": "o_totalprice", "q_tfidf": "tfidf"}


def timed_consume(fn, col, spark, sf_dir, runs=3):
    def once():
        out = fn(spark, sf_dir).agg(
            F.count(F.lit(1)).alias("n"), F.sum(col).alias("s")
        )
        t0 = time.perf_counter()
        row = out.collect()[0]
        return time.perf_counter() - t0, row["n"]

    once()  # warm
    best = min(once()[0] for _ in range(runs))
    return best, once()[1]


def main() -> None:
    ns = [int(a) for a in sys.argv[1:] if ":" not in a] or [100, 1000]
    pairs = dict(a.split(":", 1) for a in sys.argv[1:] if ":" in a)
    if pairs:
        PROBES.clear()
        PROBES.update(pairs)
    load_all_queries()
    spark = get_spark("window_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    result = {"load_avg_1m": round(os.getloadavg()[0], 2), "queries": {}}
    for name, col in PROBES.items():
        base_t, base_n = timed_consume(QUERIES[name], col, spark, BASE_SF)
        entry = {"sec_1x": round(base_t, 2), "rows_1x": base_n}
        for n in ns:
            big = build(spark, n)
            t, rows = timed_consume(QUERIES[name], col, spark, big)
            entry[f"sec_{n}x"] = round(t, 2)
            entry[f"rows_{n}x"] = rows
            entry[f"ratio_{n}x"] = round(t / base_t, 1)
        result["queries"][name] = entry
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
