#!/usr/bin/env python
"""1000x sessionize probe (VERDICT r9 item 6): time the plain window
form vs the bucketed twin at the 100x / 1000x replica sets built by
tools/scaling.py. Replicated fixtures offset user ids per replica, so
per-user volume stays constant — this measures where the bucketed
form's compressed stitch sort crosses below the plain form's full
event sort on the fixture distribution (the SKEW win is measured
separately in tools/sessionize_bench.py's hot-user synthetic).
Timed via count() (collect() of tens of millions of session rows
would measure the driver, not the plan). One JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from noaa_etl_spark.io import load_table
from noaa_etl_spark.operators.sessionize import sessionize, sessionize_bucketed
from noaa_etl_spark.session import get_spark
from tools.scaling import BASE_SF, build


def run(spark, sf_dir, form):
    ev = load_table(spark, sf_dir, "events")
    sess = form(
        ev, user_col="user_id", ts_col="ts", gap_seconds=1800,
        tiebreak_col="event_id",
    )
    out = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("v")
    )
    t0 = time.perf_counter()
    n = out.count()
    return round(time.perf_counter() - t0, 2), n


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [100, 1000]
    spark = get_spark("sessionize_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    result = {}
    # warm + base point
    run(spark, BASE_SF, sessionize)
    for label, form in (("plain", sessionize), ("bucketed", sessionize_bucketed)):
        sec, n = run(spark, BASE_SF, form)
        result[f"1x_{label}"] = {"sec": sec, "sessions": n}
    for nrep in ns:
        path = build(spark, nrep)
        for label, form in (("plain", sessionize), ("bucketed", sessionize_bucketed)):
            sec, n = run(spark, path, form)
            result[f"{nrep}x_{label}"] = {"sec": sec, "sessions": n}
            print(f"# {nrep}x {label}: {sec}s {n} sessions", flush=True)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
