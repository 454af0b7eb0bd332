#!/usr/bin/env python
"""100x execution sweep: run every graded BATCH query against the Nx
replica (tools/scaling.build) through the noop sink — full plan
execution, nothing written — and report pass/fail/timeout per query.

Why: the round-11 100x probe caught two ANSI ARITHMETIC_OVERFLOW aborts
(covariance n*sxy, chi-square num^2) in queries that were clean at 1x
and 10x — BIGINT products of aggregated BIGINTs in finalize arithmetic
grow quadratically with data and per-row quantization contracts don't
protect them. count()-based execution can't catch these (Catalyst
prunes the projected expressions); the noop sink computes every column.

Streaming twins are skipped (their arithmetic is the shared batch
finalize; their foreachBatch drains would copy the replica 3x each).

CAVEAT — run HEAVY queries ONE PER INVOCATION: an executor/JVM OOM
kills the shared local SparkSession and every later query in the same
run reports FAIL unclassified (observed live in the round-11 sweep,
where four heavy ops were misreported off one OOM). After any FAIL the
sweep now probes session health with spark.range(1).count() and aborts
with status "session poisoned" instead of emitting junk rows; restart
the process (the .tmp/scale{N} replica persists, so rebuilds are free).

Usage: python tools/scale_sweep.py [N] [cap_seconds] [query ...]
Prints one line per query and a final JSON summary.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from noaa_etl_spark.queries import QUERIES
from noaa_etl_spark.registry import load_all_queries
from noaa_etl_spark.session import get_spark
from tools.scaling import build


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    cap = float(sys.argv[2]) if len(sys.argv) > 2 else 240.0
    load_all_queries()
    names = sys.argv[3:] or [q for q in QUERIES if not q.startswith("q_stream_")]
    spark = get_spark("scale_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    big = build(spark, n)

    results: dict[str, dict] = {}
    poisoned_after: str | None = None
    for name in names:
        group = f"sweep:{name}"
        spark.sparkContext.setJobGroup(group, name, interruptOnCancel=True)
        timed_out = threading.Event()

        def cancel() -> None:
            timed_out.set()
            spark.sparkContext.cancelJobGroup(group)

        timer = threading.Timer(cap, cancel)
        timer.start()
        t0 = time.perf_counter()
        try:
            QUERIES[name](spark, big).write.format("noop").mode("overwrite").save()
            status, detail = "ok", ""
        except Exception as e:  # noqa: BLE001 — the sweep's whole job is to report
            if timed_out.is_set():
                status, detail = "timeout", f"> {cap:.0f}s (cancelled, not a failure)"
            else:
                status = "FAIL"
                detail = str(e).split("\n")[0][:300]
        finally:
            timer.cancel()
            spark.sparkContext.setJobGroup("", "")
        wall = time.perf_counter() - t0
        results[name] = {"status": status, "sec": round(wall, 1), "detail": detail}
        print(f"{name}: {status} [{wall:.1f}s] {detail}", flush=True)
        if status == "FAIL":
            # An executor/JVM OOM poisons the shared session: every
            # later query would read FAIL unclassified. Probe health
            # and abort rather than emit junk rows.
            try:
                spark.range(1).count()
            except Exception:
                print(
                    f"SESSION POISONED after {name} — aborting sweep; "
                    f"rerun remaining queries in a fresh invocation",
                    flush=True,
                )
                results[name]["detail"] += " [session poisoned after this]"
                poisoned_after = name
                break

    summary = {
        "n": n,
        "cap_s": cap,
        "total": len(results),
        "ok": sum(1 for r in results.values() if r["status"] == "ok"),
        "timeout": sorted(k for k, r in results.items() if r["status"] == "timeout"),
        "fail": {k: r["detail"] for k, r in results.items() if r["status"] == "FAIL"},
        "session_poisoned_after": poisoned_after,
        "not_run": [q for q in names if q not in results],
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
