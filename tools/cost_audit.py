#!/usr/bin/env python
"""Per-query execution-cost audit: jobs/stages/tasks (StatusTracker,
grouped per query via job groups) plus shuffle-boundary count from the
executed plan — the scheduling-cost companion to bench.py's wall-clock.

Why it matters at 100 TB: wall-clock at fixture scale is dominated by
fixed per-job overhead, so plan *shape* (how many shuffles, how many
stages) is the number that predicts cluster cost. A query whose task
count explodes or that adds an Exchange between rounds is a regression
even if sf0.1 latency looks flat.

Usage: python tools/cost_audit.py [out_json]   (default COSTS.json)
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The bench.py headline set — audited at the bench scale factor.
AUDITED = [
    "q_pricing_summary",
    "q_join3_topk",
    "q_join5_region",
    "q_window_rank",
    "q_window_rolling_1h",
    "q_sessionize",
    "q_json_extract",
    "q_dedup_exact",
    "q_knn_cosine",
    "q_wordcount",
]


def audit_query(spark, name, fn) -> dict:
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    group = f"audit_{name}"
    sc.setJobGroup(group, name, interruptOnCancel=False)
    t0 = time.perf_counter()
    df = fn(spark, SF_DIR)
    df.collect()
    wall = time.perf_counter() - t0
    sc.setJobGroup(None, None)

    job_ids = tracker.getJobIdsForGroup(group)
    stage_ids: set[int] = set()
    for jid in job_ids:
        info = tracker.getJobInfo(jid)
        if info:
            stage_ids.update(info.stageIds)
    tasks = 0
    completed_stages = 0
    for sid in sorted(stage_ids):
        sinfo = tracker.getStageInfo(sid)
        if sinfo:
            tasks += sinfo.numTasks
            completed_stages += 1
    # Shuffle boundaries in the final (AQE-rewritten) physical plan.
    plan = df._jdf.queryExecution().executedPlan().toString()
    exchanges = len(re.findall(r"\bExchange\b", plan))
    reused = len(re.findall(r"ReusedExchange", plan))
    return {
        "jobs": len(job_ids),
        "stages": len(stage_ids),
        "tasks": tasks,
        "exchanges": exchanges,
        "reused_exchanges": reused,
        "wall_sec": round(wall, 3),
    }


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "COSTS.json")
    from noaa_etl_spark.queries import QUERIES
    from noaa_etl_spark.session import get_spark

    spark = get_spark("cost-audit")
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for name in AUDITED:
        audit_query(spark, name, QUERIES[name])  # warm-up (fills caches, JIT)
        results[name] = audit_query(spark, name, QUERIES[name])
        print(name, json.dumps(results[name]), flush=True)
    payload = {"sf_dir": SF_DIR, "queries": results}
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
